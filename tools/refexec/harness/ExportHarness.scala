// Execute the REFERENCE's own RDF export path offline and dump N-Triples:
// Graph(file, ParsedLiterals TSV) -> Graph.export("out.nt") goes through
// RdfWriter(file) -> RdfSource("nt") -> JenaLang.jenaFormatToRdfWriter
// (JenaLang.scala) -> TripleItem -> Jena Node mapping incl. XSD datatype
// assignment (TripleItem.tripleItemToJenaNode) -> the stub's spec-derived
// NT stream serializer (stubs/jena.scala NtStreamWriter). Everything
// upstream of the byte-level NT grammar is real reference code, so the
// dump pins the reference's export term mapping for the PySpark readers.
// Args: <out.nt> <input.tsv> [<input2.tsv> ...]
import com.github.propi.rdfrules.data._

import java.io.File

object ExportHarness {

  def main(args: Array[String]): Unit = {
    val outPath = args(0)
    implicit val reader: RdfReader = RdfSource.Tsv(RdfSource.Tsv.ParsingMode.ParsedLiterals)
    val dataset = args.drop(1).foldLeft(Dataset()) { (d, f) => d + Graph(new File(f)) }
    val merged = Graph(dataset.quads.map(_.triple))
    merged.`export`(outPath)
  }
}
