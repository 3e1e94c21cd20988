// Dump the reference's PARSED view of TSV/graph inputs (ParsedLiterals
// mode) as resolved strings — used to pin the PySpark readers' term
// decoding against the reference parser exactly (sources/tsv.py
// parse_literals, sources/turtle.py).
// Args: <out> <input.tsv> [<input2.tsv> ...]
import com.github.propi.rdfrules.data._

import java.io.File

object DataDumpHarness {

  def main(args: Array[String]): Unit = {
    val outPath = args(0)
    implicit val reader: RdfReader = RdfSource.Tsv(RdfSource.Tsv.ParsingMode.ParsedLiterals)
    val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(outPath), java.nio.charset.StandardCharsets.UTF_8))
    for (f <- args.drop(1)) {
      val g = Graph(new File(f))
      g.triples.foreach { t =>
        out.println(s"${t.subject}\t${t.predicate}\t${t.`object`}")
      }
    }
    out.close()
  }
}
