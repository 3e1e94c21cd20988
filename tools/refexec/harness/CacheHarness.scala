// Dump the reference's BINARY cache artifacts (data/ops/Cacheable.scala,
// index/ops/Cacheable.scala) from the executed reference, so the PySpark
// reader (rdfrules_spark/sources/refcache.py) can be verified against the
// product's own on-disk format:
//   args: <data.tsv> <quads.cache> <index.cache>
//   - quads.cache: Dataset.cache(os) — stream of length-prefixed serialized
//     Quads (serialization/QuadSerialization.scala)
//   - index.cache: Index.cache(path) — dictionary items + part markers +
//     fixed-width int quads (index/ops/Cacheable.scala:25-45)
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.utils.Debugger

import java.io.{File, FileOutputStream}

object CacheHarness {
  def main(args: Array[String]): Unit = {
    // --load <file.cache>: load via Dataset.fromCache and print the quad
    // count + md5 of the sorted quad dump — run on the reference's own
    // cache AND on the PySpark writer's output to prove both load to the
    // same dataset under the reference's own deserializer.
    if (args(0) == "--load") {
      val ds = Dataset.fromCache(new File(args(1)))
      val sb = collection.mutable.ArrayBuffer.empty[String]
      ds.quads.foreach(q => sb += q.toString)
      val md = java.security.MessageDigest.getInstance("MD5")
      sb.sorted.foreach(s => md.update((s + "\n").getBytes("UTF-8")))
      println(s"quads: ${sb.size} md5: ${md.digest.map("%02x".format(_)).mkString}")
      return
    }
    val dataFile = new File(args(0))
    val quadsOut = args(1)
    val indexOut = args(2)
    val dataset = Dataset(dataFile)
    dataset.cache(new FileOutputStream(quadsOut))
    Debugger() { implicit debugger =>
      val index = Index(dataset, false)
      index.cache(indexOut)
    }
    System.err.println(s"quads cache -> $quadsOut, index cache -> $indexOut")
  }
}
