// Execute the reference's TreeBasedDbScan on a mined+sorted+topK ruleset
// and dump (head predicate, cluster index, insertion position, rule) rows
// for partition-level parity with
// rdfrules_spark.ruleset.tree_dbscan_clusters_resolved.
// Mirrors Ruleset.makeClusters(groupedByHeadPredicate = true)
// (Ruleset.scala:230-245): group the SORTED ruleset by head predicate
// (preserving order within each group), cluster each group independently.
// Args: <data.tsv> <minHc> <topK> <out> [--nodup] [--constlcs|--constobj]
//       [--arity=2] [--minsim=0.8] [--deepsim]
import com.github.propi.rdfrules.algorithm.amie.Amie
import com.github.propi.rdfrules.algorithm.clustering.TreeBasedDbScan
import com.github.propi.rdfrules.algorithm.consumer.InMemoryRuleConsumer
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.rule._
import com.github.propi.rdfrules.utils.Debugger

import java.io.File

object ClusterHarness {

  def main(args: Array[String]): Unit = {
    val dataFile = new File(args(0))
    val minHc = args(1).toDouble
    val topK = args(2).toInt
    val outPath = args(3)
    val arity = args.collectFirst { case a if a.startsWith("--arity=") => a.stripPrefix("--arity=").toInt }.getOrElse(2)
    val minSim = args.collectFirst { case a if a.startsWith("--minsim=") => a.stripPrefix("--minsim=").toDouble }.getOrElse(0.8)
    val deepSim = args.contains("--deepsim")

    val dataset = Dataset(dataFile)
    Debugger() { implicit debugger =>
      val index = IndexPart.apply(dataset, false)
      var amie = Amie().addThreshold(Threshold.MinHeadCoverage(minHc))
      if (args.contains("--nodup")) amie = amie.addConstraint(RuleConstraint.WithoutDuplicatePredicates())
      import RuleConstraint.ConstantsAtPosition.ConstantsPosition
      if (args.contains("--constlcs")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.LowerCardinalitySide()))
      if (args.contains("--constobj")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.Object))
      implicit val tihi: TripleItemIndex = index.tripleItemMap
      implicit val thi: TripleIndex[Int] = index.tripleMap
      val rules = InMemoryRuleConsumer() { consumer =>
        thi.subjects
        thi.objects
        amie.mine(consumer).toIndexedSeq
      }
      // Ruleset.sorted = sortBy default rule ordering (Rule.Simple ordering:
      // headCoverage desc); make ties deterministic for the fixture by a
      // secondary key on the resolved text — the SAME law the Python side
      // pins, so both sides feed identical insertion order.
      val resolved = rules.map(r => (r, ResolvedRule(r)))
      val sorted = resolved.sortBy { case (r, rr) =>
        (-r.measures.apply[Measure.HeadCoverage].value,
          rr.head.toString + "<=" + rr.body.map(_.toString).sorted.mkString(" ^ "))
      }.take(topK)
      System.err.println(s"rules: ${rules.size}, clustering top ${sorted.size}")

      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(outPath), java.nio.charset.StandardCharsets.UTF_8))
      // group by head predicate PRESERVING order (like Scala groupBy does
      // per group); deterministic group order = first-appearance
      val groupKeys = sorted.map(_._1.head.predicate).distinct
      for (p <- groupKeys) {
        val group = sorted.filter(_._1.head.predicate == p)
        val clustering = TreeBasedDbScan[(Rule.FinalRule, ResolvedRule)](
          arity, minSim, deepSim
        )((a, b) => implicitly[com.github.propi.rdfrules.algorithm.clustering.SimilarityCounting[Rule]].apply(a._1, b._1), debugger)
        val clusters = clustering.clusters(group.toIndexedSeq, "")
        val pName = tihi.getTripleItem(p).toString
        for ((cluster, cid) <- clusters.zipWithIndex; (r, rr) <- cluster) {
          val pos = group.indexWhere(_._2 eq rr)
          val body = rr.body.map(_.toString).sorted.mkString(" ^ ")
          val hc = r.measures.apply[Measure.HeadCoverage].value
          out.println(s"$pName\t$cid\t$pos\t${rr.head}\t$body\t$hc")
        }
      }
      out.close()
    }
  }
}
