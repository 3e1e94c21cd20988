// Debug harness: run the reference AMIE miner offline and dump the mined
// rule set (resolved text + measures) for set-level diffing against the
// PySpark re-implementation. Mirrors AmieSpec "mine with instances and with
// duplicit predicates" (AmieSpec.scala:157-173).
import com.github.propi.rdfrules.algorithm.amie.Amie
import com.github.propi.rdfrules.algorithm.consumer.InMemoryRuleConsumer
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.rule._
import com.github.propi.rdfrules.utils.{Debugger, TypedKeyMap}

import java.io.File

object MineHarness {

  def main(args: Array[String]): Unit = {
    val dataFile = new File(args(0))
    val minHc = args(1).toDouble
    val outPath = args(2)
    val withoutDupPredicates = args.contains("--nodup")
    // --graph2=PATH: named two-graph dataset (yago + dbpedia), the
    // AmieSpec.scala:401-438 shape; --graphaware: resolve every mined
    // rule's atoms as GraphAware (Ruleset.graphAwareRules,
    // Ruleset.scala:160-170) so the dump carries per-atom graph sets.
    val graph2 = args.collectFirst { case a if a.startsWith("--graph2=") => a.stripPrefix("--graph2=") }
    val graphAware = args.contains("--graphaware")

    val dataset = graph2 match {
      case Some(path2) => Dataset() + Graph("yago", dataFile) + Graph("dbpedia", new File(path2))
      case None => Dataset(dataFile)
    }
    Debugger() { implicit debugger =>
      val index = IndexPart.apply(dataset, false)
      var amie = Amie().addThreshold(Threshold.MinHeadCoverage(minHc))
      if (withoutDupPredicates) amie = amie.addConstraint(RuleConstraint.WithoutDuplicatePredicates())
      import RuleConstraint.ConstantsAtPosition.ConstantsPosition
      if (args.contains("--novar")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.Nowhere))
      if (args.contains("--constobj")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.Object))
      if (args.contains("--constsubj")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.Subject))
      if (args.contains("--constlcs")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.LowerCardinalitySide()))
      for (arg <- args; len <- arg.stripPrefix("--maxlen=").toIntOption if arg.startsWith("--maxlen="))
        amie = amie.addThreshold(Threshold.MaxRuleLength(len))
      for (arg <- args; n <- arg.stripPrefix("--minhs=").toIntOption if arg.startsWith("--minhs="))
        amie = amie.addThreshold(Threshold.MinHeadSize(n))
      // graph patterns on the HEAD atom (AmieSpec.scala:418-438 shape):
      // RulePattern(AtomPattern(graph = ...)) sets the consequent pattern
      for (arg <- args if arg.startsWith("--graphpattern="))
        amie = amie.addPattern(RulePattern(AtomPattern(graph = com.github.propi.rdfrules.data.TripleItem.Uri(arg.stripPrefix("--graphpattern=")))))
      for (arg <- args if arg.startsWith("--graphpatternnone="))
        amie = amie.addPattern(RulePattern(AtomPattern(graph = AtomPattern.AtomItemPattern.NoneOf(AtomPattern.AtomItemPattern.Constant(com.github.propi.rdfrules.data.TripleItem.Uri(arg.stripPrefix("--graphpatternnone=")))))))
      implicit val tihi: TripleItemIndex = index.tripleItemMap
      implicit val thi: TripleIndex[Int] = index.tripleMap
      val t0 = System.nanoTime()
      val rules = InMemoryRuleConsumer() { consumer =>
        thi.subjects
        thi.objects
        amie.mine(consumer).toIndexedSeq
      }
      val ms = (System.nanoTime() - t0) / 1e6
      System.err.println(s"rules: ${rules.size} in $ms ms")
      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(new java.io.FileOutputStream(outPath), java.nio.charset.StandardCharsets.UTF_8))
      for (r0 <- rules) {
        val r = if (graphAware) r0.withContent(r0.head.toGraphAwareAtom, r0.body.map(_.toGraphAwareAtom)) else r0
        val rr: ResolvedRule = ResolvedRule(r)
        val support = r.measures.get[Measure.Support].map(_.value).getOrElse(-1)
        val headSize = r.measures.get[Measure.HeadSize].map(_.value).getOrElse(-1)
        val hc = r.measures.get[Measure.HeadCoverage].map(_.value).getOrElse(-1.0)
        val body = rr.body.map(_.toString).sorted.mkString(" ^ ")
        out.println(s"${rr.head}\t<=\t$body\t$support\t$headSize\t$hc")
      }
      out.close()
    }
  }
}
