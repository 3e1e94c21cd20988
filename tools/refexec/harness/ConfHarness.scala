// Debug harness: mine with the reference engine, then compute per-rule
// confidence measures (CWA / PCA / QPCA, injective and plain, + lift) via
// RuleCounting, and dump everything for value-level diffing against the
// PySpark measures modules. Mirrors Ruleset.computeConfidence
// (Ruleset.scala:186-211) with topK=0.
import com.github.propi.rdfrules.algorithm.amie.Amie
import com.github.propi.rdfrules.algorithm.amie.RuleCounting._
import com.github.propi.rdfrules.algorithm.consumer.InMemoryRuleConsumer
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.rule._
import com.github.propi.rdfrules.utils.Debugger

import java.io.File

object ConfHarness {

  def main(args: Array[String]): Unit = {
    val dataFile = new File(args(0))
    val minHc = args(1).toDouble
    val outPath = args(2)
    val withoutDupPredicates = args.contains("--nodup")

    val dataset = Dataset(dataFile)
    Debugger() { implicit debugger =>
      val index = IndexPart.apply(dataset, false)
      var amie = Amie().addThreshold(Threshold.MinHeadCoverage(minHc))
      if (withoutDupPredicates) amie = amie.addConstraint(RuleConstraint.WithoutDuplicatePredicates())
      import RuleConstraint.ConstantsAtPosition.ConstantsPosition
      if (args.contains("--novar")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.Nowhere))
      if (args.contains("--constlcs")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.LowerCardinalitySide()))
      implicit val tihi: TripleItemIndex = index.tripleItemMap
      implicit val thi: TripleIndex[Int] = index.tripleMap
      val rules = InMemoryRuleConsumer() { consumer =>
        thi.subjects
        thi.objects
        amie.mine(consumer).toIndexedSeq
      }
      System.err.println(s"rules: ${rules.size}")

      def cwa(r: Rule.FinalRule): Double = r.measures.get[Measure.CwaConfidence].map(_.value).getOrElse(-1.0)
      def pca(r: Rule.FinalRule): Double = r.measures.get[Measure.PcaConfidence].map(_.value).getOrElse(-1.0)
      def qpca(r: Rule.FinalRule): Double = r.measures.get[Measure.QpcaConfidence].map(_.value).getOrElse(-1.0)
      def lift(r: Rule.FinalRule): Double = r.measures.get[Measure.Lift].map(_.value).getOrElse(-1.0)

      def bodySize(r: Rule.FinalRule): Int = r.measures.get[Measure.BodySize].map(_.value).getOrElse(-1)

      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(outPath), java.nio.charset.StandardCharsets.UTF_8))
      for (r <- rules) {
        val rr: ResolvedRule = ResolvedRule(r)
        val body = rr.body.map(_.toString).sorted.mkString(" ^ ")
        val support = r.measures.get[Measure.Support].map(_.value).getOrElse(-1)
        val headSize = r.measures.get[Measure.HeadSize].map(_.value).getOrElse(-1)

        // pass the 0.001 floor EXPLICITLY: withCwaConfidence's sub-0.001
        // fallback (RuleCounting.scala:71-72) forwards `allPaths` into the
        // injectiveMapping parameter, silently dropping injectivity.
        val cwaInj = r.withCwaConfidence(0.001, true)
        val cwaPlain = r.withCwaConfidence(0.001, false)
        val pcaInj = r.withPcaConfidence(0.001, true)
        val pcaPlain = r.withPcaConfidence(0.001, false)
        val qpcaInj = r.withQpcaConfidence(0.001, true)
        val qpcaPlain = r.withQpcaConfidence(0.001, false)
        val liftR = cwaInj.withLift(DefaultConfidence(Measure.CwaConfidence))

        out.println(Seq(
          rr.head.toString, body, support, headSize,
          cwa(cwaInj), bodySize(cwaInj),
          cwa(cwaPlain), bodySize(cwaPlain),
          pca(pcaInj),
          pca(pcaPlain),
          qpca(qpcaInj),
          qpca(qpcaPlain),
          lift(liftR)
        ).mkString("\t"))
      }
      out.close()
    }
  }
}
