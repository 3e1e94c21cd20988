// Execute the reference's task9 (OriginalAmieComparison -runlogical,
// experiments_amie2 OriginalAmieComparison.scala:70-86 + MinHcRdfRules +
// RdfRulesMiningTask.taskBody with DefaultMiningSettings) on an arbitrary
// TSV, for a SAME-HOST wall-time baseline:
//   mine: MinHeadCoverage(args minHc) + MaxRuleLength(3) +
//         InjectiveMapping + ConstantsAtPosition(Nowhere)   [logical only]
//   then: CWA confidence >= 0.1 (injective), filter
//   then: PCA confidence >= 0.1 (injective), filter          [countOtherMetrics]
// The published task9.txt figure (12.82 min / 3,430 rules) ran this exact
// pipeline on yago2core (~1M triples) — that dataset is not in the
// snapshot, so bench.py dumps its own synthetic 1M KG to TSV and this
// harness provides the reference-side wall time on identical input.
import com.github.propi.rdfrules.algorithm.amie.Amie
import com.github.propi.rdfrules.algorithm.amie.RuleCounting._
import com.github.propi.rdfrules.algorithm.consumer.InMemoryRuleConsumer
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.rule._
import com.github.propi.rdfrules.utils.Debugger

import java.io.File

object Task9Harness {

  def main(args: Array[String]): Unit = {
    val minHc = args(0).toDouble
    val outPath = args(1)
    val inputs = args.drop(2).filterNot(_.startsWith("--"))
    implicit val reader: RdfReader = RdfSource.Tsv(RdfSource.Tsv.ParsingMode.ParsedLiterals)
    val dataset = inputs.foldLeft(Dataset()) { (d, f) => d + Graph(new File(f)) }

    Debugger() { implicit debugger =>
      val index = IndexPart.apply(dataset, false)
      val amie = Amie()
        .addThreshold(Threshold.MinHeadCoverage(minHc))
        .addThreshold(Threshold.MaxRuleLength(3))
        .addConstraint(RuleConstraint.InjectiveMapping())
        .addConstraint(RuleConstraint.ConstantsAtPosition(RuleConstraint.ConstantsAtPosition.ConstantsPosition.Nowhere))
      implicit val tihi: TripleItemIndex = index.tripleItemMap
      implicit val thi: TripleIndex[Int] = index.tripleMap
      val t0 = System.nanoTime()
      val rules = InMemoryRuleConsumer() { consumer =>
        thi.subjects
        thi.objects
        amie.mine(consumer).toIndexedSeq
      }
      System.err.println(s"mined: ${rules.size} in ${(System.nanoTime() - t0) / 1e9} s")
      val withCwa = rules.map(_.withCwaConfidence(0.1, true))
        .filter(_.measures.get[Measure.CwaConfidence].exists(_.value >= 0.1))
      System.err.println(s"after cwa: ${withCwa.size} at ${(System.nanoTime() - t0) / 1e9} s")
      val withPca = withCwa.map(_.withPcaConfidence(0.1, true))
        .filter(_.measures.get[Measure.PcaConfidence].exists(_.value >= 0.1))
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(s"final: ${withPca.size} in $secs s")

      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(outPath), java.nio.charset.StandardCharsets.UTF_8))
      for (r <- withPca) {
        val rr: ResolvedRule = ResolvedRule(r)
        val body = rr.body.map(_.toString).sorted.mkString(" ^ ")
        val support = r.measures.get[Measure.Support].map(_.value).getOrElse(-1)
        val headSize = r.measures.get[Measure.HeadSize].map(_.value).getOrElse(-1)
        val cwa = r.measures.get[Measure.CwaConfidence].map(_.value).getOrElse(-1.0)
        val pca = r.measures.get[Measure.PcaConfidence].map(_.value).getOrElse(-1.0)
        out.println(s"${rr.head}\t<=\t$body\t$support\t$headSize\t$cwa\t$pca")
      }
      out.close()
    }
  }
}
