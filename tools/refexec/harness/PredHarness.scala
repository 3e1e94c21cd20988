// Debug harness: run the reference's prediction pipeline end-to-end and
// dump (a) distinct predicted triples with their Positive/PcaPositive/
// Negative tag, and (b) NoisyOr-grouped scores per triple — for value-level
// diffing against rdfrules_spark/prediction.py. Mirrors
// Ruleset.predict (defaults: no test set, merged binding, injective) and
// PredictedTriples.grouped(NoisyOrScorer) (Prediction.scala:31-102,
// NoisyOrScorer.scala:9-24).
import com.github.propi.rdfrules.algorithm.amie.Amie
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.prediction.aggregator.NoisyOrScorer
import com.github.propi.rdfrules.rule._
import com.github.propi.rdfrules.ruleset.Ruleset
import com.github.propi.rdfrules.utils.Debugger

import java.io.File

object PredHarness {

  def main(args: Array[String]): Unit = {
    val dataFile = new File(args(0))
    val minHc = args(1).toDouble
    val outPrefix = args(2)

    val dataset = Dataset(dataFile)
    Debugger() { implicit debugger =>
      val index = Index(IndexPart.apply(dataset, false))
      var amie = Amie().addThreshold(Threshold.MinHeadCoverage(minHc))
      if (args.contains("--nodup")) amie = amie.addConstraint(RuleConstraint.WithoutDuplicatePredicates())
      import RuleConstraint.ConstantsAtPosition.ConstantsPosition
      if (args.contains("--novar")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.Nowhere))
      if (args.contains("--constlcs")) amie = amie.addConstraint(RuleConstraint.ConstantsAtPosition(ConstantsPosition.LowerCardinalitySide()))
      val ruleset = index.mineRules(amie)
      System.err.println(s"rules: ${ruleset.size}")
      // floor 0.001 passed explicitly (see ConfHarness note on the
      // RuleCounting.scala:71-72 argument-swap fallback)
      val withConf = ruleset.computeConfidence[Measure.CwaConfidence](0.001, true, 0)
      System.err.println(s"rules with cwa >= 0.001: ${withConf.size}")

      val preds = withConf.predict()

      def w(path: String)(f: java.io.PrintWriter => Unit): Unit = {
        val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
          new java.io.FileOutputStream(path), java.nio.charset.StandardCharsets.UTF_8))
        try f(out) finally out.close()
      }

      w(outPrefix + "_tagged.tsv") { out =>
        preds.distinctPredictions.resolvedTriples.foreach { t =>
          out.println(Seq(t.triple.subject, t.triple.predicate, t.triple.`object`, t.predictedResult).mkString("\t"))
        }
      }

      implicit val dc: DefaultConfidence = DefaultConfidence(Measure.CwaConfidence)
      w(outPrefix + "_noisyor.tsv") { out =>
        preds.grouped(NoisyOrScorer()).resolvedTriples.foreach { t =>
          out.println(Seq(t.triple.subject, t.triple.predicate, t.triple.`object`, t.predictedResult, t.score, t.rules.size).mkString("\t"))
        }
      }
    }
  }
}
