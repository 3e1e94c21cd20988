// Debug harness: the reference's full link-prediction EVALUATION pipeline —
// mine on a train split, predict against a test split (merged index,
// test-covered, injective), group by NoisyOr, build prediction tasks from
// the test set at the train predicate's higherCardinalitySide, and compute
// the FromTest ranking evaluation (hits@k / MR / MRR) plus completeness.
// Dumps the aggregate numbers AND every task's ordered candidate list for
// set-level diffing against rdfrules_spark/prediction.py.
import com.github.propi.rdfrules.algorithm.amie.Amie
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.prediction.aggregator.NoisyOrScorer
import com.github.propi.rdfrules.prediction.eval.{CompletenessEvaluationBuilder, EvaluationResult, RankingEvaluationBuilder}
import com.github.propi.rdfrules.rule._
import com.github.propi.rdfrules.utils.Debugger

import java.io.File

object EvalHarness {

  def main(args: Array[String]): Unit = {
    val trainFile = new File(args(0))
    val testFile = new File(args(1))
    val minHc = args(2).toDouble
    val outPrefix = args(3)

    val trainDs = Dataset(trainFile)
    val testDs = Dataset(testFile)
    Debugger() { implicit debugger =>
      val index = Index(IndexPart.apply(trainDs, false))
      val amie = Amie()
        .addConstraint(RuleConstraint.WithoutDuplicatePredicates())
        .addConstraint(RuleConstraint.ConstantsAtPosition(RuleConstraint.ConstantsAtPosition.ConstantsPosition.Nowhere))
        .addThreshold(Threshold.MinHeadCoverage(minHc))
      val ruleset = index.mineRules(amie)
      System.err.println(s"rules: ${ruleset.size}")
      val withConf = ruleset.computeConfidence[Measure.CwaConfidence](0.001, true, 0)
      System.err.println(s"rules with cwa: ${withConf.size}")

      val preds = withConf.predict(Some(testDs))
      implicit val dc: DefaultConfidence = DefaultConfidence(Measure.CwaConfidence)
      val grouped = preds.grouped(NoisyOrScorer())
      val tasks = grouped.predictionTasks()

      // per-task ordered candidates (for set-level diffing)
      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(outPrefix + "_tasks.tsv"), java.nio.charset.StandardCharsets.UTF_8))
      tasks.resolvedPredictionTasksResults.foreach { r =>
        val task = r.predictionTask
        val cands = r.candidates.iterator.map(c =>
          s"${c.triple.subject}::${c.triple.`object`}::${c.score}").mkString("|")
        out.println(Seq(task.p, task.c, cands).mkString("\t"))
      }
      out.close()

      val results = tasks.evaluate(
        RankingEvaluationBuilder.fromTest(Vector(1, 3, 10)),
        CompletenessEvaluationBuilder()
      )
      val out2 = new java.io.PrintWriter(outPrefix + "_eval.txt")
      results.foreach {
        case EvaluationResult.Ranking(hitsK, mr, mrr, total, totalCorrect) =>
          out2.println(s"ranking\t${hitsK.map(h => s"${h.k}:${h.value}").mkString(",")}\t$mr\t$mrr\t$total\t$totalCorrect")
          System.err.println(s"ranking: hits=${hitsK.map(h => s"${h.k}:${h.value}").mkString(",")} mr=$mr mrr=$mrr q=$total qr=$totalCorrect")
        case EvaluationResult.Completeness(tp, fp, fn, tn) =>
          out2.println(s"completeness\t$tp\t$fp\t$fn\t$tn")
          System.err.println(s"completeness: tp=$tp fp=$fp fn=$fn tn=$tn")
        case x => out2.println(x.toString)
      }
      out2.close()
    }
  }
}
