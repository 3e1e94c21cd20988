// Debug harness: run the reference AMIE miner offline and dump the mined
// rule set (resolved text + measures) for set-level diffing against the
// PySpark re-implementation. Mirrors AmieSpec "mine with instances and with
// duplicit predicates" (AmieSpec.scala:157-173).
import com.github.propi.rdfrules.algorithm.amie.Amie
import com.github.propi.rdfrules.algorithm.consumer.InMemoryRuleConsumer
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.rule._
import com.github.propi.rdfrules.rule.AtomPattern.AtomItemPattern
import com.github.propi.rdfrules.rule.PatternMatcher.Aliases
import com.github.propi.rdfrules.rule.RulePatternMatcher._
import com.github.propi.rdfrules.utils.{Debugger, TypedKeyMap}

import java.io.File

object MineHarness {

  // Pattern CLI spec (shared by --pattern= mining-time and --postfilter=
  // Ruleset.filter-time): "<atom>&<atom>&...[=><atom>]"; atom = "s;p;o";
  // item = "*" Any | "$V" AnyVariable | "$C" AnyConstant | "?x" Variable |
  // "!u1|u2" NoneOf | "u1|u2" OneOf | "uri" Constant.
  def parseItem(s: String): AtomItemPattern = s match {
    case "*" => AtomItemPattern.Any
    case "$V" => AtomItemPattern.AnyVariable
    case "$C" => AtomItemPattern.AnyConstant
    case v if v.startsWith("?") => AtomItemPattern.Variable(Atom.Variable(v.charAt(1).toInt - 97))
    case c if c.startsWith("!") =>
      val items = c.stripPrefix("!").split('|').toIndexedSeq.map(u => AtomItemPattern.Constant(TripleItem.Uri(u)))
      AtomItemPattern.NoneOf(items)
    case c if c.contains("|") =>
      AtomItemPattern.OneOf(c.split('|').toIndexedSeq.map(u => AtomItemPattern.Constant(TripleItem.Uri(u))))
    case c => AtomItemPattern.Constant(TripleItem.Uri(c))
  }

  def parseAtom(s: String): AtomPattern = {
    val parts = s.split(';')
    AtomPattern(parseItem(parts(0)), parseItem(parts(1)), parseItem(parts(2)))
  }

  def parsePattern(spec: String, exact: Boolean, orderless: Boolean): RulePattern = {
    val (bodyStr, headOpt) = spec.split("=>") match {
      case Array(b, h) => (b, Some(parseAtom(h)))
      case Array(b) => (b, None)
    }
    val bodyAtoms = if (bodyStr.isEmpty) Nil else bodyStr.split('&').toList.map(parseAtom)
    val rp = RulePattern(headOpt, exact, orderless)
    bodyAtoms.foldRight(rp)((a, acc) => a &: acc)
  }

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
      // mining-time rule patterns of ANY length (Amie.addPattern;
      // RuleRefinement.scala:99-114 constrains the BFS, Amie.scala:206
      // gates the output by RulePatternMatcher)
      val patExact = args.contains("--patexact")
      val patOrderless = args.contains("--orderless")
      for (arg <- args if arg.startsWith("--pattern="))
        amie = amie.addPattern(parsePattern(arg.stripPrefix("--pattern="), patExact, patOrderless))
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
      // --postfilter=SPEC: apply the ruleset post-filter to the mined rules,
      // mirroring Ruleset.filter (Ruleset.scala:76-84) exactly: every
      // pattern is FORCED orderless (withOrderless()) and matched via
      // RulePatternMatcher.mappedRulePatternMatcher.
      val postSpecs = args.filter(_.startsWith("--postfilter=")).map(_.stripPrefix("--postfilter="))
      val filtered = if (postSpecs.isEmpty) rules else {
        implicit val builder: IndexCollections.Builder[Int] = new IndexCollections.Builder[Int] {
          def build: TripleIndex[Int] = thi
        }
        val matcher = implicitly[PatternMatcher[Rule, RulePattern.Mapped]]
        val mappedPatterns = postSpecs.toIndexedSeq.map(parsePattern(_, patExact, patOrderless).withOrderless().mapped)
        rules.filter(rule => mappedPatterns.exists(p => matcher.matchPattern(rule, p)(Aliases.empty).isDefined))
      }
      System.err.println(s"after postfilter: ${filtered.size}")
      // --keeporder: dump body atoms in STORED (generation) order instead of
      // sorted, so gradual/right-aligned semantics stay observable.
      val keepOrder = args.contains("--keeporder")
      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(new java.io.FileOutputStream(outPath), java.nio.charset.StandardCharsets.UTF_8))
      for (r0 <- filtered) {
        val r = if (graphAware) r0.withContent(r0.head.toGraphAwareAtom, r0.body.map(_.toGraphAwareAtom)) else r0
        val rr: ResolvedRule = ResolvedRule(r)
        val support = r.measures.get[Measure.Support].map(_.value).getOrElse(-1)
        val headSize = r.measures.get[Measure.HeadSize].map(_.value).getOrElse(-1)
        val hc = r.measures.get[Measure.HeadCoverage].map(_.value).getOrElse(-1.0)
        val bodyAtoms = rr.body.map(_.toString)
        val body = (if (keepOrder) bodyAtoms else bodyAtoms.sorted).mkString(" ^ ")
        out.println(s"${rr.head}\t<=\t$body\t$support\t$headSize\t$hc")
      }
      out.close()
    }
  }
}
