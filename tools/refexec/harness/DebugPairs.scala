// Probe: does the reference's injective countDistinctPairs include
// reflexive head pairs (a == b)? Also check item-id space (zero ids would
// break VariableMap's 0-sentinel).
import com.github.propi.rdfrules.algorithm.amie.AtomCounting
import com.github.propi.rdfrules.data._
import com.github.propi.rdfrules.index._
import com.github.propi.rdfrules.rule._
import com.github.propi.rdfrules.utils.Debugger

import java.io.File

object DebugPairs {
  def main(args: Array[String]): Unit = {
    val dataset = Dataset(new File("/root/reference/core/src/test/resources/yago.tsv"))
    Debugger() { implicit debugger =>
      val index = IndexPart.apply(dataset, false)
      implicit val tihi: TripleItemIndex = index.tripleItemMap
      implicit val thi: TripleIndex[Int] = index.tripleMap
      val exp = tihi.getIndex(TripleItem.Uri("<exports>"))
      val imp = tihi.getIndex(TripleItem.Uri("<imports>"))
      val dw = tihi.getIndex(TripleItem.Uri("<dealsWith>"))
      println("ids exports/imports/dealsWith: " + exp + " " + imp + " " + dw)
      println("zero id: " + tihi.zero)
      thi.subjects
      thi.objects
      val ac = AtomCounting()
      val a = Atom.Variable(0); val b = Atom.Variable(1); val c = Atom.Variable(2)
      val body = Set(Atom(a, exp, c), Atom(b, imp, c))
      val head = Atom(a, dw, b)
      val inj = ac.countDistinctPairs(body, head, 1e9, true)
      val plain = ac.countDistinctPairs(body, head, 1e9, false)
      println(s"inj=$inj plain=$plain")
      val es = tihi.getIndex(TripleItem.Uri("<El_Salvador>"))
      val pairs = ac.selectDistinctPairs(body, head, Iterator(com.github.propi.rdfrules.algorithm.amie.VariableMap(true))).toVector
      println("contains (ES,ES): " + pairs.exists(p => p.head.value == es && p.last.value == es))
      println("n reflexive pairs: " + pairs.count(p => p.head.value == p.last.value))
    }
  }
}
