// Functional stand-ins for the fastutil classes the reference uses,
// backed by plain java.util collections. Debug tooling only.
// The collection views return fastutil-style iterators (IntIterator /
// ObjectIterator) because the reference's implicit conversions to Scala
// iterators dispatch on those exact types.
package it.unimi.dsi.fastutil.ints {

  import it.unimi.dsi.fastutil.objects.ObjectIterator

  trait IntIterator {
    def hasNext: Boolean
    def nextInt(): Int
  }

  class IntCollectionView(c: java.util.Collection[Integer]) {
    def iterator(): IntIterator = {
      val it = c.iterator()
      new IntIterator {
        def hasNext: Boolean = it.hasNext
        def nextInt(): Int = it.next().intValue()
      }
    }
    def size(): Int = c.size()
  }

  class IntOpenHashSet {
    private val s = new java.util.LinkedHashSet[Integer]()
    def add(x: Int): Boolean = s.add(x)
    def remove(x: Int): Boolean = s.remove(x: Integer)
    def contains(x: Int): Boolean = s.contains(x: Integer)
    def size(): Int = s.size()
    def isEmpty: Boolean = s.isEmpty
    def trim(): Boolean = false
    def iterator(): IntIterator = new IntCollectionView(s).iterator()
  }

  class Int2IntEntry(k: Int, v: Int) {
    def getIntKey: Int = k
    def getIntValue: Int = v
  }

  class ObjCollectionView[T](c: java.util.Collection[T]) {
    def iterator(): ObjectIterator[T] = {
      val it = c.iterator()
      new ObjectIterator[T] {
        def hasNext: Boolean = it.hasNext
        def next(): T = it.next()
      }
    }
    def size(): Int = c.size()
  }

  class Int2IntOpenHashMap {
    private val m = new java.util.LinkedHashMap[Integer, Integer]()
    private var default = 0
    def defaultReturnValue(): Int = default
    def defaultReturnValue(v: Int): Unit = default = v
    def get(k: Int): Int = { val v = m.get(k: Integer); if (v == null) default else v.intValue() }
    def put(k: Int, v: Int): Int = { val p = m.put(k, v); if (p == null) default else p.intValue() }
    def remove(k: Int): Int = { val p = m.remove(k: Integer); if (p == null) default else p.intValue() }
    def containsKey(k: Int): Boolean = m.containsKey(k: Integer)
    def clear(): Unit = m.clear()
    def size(): Int = m.size()
    def isEmpty: Boolean = m.isEmpty
    def trim(): Boolean = false
    def keySet(): IntCollectionView = new IntCollectionView(m.keySet())
    def values(): IntCollectionView = new IntCollectionView(m.values())
    def int2IntEntrySet(): ObjCollectionView[Int2IntEntry] = {
      val out = new java.util.ArrayList[Int2IntEntry]()
      val it = m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out.add(new Int2IntEntry(e.getKey.intValue(), e.getValue.intValue())) }
      new ObjCollectionView(out)
    }
  }

  class Int2RefEntry[V](k: Int, v: V) {
    def getIntKey: Int = k
    def getValue: V = v
  }

  class Int2ReferenceOpenHashMap[V] {
    private val m = new java.util.LinkedHashMap[Integer, V]()
    def get(k: Int): V = m.get(k: Integer)
    def put(k: Int, v: V): V = m.put(k, v)
    def remove(k: Int): V = m.remove(k: Integer)
    def containsKey(k: Int): Boolean = m.containsKey(k: Integer)
    def clear(): Unit = m.clear()
    def size(): Int = m.size()
    def isEmpty: Boolean = m.isEmpty
    def trim(): Boolean = false
    def keySet(): IntCollectionView = new IntCollectionView(m.keySet())
    def values(): ObjCollectionView[V] = new ObjCollectionView(m.values())
    def int2ReferenceEntrySet(): ObjCollectionView[Int2RefEntry[V]] = {
      val out = new java.util.ArrayList[Int2RefEntry[V]]()
      val it = m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out.add(new Int2RefEntry[V](e.getKey.intValue(), e.getValue)) }
      new ObjCollectionView(out)
    }
  }
}

package it.unimi.dsi.fastutil.objects {

  import it.unimi.dsi.fastutil.ints.ObjCollectionView

  trait ObjectIterator[T] {
    def hasNext: Boolean
    def next(): T
  }

  class ObjectOpenHashSet[T] {
    private val s = new java.util.LinkedHashSet[T]()
    def add(x: T): Boolean = s.add(x)
    def remove(x: T): Boolean = s.remove(x)
    def contains(x: T): Boolean = s.contains(x)
    def size(): Int = s.size()
    def isEmpty: Boolean = s.isEmpty
    def trim(): Boolean = false
    def iterator(): ObjectIterator[T] = new ObjCollectionView(s).iterator()
  }

  class Obj2ObjEntry[K, V](k: K, v: V) {
    def getKey: K = k
    def getValue: V = v
  }

  class Object2ObjectOpenHashMap[K, V] {
    private val m = new java.util.LinkedHashMap[K, V]()
    def get(k: K): V = m.get(k)
    def put(k: K, v: V): V = m.put(k, v)
    def remove(k: K): V = m.remove(k)
    def containsKey(k: K): Boolean = m.containsKey(k)
    def clear(): Unit = m.clear()
    def size(): Int = m.size()
    def isEmpty: Boolean = m.isEmpty
    def trim(): Boolean = false
    def keySet(): ObjCollectionView[K] = new ObjCollectionView(m.keySet())
    def values(): ObjCollectionView[V] = new ObjCollectionView(m.values())
    def object2ObjectEntrySet(): ObjCollectionView[Obj2ObjEntry[K, V]] = {
      val out = new java.util.ArrayList[Obj2ObjEntry[K, V]]()
      val it = m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out.add(new Obj2ObjEntry[K, V](e.getKey, e.getValue)) }
      new ObjCollectionView(out)
    }
  }
}
