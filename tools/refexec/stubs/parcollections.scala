// Sequential stand-in for scala-parallel-collections (deterministic).
package scala.collection.parallel

class ForkJoinTaskSupport(val pool: java.util.concurrent.ForkJoinPool)

class ParVectorShim[T](v: Vector[T]) {
  var tasksupport: ForkJoinTaskSupport = null
  def foreach[U](f: T => U): Unit = v.foreach(f)
  def map[U](f: T => U): ParVectorShim[U] = new ParVectorShim(v.map(f))
  def filter(f: T => Boolean): ParVectorShim[T] = new ParVectorShim(v.filter(f))
  def seq: Vector[T] = v
}

object CollectionConverters {
  implicit class VectorIsParallelizable[T](v: Vector[T]) {
    def par: ParVectorShim[T] = new ParVectorShim(v)
  }
}
