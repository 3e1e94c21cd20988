// Minimal easyminer-discretization stand-in for offline compilation of the
// reference. Interval value types are functional; the discretization
// algorithms themselves throw (the debug harness never discretizes).
package eu.easyminer.discretization

trait DiscretizationTask {
  def getBufferSize: Int
}

trait Support
class RelativeSupport(val support: Double) extends Support
class AbsoluteSupport(val support: Int) extends Support

trait Consumer[T] {
  def consume(x: T): Unit
}

package task {
  trait EquidistanceDiscretizationTask extends eu.easyminer.discretization.DiscretizationTask {
    def getNumberOfBins: Int
    def getBufferSize: Int
  }
  trait EquifrequencyDiscretizationTask extends eu.easyminer.discretization.DiscretizationTask {
    def getNumberOfBins: Int
    def getBufferSize: Int
  }
  trait EquisizeDiscretizationTask extends eu.easyminer.discretization.DiscretizationTask {
    def getMinSupport: eu.easyminer.discretization.Support
    def getBufferSize: Int
  }
  trait EquisizeTreeDiscretizationTask extends EquisizeDiscretizationTask {
    def getArity: Int
    def inParallel(): Boolean
  }
}

package impl {

  sealed trait IntervalBound {
    def value: Double
  }

  object IntervalBound {
    case class Inclusive(value: Double) extends IntervalBound
    case class Exclusive(value: Double) extends IntervalBound
  }

  class Interval(val minValue: IntervalBound, val maxValue: IntervalBound) {
    def isLeftBoundClosed(): Boolean = minValue.isInstanceOf[IntervalBound.Inclusive]
    def isRightBoundClosed(): Boolean = maxValue.isInstanceOf[IntervalBound.Inclusive]
    def getLeftBoundValue(): Double = minValue.value
    def getRightBoundValue(): Double = maxValue.value
    def isLeftBoundOpened(): java.lang.Boolean = java.lang.Boolean.valueOf(!isLeftBoundClosed())
    def isRightBoundOpened(): java.lang.Boolean = java.lang.Boolean.valueOf(!isRightBoundClosed())
    def isInInterval(x: Double): Boolean = {
      val lo = if (isLeftBoundClosed()) x >= minValue.value else x > minValue.value
      val hi = if (isRightBoundClosed()) x <= maxValue.value else x < maxValue.value
      lo && hi
    }
    override def equals(obj: Any): Boolean = obj match {
      case o: Interval => minValue == o.minValue && maxValue == o.maxValue
      case _ => false
    }
    override def hashCode(): Int = java.util.Objects.hash(minValue, maxValue)
    override def toString: String =
      s"${if (isLeftBoundClosed()) "[" else "("}${minValue.value};${maxValue.value}${if (isRightBoundClosed()) "]" else ")"}"
  }

  object Interval {
    def apply(min: IntervalBound, max: IntervalBound): Interval = new Interval(min, max)

    class WithFrequency(min: IntervalBound, max: IntervalBound, val frequency: Int) extends Interval(min, max)

    object WithFrequency {
      def apply(min: IntervalBound, max: IntervalBound, frequency: Int): WithFrequency = new WithFrequency(min, max, frequency)
    }
  }

  trait Producer[T] {
    def produce(consumer: eu.easyminer.discretization.Consumer[T]): Unit
  }

  package sorting {
    trait ReversableSortedProducer[T] extends Producer[T]

    object SortedInMemoryNumericProducer {
      def apply(producer: Producer[Double], bufferSize: Int): ReversableSortedProducer[Double] =
        throw new UnsupportedOperationException("easyminer stub: discretization unavailable offline")
    }

    object SortedPersistentNumericProducer {
      def apply[R](producer: Producer[Double], dir: java.io.File, bufferSize: Int)(f: ReversableSortedProducer[Double] => R): R =
        throw new UnsupportedOperationException("easyminer stub: discretization unavailable offline")
    }
  }
}

package algorithm {
  import eu.easyminer.discretization.impl.{Interval, Producer}

  trait Discretization[T] {
    def discretize(producer: Producer[T]): IndexedSeq[Interval]
  }

  object Discretization {
    def apply[T](task: eu.easyminer.discretization.DiscretizationTask): Discretization[T] =
      (_: Producer[T]) => throw new UnsupportedOperationException("easyminer stub: discretization unavailable offline")
  }
}
