package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}

import scala.collection.mutable

/**
 * `collect_set` with a SATURATION CAP: the aggregation buffer stops
 * adding once it holds `cap + 1` distinct elements, so a hot group's
 * buffer is bounded by cap+1 entries in every partial and merge
 * (guide §5 — the unbounded set materializes a mega-hub's full
 * distinct array before any downstream size filter can discard it).
 *
 * Exactness contract for callers that filter on `size(set) <= cap`:
 *  - a group whose true distinct count is ≤ cap never saturates
 *    (adds are only skipped AT saturation, and merges never shrink a
 *    buffer), so its output is the complete distinct set;
 *  - a group whose true distinct count is > cap reports size cap+1
 *    (> cap), indistinguishable from the unbounded set's verdict
 *    under the filter.
 * Element order in the output array is unspecified, exactly like
 * `collect_set`; nulls are dropped, exactly like `collect_set`.
 */
object BoundedSet {

  private[graft] class Agg[T](cap: Int)
    extends Aggregator[T, mutable.HashSet[T], Seq[T]] {
    override def zero: mutable.HashSet[T] = mutable.HashSet.empty[T]
    override def reduce(b: mutable.HashSet[T], a: T): mutable.HashSet[T] = {
      if (a != null && b.size <= cap) b += a
      b
    }
    override def merge(b1: mutable.HashSet[T], b2: mutable.HashSet[T]): mutable.HashSet[T] = {
      val it = b2.iterator
      while (it.hasNext && b1.size <= cap) b1 += it.next()
      b1
    }
    override def finish(r: mutable.HashSet[T]): Seq[T] = r.toSeq
    override def bufferEncoder: Encoder[mutable.HashSet[T]] =
      Encoders.kryo[mutable.HashSet[T]]
    override def outputEncoder: Encoder[Seq[T]] = null // bound per element type below
  }

  private final class StringAgg(cap: Int) extends Agg[String](cap) {
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }
  private final class LongAgg(cap: Int) extends Agg[Long](cap) {
    override def reduce(b: mutable.HashSet[Long], a: Long): mutable.HashSet[Long] = {
      if (b.size <= cap) b += a // primitive long input cannot be null
      b
    }
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }
  private final class IntAgg(cap: Int) extends Agg[Int](cap) {
    override def reduce(b: mutable.HashSet[Int], a: Int): mutable.HashSet[Int] = {
      if (b.size <= cap) b += a
      b
    }
    override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder[Seq[Int]]()
  }

  /** The bounded collect_set as a UDAF for the given element type. */
  private[graft] def udafFor(dt: DataType, cap: Int): UserDefinedFunction = dt match {
    case StringType  => udaf(new StringAgg(cap), Encoders.STRING)
    case LongType    => udaf(new LongAgg(cap), Encoders.scalaLong)
    case IntegerType => udaf(new IntAgg(cap), Encoders.scalaInt)
    case other => throw new IllegalArgumentException(
      s"BoundedSet supports string/long/int elements, got $other")
  }
}
