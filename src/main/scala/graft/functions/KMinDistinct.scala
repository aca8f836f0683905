package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: the k smallest DISTINCT long values — the KMV
  * distinct-count sketch's state ([[graft.extensions.Sketches]]).
  *
  * The buffer is a sorted distinct array capped at k, so partial
  * aggregation keeps ≤ k longs per task and the merge tree moves
  * O(k · partitions) — constant memory regardless of group size, the
  * same bounded-buffer discipline as [[TopKByCount]]. Set-union then
  * take-k is associative, commutative and idempotent, so the result is
  * independent of partitioning and merge order — what makes a KMV
  * estimate exactly oracle-able despite being an approximation of the
  * distinct count. */
class KMinDistinct(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, s"k must be positive, got $k")

  private def cap(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty

  // the hot path: after the buffer saturates with small hashes, almost
  // every row takes the first branch (a compare). Otherwise a binary
  // search keeps the insert O(log k + k) with no re-sort — reduce()
  // runs per ROW, so an xs.distinct.sorted here dominated the whole
  // aggregation (the pure-state bench row was slower than the exact
  // countDistinct it replaces before this).
  override def reduce(buf: Seq[Long], in: Long): Seq[Long] = {
    if (buf.length == k && in >= buf.last) buf
    else {
      val arr = buf.toArray
      val idx = java.util.Arrays.binarySearch(arr, in)
      if (idx >= 0) buf // already present
      else {
        val at = -idx - 1
        val out = new Array[Long](math.min(arr.length + 1, k))
        System.arraycopy(arr, 0, out, 0, at)
        out(at) = in
        System.arraycopy(arr, at, out, at + 1,
          math.min(arr.length - at, out.length - at - 1))
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      }
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = cap(a ++ b)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
