package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF for the df-capped posting-list build
  * ([[graft.extensions.Postings]]): exact row count plus the group's
  * ids, the id buffer HARD-CAPPED at `cap + 1` elements — one element
  * past the cap is enough to prove overflow, after which ids are
  * dropped on the floor while the count keeps advancing.
  *
  * This is the r20 single-shuffle rewrite of the build's old
  * count-then-semi-join-then-collect_list shape: the same
  * prune-before-materialize contract (a stop-term in 10⁹ docs never
  * materializes its list — its buffer stays ≤ cap+1 longs), but in ONE
  * aggregation over the pair frame instead of two aggregations plus a
  * join (two full exchanges of the pair frame → one; plan diff in
  * plans/r20/). Determinism: for df ≤ cap no id is ever dropped (the
  * buffer only saturates past cap+1 elements), so the finished set is
  * merge-order-independent; for df > cap the ids are discarded by the
  * caller (NULL postings), so their partial content is irrelevant.
  * Same bounded-buffer discipline as [[KMinDistinct]]/[[TopKByCount]].
  */
class DfCappedIds(cap: Int) extends Aggregator[Long, (Long, Seq[Long]), (Long, Seq[Long])] {
  require(cap >= 1, s"cap must be positive, got $cap")

  override def zero: (Long, Seq[Long]) = (0L, Vector.empty)

  override def reduce(b: (Long, Seq[Long]), in: Long): (Long, Seq[Long]) =
    (b._1 + 1L, if (b._2.length <= cap) b._2 :+ in else b._2)

  override def merge(a: (Long, Seq[Long]), b: (Long, Seq[Long])): (Long, Seq[Long]) =
    (a._1 + b._1, if (a._2.length > cap) a._2
      else if (b._2.length > cap) b._2
      else (a._2 ++ b._2).take(cap + 1))

  override def finish(r: (Long, Seq[Long])): (Long, Seq[Long]) = r

  override def bufferEncoder: Encoder[(Long, Seq[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long])]()

  override def outputEncoder: Encoder[(Long, Seq[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long])]()
}
