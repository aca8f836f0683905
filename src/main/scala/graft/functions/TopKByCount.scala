package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF exemplar (SURVEY §2.10): distributed top-k by count,
  * replacing the reference's driver-side `Counter` + `sorted` + slice
  * (001_….ipynb:751-754).
  *
  * The buffer is a bounded sorted list (≤ k entries), so partial
  * aggregation keeps at most k pairs per partition and the merge tree
  * moves O(k · partitions) data — constant memory per task regardless of
  * input size, the property that makes it safe at 100 TB where a
  * collect-and-sort would not be. Ordering is (count desc, term asc) —
  * total and deterministic. */
class TopKByCount(k: Int) extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private def ord: Ordering[(String, Long)] =
    Ordering.by[(String, Long), (Long, String)] { case (t, c) => (-c, t) }

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    (buf :+ in).sorted(ord).take(k)

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
