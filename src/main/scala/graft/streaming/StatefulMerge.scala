package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True-streaming formulation of the SCD merge: per-key state via
  * mapGroupsWithState — SURVEY §2.9 "stateful op" row.
  *
  * [[SnapshotStream.mergeSink]] (join-based, stateless) is the primary,
  * 100 TB-safe formulation; this keyed variant exists to demonstrate the
  * KeyValueGroupedDataset state API and is appropriate when the key space
  * fits the state store (the reference's 40 M ids would need RocksDB
  * state backend + state TTL). */
object StatefulMerge {

  /** One incoming observation of a key in a dated snapshot. */
  case class KeyObs(id: Long, snapshotDate: String, payloadHash: Long)

  /** Lifecycle state per key, mirroring the reference's lifecycle columns
    * (feeder_postgres.py:92-94). */
  case class KeyState(addedAt: String, updatedAt: String, payloadHash: Long)

  /** Updated lifecycle row emitted per observation. */
  case class KeyLifecycle(id: Long, addedAt: String, updatedAt: String, changed: Boolean)

  /** The pure per-key fold shared by both state APIs: observations in
    * snapshot-date order (the reference processes dirs sorted ascending,
    * feeder_postgres.py:226) against the carried state. */
  def foldKey(
      id: Long,
      obs: Iterator[KeyObs],
      initial: Option[KeyState]): (Seq[KeyLifecycle], Option[KeyState]) = {
    val sorted = obs.toSeq.sortBy(_.snapshotDate)
    var cur = initial
    val out = sorted.map { o =>
      cur match {
        case None =>
          cur = Some(KeyState(o.snapshotDate, o.snapshotDate, o.payloadHash))
          KeyLifecycle(id, o.snapshotDate, o.snapshotDate, changed = true)
        case Some(st) =>
          val changed = st.payloadHash != o.payloadHash
          val next = KeyState(
            addedAt = if (st.addedAt <= o.snapshotDate) st.addedAt else o.snapshotDate,
            updatedAt = if (changed) o.snapshotDate else st.updatedAt,
            payloadHash = o.payloadHash)
          cur = Some(next)
          KeyLifecycle(id, next.addedAt, next.updatedAt, changed)
      }
    }
    (out, cur)
  }

  def updateKey(
      id: Long,
      obs: Iterator[KeyObs],
      state: GroupState[KeyState]): Iterator[KeyLifecycle] = {
    val (out, cur) = foldKey(id, obs, state.getOption)
    cur.foreach(state.update)
    out.iterator
  }

  /** Wire the keyed merge over a stream of observations. */
  def apply(obs: Dataset[KeyObs]): Dataset[KeyLifecycle] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[KeyLifecycle]
    obs.groupByKey(_.id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateKey)
  }

  /** TTL variant: a key idle for `ttlMs` of processing time is evicted
    * from the state store on the next batch (classic GroupStateTimeout
    * mechanics — the [[StatefulMergeTws]] TTLConfig is the Spark 4
    * spelling of the same bound). A reappearing key re-enters as a fresh
    * insert. Without a TTL the reference's 40 M-id key space grows the
    * store monotonically (SURVEY §7.4). */
  def applyWithTtl(obs: Dataset[KeyObs], ttlMs: Long): Dataset[KeyLifecycle] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[KeyLifecycle]
    obs.groupByKey(_.id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (id: Long, rows: Iterator[KeyObs], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = updateKey(id, rows, state)
            state.setTimeoutDuration(ttlMs)
            out
          }
      }
  }
}
