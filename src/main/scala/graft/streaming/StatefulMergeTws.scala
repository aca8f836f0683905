package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import StatefulMerge.{KeyLifecycle, KeyObs, KeyState}

/** The [[StatefulMerge]] lifecycle merge on Spark 4's `transformWithState`
  * (StatefulProcessor) — the arbitrary-state API that supersedes
  * mapGroupsWithState: typed state handles (Value/List/Map) with
  * per-state TTL, timers, and a RocksDB-only store (the 40M-key path is
  * the default, not an opt-in).
  *
  * Same per-key fold as the mapGroupsWithState variant
  * ([[StatefulMerge.foldKey]] is shared), so the two formulations are
  * interchangeable — StreamingSpec pins identical outputs. State TTL is
  * the operational win at scale: with `ttl` set, a key not observed for
  * the TTL window leaves the RocksDB store (value filtered at read,
  * cleaned up by store maintenance) instead of accumulating forever —
  * the reference's 40 M-id key space (SURVEY §7.4) never deletes; a real
  * 100 TB deployment must. An expired key that reappears re-enters the
  * lifecycle as a fresh insert (changed=true, addedAt = the new
  * snapshot), which is exactly the reference's semantics for an id seen
  * again after its retention horizon. */
object StatefulMergeTws {

  class LifecycleProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, KeyObs, KeyLifecycle] {
    @transient private var state: ValueState[KeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyState](
        "lifecycle", Encoders.product[KeyState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(
        key: Long,
        rows: Iterator[KeyObs],
        timerValues: TimerValues): Iterator[KeyLifecycle] = {
      val initial = if (state.exists()) Some(state.get()) else None
      val (out, cur) = StatefulMerge.foldKey(key, rows, initial)
      cur.foreach(state.update)
      out.iterator
    }
  }

  /** Wire the keyed merge over a stream of observations. Requires the
    * RocksDB state store provider (transformWithState rejects the HDFS
    * one by design). `ttl` bounds per-key state lifetime (processing
    * time since the key's last update); None keeps state forever. */
  def apply(
      obs: Dataset[KeyObs],
      ttl: Option[java.time.Duration] = None): Dataset[KeyLifecycle] = {
    implicit val outEnc = Encoders.product[KeyLifecycle]
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    obs.groupByKey(_.id)(Encoders.scalaLong)
      .transformWithState(new LifecycleProcessor(ttl), timeMode, OutputMode.Append())
  }
}
