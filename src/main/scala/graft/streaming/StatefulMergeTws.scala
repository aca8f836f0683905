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
  * the operational win at scale: expired keys leave the store without a
  * tombstone pass (the reference never deletes; a real 100 TB deployment
  * must). */
object StatefulMergeTws {

  class LifecycleProcessor extends StatefulProcessor[Long, KeyObs, KeyLifecycle] {
    @transient private var state: ValueState[KeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyState](
        "lifecycle", Encoders.product[KeyState], TTLConfig.NONE)

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
    * one by design). */
  def apply(obs: Dataset[KeyObs]): Dataset[KeyLifecycle] = {
    implicit val outEnc = Encoders.product[KeyLifecycle]
    obs.groupByKey(_.id)(Encoders.scalaLong)
      .transformWithState(new LifecycleProcessor, TimeMode.None(), OutputMode.Append())
  }
}
