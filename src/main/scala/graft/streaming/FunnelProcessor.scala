package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The [[Funnel]] state machine on Spark 4's `transformWithState`
  * (StatefulProcessor + RocksDB state store) — the successor API to the
  * `flatMapGroupsWithState` that `stream_stateful_custom` demonstrates,
  * and the third runtime witness that [[Funnel]] is runtime-agnostic:
  * batch mapGroups, FMGWS, and TWS all agree (SURVEY §2.9; VERDICT r12
  * #1 promoted this from a test-only harness to the registered
  * `stream_transform_with_state` row).
  *
  * Scale: per-key state is ONE ValueState row holding the funnel struct,
  * whose size is bounded by the clicks preceding the earliest purchase
  * (see [[Funnel.update]]) — O(1) for active buyers, input-bounded only
  * for never-purchasing keys; at 100 TB the state lives in RocksDB off
  * executor heap with changelog checkpointing, which is exactly the
  * provider TWS mandates.
  *
  * @param ttl optional per-state TTL (TimeMode.ProcessingTime only):
  *            expired keys read back as null, so a funnel restarts from
  *            empty — the state-retention control a 100 TB pipeline uses
  *            to keep abandoned sessions from accumulating forever.
  *            TTLConfig.NONE (the default) retains state for the query's
  *            lifetime; the registered row and the parity tests use NONE
  *            so output equals the batch twin over the full fixture.
  */
class FunnelProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[
      Long, (Long, String, Long), (Long, Long, Long, Long, Long, Long, Long)] {
  @transient private var state: ValueState[Funnel.State] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Funnel.State](
      "funnel", Encoders.product[Funnel.State], ttl)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, String, Long)],
      timerValues: TimerValues)
      : Iterator[(Long, Long, Long, Long, Long, Long, Long)] = {
    val init = Option(state.get()).getOrElse(Funnel.empty)
    val st = rows.foldLeft(init)((acc, e) => Funnel.update(acc, e._2, e._3))
    state.update(st)
    Iterator.single(Funnel.finish(key, st))
  }
}
