package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Funnel

/** The same funnel state machine on Spark 4's transformWithState
  * (StatefulProcessor + RocksDB state store) — the successor API to
  * flatMapGroupsWithState. One more witness that [[Funnel]] is
  * runtime-agnostic: batch mapGroups, FMGWS, and TWS all agree. */
class FunnelProcessor extends StatefulProcessor[
    Long, (Long, String, Long), (Long, Long, Long, Long, Long, Long, Long)] {
  @transient private var state: ValueState[Funnel.State] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Funnel.State](
      "funnel", Encoders.product[Funnel.State], TTLConfig.NONE)

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

class TransformWithStateSpec extends AnyFunSuite {
  import TestSpark._

  test("transformWithState funnel == batch mapGroups funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = graft.sources.Tables.events(spark, SF001)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("es"))
        .as[(Long, String, Long)].collect().toSeq

      val mem = MemoryStream[(Long, String, Long)]
      mem.addData(evs)
      val streamed = mem.toDS()
        .groupByKey(_._1)
        .transformWithState(new FunnelProcessor, TimeMode.None(),
          OutputMode.Update(),
          Encoders.product[(Long, Long, Long, Long, Long, Long, Long)])
      val name = s"graft_tws_${System.nanoTime()}"
      val q = streamed.toDF("user_id", "n_events", "n_clicks", "n_purchases",
          "clicks_before_first_purchase", "first_es", "last_es")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(name).collect()
        .groupBy(_.getAs[Long]("user_id")).map(_._2.last)
        .map(_.toString).toSeq.sorted

      val batch = evs.toDS()
        .groupByKey(_._1)
        .mapGroups((uid, it) => Funnel.finish(uid,
          it.foldLeft(Funnel.empty)((st, e) => Funnel.update(st, e._2, e._3))))
        .toDF("user_id", "n_events", "n_clicks", "n_purchases",
          "clicks_before_first_purchase", "first_es", "last_es")
        .collect().map(_.toString).toSeq.sorted
      assert(got == batch)
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
