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

  // TWS requires the RocksDB provider; every test wears the shared
  // TestSpark.withRocksDb swap (provider + changelog checkpointing).

  test("transformWithState funnel == batch mapGroups funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
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
    }
  }

  test("transformWithState state survives a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Round-8 restart proof for the successor stateful API: half the
    // events feed incarnation one, the query STOPS, a new query object
    // resumes from the checkpoint (RocksDB + changelog) and feeds the
    // rest. A user whose events span the boundary only produces the
    // correct final funnel row if incarnation two started from the
    // RESTORED ValueState, because committed offsets mean its first-half
    // events are never re-read. Update-mode emissions are captured per
    // batch via foreachBatch (the memory sink dies with the query); the
    // last emission per user must equal the batch twin.
    val evs = graft.sources.Tables.events(spark, SF001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("es"))
      .as[(Long, String, Long)].collect().toSeq
    val (h1, h2) = evs.splitAt(evs.size / 2)
    val spanning = h1.map(_._1).toSet & h2.map(_._1).toSet
    assert(spanning.nonEmpty,
      "no user spans the restart boundary — the split proves nothing")
    withRocksDb {
      val base = java.nio.file.Files
        .createTempDirectory("graft_tws_restart").toString
      val out = s"$base/out"
      val mem = MemoryStream[(Long, String, Long)]
      def start() = mem.toDS()
        .groupByKey(_._1)
        .transformWithState(new FunnelProcessor, TimeMode.None(),
          OutputMode.Update(),
          Encoders.product[(Long, Long, Long, Long, Long, Long, Long)])
        .toDF("user_id", "n_events", "n_clicks", "n_purchases",
          "clicks_before_first_purchase", "first_es", "last_es")
        .writeStream
        .option("checkpointLocation", s"$base/chk")
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(out)
        }
        .outputMode(OutputMode.Update()).start()
      mem.addData(h1)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      mem.addData(h2)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      // on-disk witness that changelog checkpointing was live
      assert(ChainedStream.countFiles(s"$base/chk/state", ".changelog") > 0,
        "no .changelog files in the state checkpoint")

      val emissions = spark.read.parquet(out)
      val lastPerUser = emissions
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("batch_id").desc)))
        .filter(col("rk") === 1).drop("rk", "batch_id")
      val got = lastPerUser.collect().map(_.toString).sorted.toSeq

      val batch = evs.toDS()
        .groupByKey(_._1)
        .mapGroups((uid, it) => Funnel.finish(uid,
          it.foldLeft(Funnel.empty)((st, e) => Funnel.update(st, e._2, e._3))))
        .toDF("user_id", "n_events", "n_clicks", "n_purchases",
          "clicks_before_first_purchase", "first_es", "last_es")
        .collect().map(_.toString).sorted.toSeq
      assert(got == batch,
        "restarted transformWithState != batch twin: ValueState lost " +
          "across the incarnation boundary")
    }
  }
}
