package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once ingestion across restarts: a file-source stream with a
  * checkpoint is stopped mid-corpus, more files arrive, the stream is
  * restarted from the same checkpoint — every input row must appear in the
  * sink exactly once. This is the recovery contract a 100 TB pipeline
  * leans on when executors/driver cycle. */
class StreamingRecoverySpec extends AnyFunSuite {
  import TestSpark._

  test("file-source stream resumes from checkpoint without loss or dups") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_recovery").toString
    val srcDir = s"$base/src"
    val outDir = s"$base/out"
    val ckDir = s"$base/ck"
    Files.createDirectories(Paths.get(srcDir))

    val chunk1 = (0L until 500L).map(i => (i, s"v$i"))
    val chunk2 = (500L until 900L).map(i => (i, s"v$i"))
    chunk1.toDF("id", "v").coalesce(1).write.mode("append").parquet(srcDir)

    def startQuery() = spark.readStream
      .schema("id LONG, v STRING")
      .parquet(srcDir)
      .withColumn("tag", concat(col("v"), lit("!")))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .start()

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    chunk2.toDF("id", "v").coalesce(1).write.mode("append").parquet(srcDir)

    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == 900, "every row exactly once after restart")
    assert(out.select("id").distinct().count() == 900)
    assert(out.filter(!col("tag").endsWith("!")).count() == 0)
  }

  test("multi-batch incremental aggregation converges to the batch result") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.sources.Tables.events(spark, SF001)
      .select(col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq

    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val name = s"graft_inc_${System.nanoTime()}"
    val agg = mem.toDF().toDF("ts", "event_type", "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Det.dsum6(col("value")).as("s"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      evs.grouped(250).foreach { chunk => // four incremental batches
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    val batch = evs.toDF("ts", "event_type", "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Det.dsum6(col("value")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }
}
