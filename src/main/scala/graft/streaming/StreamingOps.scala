package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Spec
import graft.functions.Det
import graft.sources.Tables

/** SURVEY.md §2.9 + §2.3 streaming joins — the reference's core capability
  * (stream-stream / stream-static joins, windowed aggregation, watermarks),
  * re-expressed on Structured Streaming's unbounded-table model.
  *
  * Design: every operator is ONE logical transform (a `DataFrame =>
  * DataFrame` here) applied identically to a batch DataFrame (what
  * `SparkEntry.queries` returns — DuckDB-checkable) and to a streaming
  * DataFrame (driven in StreamingSpec over MemoryStream, asserting
  * stream == batch output). That batch/stream parity is exactly the
  * guarantee Structured Streaming's incrementalization contract makes, so
  * the batch twin IS the specification of the streaming result.
  *
  * Scale: windowed aggregations shuffle on (window, key) with map-side
  * partial aggregation; stream-stream joins are state-store-backed
  * symmetric hash joins whose state is bounded by the watermark + interval
  * condition — both shapes run unchanged on a 1000-executor cluster.
  *
  * Event time: all arithmetic is epoch-µs integers (fixture-generation
  * precision hazard, ns pre-regeneration vs µs current — FIXTURES.md
  * §hazards; Tables.events normalizes both to TIMESTAMP µs).
  */
object StreamingOps {
  def specs: Seq[Spec] = Seq(tumbling, sliding, session, watermarkLate,
    dedup, statefulCustom, streamStream, streamStatic, streamStreamOuter,
    streamStreamFull, incrementalRestart, joinThenWindowSpec,
    rocksdbState, transformWithState, twsTimers, twsMapState, updateMode,
    profileStreamProgress, foreachBatchUpsert, chainedAggSpec,
    sourceStreamJoin, sourceStreamJoinOuter)

  /** `StreamingQuery.recentProgress` — the per-micro-batch observability
    * surface (`StreamingQueryProgress`: batchId, numInputRows, sink
    * numOutputRows) that a 100 TB streaming deployment alarms on: input
    * starvation, sink fan-out explosions, and batch skew all show up
    * here before they show up in lag. Deterministic because the input is
    * the memoized parity staging ([[updInput]]: one file per parity,
    * admission-ordered, maxFilesPerTrigger=1 ⇒ exactly two data
    * batches): batch 0 ingests the even-µs rows, batch 1 the odd-µs
    * rows, and the complete-mode sink emits the cumulative distinct-user
    * table each batch. The oracle recomputes all four numbers from
    * `events` directly; trailing no-data batches are filtered by
    * numInputRows > 0. */
  private val profileStreamProgress = Spec(
    "profile_stream_progress",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS es FROM events)
      |SELECT 0 AS batch_id,
      |  (SELECT COUNT(*) FROM e WHERE es % 2 = 0)              AS n_in,
      |  (SELECT COUNT(DISTINCT user_id) FROM e WHERE es % 2 = 0) AS n_out
      |UNION ALL
      |SELECT 1,
      |  (SELECT COUNT(*) FROM e WHERE es % 2 = 1),
      |  (SELECT COUNT(DISTINCT user_id) FROM e)
      |ORDER BY batch_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val inDir = updInput(s, d)
    val s2 = graft.operators.Scans.fewPartitionSession(s, 4)
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("es", LongType)))
    val name = "graft_progress_" + java.nio.file.Paths.get(d)
      .toAbsolutePath.normalize.toString.replaceAll("[^A-Za-z0-9]", "_")
    val q = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .groupBy(col("user_id")).count()
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    try require(q.awaitTermination(180000),
      "progress query did not finish in 180 s")
    finally q.stop()
    val rows = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => (p.batchId, p.numInputRows, p.sink.numOutputRows))
    require(rows.map(_._1) == Seq(0L, 1L),
      s"expected exactly data batches 0 and 1, got ${rows.map(_._1)}")
    import s.implicits._
    rows.toDF("batch_id", "n_in", "n_out").orderBy(col("batch_id"))
  }

  /** `foreachBatch` CDC UPSERT — the streaming keyed-merge landing every
    * warehouse pipeline runs where a MERGE-capable table format is the
    * usual sink: each micro-batch folds into a keyed base table
    * (read base → union → re-aggregate per key → atomic swap), so the
    * landed table always holds ONE row per key with (max event time,
    * running count) — state the APPEND-mode file sink structurally
    * cannot express (it can never retract a key's previous row). The
    * two-batch parity staging ([[updInput]], maxFilesPerTrigger=1) makes
    * the merge observable: batch 1 must REPLACE batch-0 rows for users
    * spanning the parity split, and a `require` pins ≥2 data batches so
    * the row can never silently degrade to a single-batch write.
    * Exactly-once: foreachBatch is AT-LEAST-once, so the merge carries
    * the canonical batch-id idempotence marker — a replayed id is
    * skipped before touching state (max(es) alone is replay-idempotent;
    * the running COUNT is not, which is exactly why real deployments
    * ledger the batch id). At 100 TB the merge is a keyed shuffle of
    * |base ∪ batch| per trigger — the reason production versions
    * partition/bucket the base by the merge key and MERGE only touched
    * partitions; the fold here is that same plan without the format
    * sugar. The oracle is the whole-history aggregate: upserting batch
    * by batch must land exactly where one global GROUP BY lands. */
  private val foreachBatchUpsert = Spec(
    "stream_foreachbatch_upsert",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS es FROM events)
      |SELECT user_id, MAX(es) AS last_es,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.operators.Scans
    val inDir = updInput(s, d)
    val s2 = Scans.fewPartitionSession(s, 4)
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("es", LongType)))
    val out = Scans.scratch(s, "fbu_state", d)
    Scans.rmRecursive(new java.io.File(out))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val base = s"$out/state"
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (upsertMergeBatch(out, batch, id)) nBatches.incrementAndGet()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    try require(q.awaitTermination(180000),
      "upsert stream did not finish in 180 s")
    finally q.stop()
    require(nBatches.get >= 2,
      s"only ${nBatches.get} data batch(es) — the merge path was never " +
        "exercised across a batch boundary")
    s.read.parquet(base).orderBy(col("user_id"))
  }

  /** The production core of [[foreachBatchUpsert]], factored so
    * StreamingSpec can drive it under DIFFERENT batch splits (the
    * split-invariance the oracle's fixed two-file staging cannot vary)
    * and under a replayed batch id. Folds one micro-batch of
    * (user_id, es) into the keyed base under `out`; returns true iff
    * the batch was NEW (false = the batch-id ledger skipped a replay). */
  private[graft] def upsertMergeBatch(out: String, batch: DataFrame,
      id: Long): Boolean = {
    import graft.operators.Scans
    val base = s"$out/state"
    val baseF = new java.io.File(base)
    val tmpF = new java.io.File(s"$out/tmp_$id")
    // Sweep retired-state orphans FIRST (ADVICE r15 #1): a crash between
    // the two renames below (or after the swap, before rmRecursive)
    // leaves an old_<id> copy of the pre-merge base on disk — without
    // this sweep each such crash permanently leaks one full state copy.
    // Safe unconditionally: markers are staged into tmp BEFORE base is
    // retired, so by the time any old_* exists the committed state lives
    // in tmp (crash mid-window) or base (crash post-swap) — never only
    // in old_*.
    Option(new java.io.File(out).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("old_"))
      .foreach(Scans.rmRecursive)
    // The batch-id ledger lives INSIDE the state dir (ADVICE r14 #2):
    // the `_done_<id>` markers are staged into tmp alongside the merged
    // parquet, so the single rename below publishes state + ledger
    // atomically — there is no window where swapped-but-unmarked state
    // lets a replayed batch re-merge and double-count n_events.
    // Underscore-prefixed files are invisible to Spark's file listing.
    if (new java.io.File(baseF, s"_done_$id").exists())
      return false // at-least-once → idempotent
    // Crash recovery for the one remaining non-atomic step (base moved
    // aside, tmp not yet renamed in): tmp already carries this batch's
    // marker ⇒ the merge committed; finish the publish and skip.
    if (!baseF.exists() && new java.io.File(tmpF, s"_done_$id").exists()) {
      require(tmpF.renameTo(baseF), s"recovery publish failed for batch $id")
      return false
    }
    val sess = batch.sparkSession
    val batchAgg = batch.groupBy(col("user_id"))
      .agg(max(col("es")).as("last_es"),
        count(lit(1)).as("n_events"))
    val existing =
      if (new java.io.File(base).exists()) sess.read.parquet(base)
      else sess.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        batchAgg.schema)
    val merged = existing.unionByName(batchAgg)
      .groupBy(col("user_id"))
      .agg(max(col("last_es")).as("last_es"),
        sum(col("n_events")).cast("long").as("n_events"))
    // write-then-swap: the merge READS base, so it lands in a tmp dir
    // first; the swap happens only after the write committed
    merged.write.mode("overwrite").parquet(tmpF.toString)
    // Stage the full ledger into tmp — prior batches' markers carried
    // forward plus this batch's — so ledger and state publish in ONE
    // rename. Crash before the renames: old state+ledger intact, the
    // replay re-merges (correct). Crash between them: the recovery
    // branch at entry finishes the publish.
    Option(baseF.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("_done_"))
      .foreach(m => new java.io.File(tmpF, m).createNewFile())
    new java.io.File(tmpF, s"_done_$id").createNewFile()
    if (baseF.exists()) {
      val old = new java.io.File(s"$out/old_$id")
      Scans.rmRecursive(old)
      require(baseF.renameTo(old), s"state retire failed for batch $id")
      require(tmpF.renameTo(baseF), s"state swap failed for batch $id")
      Scans.rmRecursive(old)
    } else {
      require(tmpF.renameTo(baseF), s"state swap failed for batch $id")
    }
    true
  }

  /** Shared transforms (batch twin == streaming form). */

  def tumblingAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum6(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n_events"), col("sum_value"))

  def slidingAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum6(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n_events"), col("sum_value"))

  def sessionAgg(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum6(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))

  def tenMinuteAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum6(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col("n_events"), col("sum_value"))

  def dedupByEventId(ev: DataFrame): DataFrame =
    ev.dropDuplicates("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("es"))

  /** Stream-stream interval join: (click, view) pairs for the same user
    * with the view in the 10 minutes up to the click. The interval bound is
    * what lets the state store evict — without it stream-stream join state
    * grows forever. */
  def clickViewPairs(clicks: DataFrame, views: DataFrame,
      bandMinutes: Int = 10): DataFrame =
    clickViewJoin(clicks, views, bandMinutes, "inner")

  /** LEFT OUTER form of [[clickViewPairs]] — every click survives, with
    * null view columns when no view preceded it in the band. In streaming
    * this is the harder contract: the unmatched side can only be emitted
    * once the watermark proves no matching view can still arrive, so
    * outer results are watermark-delayed and state is evicted at exactly
    * that boundary (both-side watermarks + the time-interval condition
    * are mandatory — StreamingSpec drives it, sentinel-advancing the
    * watermark to flush the tail). The batch twin is a plain left join. */
  def clickViewPairsOuter(clicks: DataFrame, views: DataFrame,
      bandMinutes: Int = 10): DataFrame =
    clickViewJoin(clicks, views, bandMinutes, "left_outer")

  /** FULL OUTER form — completes the state-store eviction matrix: BOTH
    * sides' unmatched rows are held in state until the watermark proves
    * no partner can still arrive, then emitted with nulls on the other
    * side and evicted. Left outer only exercises click-side eviction
    * emission; full outer additionally emits on view-state eviction, the
    * semantics Spark added for interval joins in 3.1. The batch twin is
    * a plain full join, so the oracle stays declarative. */
  def clickViewPairsFull(clicks: DataFrame, views: DataFrame,
      bandMinutes: Int = 10): DataFrame =
    clickViewJoin(clicks, views, bandMinutes, "full_outer")

  /** One copy of the interval condition + projection for both join types —
    * a band or bound fix can never drift between the inner/outer forms. */
  private def clickViewJoin(clicks: DataFrame, views: DataFrame,
      bandMinutes: Int, joinType: String): DataFrame =
    clicks.alias("c").join(views.alias("v"),
        col("c.user_id") === col("v.user_id")
          && col("v.ts") > col("c.ts") - expr(s"INTERVAL $bandMinutes MINUTE")
          && col("v.ts") <= col("c.ts"),
        joinType)
      // coalesce is an identity for inner/left (c.user_id never null on
      // emitted rows) and supplies the view side's key on full-outer
      // unmatched-view rows
      .select(col("c.event_id").as("click_id"), col("v.event_id").as("view_id"),
        coalesce(col("c.user_id"), col("v.user_id")).as("user_id"),
        unix_micros(col("c.ts")).as("click_us"),
        unix_micros(col("v.ts")).as("view_us"))

  /** CHAINED stateful pipeline: stream-stream interval join feeding a
    * DOWNSTREAM tumbling aggregation — TWO state stores in one query
    * (symmetric-hash join state, then window state), with the watermark
    * propagated across the join (Spark derives the join output's event
    * time from c.ts minus the interval allowance) gating both eviction
    * AND window emission. This is the first thing a real pipeline does
    * after joining clicks⋈views (VERDICT r5 gap #1) and it is NOT
    * implied by testing the stages separately: the failure mode it
    * pins is watermark mis-propagation, where the downstream agg either
    * never fires or drops rows the join legitimately emitted.
    * The join keeps c.ts as a true TIMESTAMP column (`cts`) — the
    * downstream `window()` needs real event time, not epoch longs.
    * Batch twin: identical transform; Catalyst folds it to a plain
    * join + hash aggregate, which IS the specification. */
  def joinThenWindow(clicks: DataFrame, views: DataFrame,
      bandMinutes: Int = 10): DataFrame =
    clicks.alias("c").join(views.alias("v"),
        col("c.user_id") === col("v.user_id")
          && col("v.ts") > col("c.ts") - expr(s"INTERVAL $bandMinutes MINUTE")
          && col("v.ts") <= col("c.ts"))
      .select(col("c.ts").as("cts"))
      .groupBy(window(col("cts"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("n_pairs"))

  /** CHAINED windowed aggregations — TWO window-agg state stores in one
    * query (multiple stateful AGGREGATIONS, the Spark ≥3.4 append-mode
    * surface; the agg→agg sibling of [[joinThenWindow]]'s join→agg
    * chain): a 10-minute pre-aggregate re-windowed into 1-hour rollups
    * via the window-on-window overload `window(window_col, "1 hour")`.
    * At 100 TB this is the streaming two-level rollup — the fine
    * windows absorb the raw event rate, the coarse level serves
    * dashboards, and only finalized sub-windows flow downstream (the
    * propagated watermark gates both stores). The re-aggregation is
    * EXACT: the sub-sums re-sum in DECIMAL(28,6) (each is 6-dp-exact by
    * [[Det.dsum6]]'s contract), so chained == direct to the bit.
    * `n_subwindows` witnesses genuine two-level structure — a direct
    * 1-hour aggregate cannot produce it. Batch twin: Catalyst folds the
    * chain to two hash aggregates, which IS the specification; the
    * streaming parity + two-state-operator witness live in
    * StreamingSpec (both providers). */
  def chainedWindowAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum6(col("value")).as("sum_value"))
      .groupBy(window(col("window"), "1 hour").as("hw"))
      .agg(count(lit(1)).as("n_subwindows"),
        sum(col("n_events")).cast("long").as("n_events"),
        sum(col("sum_value").cast("decimal(28,6)")).cast("double")
          .as("sum_value"))
      .select(unix_micros(col("hw.start")).as("ws_us"),
        col("n_subwindows"), col("n_events"), col("sum_value"))

  private val chainedAggSpec = Spec(
    "stream_chained_agg",
    """WITH sub AS (
      |  SELECT (epoch_us(ts) // 600000000) * 600000000 AS sw_us,
      |    COUNT(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1)
      |SELECT (sw_us // 3600000000) * 3600000000 AS ws_us,
      |  COUNT(*) AS n_subwindows,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(sum_value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM sub GROUP BY 1 ORDER BY ws_us""".stripMargin) { (s, d) =>
    chainedWindowAgg(Tables.events(s, d)).orderBy(col("ws_us"))
  }

  /** 30-minute per-type windowed aggregate — the stateful shape the
    * RocksDB state-store demonstration runs (see [[rocksdbState]]);
    * distinct window geometry from the other window specs so each
    * registry entry exercises its own plan. */
  def halfHourAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum6(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n_events"), col("sum_value"))

  def enrichWithCustomer(ev: DataFrame, customer: DataFrame): DataFrame =
    ev.join(broadcast(customer), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("c_mktsegment"), col("value"))

  /** Specs (batch twins over the events fixture). */

  private val tumbling = Spec(
    "stream_tumbling",
    """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws_us, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2
      |ORDER BY ws_us, event_type""".stripMargin) { (s, d) =>
    tumblingAgg(Tables.events(s, d)).orderBy(col("ws_us"), col("event_type"))
  }

  private val sliding = Spec(
    "stream_sliding",
    """SELECT ((epoch_us(ts) // 900000000) - j) * 900000000 AS ws_us,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN generate_series(0, 3) AS g(j)
      |GROUP BY 1, 2
      |ORDER BY ws_us, event_type""".stripMargin) { (s, d) =>
    slidingAgg(Tables.events(s, d)).orderBy(col("ws_us"), col("event_type"))
  }

  private val session = Spec(
    "stream_session",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS es, value FROM events),
      |x AS (
      |  SELECT *, CASE WHEN lag(es) OVER w IS NULL
      |                   OR es - lag(es) OVER w >= 1800000000
      |            THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |y AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, MIN(es) AS session_start_us,
      |  MAX(es) + 1800000000 AS session_end_us,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM y GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin) { (s, d) =>
    sessionAgg(Tables.events(s, d))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** Batch twin of the watermarked tumbling aggregate; late-data semantics
    * (rows behind the watermark dropped) are asserted in StreamingSpec —
    * on a complete batch the watermark never fires, so batch == streaming
    * over fully-delivered data. */
  private val watermarkLate = Spec(
    "stream_watermark_late",
    """SELECT (epoch_us(ts) // 600000000) * 600000000 AS ws_us,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1
      |ORDER BY ws_us""".stripMargin) { (s, d) =>
    tenMinuteAgg(Tables.events(s, d)).orderBy(col("ws_us"))
  }

  /** Exactly-once-style dedup on event_id; the fixture is dup-free so the
    * batch twin is an identity projection — StreamingSpec injects synthetic
    * dups via MemoryStream and asserts dropDuplicatesWithinWatermark
    * removes them. */
  private val dedup = Spec(
    "stream_dedup",
    """SELECT event_id, user_id, event_type, epoch_us(ts) AS es
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    dedupByEventId(Tables.events(s, d)).orderBy(col("event_id"))
  }

  /** Custom per-key state machine (purchase funnel): for each user, scan
    * events in time order and track clicks seen before the first purchase.
    * Batch form uses the typed Dataset API (groupByKey + mapGroups); the
    * streaming form in StreamingSpec runs the same [[Funnel.update]] logic
    * under flatMapGroupsWithState. Scale note: mapGroups shuffles once on
    * user_id and needs one user's events in memory — bounded here (≤ a few
    * hundred events/user); for unbounded keys use the streaming form whose
    * state is O(1) per user. */
  private val statefulCustom = Spec(
    "stream_stateful_custom",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS es FROM events),
      |fp AS (
      |  SELECT user_id, MIN(es) FILTER (WHERE event_type = 'purchase') AS first_p
      |  FROM e GROUP BY user_id)
      |SELECT e.user_id,
      |  COUNT(*) AS n_events,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_clicks,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchases,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' AND es < first_p THEN 1 END), 0) AS BIGINT)
      |    AS clicks_before_first_purchase,
      |  MIN(es) AS first_es, MAX(es) AS last_es
      |FROM e JOIN fp ON e.user_id = fp.user_id
      |GROUP BY e.user_id
      |ORDER BY e.user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("es"))
      .as[(Long, String, Long)]
    ev.groupByKey(_._1)
      .mapGroups((uid, it) => Funnel.finish(uid,
        it.foldLeft(Funnel.empty)((st, e) => Funnel.update(st, e._2, e._3))))
      .toDF("user_id", "n_events", "n_clicks", "n_purchases",
        "clicks_before_first_purchase", "first_es", "last_es")
      .orderBy(col("user_id"))
  }

  private val streamStream = Spec(
    "join_stream_stream",
    """SELECT c.event_id AS click_id, v.event_id AS view_id,
      |  c.user_id AS user_id,
      |  epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND epoch_us(v.ts) >  epoch_us(c.ts) - 600000000
      | AND epoch_us(v.ts) <= epoch_us(c.ts)
      |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    clickViewPairs(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .orderBy(col("click_id"), col("view_id"))
  }

  private val streamStreamOuter = Spec(
    "join_stream_stream_outer",
    """SELECT c.event_id AS click_id, v.event_id AS view_id,
      |  c.user_id AS user_id,
      |  epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND epoch_us(v.ts) >  epoch_us(c.ts) - 600000000
      | AND epoch_us(v.ts) <= epoch_us(c.ts)
      |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    clickViewPairsOuter(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .orderBy(col("click_id"), col("view_id"))
  }

  /** Full-outer interval join: both sides' unmatched rows survive with
    * nulls. Row identity under nulls: matched rows are unique by
    * (click_id, view_id); an unmatched row is unique by its own id and
    * its partner column is NULL, so (click_id NULLS FIRST, view_id NULLS
    * FIRST) — pinned explicitly on BOTH engines, whose default null
    * ordering differs — is a total order. */
  private val streamStreamFull = Spec(
    "join_stream_stream_full",
    """SELECT c.event_id AS click_id, v.event_id AS view_id,
      |  COALESCE(c.user_id, v.user_id) AS user_id,
      |  epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND epoch_us(v.ts) >  epoch_us(c.ts) - 600000000
      | AND epoch_us(v.ts) <= epoch_us(c.ts)
      |ORDER BY click_id NULLS FIRST, view_id NULLS FIRST""".stripMargin) {
    (s, d) =>
    val ev = Tables.events(s, d)
    clickViewPairsFull(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .orderBy(col("click_id").asc_nulls_first, col("view_id").asc_nulls_first)
  }

  private val joinThenWindowSpec = Spec(
    "stream_join_then_window",
    """SELECT (epoch_us(c.ts) // 3600000000) * 3600000000 AS ws_us,
      |  COUNT(*) AS n_pairs
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND epoch_us(v.ts) >  epoch_us(c.ts) - 600000000
      | AND epoch_us(v.ts) <= epoch_us(c.ts)
      |GROUP BY 1 ORDER BY ws_us""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    joinThenWindow(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .orderBy(col("ws_us"))
  }

  /** Batch twin of the RocksDB state-store demonstration. The provider
    * swap is a RUNTIME property, invisible to the logical plan — the
    * whole point is that the SAME query runs on the memory-backed store
    * (dev) and on RocksDB + changelog checkpointing (the 100 TB
    * deployment, where join/window state exceeds executor heap) with
    * identical results. StreamingRecoverySpec drives this transform as a
    * stream under `RocksDBStateStoreProvider`, asserts parity with this
    * batch twin, verifies via the query's state-operator custom metrics
    * that RocksDB actually served the state, and re-proves the
    * state-bound eviction property of the interval join under the same
    * provider. */
  private val rocksdbState = Spec(
    "stream_rocksdb_state",
    """SELECT (epoch_us(ts) // 1800000000) * 1800000000 AS ws_us,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2
      |ORDER BY ws_us, event_type""".stripMargin) { (s, d) =>
    halfHourAgg(Tables.events(s, d)).orderBy(col("ws_us"), col("event_type"))
  }

  /** The funnel on Spark 4's `transformWithState` — the successor
    * stateful-streaming API to `stream_stateful_custom`'s
    * flatMapGroupsWithState (VERDICT r12 #1), run HERE as a real
    * streaming query end-to-end: the fixture events land as TWO parquet
    * files, the file source admits them one per micro-batch
    * (maxFilesPerTrigger=1 under Trigger.AvailableNow), so a user whose
    * events span the file boundary only produces the correct final row
    * if [[FunnelProcessor]]'s ValueState genuinely carried across
    * batches. TWS mandates the RocksDB state-store provider (the
    * HDFS-backed default is rejected at query start —
    * TransformWithStateSpec pins that rejection), so the provider +
    * changelog-checkpointing confs are pinned on a session CLONE scoped
    * to this query. Update-mode emissions are captured per batch via
    * foreachBatch with the batch id; the registered result is the LAST
    * emission per user — the final funnel state — which the batch-twin
    * oracle recomputes declaratively. Event-order note: [[Funnel.update]]
    * is arrival-order-insensitive (min/max/count aggregates and a
    * min-purchase-filtered click set), so batch boundaries never change
    * the final row.
    *
    * Cost shape (first sf0.1 sample 7.6 s, retune target ≤ ~1.5 s): the
    * two-file input staging is the query's PRECONDITION, not its
    * demonstration — memoized per (session, sfDir) in [[twsInput]] with
    * the standard revalidateMemo self-heal — and the streaming query
    * runs in a 4-shuffle-partition session clone (VERDICT r9 #1
    * rationale: ~1.5k funnel keys need nowhere near 32 RocksDB store
    * instances per micro-batch; the clone also scopes the mandatory
    * provider confs with no restore-on-exit hazard). Results stay
    * partition-count-independent — the CPUS=4/7/8/32 sweeps pin that. */
  /** Memoized two-file input staging for `stream_transform_with_state`:
    * the events projection split on event-time parity into exactly two
    * one-file parquet halves (healthy = both halves still present), so
    * spanning users exist and maxFilesPerTrigger=1 yields exactly two
    * micro-batches. Same pid-keyed-scratch-under-session-key hazard and
    * self-heal as Scans.fragmentedEvents. */
  private val twsInCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), String]

  private[graft] def twsInput(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    import graft.operators.Scans
    val abs = java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
    // exact stamped count (round-13 self-review): both halves must be
    // present AND whole, or the memo rebuilds
    Scans.revalidateMemo(twsInCache, (s, abs), Scans.healthyStamped)
    twsInCache.computeIfAbsent((s, abs), { _ =>
      val inDir = Scans.scratch(s, "tws_in", d)
      Scans.rmRecursive(new java.io.File(inDir))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("es"))
      // two one-file halves split on event-time parity: both halves stay
      // dense and any user with events of both µs-parities spans the
      // micro-batch boundary, which is what makes cross-batch ValueState
      // carriage observable in the final output.
      ev.filter(pmod(col("es"), lit(2)) === 0).coalesce(1)
        .write.mode("append").parquet(inDir)
      ev.filter(pmod(col("es"), lit(2)) === 1).coalesce(1)
        .write.mode("append").parquet(inDir)
      Scans.stampExpected(inDir)
      graft.sources.SessionHooks.onApplicationEnd(s, s"tws-in-$abs") {
        () => twsInCache.remove((s, abs)); ()
      }
      inDir
    })
  }

  /** Memoized two-file staging for `stream_update_mode`: the (user_id,
    * es) projection split on µs parity — same split rule as [[twsInput]]
    * so spanning users exist — but with ADMISSION-ORDER MTIMES stamped
    * (the [[twsTimerInput]] discipline): unlike the funnel, whose final
    * row is batch-order-insensitive, update-mode EMISSION SETS are
    * defined per batch, so "even half is micro-batch 0" must be pinned,
    * not assumed from write latency. Own layout rather than mutating
    * twsInput's shared files: stamping mtimes on a layout other rows
    * read would couple the rows through the filesystem. */
  /** Shared staged-layout writer for the admission-order stagings
    * ([[twsTimerInput]], [[updInput]] — one definition, round-14 review;
    * the same drift class the r4 review flagged for rmRecursive): each
    * piece lands as ONE parquet file, stamped with strictly increasing
    * mtimes 10 s apart in write order, so the file source's
    * oldest-first admission under maxFilesPerTrigger=1 replays the
    * pieces as micro-batches in exactly this order. */
  private def writeStampedPieces(inDir: String, pieces: Seq[DataFrame])
      : Unit = {
    var seen = Set.empty[String]
    val t0 = System.currentTimeMillis()
    pieces.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.mode("append").parquet(inDir)
      val files = new java.io.File(inDir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files.filterNot(f => seen(f.getName)).foreach { f =>
        require(f.setLastModified(t0 + i * 10000L),
          s"could not stamp admission-order mtime on $f")
      }
      seen = files.map(_.getName).toSet
    }
  }

  private val updInCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), String]

  private[graft] def updInput(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    import graft.operators.Scans
    val abs = java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
    Scans.revalidateMemo(updInCache, (s, abs), Scans.healthyStamped)
    updInCache.computeIfAbsent((s, abs), { _ =>
      val inDir = Scans.scratch(s, "upd_in", d)
      Scans.rmRecursive(new java.io.File(inDir))
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("es"))
      writeStampedPieces(inDir, Seq(
        ev.filter(pmod(col("es"), lit(2)) === 0),
        ev.filter(pmod(col("es"), lit(2)) === 1)))
      Scans.stampExpected(inDir)
      graft.sources.SessionHooks.onApplicationEnd(s, s"upd-in-$abs") {
        () => updInCache.remove((s, abs)); ()
      }
      inDir
    })
  }

  private val sjInCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), String]

  /** Data chunks in the sjInput staging (sentinels add 2 more pieces).
    * 2 is the proof minimum — see [[sjInput]]'s docstring. */
  private[graft] val sjChunks = 2

  /** Memoized TIME-CHUNKED staging for the file-source stream-stream
    * join rows (VERDICT r16 #1: the flagship interval join previously
    * ran as a registered BATCH twin plus MemoryStream spec proofs — no
    * registered row drove the real symmetric-hash join state machine
    * over a replayable source, so its 100 TB failure mode, join-state
    * growth, was invisible to the scale probe). Events (clicks+views
    * only) are split into range-disjoint TIME chunks (each micro-batch
    * costs ~0.9 s of addBatch/state-lifecycle floor on this box, so the
    * chunk count trades eviction granularity against a fixed bill;
    * VERDICT r18 #6 cut it from 4 to 2 — the minimum that still proves
    * BOTH witnesses: pairs straddling the one chunk boundary only emit
    * if the earlier side was retained in state ACROSS batches, and the
    * watermark advancing between the chunk batches evicts chunk-1 state
    * mid-stream, read by StreamingSpec as state high-water strictly
    * below total input), one parquet
    * file each, mtime-stamped in time order ([[writeStampedPieces]]) so
    * `maxFilesPerTrigger=1` replays them as time-ordered micro-batches:
    * the watermark then ADVANCES BETWEEN BATCHES and state eviction
    * actually happens mid-stream — a single-file replay would hold both
    * full sides in state for one giant batch and measure nothing. Chunk
    * ranges are disjoint and ascending, so no row is ever behind the
    * watermark on arrival (late-drop-free ⇒ exact batch parity) for ANY
    * non-negative delay. TWO trailing SENTINEL pieces (negative
    * event_ids/user_ids at max + 2 d and max + 4 d) advance the
    * watermark past every real row so the OUTER variant's unmatched
    * tail flushes (the StreamingSpec sentinel idiom, file-source form;
    * see the in-body comment for why one sentinel is not enough);
    * sentinels themselves never emit — nothing ever passes a watermark
    * beyond them — and are filtered defensively anyway. */
  private[graft] def sjInput(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    import graft.operators.Scans
    val abs = java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
    Scans.revalidateMemo(sjInCache, (s, abs), Scans.healthyStamped)
    sjInCache.computeIfAbsent((s, abs), { _ =>
      // Session-independent shared staging (VERDICT r17 #4): the chunks
      // are a pure function of the events fixture, so key the directory
      // by its path + mtime + size and let every JVM on this box reuse
      // one build — a fresh bench JVM previously re-paid ~17 MB of
      // staging shuffle and seconds of materialize_layout here. The
      // rename publish preserves the chunk files' admission-order
      // mtimes ([[writeStampedPieces]]), which is all the file source's
      // oldest-first ordering reads — absolute stamp values don't
      // matter, only their order.
      val src = new java.io.File(abs, "events.parquet")
      // the chunk count is part of the key: a layout staged under a
      // different chunking is healthy-by-stamp but WRONG for the floor
      // this build expects (the r18->r19 4->2 cut would otherwise keep
      // serving the old 6-piece staging on a warm box forever)
      val fp = s"c${sjChunks}_m${src.lastModified}_s${src.length}"
      // evict only the MEMO entry with the session (the map would
      // otherwise pin dead sessions); the shared dir itself survives
      // for the next JVM — that is the point.
      graft.sources.SessionHooks.onApplicationEnd(s, s"sj-in-$abs") {
        () => sjInCache.remove((s, abs)); ()
      }
      Scans.ensureShared(Scans.sharedScratchDir("sj_in", abs, fp),
          Scans.healthyStamped) { inDir =>
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"))
        val b = ev.agg(min(unix_micros(col("ts"))),
          max(unix_micros(col("ts")))).collect()(0)
        val (lo, hi) = (b.getLong(0), b.getLong(1))
        val nChunks = sjChunks
        val w = math.max(1L, (hi - lo) / nChunks + 1)
        val chunks = (0 until nChunks).map { k =>
          ev.filter(unix_micros(col("ts"))
            .between(lo + k * w, math.min(lo + (k + 1) * w - 1, hi)))
        }
        // TWO sentinel pieces, not one: watermark updates BETWEEN
        // batches, so the batch that ingests sentinel 1 still
        // evicts/emits with the pre-sentinel watermark (hi − delay —
        // the tail ~10 min of real rows stay buffered), and relying on
        // the trailing NO-DATA micro-batch to flush them races
        // processAllAvailable/stop (measured: exactly the last click's
        // outer row went missing). Sentinel batch 2 runs with the
        // sentinel-1 watermark (hi + 2 d − delay > every real row), so
        // the whole real tail flushes inside a DATA batch
        // processAllAvailable provably covers.
        def sentinel(k: Long) = {
          import s.implicits._
          val far = new java.sql.Timestamp(
            (hi + k * 2L * 86400 * 1000000) / 1000)
          Seq((-2 * k + 1, -2 * k + 1, "click", far),
            (-2 * k, -2 * k, "view", far))
            .toDF("event_id", "user_id", "event_type", "ts")
        }
        writeStampedPieces(inDir, chunks ++ Seq(sentinel(1), sentinel(2)))
        Scans.stampExpected(inDir)
      }
    })
  }

  /** The real watermarked stream-stream interval join over the
    * [[sjInput]] staged file source — the production state machine the
    * batch twins specify: both sides watermarked 10 minutes, the
    * 10-minute band in the join condition bounding BOTH buffers, append
    * mode (the only legal mode for stream-stream joins). At 100 TB the
    * load-bearing property is that retained state is ∝ event-rate ×
    * (band + delay + batch granularity) — NOT ∝ total input: the scale
    * probe's memory/state axis reads exactly this from the progress
    * events (srows high-water ≪ input rows, slope ~1 in rate). Exact
    * batch parity: time-ordered chunks mean zero late drops, inner
    * matches emit as found, and the sentinel watermark-flushes the
    * outer tail (see [[sjInput]]). 4 shuffle partitions on a session
    * clone — the stream-stream join commits 4 state stores per
    * partition per batch (measured ~1 s/batch of pure commit overhead
    * at 8 partitions), and the parent's 32 would be pure fixed I/O at
    * fixture scale (the [[graft.operators.Scans
    * .fewPartitionSession]] rationale; results are partition-count
    * independent, part of the registry contract). */
  private[graft] def fileStreamJoin(s: org.apache.spark.sql.SparkSession,
      d: String, joinType: String): DataFrame = {
    import graft.operators.Scans
    val inDir = sjInput(s, d)
    val s2 = Scans.fewPartitionSession(s, 4)
    // the sentinel only advances the watermark if a batch RUNS after it
    // is ingested; the trailing no-data micro-batch is that batch
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val schema = s2.read.parquet(inDir).schema
    val raw = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val clicks = raw.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_uid"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val views = raw.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_uid"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val joined = clicks.join(views,
        col("c_uid") === col("v_uid")
          && col("v_ts") > col("c_ts") - expr("INTERVAL 10 MINUTE")
          && col("v_ts") <= col("c_ts"),
        joinType)
      .select(col("c_id").as("click_id"), col("v_id").as("view_id"),
        coalesce(col("c_uid"), col("v_uid")).as("user_id"),
        unix_micros(col("c_ts")).as("click_us"),
        unix_micros(col("v_ts")).as("view_us"))
    val name = "graft_sj_" + joinType + "_" + java.nio.file.Paths.get(d)
      .toAbsolutePath.normalize.toString.replaceAll("[^A-Za-z0-9]", "_")
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // The sentinel filter runs on the BATCH read of the memory table,
    // never inside the streaming plan: a post-join `click_id >= 0` is a
    // LEFT-side predicate, and PushPredicateThroughJoin pushes those
    // through a left-outer join — landing BELOW the clicks-side
    // watermark node, where it removes the sentinel clicks before they
    // can advance the watermark. The global watermark (min of both
    // nodes) then sticks at hi − delay and the last ~10 minutes of
    // unmatched clicks never flush (measured: exactly the final click's
    // outer row went missing — a one-row wrongness a lazier test would
    // blame on flakiness). Sentinels never emit anyway (nothing
    // advances the watermark past them), so this is defense in depth.
    s2.table(name)
      .filter(coalesce(col("click_id"), lit(0L)) >= 0
        && coalesce(col("view_id"), lit(0L)) >= 0)
  }

  private val sourceStreamJoin = Spec(
    "source_stream_join",
    """SELECT c.event_id AS click_id, v.event_id AS view_id,
      |  c.user_id AS user_id,
      |  epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND epoch_us(v.ts) >  epoch_us(c.ts) - 600000000
      | AND epoch_us(v.ts) <= epoch_us(c.ts)
      |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
    fileStreamJoin(s, d, "inner").orderBy(col("click_id"), col("view_id"))
  }

  private val sourceStreamJoinOuter = Spec(
    "source_stream_join_outer",
    """SELECT c.event_id AS click_id, v.event_id AS view_id,
      |  c.user_id AS user_id,
      |  epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id
      | AND epoch_us(v.ts) >  epoch_us(c.ts) - 600000000
      | AND epoch_us(v.ts) <= epoch_us(c.ts)
      |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
    fileStreamJoin(s, d, "left_outer")
      .orderBy(col("click_id"), col("view_id"))
  }

  /** UPDATE output mode on a built-in streaming aggregate — the output-
    * mode SEMANTICS row: per micro-batch, `groupBy(user_id).count()`
    * emits ONLY the groups whose state changed in that batch. Complete
    * mode would re-emit every group every batch (downstream rewrites the
    * world each trigger — a non-starter at 100 TB key cardinality);
    * append mode is illegal on an unwatermarked aggregate (results never
    * finalize); update is the incremental contract CDC-style consumers
    * key on. The registered output is the FULL per-batch emission
    * ledger, (batch_id, user_id, cnt) — not just final state — so the
    * hash pins exactly three things: batch 0 = even-parity partial
    * counts for users seen there, batch 1 = TOTAL counts but ONLY for
    * users with an odd-parity event, and — the semantics witness —
    * even-only users are ABSENT from batch 1 (their state did not
    * change; StreamingSpec asserts that absence explicitly). The oracle
    * reconstructs both emission sets relationally from the parity rule.
    * HDFS-default state store (built-in agg — no RocksDB mandate);
    * 4-partition clone, same rationale as the TWS family. */
  private val updateMode = Spec(
    "stream_update_mode",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS es FROM events),
      |b0 AS (SELECT user_id, COUNT(*) AS cnt FROM e
      |       WHERE es % 2 = 0 GROUP BY user_id),
      |b1 AS (SELECT e.user_id, COUNT(*) AS cnt FROM e
      |       WHERE e.user_id IN (SELECT user_id FROM e WHERE es % 2 = 1)
      |       GROUP BY e.user_id)
      |SELECT 0 AS batch_id, user_id, cnt FROM b0
      |UNION ALL
      |SELECT 1 AS batch_id, user_id, cnt FROM b1
      |ORDER BY batch_id, user_id""".stripMargin) { (s, d) =>
    val base = graft.operators.Scans.scratch(s, "upd_mode", d)
    graft.operators.Scans.rmRecursive(new java.io.File(base))
    updateModeLedger(s, updInput(s, d), base)
  }

  /** The `stream_update_mode` streaming core, factored so
    * StreamingSpec's absence witness can drive the IDENTICAL query over
    * a synthetic staging with guaranteed single-batch-only keys (the
    * fixture at sf0.001 happens to give every user events of both
    * parities, which would make an absence assertion on the registered
    * layout vacuous). Reads (user_id, es) parquet files one per
    * micro-batch, update-mode groupBy-count, per-batch ledger out. */
  private[graft] def updateModeLedger(s: org.apache.spark.sql.SparkSession,
      inDir: String, base: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val chk = s"$base/chk"; val outDir = s"$base/out"
    val s2 = graft.operators.Scans.fewPartitionSession(s, 4)
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("es", LongType)))
    val q = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .groupBy(col("user_id")).count()
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    try require(q.awaitTermination(180000),
      "update-mode query did not finish in 180 s")
    finally q.stop()
    s.read.parquet(outDir)
      .select(col("batch_id"), col("user_id"), col("count").as("cnt"))
      .orderBy(col("batch_id"), col("user_id"))
  }

  private val transformWithState = Spec(
    "stream_transform_with_state",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS es FROM events),
      |fp AS (
      |  SELECT user_id, MIN(es) FILTER (WHERE event_type = 'purchase') AS first_p
      |  FROM e GROUP BY user_id)
      |SELECT e.user_id,
      |  COUNT(*) AS n_events,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_clicks,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchases,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' AND es < first_p THEN 1 END), 0) AS BIGINT)
      |    AS clicks_before_first_purchase,
      |  MIN(es) AS first_es, MAX(es) AS last_es
      |FROM e JOIN fp ON e.user_id = fp.user_id
      |GROUP BY e.user_id
      |ORDER BY e.user_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import org.apache.spark.sql.types._
    val base = graft.operators.Scans.scratch(s, "tws", d)
    graft.operators.Scans.rmRecursive(new java.io.File(base)) // idempotent
    val chk = s"$base/chk"; val outDir = s"$base/out"
    val inDir = twsInput(s, d)
    // 4-partition clone: RocksDB provider + changelog scoped HERE (TWS
    // mandates RocksDB; a clone can't leak the conf into sibling queries)
    val s2 = graft.operators.Scans.fewPartitionSession(s, 4)
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled", "true")
    import s2.implicits._
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("es", LongType)))
    val q = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor, TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders
          .product[(Long, Long, Long, Long, Long, Long, Long)])
      .toDF("user_id", "n_events", "n_clicks", "n_purchases",
        "clicks_before_first_purchase", "first_es", "last_es")
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    // stop() in finally (round-13 self-review, same shape as
    // Scans.statefulCheckpoint): on the timeout path the query must not
    // stay live holding RocksDB stores while a later invocation
    // rmRecursive's its checkpoint out from under it. No-op if the query
    // already terminated.
    try require(q.awaitTermination(180000),
      "transformWithState query did not finish in 180 s")
    finally q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("batch_id").desc)
    s.read.parquet(outDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk", "batch_id")
      .orderBy(col("user_id"))
  }

  /** Memoized three-file staging for `stream_tws_timers`: the events
    * (user_id, ts) projection split CHRONOLOGICALLY at the midpoint of
    * the fixture's time range into two one-file halves, followed by one
    * single-row sentinel file (user −1 at max+2 h). With
    * `maxFilesPerTrigger=1` and oldest-mtime-first file admission —
    * pinned here by stamping strictly increasing mtimes, 10 s apart, on
    * the files in write order — the watermark climbs monotonically: no
    * real row is ever behind it (half 2 starts at the cut, above half 1's
    * max), and the sentinel batch pushes it past every possible session
    * close (max + 2 h − 1 min > last event + 30 min gap). The timers
    * themselves then fire in the engine's trailing NO-DATA micro-batch
    * (`spark.sql.streaming.noDataMicroBatches.enabled`, pinned true on
    * the query's session clone): AvailableNow runs one final empty batch
    * when the watermark advanced, exactly so watermark-only transitions
    * — append-window emission, state eviction, event-time timers — can
    * complete without more input. A second data-bearing sentinel batch
    * would buy the same firing for one more RocksDB commit cycle
    * (~0.6 s/run measured); if the no-data batch were ever NOT run, the
    * output would miss every session and the oracle would fail loudly —
    * nothing silent rests on it. Same memo/self-heal pattern as
    * [[twsInput]]; exact-count stamp covers all three files. */
  private val twsTimerCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), String]

  private[graft] def twsTimerInput(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    import graft.operators.Scans
    val abs = java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
    Scans.revalidateMemo(twsTimerCache, (s, abs), Scans.healthyStamped)
    twsTimerCache.computeIfAbsent((s, abs), { _ =>
      val inDir = Scans.scratch(s, "tws_timer_in", d)
      Scans.rmRecursive(new java.io.File(inDir))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("es"))
      val bounds = ev.agg(min(col("es")), max(col("es"))).collect()(0)
      val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
      val cut = mn + (mx - mn) / 2
      def sentinel(uid: Long, esUs: Long) =
        s.range(1).select(lit(uid).as("user_id"),
          timestamp_micros(lit(esUs)).as("ts"))
      writeStampedPieces(inDir, Seq(
        ev.filter(col("es") < cut).select(col("user_id"), col("ts")),
        ev.filter(col("es") >= cut).select(col("user_id"), col("ts")),
        sentinel(-1L, mx + 7200000000L)))
      Scans.stampExpected(inDir)
      graft.sources.SessionHooks.onApplicationEnd(s, s"tws-timer-in-$abs") {
        () => twsTimerCache.remove((s, abs)); ()
      }
      inDir
    })
  }

  /** Event-time TIMERS on `transformWithState` (VERDICT r13 #1): gap
    * sessionization where each key's session is closed by a
    * `handleExpiredTimer` firing at watermark ≥ last event + gap — see
    * [[SessionTimerProcessor]] for the state/timer design and why the
    * output equals batch sessionization exactly. Runs HERE as a real
    * streaming query (three data micro-batches + the trailing no-data
    * batch) over [[twsTimerInput]]'s staged layout: the chronological
    * split means open sessions genuinely span micro-batch boundaries
    * (every ListState carries), the sentinel batch drives the watermark
    * past every real session's close-out, and the no-data batch is where
    * the timers fire before the query ends. Append mode (a session is
    * emitted exactly once, on close) lets the exactly-once parquet file
    * sink consume the stream directly — no foreachBatch/last-emission
    * bookkeeping. Sentinel users (negative ids) are excluded on read;
    * the DuckDB oracle recomputes the same sessions with the lag()-CTE
    * idiom (same >= gap convention, same last+gap session end). */
  private val twsTimers = Spec(
    "stream_tws_timers",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS es FROM events),
      |x AS (
      |  SELECT *, CASE WHEN lag(es) OVER w IS NULL
      |                   OR es - lag(es) OVER w >= 1800000000
      |            THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |y AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, MIN(es) AS session_start_us,
      |  MAX(es) + 1800000000 AS session_end_us, COUNT(*) AS n_events
      |FROM y GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import org.apache.spark.sql.types._
    val base = graft.operators.Scans.scratch(s, "tws_timer", d)
    graft.operators.Scans.rmRecursive(new java.io.File(base)) // idempotent
    val chk = s"$base/chk"; val outDir = s"$base/out"
    val inDir = twsTimerInput(s, d)
    // Cost shape: FOUR micro-batch cycles (three data + the no-data
    // timer batch) at the measured ~0.5–0.6 s/cycle RocksDB-lifecycle
    // floor (BASELINE.md) ⇒ ~2.5 s steady — already trimmed from five
    // cycles by the single-sentinel + no-data-batch design, with the
    // input staging pre-paid in bench's materialize_layout. A 2-partition
    // clone measured no faster than the family's 4 (the cycle cost is
    // batch lifecycle, not per-partition stores), so 4 is kept.
    val s2 = graft.operators.Scans.fewPartitionSession(s, 4)
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled", "true")
    // the sentinel advances the watermark; the timers FIRE in the
    // trailing no-data batch — pin the conf that guarantees it runs
    // (default true; pinned so a cluster-level override cannot silently
    // empty this query's output)
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    import s2.implicits._
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType)))
    val q = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), unix_micros(col("ts")).as("es"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(1800000000L),
        TimeMode.EventTime(), OutputMode.Append(),
        org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)])
      .toDF("user_id", "session_start_us", "session_end_us", "n_events")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", chk)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    try require(q.awaitTermination(180000),
      "stream_tws_timers query did not finish in 180 s")
    finally q.stop()
    s.read.parquet(outDir).filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** MapState on `transformWithState` (VERDICT r13 #1): per-user
    * event-type counters held in one RocksDB map per key and updated in
    * place across micro-batches — see [[TypeCountsProcessor]]. Reuses the
    * [[twsInput]] parity staging (one file per micro-batch), so final
    * counts are only right if the map carried across the batch boundary;
    * update-mode emissions are captured per batch via foreachBatch and
    * the last emission per (user, type) — the final counter value — is
    * the registered result, recomputed declaratively by a plain GROUP BY
    * oracle. */
  private val twsMapState = Spec(
    "stream_tws_mapstate",
    """SELECT user_id, event_type, COUNT(*) AS n_events
      |FROM events GROUP BY 1, 2
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import org.apache.spark.sql.types._
    val base = graft.operators.Scans.scratch(s, "tws_map", d)
    graft.operators.Scans.rmRecursive(new java.io.File(base)) // idempotent
    val chk = s"$base/chk"; val outDir = s"$base/out"
    val inDir = twsInput(s, d)
    val s2 = graft.operators.Scans.fewPartitionSession(s, 4)
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    s2.conf.set("spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled", "true")
    import s2.implicits._
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("es", LongType)))
    val q = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new TypeCountsProcessor, TimeMode.None(),
        OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[(Long, String, Long)])
      .toDF("user_id", "event_type", "n_events")
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    try require(q.awaitTermination(180000),
      "stream_tws_mapstate query did not finish in 180 s")
    finally q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("batch_id").desc)
    s.read.parquet(outDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk", "batch_id")
      .orderBy(col("user_id"), col("event_type"))
  }

  private val streamStatic = Spec(
    "join_stream_static",
    """SELECT event_id, user_id, event_type, c_name, c_mktsegment, value
      |FROM events JOIN customer ON user_id = c_custkey
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    enrichWithCustomer(Tables.events(s, d), Tables.customer(s, d))
      .orderBy(col("event_id"))
  }

  /** Incremental batch processing with restart — Trigger.AvailableNow +
    * a checkpoint + the exactly-once parquet file sink: the production
    * shape of every periodic ingest job (run on a schedule, process ONLY
    * files that arrived since the last run, stop). Two separate query
    * incarnations run here against the same checkpoint: the first sees
    * half the corpus, the second — a genuine restart, new query object —
    * sees the directory with both halves but processes only the unseen
    * files (the file source's seen-files log lives in the checkpoint;
    * the file sink's transaction log makes the output exactly-once even
    * if a run dies mid-write). The read-back equals one batch pass over
    * everything — that equivalence is the whole contract, and it is what
    * lets a 100 TB corpus be ingested as years of small runs that never
    * re-read history (the streaming sibling of llm_dedup_incremental's
    * admission pattern). Stateless transform ⇒ append mode; no
    * arithmetic beyond projection, so the oracle hash-checks values
    * bit-for-bit. */
  private val incrementalRestart = Spec(
    "stream_incremental_restart",
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.streaming.Trigger
    val base = graft.operators.Scans.scratch(s, "increstart", d)
    graft.operators.Scans.rmRecursive(new java.io.File(base)) // idempotent re-run
    val inDir = s"$base/in"; val chk = s"$base/chk"; val outDir = s"$base/out"
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    def runOnce(): Unit = {
      val q = s.readStream.schema(ev.schema).parquet(inDir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    ev.filter(pmod(col("event_id"), lit(2)) === 0)
      .write.mode("append").parquet(inDir)
    runOnce()
    ev.filter(pmod(col("event_id"), lit(2)) === 1)
      .write.mode("append").parquet(inDir)
    runOnce()
    s.read.parquet(outDir).orderBy(col("event_id"))
  }
}

/** The funnel state machine shared by the batch (mapGroups) and streaming
  * (flatMapGroupsWithState) forms of `stream_stateful_custom`. Pure and
  * order-insensitive where SQL is (clicks strictly before the first
  * purchase in event time). */
object Funnel {
  final case class State(nEvents: Long, nClicks: Long, nPurchases: Long,
      clickTimes: List[Long], firstPurchase: Option[Long],
      firstEs: Option[Long], lastEs: Option[Long])

  val empty: State = State(0, 0, 0, Nil, None, None, None)

  def update(st: State, eventType: String, es: Long): State = {
    val firstP = eventType match {
      case "purchase" => Some(st.firstPurchase.fold(es)(math.min(_, es)))
      case _ => st.firstPurchase
    }
    // State-size bound: firstPurchase only ever decreases, so a click with
    // es >= the CURRENT first purchase can never satisfy `es < firstP`
    // later either — drop it. Retained click times are therefore bounded
    // by the clicks preceding the earliest purchase seen so far (and the
    // whole list collapses once any purchase arrives), which is what keeps
    // per-key streaming state small on long-lived keys.
    val clicks0 =
      if (eventType == "click") es :: st.clickTimes else st.clickTimes
    val clicks = firstP match {
      case Some(fp) => clicks0.filter(_ < fp)
      case None => clicks0
    }
    State(st.nEvents + 1,
      st.nClicks + (if (eventType == "click") 1 else 0),
      st.nPurchases + (if (eventType == "purchase") 1 else 0),
      clicks, firstP,
      Some(st.firstEs.fold(es)(math.min(_, es))),
      Some(st.lastEs.fold(es)(math.max(_, es))))
  }

  def finish(uid: Long, st: State)
      : (Long, Long, Long, Long, Long, Long, Long) = {
    val before = st.firstPurchase
      .map(fp => st.clickTimes.count(_ < fp).toLong).getOrElse(0L)
    (uid, st.nEvents, st.nClicks, st.nPurchases, before,
      st.firstEs.getOrElse(0L), st.lastEs.getOrElse(0L))
  }
}
