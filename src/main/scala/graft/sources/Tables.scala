package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access (TESTDATA.md / FIXTURES.md).
  *
  * Parquet self-describes its schema and the driver fixtures are pinned, so
  * we read them directly; at 100 TB the same call reads a partitioned
  * directory tree instead of a single file — the API is unchanged and
  * partition pruning / predicate pushdown apply automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-(session, file) memo of the base relations. `spark.read.parquet`
    * re-lists the path and re-reads footers on every call; with ~100
    * registered queries each touching 1-3 fixture tables, that listing
    * cost is pure per-query planning overhead. The fixtures are immutable
    * for a session's lifetime (driver contract), so the lazily-built
    * DataFrame — still just a logical plan, nothing is cached/executed —
    * is safely shared across queries. Keyed by session because a plan is
    * only valid in the session that built it. Entries are one per
    * (session, fixture file) — ≤ ~a dozen per session, each a logical plan
    * + file listing — and a stop-listener evicts a session's entries when
    * its context ends, so even a session-cycling harness cannot accumulate
    * references to dead sessions (ADVICE r2). */
  private val relationCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** First-seen (mtime, length) per (session, fixture path) — ADVICE r10
    * #1, hardened per ADVICE r11 #2/#3. The memoized relation above
    * caches the parquet footer read (and [[eventsRawTsType]] pins the
    * streaming schema to it), which is only sound under the driver
    * contract "fixtures are immutable for a session's lifetime". The
    * driver HAS regenerated `/root/testdata` in place twice already
    * (2026-08-13 and 2026-08-14, between sessions — both absorbed); if
    * it ever regenerates MID-session, the next [[load]]/[[eventsRaw]]
    * call fails here with one attributable error naming the file,
    * instead of surfacing as a stale-plan hash mismatch or a silently
    * skewed streaming schema pin. The baseline records mtime AND length
    * because mtime alone can be preserved by `cp -p`/`rsync -t`/coarse
    * filesystem timestamp granularity — a regenerated parquet file
    * virtually never preserves both (the guard still cannot catch a
    * same-length, same-mtime rewrite; FixtureContractSpec's content pins
    * are the backstop for that). Checked on EVERY call (one stat(2) per
    * query build — noise next to the footer read the cache avoids).
    * Keyed and evicted exactly like the relation entries, so a
    * post-regeneration NEW session legitimately re-records fresh
    * baselines. */
  private val mtimeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Long, Long)]

  private def guardMtime(s: SparkSession, rawPath: String): Unit = {
    // Canonical key (same normalization as Scans.scratch/fragmentedEvents):
    // two spellings of the same fixture path must share ONE first-seen
    // baseline, or a regeneration between their first touches slips
    // through as a fresh baseline on the second spelling.
    val path = java.nio.file.Paths.get(rawPath)
      .toAbsolutePath.normalize.toString
    val f = new java.io.File(path)
    val now = (f.lastModified(), f.length())
    // Missing file (lastModified == 0): don't record a baseline — let
    // spark.read.parquet surface the real missing-file error, and a later
    // successful load establish the baseline. Recording 0 here would turn
    // every retry after the file appears into a misleading
    // "changed mid-session" failure (ADVICE r11 #2).
    if (now._1 == 0L) return
    mtimeCache.putIfAbsent((s, path), now) match {
      case Some(first) if first != now =>
        throw new IllegalStateException(
          s"fixture $path changed mid-session (mtime,len $first -> $now): " +
            "the driver regenerated testdata in place, so every memoized " +
            "relation and schema pin for it is stale — restart the " +
            "session/JVM and re-run (FixtureContractSpec names any " +
            "logical-schema drift)")
      case _ => ()
    }
  }

  private def evictOnStop(s: SparkSession): Unit =
    SessionHooks.onApplicationEnd(s, "tables") { () =>
      relationCache.keys.filter(_._1 eq s).foreach(relationCache.remove)
      mtimeCache.keys.filter(_._1 eq s).foreach(mtimeCache.remove)
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    evictOnStop(spark)
    guardMtime(spark, s"$sfDir/$name.parquet")
    relationCache.getOrElseUpdate((spark, s"$sfDir/$name.parquet"),
      spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** `events.ts` has shipped in two fixture generations: parquet
    * TIMESTAMP(NANOS) (pre-2026-08-13 regeneration), which Spark 4.1
    * refuses to read natively ([PARQUET_TYPE_ILLEGAL]) and we instead read
    * as a raw long via the legacy conf, and plain TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (current), which Spark reads directly as
    * TIMESTAMP_NTZ. The conf is safe to set unconditionally — it only
    * changes how TIMESTAMP(NANOS) columns parse and is a no-op on a µs
    * file — and is deliberately left set for the session rather than
    * restored: restoring it at query-BUILD time would race with Spark's
    * lazy evaluation (the scan reads the conf at execution).
    * [[events]] normalizes both generations to the same column type. */
  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    evictOnStop(s)
    guardMtime(s, s"$d/events.parquet")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    relationCache.getOrElseUpdate((s, s"$d/events.parquet#nanosAsLong"),
      s.read.parquet(s"$d/events.parquet"))
  }

  /** The `ts` type as stored in the fixture file (LongType for the legacy
    * ns generation under the nanosAsLong conf, TimestampNTZType for the
    * current µs generation) — the streaming file source pins its schema to
    * this, since a streaming schema pin must match the file exactly. */
  def eventsRawTsType(s: SparkSession, d: String):
      org.apache.spark.sql.types.DataType =
    eventsRaw(s, d).schema("ts").dataType

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Events with `ts` normalized to session-local TIMESTAMP micros — the
    * type every registered consumer (window(), unix_micros, watermarks,
    * getTimestamp extraction) was built and oracle-validated against —
    * regardless of which fixture generation is on disk:
    *  - legacy ns-as-long: truncate ns→µs with integer division, exactly
    *    the truncation DuckDB applies reading the same column;
    *  - current µs TIMESTAMP_NTZ: cast NTZ→TIMESTAMP, which interprets the
    *    wall-clock value in the session timezone (pinned UTC by every
    *    entrypoint), i.e. the identical epoch-µs value DuckDB's epoch_us()
    *    computes from its naive TIMESTAMP read of the same file. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(eventsRaw(s, d))

  /** The generation-normalization itself, factored out so the streaming
    * file source (Scans.eventsFileStream, which pins its schema to the
    * RAW stored type) applies the IDENTICAL transform and a streaming
    * consumer that projects `ts` sees the same values as the batch path
    * (ADVICE r10 #3) — works unchanged on batch and streaming relations
    * (pure column expressions, no actions). */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        // ns→µs via `div` = truncation toward zero — bit-for-bit what
        // DuckDB's epoch_us() does reading the same ns column ON THE
        // FIXTURE'S ALL-POSITIVE (2024+) DOMAIN, where truncation and
        // floor-division coincide. For pre-epoch (negative) ns they
        // diverge (div rounds toward zero, floor rounds down); the
        // contract is PARITY with the oracle, not either convention in
        // isolation, so if pre-epoch events ever become possible both
        // engines' conventions must be re-checked together (ADVICE r10
        // #2).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts read as unexpected type $other; expected ns-as-long " +
          "(legacy fixture + nanosAsLong conf) or TIMESTAMP_NTZ (µs fixture)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
