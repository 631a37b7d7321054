package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture amplifier for the scale-probe harness
  * (VERDICT r15 #1): `runMain graft.Amplify <srcSfDir> <outDir> <factor>`
  * writes a `factor`×-amplified copy of the sf fixtures by replicating
  * rows with KEY-SPACE OFFSETS — copy k shifts every join/group key by
  * k·10⁹ — so the amplified corpus scales the way real data does:
  *
  *  - join fan-out per key stays CONSTANT (copy k's orders reference
  *    copy k's customers; an unshifted replication would multiply every
  *    key's match count by `factor` and measure join-explosion, not the
  *    operator);
  *  - group-by key cardinality scales with the data (the 100 TB
  *    behavior), while fixed-domain columns (status, priority, dates)
  *    keep their domains;
  *  - dimension tables (nation, region) stay verbatim — facts reference
  *    them unshifted, exactly like a production star schema;
  *  - document TEXT is salted per copy (k>0 appends " zK") and
  *    embeddings are perturbed per copy (+k·10⁻³ per component), so the
  *    duplicate/near-neighbor RATE stays constant instead of turning
  *    every row into a `factor`-way duplicate cluster — a slope witness
  *    must scale the problem, not manufacture a pathological one (the
  *    adversarial hot-cluster path has its own bounded-candidate-mass
  *    coverage in ScaleStressSpec / HotShingleCapSpec).
  *
  * No oracle runs on amplified dirs — this is a SCALING witness
  * (tools/scale_probe.py measures per-row wall-time slopes across
  * 1× → 8× → 32×), not a correctness check; correctness is the driver's
  * sf0.01 gate. Timestamps are written back with their stored physical
  * type untouched (events.ts stays TIMESTAMP_NTZ µs, so
  * Tables.normalizeTs and the streaming schema pins behave identically
  * on amplified dirs). */
object Amplify {

  /** One stride for every BIGINT key column: far above any fixture key
    * (max ~6·10⁵ at sf0.1) and far below Long overflow at factor 32. */
  val Stride = 1000000000L

  private val keyCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private def copyK(name: String, df: DataFrame, k: Int): DataFrame = {
    val shifted = keyCols(name).foldLeft(df) { (d, c) =>
      d.withColumn(c, col(c) + lit(k * Stride))
    }
    name match {
      case "documents" if k > 0 =>
        // Per-copy VOWEL TRANSLATION, not a suffix (round-16 probe
        // lesson): SimHash/MinHash are similarity-preserving, so a
        // one-token salt left copies within hamming ≤ 3 of each other
        // and manufactured factor-way near-dup clusters — the probe
        // then measured the (genuinely quadratic) pathological-cluster
        // output, not operator scaling. Translating the 5 vowels to a
        // k-dependent consonant set changes most WORDS' hashes (every
        // vowel-bearing token), so cross-copy similarity collapses
        // while within-copy duplicates (same translation) survive —
        // duplicate RATE constant, text length and NULLs preserved.
        val target = (0 until 5)
          .map(i => "bcdfghjklmnpqrstvwxz"((k * 5 + i * 7) % 20))
          .mkString
        shifted.withColumn("text",
          translate(col("text"), "aeiou", target))
      case "embeddings" if k > 0 =>
        // Per-copy ±1 SIGN-FLIP pattern, not an additive shift (the
        // additive +k·1e-3 left copies at cosine ≈ 0.9999 of their
        // originals — manufactured near-dup clusters, same probe
        // lesson as the text salt): a diagonal ±1 matrix is
        // ORTHOGONAL, so within-copy angles — and therefore the
        // near-dup/ANN structure each copy carries — are preserved
        // EXACTLY, while cross-copy cosines collapse to ~0 (half the
        // components flip). hash(i, k) keeps the pattern deterministic.
        shifted.withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(pmod(hash(i, lit(k)), lit(2)) === 0, x).otherwise(-x)))
      case _ => shifted
    }
  }

  def amplify(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keyCols.keys.toSeq.sorted.foreach { name =>
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      val out = (0 until factor).map(copyK(name, src, _))
        .reduce(_ unionAll _)
      if (name == "events") {
        // events must land as a single FILE, like the driver fixture:
        // the streaming file source's listing can't see a Spark-written
        // events.parquet/ DIRECTORY (TESTDATA gotcha), and the
        // streaming rows are probe targets too. coalesce(1) then lift
        // the lone part file out of the directory.
        val tmp = s"$outDir/_events_tmp"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-")
            && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error("no part file written for events"))
        val dst = new java.io.File(s"$outDir/events.parquet")
        graft.operators.Scans.rmRecursive(dst)
        require(part.renameTo(dst), "events single-file rename failed")
        graft.operators.Scans.rmRecursive(new java.io.File(tmp))
      } else {
        out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      }
      println(s"[amplify] $name x$factor")
    }
    Seq("nation", "region").foreach { name =>
      spark.read.parquet(s"$srcDir/$name.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[amplify] $name verbatim")
    }
  }

  def main(args: Array[String]): Unit = {
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    amplify(spark, src, out, factor)
    spark.stop()
  }
}
