package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import graft.operators.LlmVector
import graft.sources.Tables

/** Recall/scan-fraction sweep for the two ANN candidate generators —
  * `llm_ann_lsh` (hyperplane LSH, multi-probe) and `llm_ann_ivf` (coarse
  * quantizer) — against the exact brute-force baseline `llm_cosine_topk`.
  * ANN quality is a measured trade, not a guess: this main prints
  * recall@5 and the measured fraction of the corpus each probe scores for
  * a grid of configurations, and is how the shipped defaults were chosen
  * (see the scaladoc on the two operators for the numbers).
  *
  * Usage: runMain graft.AnnTune [sfDir]
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SparkEntry.queries("llm_cosine_topk")(spark, sfDir))
    // Each config's candidate generation runs ONCE: the raw scored set is
    // persisted, the scan fraction is its count, and the ranked top-5 is
    // derived from the same cached set.
    def report(tag: String, raw: DataFrame): Unit = {
      val cached = raw.persist()
      val scan = cached.count() / (10.0 * (n - 1))
      // Collapse duplicate pairs before ranking (multi-table candidate
      // sets meet once per table — same dedup the shipped query applies;
      // a no-op for the single-table and IVF sets, which are pair-unique).
      val deduped = cached.groupBy(col("probe_id"), col("neighbor_id"))
        .agg(max(col("score")).as("score"))
      val recall = (pairs(LlmVector.rankTop5(deduped, rank = true)) & exact)
        .size.toDouble / exact.size
      cached.unpersist()
      println(f"$tag%-28s recall@5=$recall%.3f scan=$scan%.3f")
    }
    for ((planes, radius, tables) <- Seq((8, 2, 1), (8, 3, 1), (8, 4, 1),
        (9, 4, 1), (8, 2, 2), (8, 2, 4), (10, 3, 2)))
      report(s"lsh planes=$planes r=$radius t=$tables",
        LlmVector.lshTopk(emb, planes, radius, tables, rank = false))
    // query-directed multi-probe (margin-ordered flip sets): same bucket
    // join, strictly more selective probing per recall point
    for ((planes, np, tables) <- Seq((8, 28, 4), (8, 32, 4), (8, 36, 4),
        (8, 16, 6), (8, 18, 6), (8, 20, 6), (8, 12, 8), (8, 14, 8),
        (8, 16, 8)))
      report(s"lshq planes=$planes np=$np t=$tables",
        LlmVector.lshTopkDirected(spark, emb, planes, np, tables,
          rank = false))
    for ((cells, np) <- Seq((16, 3), (16, 6), (16, 8), (24, 10), (24, 12),
        (32, 12), (48, 14), (48, 17), (48, 19), (64, 18), (64, 22),
        (64, 26), (64, 20)))
      report(s"ivf cells=$cells nProbe=$np",
        LlmVector.ivfTopk(spark, emb, cells, np, rank = false))
    spark.stop()
  }
}
