package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (round 22): stage-level attribution of the ngram-pairs
  * substrate build (`LlmText.computeNgramPairs`) — the largest single
  * attributable cost in the bench (`materialize_pairs`). Replicates the
  * build's DAG piece by piece and times each piece with the noop sink
  * (guide §1.4) so the expensive stage is identified before anything is
  * changed, plus A/B variants for candidate restructures. A measuring
  * replica, not the production path: any change it motivates is made in
  * LlmText and re-verified there (oracle + bench fields). Same dev-main
  * family as TimeQ/ReuseCheck/Explain — not registered, no query
  * semantics. `runMain graft.PairsProbe [sfDir] [reps]`. */
object PairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // session/codegen warm, like Bench

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(body: => Unit): Double = {
      spark.sparkContext.setJobDescription(s"pairsprobe: $label")
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[pairsprobe] $label%-34s $sec%7.3f s")
      sec
    }

    // --- replica of the build DAG (docShingles + computeNgramPairsScoped
    // at the fixture width, where cacheWidth == 0) ---
    def docsWords = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    // pre-r22 form (distinct on shingle STRINGS, hash after explode) —
    // kept as the A/B control for the r22 hash-first change
    def shStringDistinct = docsWords
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          """transform(sequence(0, size(words) - 3),
            |  i -> concat_ws(' ', words[i], words[i+1], words[i+2]))"""
            .stripMargin))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
    // r22 production form: hash INSIDE the transform (see LlmText.docShingles)
    def shHashFirst = docsWords
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          """transform(sequence(0, size(words) - 3),
            |  i -> xxhash64(concat_ws(' ', words[i], words[i+1],
            |                words[i+2])))""".stripMargin))).as("sh"))

    (1 to reps).foreach { rep =>
      System.err.println(s"[pairsprobe] ---- rep $rep ----")
      timed("A scan+shingle string-distinct")  { noop(shStringDistinct) }
      timed("B scan+shingle hash-first (r22)") { noop(shHashFirst) }

      val sh = shHashFirst.persist()
      timed("C persist+count postings")      { sh.count(): Unit }
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      timed("D sizes agg (cached)")          { noop(sizes) }
      val dfAgg = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      timed("E dfAgg (cached)")              { noop(dfAgg) }
      val capped = sh.join(
        dfAgg.filter(col("df") <= 1024).select(col("sh")), "sh")
      timed("F capped join")                 { noop(capped) }
      val inter = capped.alias("a")
        .join(capped.alias("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      timed("G self-join+pair agg")          { noop(inter) }
      val jac = (col("n_inter").cast("double")
        / (col("n_a") + col("n_b") - col("n_inter")))
      val filtered = inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
          "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
          "doc_b")
        .withColumn("jaccard", jac)
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"),
          col("n_b"), col("jaccard"))
      timed("H full filtered (end to end)")  { noop(filtered) }
      timed("I diagnostic first()") {
        dfAgg.filter(col("df") > 1024)
          .agg(coalesce(sum(col("df")), lit(0L)).as("postings"),
            count(lit(1)).as("shingles")).first(): Unit
      }
      sh.unpersist(blocking = true): Unit
    }
    spark.stop()
  }
}
