package graft

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LlmText, LlmVector}

/** Dedup family at 40× the sf0.1 corpus (20 000 docs): the banded-MinHash
  * path must still agree exactly with the inverted-index exact path, the
  * hot-shingle cap must not fire on an organic vocabulary, and clustering
  * must label every paired doc. This is the in-repo stand-in for the
  * next scale-up: the shapes that survive 40× without new code paths are
  * the ones that survive 1000×. Deterministic LCG corpus — no RNG APIs. */
class ScaleStressSpec extends AnyFunSuite {
  import TestSpark._

  private val nDocs = 20000
  private val vocab = (0 until 64).map(i => s"w$i")

  /** xorshift-ish deterministic stream; avoids java.util.Random so the
    * corpus is identical on every run and platform. */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val rng = lcg(42L)
    val docs = (0 until nDocs).map { i =>
      val words = (0 until 30).map { _ =>
        vocab(((rng.next() >>> 33) % vocab.length).toInt)
      }
      (i.toLong, words.mkString(" "))
    }
    // Inject near dups (guaranteed 1-word edit of doc id-2's FINAL text)
    // and exact dups (copy of doc id-1's FINAL text) sequentially, so each
    // injection references the corpus as it will actually be written —
    // id%100: 97 becomes a near dup of base doc 95, then 98 an exact dup
    // of that near dup, giving both jaccard≈0.9 and jaccard=1.0 pairs.
    val texts = scala.collection.mutable.ArrayBuffer(docs.map(_._2): _*)
    (0 until nDocs).foreach { id =>
      if (id % 100 == 97 && id > 1) {
        val w = texts(id - 2).split(" ")
        w(0) = if (w(0) == "zz") "zy" else "zz" // always a real edit
        texts(id) = w.mkString(" ")
      } else if (id % 100 == 98 && id > 0) {
        texts(id) = texts(id - 1)
      }
    }
    val finalDocs = (0 until nDocs).map(i => (i.toLong, texts(i)))
    finalDocs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .coalesce(4).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  // ------------------------------------------------------------------
  // Adversarial bucket skew (VERDICT r8 #4): a 500-doc near-dup CLIQUE
  // inside a 10k corpus — the one regime where "work ∝ co-bucketed
  // pairs" degrades toward all-pairs. The claim to bound: degradation is
  // local to the clique (≤ bands·C(clique,2) join work), never global
  // (C(n,2)). Clique docs share a disjoint h* vocabulary and differ only
  // in word 0, so every clique pair has jaccard 27/29 ≈ 0.931 and zero
  // overlap with the organic corpus.
  private val hotN = 500
  private val advN = 10000
  private lazy val advDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val rng = lcg(1234L)
    val hotBase = (1 until 30).map(i => s"h$i")
    val docs = (0 until advN).map { i =>
      val text =
        if (i < hotN) (s"u$i" +: hotBase).mkString(" ")
        else (0 until 30)
          .map(_ => vocab(((rng.next() >>> 33) % vocab.length).toInt))
          .mkString(" ")
      (i.toLong, text)
    }
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .coalesce(4).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("minhash band fan-out under a 500-doc clique: local, not global") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, advDir)
      .select("doc_id", "text")
    val banded = LlmVector.minhashBanded(LlmVector.minhashShingles(docs))
      .persist()
    // Join work = Σ_(band,hash) C(bucket, 2) — the number of raw pair
    // meetings the band equi-join produces, i.e. the quantity the
    // "∝ co-bucketed pairs" comment claims scales with clique², not n².
    val joinWork = banded.groupBy("band_idx", "band_hash").count()
      .agg(sum(expr("count * (count - 1) DIV 2")).as("w"))
      .head().getLong(0)
    banded.unpersist()
    val cliquePairs = hotN.toLong * (hotN - 1) / 2 // 124 750
    val allPairs = advN.toLong * (advN - 1) / 2    // ~50 M
    assert(joinWork >= cliquePairs,
      s"clique must co-band at least once: $joinWork < $cliquePairs")
    // Each band can co-bucket the clique at most once ⇒ the adversarial
    // ceiling is bands·C(clique,2) plus organic band noise (the bound
    // references the PRODUCTION band count so a tuning change retightens
    // it automatically).
    assert(joinWork <= LlmVector.bands.toLong * cliquePairs + 20000L,
      s"join work $joinWork exceeds the bands×clique² ceiling")
    // The scale claim: even with 5 % of the corpus in ONE near-dup
    // clique, the banded join does < 5 % of the all-pairs work.
    assert(joinWork <= allPairs / 20,
      s"join work $joinWork is not << all-pairs $allPairs")
    info(s"minhash band join work $joinWork vs clique $cliquePairs, " +
      s"ceiling ${LlmVector.bands.toLong * cliquePairs}, all-pairs $allPairs")
    // And the pipeline's OUTPUT under this skew is exactly the clique.
    val got = LlmVector.minhashPairs(docs, 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      a <- 0 until hotN; b <- a + 1 until hotN
    } yield (a.toLong, b.toLong)).toSet
    assert(got == expect,
      s"got ${got.size} pairs, expected ${expect.size} (the clique); " +
        s"missed=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

  test("simhash chunk fan-out under the clique: measured, bounded, exact") {
    val docs = graft.sources.Tables.documents(spark, advDir)
      .select("doc_id", "text")
    val rows = docs.collect()
      .map(r => (r.getLong(0),
        org.apache.spark.sql.graft.SimHashImpl.hash(r.getString(1))))
      .sortBy(_._1)
    // Candidate mass of the 16-bit-chunk layout (same layout the
    // production join uses and the DuckDB oracle re-derives):
    // Σ_chunk Σ_value C(bucket, 2).
    val nChunks = LlmVector.simhashChunks
    val cBits = 64 / nChunks
    val chunkWork = (0 until nChunks).map { c =>
      rows.groupBy { case (_, sig) => (sig >>> (c * cBits)) & ((1L << cBits) - 1) }
        .map { case (_, g) => g.size.toLong * (g.size - 1) / 2 }.sum
    }.sum
    val cliquePairs = hotN.toLong * (hotN - 1) / 2
    val allPairs = advN.toLong * (advN - 1) / 2
    assert(chunkWork <= nChunks.toLong * cliquePairs + 30000L,
      s"chunk candidate mass $chunkWork exceeds chunks×clique² + noise")
    assert(chunkWork <= allPairs / 20,
      s"chunk candidate mass $chunkWork is not << all-pairs $allPairs")
    info(s"simhash chunk candidate mass $chunkWork vs clique " +
      s"$cliquePairs, all-pairs $allPairs")
    // Exactness under skew: distributed chunk-LSH == local brute force.
    val got = LlmVector.simhashPairs(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = rows.map(_._2); val ids = rows.map(_._1)
    val expect = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    var i = 0
    while (i < sigs.length) {
      var j = i + 1
      while (j < sigs.length) {
        val h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (h <= 3) expect += ((ids(i), ids(j), h))
        j += 1
      }
      i += 1
    }
    assert(got == expect,
      s"chunk-LSH ${got.size} vs brute ${expect.size} under clique skew")
  }

  test("embedding LSH under an all-near-dup clique: complete and local") {
    import spark.implicits._
    // 800 near-identical vectors (the clique) + 7 200 spread organics.
    // Every clique pair is cosine ≥ 0.99 and must be FOUND (completeness
    // under maximal bucket skew); organic vectors are near-orthogonal so
    // no organic pair qualifies. Base components 1 + d/64 give every
    // hyperplane a decisive margin, so a 1e-5 perturbation cannot flip
    // sign buckets.
    val rng = lcg(99L)
    val hot = 800
    val vecs = (0 until 8000).map { i =>
      val arr =
        if (i < hot)
          Array.tabulate(64)(d =>
            (1.0f + d / 64.0f) + (if (d == i % 64) 1e-5f * (i / 64 + 1)
                                  else 0.0f))
        else
          Array.tabulate(64) { _ =>
            // organic: ±1-ish components from the LCG — near-orthogonal
            // to each other and to the all-positive clique direction
            if (((rng.next() >>> 33) & 1L) == 0L) -1.0f else 1.0f
          }
      (i.toLong, arr.toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val got = LlmVector.embedNearDupPairs(emb, 0.99)
    val cnt = got.count()
    val cliquePairs = hot.toLong * (hot - 1) / 2
    assert(cnt == cliquePairs,
      s"expected exactly the clique ($cliquePairs pairs), got $cnt")
    val minScore = got.agg(org.apache.spark.sql.functions.min("score"))
      .head().getDouble(0)
    assert(minScore >= 0.99, s"min score $minScore")
    // Locality measure: own-bucket co-residence mass of the production
    // bucket layout — the clique sits in ONE bucket (C(800,2) mass);
    // organics spread. The measured mass must stay ≪ all-pairs.
    val bucketMass = emb
      .select(org.apache.spark.sql.graft.HyperplaneBucket(
        col("embedding"), 8, 0).as("b"))
      .groupBy("b").count()
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr("count * (count - 1) DIV 2")))
      .head().getLong(0)
    val allPairs = 8000L * 7999 / 2
    assert(bucketMass >= cliquePairs, s"clique not co-bucketed: $bucketMass")
    assert(bucketMass <= allPairs / 20,
      s"bucket mass $bucketMass is not << all-pairs $allPairs")
    info(s"hyperplane own-bucket mass $bucketMass vs clique $cliquePairs, " +
      s"all-pairs $allPairs")
  }

  test("organic vocabulary stays under the hot-shingle cap") {
    val maxDf = LlmText.docShingles(spark, dir)
      .groupBy("sh").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxDf <= 1024,
      s"max shingle df $maxDf would trip the cap and skew the parity test")
  }

  test("banded MinHash equals the exact inverted-index join at 20k docs") {
    val exact = LlmText.ngramPairs(spark, dir)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = LlmVector.minhashPairs(
      graft.sources.Tables.documents(spark, dir)
        .select("doc_id", "text"), 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "stress corpus must contain injected dups")
    // the injections must actually be present: every (near-dup, its exact
    // copy) pair has jaccard 1.0, every (base, near-dup) pair ≈ 0.8
    (100 until nDocs by 100).foreach { c =>
      assert(exact.contains((c + 97L, c + 98L)), s"missing exact pair at $c")
      assert(exact.contains((c + 95L, c + 97L)), s"missing near pair at $c")
    }
    assert(minhash == exact,
      s"minhash ${minhash.size} vs exact ${exact.size}; " +
        s"missed=${(exact -- minhash).take(5)} extra=${(minhash -- exact).take(5)}")
  }

  test("clustering labels every paired doc with its component minimum") {
    val pairs = LlmText.ngramPairs(spark, dir)
      .select("doc_a", "doc_b")
    val labels = LlmText.clusterPairs(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairRows = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairRows.nonEmpty)
    pairRows.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
      assert(labels(a) <= math.min(a, b))
    }
  }

  test("simhash chunk-LSH equals brute-force hamming<=3 at 20k docs") {
    // The llm_dedup_simhash oracle guarantee is the pigeonhole THEOREM
    // (hamming <= 3 ⇒ one of four 16-bit chunks equal ⇒ candidate), so
    // it cannot degrade with corpus size — but the claim deserves the
    // same 40×-scale witness the MinHash path has. Brute force: all
    // 2·10⁸ signature pairs via xor+popcount on a local array (~1 s),
    // against the bucketed chunk-join pipeline's output.
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
    val got = LlmVector.simhashPairs(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigRows = docs.collect()
      .map(r => (r.getLong(0),
        org.apache.spark.sql.graft.SimHashImpl.hash(r.getString(1))))
      .sortBy(_._1)
    val ids = sigRows.map(_._1)
    val sigs = sigRows.map(_._2)
    val expect = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    var i = 0
    while (i < sigs.length) {
      var j = i + 1
      while (j < sigs.length) {
        val h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (h <= 3) expect += ((ids(i), ids(j), h))
        j += 1
      }
      i += 1
    }
    assert(expect.nonEmpty, "stress corpus produced no hamming<=3 pairs")
    assert(got == expect,
      s"chunk-LSH ${got.size} pairs vs brute force ${expect.size}; " +
        s"missed=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }
}
