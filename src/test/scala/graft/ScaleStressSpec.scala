package graft

import org.apache.spark.sql.functions.lit
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
