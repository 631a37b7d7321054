package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmVector
import graft.sources.Tables

/** llm_ann_ivf — recall floor against the exact brute-force baseline,
  * determinism, and quantizer invariants. Since round 9 the query is ALSO
  * hash-exact oracle-checked (the DuckDB SQL replays the Lloyd training
  * and search fold-for-fold — LlmVector.annIvfOracleSql); these floors
  * remain the semantic "is the recall any good" check the hash can't
  * express. */
class IvfSpec extends AnyFunSuite {
  import TestSpark._

  test("centroids are unit vectors, at most k, deterministic") {
    val emb = Tables.embeddings(spark, SF01)
    val a = LlmVector.ivfCentroids(emb)
    val b = LlmVector.ivfCentroids(emb)
    assert(a.length <= 48 && a.nonEmpty)
    a.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n")
    }
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "training must be deterministic (bounded sample by vec_id)")
  }

  test("topCells ranks by dot, ties to lower index, returns n cells") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    assert(LlmVector.topCells(cents, Seq(1.0f, 0.1f), 2) == Seq(0, 2))
    assert(LlmVector.topCells(cents, Seq(0.0f, 1.0f), 1) == Seq(1))
  }

  test("NearestCells expression mirrors topCells on real vectors, no UDF") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SF001).limit(64)
    val cents = LlmVector.ivfCentroids(emb, k = 7)
    Seq(1, 3, 7, 9).foreach { n => // n > k exercises the clamp
      val got = emb.select(col("vec_id"),
          org.apache.spark.sql.graft.NearestCells(col("embedding"), cents, n))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val want = emb.select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) ->
          LlmVector.topCells(cents, r.getSeq[Float](1), n)).toMap
      assert(got == want, s"n=$n")
    }
    // the assignment step must stay codegen-pure (VERDICT r4): no ScalaUDF
    val plan = SparkEntry.queries("llm_ann_ivf")(spark, SF001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"IVF plan still contains a UDF:\n$plan")
  }

  test("ivf run is deterministic and each probe gets exactly 5 ranked rows") {
    val q = SparkEntry.queries("llm_ann_ivf")
    val a = q(spark, SF01).collect().map(_.toString).toSeq
    val b = q(spark, SF01).collect().map(_.toString).toSeq
    assert(a == b)
    val perProbe = q(spark, SF01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq)
    assert(perProbe.values.forall(_ == Seq(1, 2, 3, 4, 5)))
  }

  test("recall@5 vs exact baseline beats the random-candidate floor") {
    val exact = SparkEntry.queries("llm_cosine_topk")(spark, SF01)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("llm_ann_ivf")(spark, SF01)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    // Shipped config (r4 AnnTune sweep): 48 cells, nProbe 19 ⇒ recall 0.90
    // @ 39.7 % scan at sf0.1 and EXACTLY 0.80 here at sf0.01 (floor-exact:
    // 48 cells over 500 vectors is ~10/cell of quantizer support). Both
    // numbers are deterministic on the pinned fixtures (seeded sample,
    // fixed Lloyd iterations), so the 0.8 pin cannot flake — but it has
    // ZERO headroom at this scale by measurement, not accident. If a
    // fixture regeneration ever lands below the floor, re-run
    // `runMain graft.AnnTune /root/testdata/sf0.01`; the r4 sweep already
    // measured (64, 26) at 0.94 @ 39.8 % scan on this corpus as the
    // small-N fallback.
    assert(recall >= 0.8, s"ivf recall@5 = $recall")
  }
}
