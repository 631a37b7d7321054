package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmVector
import graft.sources.Tables

/** llm_ann_ivfpq — the IVF-PQ compressed-resident ANN path. The row is
  * hash-exact oracle-checked (LlmVector.annIvfPqOracleSql replays both
  * quantizer trainings, the encoding, the ADC fold and the re-rank);
  * these tests pin the semantic quality and kernel invariants the hash
  * cannot express: recall floors against the exact baseline, encode/adc
  * bit-agreement with an independent JVM recomputation, tie semantics,
  * and determinism of the driver-side codebook training. */
class IvfPqSpec extends AnyFunSuite {
  import TestSpark._

  private def norm(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) v else v.map(_ / n)
  }

  test("pqCodebooks: deterministic, right shape, codes are subvector means") {
    val emb = Tables.embeddings(spark, SF01)
    val a = LlmVector.pqCodebooks(emb)
    val b = LlmVector.pqCodebooks(emb)
    assert(a.length == 16) // m subspaces
    assert(a.forall(book => book.length <= 32 && book.nonEmpty))
    assert(a.forall(_.forall(_.length == 4))) // subDim
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (p, q) => p.sameElements(q) }
    }, "PQ training must be deterministic (bounded sample by vec_id)")
    // sub-centroids are means, NOT renormalized: norms must vary and be
    // well under 1 for 4-dim slices of unit vectors
    val norms = a.flatten.map(c => math.sqrt(c.map(x => x * x).sum))
    assert(norms.max <= 1.0 + 1e-9 && norms.min < 0.9,
      s"sub-centroid norms look renormalized: [${norms.min}, ${norms.max}]")
  }

  test("PqEncode matches an independent JVM argmin, ties to lower code") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SF001).limit(32)
    val books = LlmVector.pqCodebooks(emb, iters = 2)
    val got = emb.select(col("vec_id"),
        org.apache.spark.sql.graft.PqEncode(col("embedding"), books, 4))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val want = emb.select(col("vec_id"), col("embedding")).collect().map { r =>
      val x = norm(r.getSeq[Float](1).toArray.map(_.toDouble))
      r.getLong(0) -> books.indices.map { j =>
        var best = Double.PositiveInfinity; var bc = 0
        for (c <- books(j).indices) {
          var s = 0.0
          for (d <- 0 until 4 if j * 4 + d < x.length) {
            val t = x(j * 4 + d) - books(j)(c)(d); s += t * t
          }
          if (s < best) { best = s; bc = c } // strict < keeps the lower code
        }
        bc
      }
    }.toMap
    assert(got.view.mapValues(_.toSeq).toMap ==
      want.view.mapValues(_.toSeq).toMap)
    // explicit tie witness: two identical codes -> the lower index wins
    val tieBooks = Array(Array(Array(1.0, 0.0, 0.0, 0.0),
      Array(1.0, 0.0, 0.0, 0.0)))
    import spark.implicits._
    val one = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val code = one.select(org.apache.spark.sql.graft.PqEncode(
        col("embedding"), tieBooks, 4)).collect()(0).getSeq[Int](0)
    assert(code == Seq(0))
  }

  test("PqAdc equals the reconstruction dot of the normalized probe") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SF001).limit(16)
    val books = LlmVector.pqCodebooks(emb, iters = 2)
    val enc = emb.select(col("vec_id"),
        org.apache.spark.sql.graft.PqEncode(col("embedding"), books, 4)
          .as("codes"),
        col("embedding"))
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("pe"))
    val got = enc.crossJoin(probe)
      .select(col("vec_id"),
        org.apache.spark.sql.graft.PqAdc(col("codes"), col("pe"), books, 4))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pe = norm(emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0)
      .getSeq[Float](0).toArray.map(_.toDouble))
    val want = enc.select(col("vec_id"), col("codes")).collect().map { r =>
      val codes = r.getSeq[Int](1)
      var s = 0.0
      for (dim <- 0 until 64 if dim < pe.length) {
        s += pe(dim) * books(dim / 4)(codes(dim / 4))(dim % 4)
      }
      r.getLong(0) -> s
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(v == want(k), s"vec $k: adc $v != manual ${want(k)}")
    }
  }

  test("ivfpq run is deterministic with exactly 5 ranked rows per probe") {
    val q = SparkEntry.queries("llm_ann_ivfpq")
    val a = q(spark, SF01).collect().map(_.toString).toSeq
    val b = q(spark, SF01).collect().map(_.toString).toSeq
    assert(a == b)
    val perProbe = q(spark, SF01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq)
    assert(perProbe.values.forall(_ == Seq(1, 2, 3, 4, 5)))
  }

  test("recall@5: the 64-deep re-rank recovers the coarse candidate ceiling") {
    val exact = SparkEntry.queries("llm_cosine_topk")(spark, SF01)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("llm_ann_ivfpq")(spark, SF01)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    // Measured frontier on the near-orthogonal fixtures (BASELINE r18):
    // (m=8, ks=16, R=16) 0.32 -> (m=8, ks=32, R=64) 0.74 ->
    // (m=16, ks=32, R=64) 0.86 at sf0.1; here at sf0.01 the 64-deep
    // shortlist recovers llm_ann_ivf's exact 0.80 candidate ceiling
    // (the coarse stage is shared, so PQ can never beat it). Pinned at
    // the same deterministic floor as IvfSpec.
    assert(recall >= 0.8, s"ivfpq recall@5 = $recall")
  }
}
