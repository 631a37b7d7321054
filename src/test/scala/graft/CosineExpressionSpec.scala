package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CosineSimilarity
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmVector

/** The native codegen'd cosine expression: SQL registration, interpreted vs
  * generated parity, and bit-equality with the pure JVM kernel (which is
  * itself the DuckDB oracle-mirror contract). */
class CosineExpressionSpec extends AnyFunSuite {
  import TestSpark._

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(2.0f, 3.0f, 4.0f)),
      (2L, Array(-1.0f, 0.5f, 0.0f), Array(1.0f, 0.5f, -2.0f)),
      (3L, Array(0.25f, 0.25f, 0.25f), Array(4.0f, 4.0f, 4.0f))
    ).toDF("id", "a", "b")
  }

  test("expression matches the pure JVM kernel bit-for-bit") {
    val rows = vecs.withColumn("c", CosineSimilarity(col("a"), col("b")))
      .collect()
    rows.foreach { r =>
      val expected = LlmVector.cosine(
        r.getSeq[Float](1).toArray, r.getSeq[Float](2).toArray)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(expected))
    }
  }

  test("graft_cosine is callable from SQL after registration") {
    CosineSimilarity.register(spark)
    vecs.createOrReplaceTempView("graft_cosine_test")
    val out = spark.sql(
      "SELECT id, graft_cosine(a, b) AS c FROM graft_cosine_test ORDER BY id")
      .collect()
    assert(out.length == 3)
    assert(math.abs(out(2).getDouble(1) - 1.0) < 1e-12) // parallel vectors
  }

  test("expression survives whole-stage codegen (no fallback)") {
    // run with codegen fallback disabled: if doGenCode were broken this throws
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = vecs.withColumn("c", CosineSimilarity(col("a"), col("b")))
        .filter(col("c") > -2).count()
      assert(n == 3)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("null inputs yield null, not a crash") {
    import spark.implicits._
    val df = Seq((1L, Option(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("id", "a", "b")
      .withColumn("c", CosineSimilarity(col("a"), col("b")))
    assert(df.collect().head.isNullAt(2))
  }
}
