package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** llm_multimodal_decode — the PNG encode→decode round-trip must return
  * exactly the features computable from the source text (PNG is lossless
  * and the render arithmetic is deterministic). The DuckDB oracle asserts
  * the same at sf0.01; this pins it in-JVM at sf0.001 so a codec or
  * arithmetic regression fails fast in the suite. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("decoded PNG features equal the from-text prediction for every doc") {
    val rows = SparkEntry.queries("llm_multimodal_decode")(spark, SF001)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = graft.sources.Tables.documents(spark, SF001)
      .select(col("doc_id"), col("text")).collect()
    assert(docs.length == rows.size)
    docs.foreach { r =>
      val cps = r.getString(1).codePoints().toArray
      val n = cps.length
      val w = (n % 32) + 4
      val h = (n % 24) + 3
      var checksum = 0L
      var i = 0
      while (i < w * h) {
        val b = if (n == 0) 0 else cps(i % n) % 256
        checksum += (i + 1).toLong * b
        i += 1
      }
      assert(rows(r.getLong(0)) == ((w.toLong, h.toLong, w.toLong * h,
        checksum)), s"doc ${r.getLong(0)}")
    }
  }
}
