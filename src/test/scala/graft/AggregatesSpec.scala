package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MoneyStats
import graft.sources.Tables

class AggregatesSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_approx_distinct is within HLL rsd bound of exact") {
    // The query output IS the check now (within-band boolean next to the
    // exact count); assert the band holds and the exact side agrees with
    // an independent countDistinct.
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, SF01)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val exact = Tables.events(spark, SF01)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val (ex, ok) = rows(k)
      assert(ex == n, s"$k: exact_users $ex != independent $n")
      assert(ok, s"$k: approx outside the 5% band of $n")
    }
  }

  test("agg_unpivot melts to exactly rows×metrics and preserves totals") {
    val out = SparkEntry.queries("agg_unpivot")(spark, SF01)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val li = Tables.lineitem(spark, SF01)
    val n = li.count()
    assert(out.keySet == Set("l_quantity", "l_extendedprice",
      "l_discount", "l_tax"))
    out.foreach { case (m, (total, cnt)) =>
      assert(cnt == n, s"$m: melted count $cnt != $n rows")
      val direct = li.agg(graft.functions.Det.dsum(col(m)))
        .collect()(0).getDouble(0)
      assert(total == direct, s"$m: melted total $total != direct $direct")
    }
  }

  test("agg_sketch_hll merged estimate stays in band and exact side agrees") {
    val rows = SparkEntry.queries("agg_sketch_hll")(spark, SF01)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val exact = Tables.orders(spark, SF01)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val (ex, ok) = rows(k)
      assert(ex == n, s"$k: exact_custs $ex != independent $n")
      assert(ok, s"$k: merged-sketch estimate outside the 25% band of $n")
    }
    // The TIGHT accuracy bar lives here, not in the oracle row (ADVICE
    // r4): recompute the merged estimate from the sketches directly and
    // hold it to ±5 % (3σ at lgK=12) where a flake is attributable,
    // while the hash-checked flag above only risks flipping at ~15σ.
    val est = Tables.orders(spark, SF01)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .groupBy(col("o_orderstatus"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= n * 0.05,
        s"$k: merged estimate ${est(k)} outside the 5% band of $n")
    }
    // Mergeability is the point: the union of per-priority sketches must
    // estimate the status-level cardinality, not the sum of the parts
    // (overlapping customer sets would inflate a naive sum).
    val naiveSum = Tables.orders(spark, SF01)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .groupBy(col("o_orderstatus")).agg(sum(col("n")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(naiveSum(k) > n,
        s"$k: fixture has no cross-priority customer overlap — the " +
          "merge-vs-sum distinction this test pins would be vacuous")
    }
  }

  test("MoneyStats computes exact count/mean/population variance") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("k", "v")
    val stats = udaf(new MoneyStats)
    val rows = df.groupBy($"k").agg(stats($"v").as("st"))
      .select($"k", $"st._1", $"st._2", $"st._3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(rows(0)._2 == 3L)
    assert(math.abs(rows(0)._3 - 2.0) < 1e-12)        // mean of 1,2,3
    assert(math.abs(rows(0)._4 - 2.0 / 3) < 1e-9)     // pop var of 1,2,3
    assert(rows(1) == (("b", 1L, 10.0, 0.0)))
  }

  test("MoneyStats merge is partition-order independent") {
    import spark.implicits._
    val vals = (1 to 1000).map(i => ("k", i * 0.37))
    val stats = udaf(new MoneyStats)
    def run(parts: Int) =
      vals.toDF("k", "v").repartition(parts).groupBy($"k")
        .agg(stats($"v").as("st")).select($"st._2", $"st._3")
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    assert(run(1) == run(7), "different partitionings must agree exactly")
  }

  test("rollup row count = detail + per-nation subtotal + grand total") {
    val df = SparkEntry.queries("agg_rollup")(spark, SF001)
    val rows = df.collect()
    val detail = rows.count(r => !r.isNullAt(0) && !r.isNullAt(1))
    val nation = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val grand = rows.count(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand == 1)
    assert(rows.length == detail + nation + grand)
  }
}
