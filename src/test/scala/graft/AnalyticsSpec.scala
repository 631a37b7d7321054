package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bounds for the estimate-class analytics queries and algebraic checks
  * for the moment-derived statistics. */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_percentile lands within the exact quartile neighborhood") {
    // The query output IS the check now (oracle-checkable band booleans
    // next to the exact percentiles); assert the bands hold and the exact
    // side agrees with agg_percentile's independent computation.
    val exact = SparkEntry.queries("agg_percentile")(spark, SF01)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3)))
      .toMap // flag -> (median, p90)
    val rows = SparkEntry.queries("agg_approx_percentile")(spark, SF01)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      val (m, p90) = exact(flag)
      assert(r.getDouble(1) == m, s"$flag p50 mismatch vs agg_percentile")
      assert(r.getDouble(2) == p90, s"$flag p90 mismatch vs agg_percentile")
      assert(r.getBoolean(3), s"$flag: approx p50 outside ±2 of exact")
      assert(r.getBoolean(4), s"$flag: approx p90 outside ±2 of exact")
    }
  }

  test("moment-derived variance is non-negative and stddev² == variance") {
    val rows = SparkEntry.queries("agg_stats_moments")(spark, SF001).collect()
    rows.foreach { r =>
      val varPop = r.getAs[Double]("var_pop_q")
      val std = r.getAs[Double]("stddev_pop_q")
      assert(varPop >= 0)
      assert(math.abs(std * std - varPop) < 1e-9 * math.max(1.0, varPop))
    }
  }

  test("moment-derived stats agree with Spark built-ins to float tolerance") {
    import org.apache.spark.sql.functions._
    val builtin = graft.sources.Tables.lineitem(spark, SF001)
      .groupBy(col("l_returnflag"))
      .agg(var_pop(col("l_quantity")).as("v"),
        covar_pop(col("l_quantity"), col("l_discount")).as("cv"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    SparkEntry.queries("agg_stats_moments")(spark, SF001).collect()
      .foreach { r =>
        val (v, cv) = builtin(r.getString(0))
        assert(math.abs(r.getAs[Double]("var_pop_q") - v) < 1e-6 * (1 + v))
        assert(math.abs(r.getAs[Double]("covar_pop_qd") - cv) < 1e-6)
      }
  }
}
