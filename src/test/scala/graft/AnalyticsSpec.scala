package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bounds for the estimate-class analytics queries and algebraic checks
  * for the moment-derived statistics. */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_percentile lands within the exact quartile neighborhood") {
    val exact = SparkEntry.queries("agg_percentile")(spark, SF01)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3)))
      .toMap // flag -> (median, p90)
    val approx = SparkEntry.queries("agg_approx_percentile")(spark, SF01)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    approx.foreach { case (flag, (ap50, ap90)) =>
      val (m, p90) = exact(flag)
      assert(math.abs(ap50 - m) <= 2.0, s"$flag median: $ap50 vs $m")
      assert(math.abs(ap90 - p90) <= 2.0, s"$flag p90: $ap90 vs $p90")
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
