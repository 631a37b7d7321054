package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Spec
import graft.functions.{Det, Sql}
import graft.sources.Tables

/** Second-wave analytics surface: exact percentiles/median, pivot, ntile,
  * cross join, conditional-function family, and correlated subqueries
  * (exercising Catalyst's decorrelation — SURVEY.md §4 row 7).
  *
  * Percentile note: Spark `percentile` and DuckDB `quantile_cont` share the
  * same definition (linear interpolation a + (b−a)·frac over the ordered
  * set), and the interpolation arithmetic is the same IEEE sequence, so
  * results hash-match. Exact percentiles need the full sorted group —
  * fine per group at any scale (grouped by l_returnflag here); for a
  * whole-table percentile at 100 TB you'd reach for approx_percentile
  * (t-digest) instead, the same trade as agg_approx_distinct.
  */
object Analytics {
  def specs: Seq[Spec] = Seq(percentiles, pivotStatus, ntileBuckets,
    crossJoin, conditionals, subqueries)

  private val percentiles = Spec(
    "agg_percentile",
    """SELECT l_returnflag,
      |  median(l_quantity)              AS med_qty,
      |  quantile_cont(l_quantity, 0.25) AS p25_qty,
      |  quantile_cont(l_quantity, 0.90) AS p90_qty,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_quantity, 0.25)").as("p25_qty"),
        expr("percentile(l_quantity, 0.90)").as("p90_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Pivot order counts + revenue: status rows × priority columns. The
    * DataFrame `pivot` with an explicit value list compiles to one
    * hash aggregate with CASE projections — same shape as the SQL mirror,
    * no extra shuffle for the pivot itself. */
  private val pivotStatus = Spec(
    "pivot_status",
    s"""SELECT o_orderstatus,
       |  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS urgent,
       |  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 END), 0) AS BIGINT) AS high,
       |  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW'    THEN 1 END), 0) AS BIGINT) AS low
       |FROM orders GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "5-LOW"))
      .agg(count(lit(1)))
      .select(col("o_orderstatus"),
        coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
        coalesce(col("2-HIGH"), lit(0L)).as("high"),
        coalesce(col("5-LOW"), lit(0L)).as("low"))
      .orderBy(col("o_orderstatus"))
  }

  /** NTILE quartiles of customers by account balance (deterministic via
    * full tiebreak on the key). */
  private val ntileBuckets = Spec(
    "win_ntile",
    s"""SELECT quartile, COUNT(*) AS n_customers,
       |  ${Sql.dsum("c_acctbal", "sum_bal")}
       |FROM (SELECT c_acctbal,
       |        NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
       |      FROM customer)
       |GROUP BY quartile ORDER BY quartile""".stripMargin) { (s, d) =>
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_acctbal"), ntile(4).over(w).as("quartile"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        Det.dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("quartile"))
  }

  /** Explicit cross join of the two tiny dims (the only place a cartesian
    * is ever acceptable: both sides O(1)). */
  private val crossJoin = Spec(
    "join_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.region(s, d).select(col("r_name"))
      .crossJoin(Tables.nation(s, d).select(col("n_name")))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Conditional/null-handling family: coalesce, nullif, nvl2-equivalent,
    * CASE over nullable join results. */
  private val conditionals = Spec(
    "fn_conditional",
    """SELECT c.c_custkey,
      |  COALESCE(o.n_orders, 0)                 AS n_orders,
      |  CASE WHEN o.n_orders IS NULL THEN 'none'
      |       WHEN o.n_orders >= 15   THEN 'many' ELSE 'some' END AS band,
      |  NULLIF(COALESCE(o.n_orders, 0), 0)      AS n_or_null,
      |  (o.n_orders IS NOT NULL)                AS has_orders
      |FROM customer c
      |LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders
      |           FROM orders GROUP BY o_custkey) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        when(col("n_orders").isNull, "none")
          .when(col("n_orders") >= 15, "many")
          .otherwise("some").as("band"),
        nullif(coalesce(col("n_orders"), lit(0L)), lit(0L)).as("n_or_null"),
        col("n_orders").isNotNull.as("has_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Correlated scalar + IN subqueries through the SQL surface — Catalyst
    * decorrelates both into joins (no per-row re-execution; the plan is a
    * left join + aggregate, which is what scales). */
  private val subqueries = Spec(
    "subquery_correlated",
    """SELECT c_custkey, c_name,
      |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("graft_sq_customer")
    Tables.orders(s, d).createOrReplaceTempView("graft_sq_orders")
    s.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT COUNT(*) FROM graft_sq_orders WHERE o_custkey = c_custkey)
        |    AS n_orders
        |FROM graft_sq_customer
        |WHERE c_custkey IN (SELECT o_custkey FROM graft_sq_orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }
}
