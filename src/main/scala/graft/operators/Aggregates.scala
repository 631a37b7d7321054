package graft.operators

import org.apache.spark.sql.functions._
import graft.Spec
import graft.functions.{Det, Sql}
import graft.sources.Tables

/** SURVEY.md §2.4 — aggregations.
  *
  * All of these compile to Spark's two-phase hash aggregate (partial
  * map-side combine + final after shuffle on the grouping keys) — the shape
  * that scales linearly with data volume. Float determinism: every measure
  * goes through [[Det]] decimal accumulation.
  */
object Aggregates {
  def specs: Seq[Spec] = Seq(aggHashGroup)

  /** TPC-H Q1 shape: the engine's flagship batch aggregate. */
  private val aggHashGroup = Spec(
    "agg_hash_group",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Sql.dsum("l_quantity", "sum_qty")},
       |  ${Sql.dsum("l_extendedprice", "sum_base_price")},
       |  CAST(SUM(${Sql.revenue}) AS DOUBLE) AS sum_disc_price,
       |  ${Sql.dsum6("l_extendedprice*(1-l_discount)*(1+l_tax)", "sum_charge")},
       |  ${Sql.davg("l_quantity", "avg_qty")},
       |  ${Sql.davg("l_extendedprice", "avg_price")},
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(Det.revenue).cast("double").as("sum_disc_price"),
        Det.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
