package graft.operators

import org.apache.spark.sql.functions._
import graft.Spec
import graft.functions.{Det, Sql}
import graft.sources.Tables

/** SURVEY.md §2.6 — sort / limit / pagination.
  *
  * Scale posture: a global ORDER BY is a range-partitioned sort (sampled
  * bounds, no single-node bottleneck); ORDER BY + LIMIT k plans as
  * TakeOrderedAndProject — per-partition top-k then a k-row driver merge,
  * which is the only safe global-top-k shape at 100 TB. Every ordering
  * carries a full tiebreak (§7.4.5).
  */
object SortLimit {
  def specs: Seq[Spec] = Seq(sortMulti, limitTopk, offsetPage)

  /** Total-order multi-key sort of per-customer revenue. */
  private val sortMulti = Spec(
    "sort_multi",
    s"""SELECT o_custkey, ${Sql.dsum("o_totalprice", "revenue")},
       |       COUNT(*) AS n_orders
       |FROM orders GROUP BY o_custkey
       |ORDER BY revenue DESC, o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(Det.dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("o_custkey"))
  }

  /** Global top-10 by price (TakeOrderedAndProject). */
  private val limitTopk = Spec(
    "limit_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
  }

  /** LIMIT/OFFSET page 2 with full tiebreak (deterministic pagination). */
  private val offsetPage = Spec(
    "offset_page",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(10)
        .limit(10)
  }
}
