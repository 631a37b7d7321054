package graft.operators

import org.apache.spark.sql.functions._
import graft.Spec
import graft.sources.Tables

/** SURVEY.md §2.2 — projection / filter / predicates.
  *
  * All predicates here are sargable (no UDF wrapping), so Catalyst pushes
  * them into the parquet scan (`PushedFilters` in explain) — at 100 TB this
  * is row-group/page skipping, the single biggest scan win.
  */
object FilterProject {
  def specs: Seq[Spec] = Seq(project, filterPred, filterDate, likeFamily)

  /** Column subset + computed column. Per-row double arithmetic is
    * bit-identical across engines (same IEEE ops in the same order), so no
    * decimal dance is needed without aggregation. */
  private val project = Spec(
    "project",
    """SELECT l_orderkey, l_linenumber,
      |       l_extendedprice * (1 - l_discount) AS net
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Conjunction/disjunction, BETWEEN, IN, LIKE, IS NOT NULL. */
  private val filterPred = Spec(
    "filter_pred",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
      |FROM lineitem
      |WHERE (l_returnflag = 'A' OR l_linestatus = 'O')
      |  AND l_quantity BETWEEN 10 AND 20
      |  AND l_returnflag IN ('A', 'N')
      |  AND l_shipdate IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter((col("l_returnflag") === "A" || col("l_linestatus") === "O")
        && col("l_quantity").between(10, 20)
        && col("l_returnflag").isin("A", "N")
        && col("l_shipdate").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_linestatus"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** The pattern-predicate family beyond [[filterPred]]'s plain LIKE-less
    * conjunctions: `LIKE` with wildcards, `ILIKE` (case-insensitive,
    * Spark 3.3+), `RLIKE` (regexp), and `LIKE … ESCAPE` (matching a
    * literal `_`/`%`). Emitted as BOOLEAN COLUMNS over every row rather
    * than as WHERE clauses, so both match and non-match paths of each
    * predicate are hash-checked (a filter-only spelling would silently
    * pass if a predicate degenerated to all-false). LIKE/ILIKE compile
    * to codegen'd string matchers (prefix/suffix/contains specialize to
    * startsWith/endsWith/contains — no regex engine); RLIKE is the one
    * real regex and is priced accordingly at 100 TB. DuckDB: ILIKE
    * native, RLIKE as regexp_matches. */
  private val likeFamily = Spec(
    "filter_like_family",
    """SELECT p_partkey,
      |  p_name LIKE '%widget%' AS is_widget,
      |  p_name ILIKE 'COLD%' AS cold_ci,
      |  regexp_matches(p_name, '^(small|large) ') AS sized,
      |  p_name LIKE '%$_%' ESCAPE '$' AS has_underscore
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_name").like("%widget%").as("is_widget"),
        col("p_name").ilike("COLD%").as("cold_ci"),
        col("p_name").rlike("^(small|large) ").as("sized"),
        expr("p_name LIKE '%$_%' ESCAPE '$'").as("has_underscore"))
      .orderBy(col("p_partkey"))
  }

  /** Event-time range predicate — the pattern partition pruning keys on
    * when the table is date-partitioned at scale. */
  private val filterDate = Spec(
    "filter_date",
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-07-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
}
