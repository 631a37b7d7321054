package graft.operators

import org.apache.spark.sql.functions._
import graft.Spec
import graft.sources.Tables

/** Table-maintenance operators — the jobs that keep a 100 TB dataset
  * usable between queries: CDC upserts folded into a base table and
  * one-pass column profiling. (Small-file compaction, the third member of
  * this family, lives in [[Scans]] as `sink_compacted`.)
  */
object Maintenance {
  def specs: Seq[Spec] = Seq(mergeUpsert, profileColumns)

  /** MERGE INTO semantics on vanilla Spark: a deterministic change feed
    * (updates for keys ≡0 mod 10, deletes for ≡1, inserts for ≡2 at
    * shifted keys) folded into the base table as one left join + filter +
    * union — matched-update, matched-delete, and not-matched-insert in a
    * single pass over the base. The join is keyed on the table key, so at
    * 100 TB it co-partitions with the base's layout; a real CDC batch is
    * small relative to the base and broadcasts (hinted here), making the
    * whole merge map-side — the base is never shuffled. The update
    * multiplies a double by 1.1 on both engines (same IEEE operands ⇒
    * bit-identical), so the oracle hash-checks every merged value.
    *
    * Insert rows are excluded from the matched-side join IN BOTH the
    * engine and the oracle SQL (not just the engine): if a regenerated
    * fixture ever grows orderkeys past the 1e7 insert-key shift, an
    * asymmetric join would silently turn colliding inserts into matches
    * on one side only — the r4 review caught exactly that latent skew. */
  private val mergeUpsert = Spec(
    "merge_upsert",
    """WITH ch AS (
      |  SELECT o_orderkey AS k, 'U' AS op, o_totalprice * 1.1 AS new_price
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'D', NULL FROM orders WHERE o_orderkey % 10 = 1
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 'I', o_totalprice
      |  FROM orders WHERE o_orderkey % 10 = 2)
      |SELECT * FROM (
      |  SELECT b.o_orderkey,
      |    COALESCE(c.new_price, b.o_totalprice) AS o_totalprice,
      |    CASE WHEN c.op = 'U' THEN 'updated' ELSE 'kept' END AS action
      |  FROM orders b LEFT JOIN (SELECT * FROM ch WHERE op <> 'I') c
      |    ON b.o_orderkey = c.k
      |  WHERE c.op IS NULL OR c.op <> 'D'
      |  UNION ALL
      |  SELECT k, new_price, 'inserted' FROM ch WHERE op = 'I')
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
    val src = base.withColumn("m", pmod(col("o_orderkey"), lit(10)))
    val changes = src.filter(col("m") === 0)
      .select(col("o_orderkey").as("k"), lit("U").as("op"),
        (col("o_totalprice") * 1.1d).as("new_price"))
      .unionAll(src.filter(col("m") === 1)
        .select(col("o_orderkey").as("k"), lit("D").as("op"),
          lit(null).cast("double").as("new_price")))
      .unionAll(src.filter(col("m") === 2)
        .select((col("o_orderkey") + 10000000L).as("k"), lit("I").as("op"),
          col("o_totalprice").as("new_price")))
    val merged = base
      .join(broadcast(changes.filter(col("op") =!= "I")),
        col("o_orderkey") === col("k"), "left")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("o_orderkey"),
        coalesce(col("new_price"), col("o_totalprice")).as("o_totalprice"),
        when(col("op") === "U", "updated").otherwise("kept").as("action"))
      .unionAll(changes.filter(col("op") === "I")
        .select(col("k").as("o_orderkey"),
          col("new_price").as("o_totalprice"),
          lit("inserted").as("action")))
    merged.orderBy(col("o_orderkey"))
  }

  /** One-pass column profiler — the ANALYZE/data-quality step every
    * ingestion pipeline runs before trusting a drop: per-column null
    * count, distinct count, and min/max, computed in a SINGLE aggregate
    * over a single scan (PlanSpec asserts it) and then unpivoted to one
    * row per column. Adding a 50th column adds expressions, not passes.
    * Min/max are emitted as strings so one schema fits every column type;
    * only exactly-rendered types participate (integers and strings —
    * doubles would diverge on formatting, the fn_math lesson). */
  private val profileColumns = Spec(
    "profile_columns",
    """SELECT * FROM (
      |  SELECT 'o_orderkey' AS col_name,
      |    COUNT(*) - COUNT(o_orderkey) AS n_nulls,
      |    COUNT(DISTINCT o_orderkey) AS n_distinct,
      |    CAST(MIN(o_orderkey) AS VARCHAR) AS vmin,
      |    CAST(MAX(o_orderkey) AS VARCHAR) AS vmax
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
      |    COUNT(DISTINCT o_custkey),
      |    CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
      |    COUNT(DISTINCT o_orderstatus),
      |    MIN(o_orderstatus), MAX(o_orderstatus)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
      |    COUNT(DISTINCT o_orderpriority),
      |    MIN(o_orderpriority), MAX(o_orderpriority)
      |  FROM orders)
      |ORDER BY col_name""".stripMargin) { (s, d) =>
    def prof(c: String, asString: Boolean) = struct(
      lit(c).as("col_name"),
      (count(lit(1)) - count(col(c))).as("n_nulls"),
      countDistinct(col(c)).as("n_distinct"),
      (if (asString) min(col(c)) else min(col(c)).cast("string")).as("vmin"),
      (if (asString) max(col(c)) else max(col(c)).cast("string")).as("vmax"))
    Tables.orders(s, d)
      .agg(array(
        prof("o_orderkey", asString = false),
        prof("o_custkey", asString = false),
        prof("o_orderstatus", asString = true),
        prof("o_orderpriority", asString = true)).as("profiles"))
      .select(explode(col("profiles")).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.vmin"), col("p.vmax"))
      .orderBy(col("col_name"))
  }
}
