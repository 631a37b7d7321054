package graft.operators

import org.apache.spark.sql.functions._
import graft.Spec
import graft.sources.Tables

/** SURVEY.md §2.7 — set operations. All four plan as shuffles on the full
  * row (distinct forms) or plain concatenation (union all) — no surprises
  * at scale. */
object SetOps {
  def specs: Seq[Spec] = Seq(unionAll, unionDistinct, intersect, exceptOp,
    intersectAll, exceptAll, unionByName)

  /** `unionByName(allowMissingColumns = true)` — the schema-evolution-
    * tolerant concatenation. Positional `union` silently mis-binds the
    * moment two branch schemas drift (same arity, different order ⇒
    * wrong columns, zero errors), which at 100 TB is exactly what
    * happens when a daily-append pipeline adds a column to new
    * partitions only; by-name resolution pads the missing column with
    * typed NULLs instead. The two branches here project DIFFERENT,
    * differently-ordered column sets from orders (F-orders carry price,
    * O-orders carry custkey), so a positional union would either throw
    * or bind o_custkey under o_totalprice — the output nulls prove the
    * by-name path ran. Plans as plain concatenation (no shuffle); the
    * oracle spells the padding with explicit typed NULL branches. */
  private val unionByName = Spec(
    "set_union_byname",
    """SELECT o_orderkey, o_totalprice, CAST(NULL AS BIGINT) AS o_custkey
      |FROM orders WHERE o_orderstatus = 'F'
      |UNION ALL
      |SELECT o_orderkey, CAST(NULL AS DOUBLE), o_custkey
      |FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
      .unionByName(
        o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"), col("o_orderkey")),
        allowMissingColumns = true)
      .orderBy(col("o_orderkey"))
  }

  /** Bag-semantics INTERSECT ALL: multiplicity = min of the two sides —
    * run on a duplicate-heavy projection (customer keys of multi-order
    * customers) so the ALL semantics are actually exercised. Plans as a
    * count-per-row aggregate on each side + join (Spark rewrites it via
    * `replicate_rows`), all key-partitioned. */
  private val intersectAll = Spec(
    "set_intersect_all",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersectAll(
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** Bag-semantics EXCEPT ALL: multiplicity = max(0, left − right). */
  private val exceptAll = Spec(
    "set_except_all",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .exceptAll(
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  private def urgent(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
  private def high(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_orderkey"), col("o_custkey"))

  private val unionAll = Spec(
    "set_union_all",
    """SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    urgent(s, d).union(high(s, d)).orderBy(col("o_orderkey"))
  }

  private val unionDistinct = Spec(
    "set_union_distinct",
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    urgent(s, d).select(col("o_custkey"))
      .union(high(s, d).select(col("o_custkey")))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  private val intersect = Spec(
    "set_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  private val exceptOp = Spec(
    "set_except",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }
}
