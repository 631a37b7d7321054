package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Loud, attributable detection of driver fixture regeneration.
  *
  * The driver regenerated `/root/testdata` in place once already
  * (2026-08-13: every timestamp column's physical parquet type changed,
  * breaking 79 tests through one loader assumption). This suite pins the
  * LOGICAL schema contract every registered query compiles against, so the
  * next regeneration that moves a type fails HERE, in one named test with
  * a diff-shaped message — not as scattered failures or an opaque driver
  * hash mismatch. Values/row counts are deliberately not pinned (the
  * oracle gate recomputes those from the same files); only the
  * names+types surface the queries are written against is.
  */
class FixtureContractSpec extends AnyFunSuite {
  import TestSpark._

  /** name -> expected Spark schema as (column, simpleString type) pairs.
    * `events` goes through Tables.events and must surface the NORMALIZED
    * ts (session-local TIMESTAMP µs) regardless of fixture generation;
    * the naive fixture timestamps read as timestamp_ntz. */
  private val contract: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  // All three scale factors, INCLUDING the bench fixture sf0.1 (VERDICT
  // r10 #2): before this, a regeneration that changed only sf0.1 would
  // surface as an opaque bench/oracle mismatch instead of a named test.
  // Cost note: the schema test is a footer read; the post-epoch domain
  // test below it DOES scan the events column at each sf (events is the
  // third-smallest table — ~100k rows at sf0.1, sub-second).
  for (sf <- Seq(SF001, SF01, SF1)) {
    test(s"events.ts stays in the post-epoch domain at $sf") {
      // ADVICE r10 #2: the legacy ns→µs path converts with `div`
      // (truncation toward zero), which equals DuckDB's epoch_us()
      // truncation ONLY for non-negative timestamps — pre-epoch values
      // would diverge by 1 µs whenever the ns tail is nonzero. The
      // fixture domain has been all-2024+ in every generation; pin that
      // here so a regeneration introducing pre-epoch events fails as one
      // named test telling the fixer to re-check BOTH engines'
      // conversion conventions together (Tables.normalizeTs comment).
      import org.apache.spark.sql.functions._
      val minTs = Tables.events(spark, sf)
        .agg(min(unix_micros(col("ts")))).collect()(0).getLong(0)
      assert(minTs > 0,
        s"pre-epoch event timestamp (min epoch-µs $minTs) — the div-" +
          "truncation/epoch_us parity assumption no longer holds; " +
          "re-derive the ns→µs conversion on both engines")
    }

    test(s"fixture logical schemas match the query contract at $sf") {
      val drift = contract.toSeq.sortBy(_._1).flatMap { case (name, exp) =>
        val df = if (name == "events") Tables.events(spark, sf)
                 else Tables.load(spark, sf, name)
        val got = df.schema.fields
          .map(f => f.name -> f.dataType.simpleString).toSeq
        if (got == exp) Nil
        else Seq(s"$name:\n  expected $exp\n  got      $got")
      }
      assert(drift.isEmpty,
        "fixture schema drift (driver regeneration?) — re-run the full " +
          "verify matrix and update FixtureContractSpec/FIXTURES.md:\n" +
          drift.mkString("\n"))
    }
  }
}
