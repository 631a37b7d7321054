package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

class JoinsSpec extends AnyFunSuite {
  import TestSpark._

  test("semi + anti partition the left table") {
    val c = Tables.customer(spark, SF001)
    val e = Tables.events(spark, SF001)
    val semi = c.join(e, col("c_custkey") === col("user_id"), "left_semi")
    val anti = c.join(e, col("c_custkey") === col("user_id"), "left_anti")
    assert(semi.count() + anti.count() == c.count())
    assert(semi.intersect(anti).count() == 0)
  }

  test("left outer keeps every left row at least once") {
    val df = SparkEntry.queries("join_left_outer")(spark, SF001)
    val customers = Tables.customer(spark, SF001).count()
    assert(df.select(col("c_custkey")).distinct().count() == customers)
  }

  test("inner join row count equals orders (FK integrity)") {
    val df = SparkEntry.queries("join_inner_hash")(spark, SF001)
    assert(df.count() == Tables.orders(spark, SF001).count())
  }

  test("as-of join matches hand-computed latest order on a tiny frame") {
    import spark.implicits._
    val e = Seq((1L, 10L, "2024-01-10 00:00:00"),
      (2L, 10L, "2024-01-01 00:00:00"))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
    val o = Seq((100L, 10L, "2024-01-05 00:00:00"),
      (101L, 10L, "2024-01-08 00:00:00"),
      (102L, 10L, "2024-02-01 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", $"o_orderdate".cast("timestamp"))
    val got = e.join(o,
        $"o_custkey" === $"user_id" && $"o_orderdate" <= $"ts", "left")
      .groupBy($"event_id")
      .agg(max($"o_orderdate").as("last_order_date"),
        count($"o_orderkey").as("n_prior_orders"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)).map(_.toString), r.getLong(2)))).toMap
    assert(got(1L) == ((Some("2024-01-08 00:00:00.0"), 2L)))
    assert(got(2L) == ((None, 0L))) // no order at-or-before → left semantics
  }

  test("theta-range band only counts clicks within the window") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, "purchase", "2024-01-01 10:00:00"),
      (2L, 7L, "click", "2024-01-01 09:55:00"),  // inside 10-min band
      (3L, 7L, "click", "2024-01-01 09:45:00"),  // outside
      (4L, 8L, "click", "2024-01-01 09:59:00"))  // other user
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("ts", $"ts".cast("timestamp"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_event_id"), $"user_id".as("p_user_id"),
        $"ts".as("p_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user_id"), $"ts".as("c_ts"),
        $"event_id".as("c_event_id"))
    val got = p.join(c,
        $"p_user_id" === $"c_user_id"
          && $"c_ts" > $"p_ts" - expr("INTERVAL 10 MINUTE")
          && $"c_ts" <= $"p_ts", "left")
      .groupBy($"p_event_id").agg(count($"c_event_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  test("join_fuzzy blocking finds every pair the all-pairs scan finds") {
    // reference: an independent all-pairs edit-distance scan over the
    // (tiny) distinct-name set, under the operator's declared contract —
    // pairs within length gap 1 and distance 2. (A distance-2 pair CAN
    // sit at length gap 2 — two same-direction indels; the length±1
    // blocking key excludes those by design, in the oracle too.)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.sources.Tables.part(spark, SF001)
      .select(org.apache.spark.sql.functions.col("p_name"))
      .distinct().collect().map(_.getString(0))
    val exp = (for {
      x <- names; y <- names
      if x < y && math.abs(x.length - y.length) <= 1 && lev(x, y) <= 2
    } yield (x, y, lev(x, y).toLong)).toSet
    val got = SparkEntry.queries("join_fuzzy")(spark, SF001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == exp)
    assert(got.nonEmpty, "fixture must contain at least one fuzzy pair")
  }

  test("rangeDayAgg == rangeBinAgg, including time-of-day points") {
    // The round-16 day-pre-aggregated rewrite must be result-identical
    // to the residual-checked bin join on the fixture AND on a
    // synthetic where POINTS carry time-of-day (the rewrite's exactness
    // claim: only INTERVAL starts need day alignment).
    import graft.operators.Joins
    val iv = Tables.orders(spark, SF001)
      .filter(pmod(col("o_orderkey"), lit(499)) === 0)
    val pts = Tables.lineitem(spark, SF001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq
    val fixture = canon(Joins.rangeDayAgg(iv, pts))
    assert(fixture == canon(Joins.rangeBinAgg(iv, pts)),
      "day rewrite diverged from the residual bin join on the fixture")
    assert(fixture.nonEmpty)
    // time-of-day points: shift every shipdate by +13h37m — day
    // membership of some points changes relative to nothing (the
    // interval bound comparisons must still agree between both paths)
    val shifted = pts.withColumn("l_shipdate",
      col("l_shipdate") + expr("INTERVAL 13 HOURS 37 MINUTES"))
    assert(canon(Joins.rangeDayAgg(iv, shifted))
        == canon(Joins.rangeBinAgg(iv, shifted)),
      "day rewrite diverged on time-of-day points")
  }

  test("rangeDayAgg refuses time-of-day interval starts loudly") {
    import graft.operators.Joins
    val iv = Tables.orders(spark, SF001)
      .filter(pmod(col("o_orderkey"), lit(499)) === 0)
      .withColumn("o_orderdate",
        col("o_orderdate") + expr("INTERVAL 1 HOUR"))
    // Round 17: the guard now rides the ivDays pass as a raise_error
    // branch of the sd computation (no extra eager action per
    // construction), so it surfaces at execution as Spark's
    // USER_RAISED_EXCEPTION — unwrap to the root message.
    val e = intercept[Exception] {
      Joins.rangeDayAgg(iv, Tables.lineitem(spark, SF001)).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("day-aligned")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
  }

  test("CBO trusts the catalog: stale stats keep the stale join order") {
    // VERDICT r19 #7 — the operational hazard opt_cbo_reorder's
    // fresh-stats witness doesn't show: CBO reads what ANALYZE recorded,
    // not what's on disk. Note Spark protects the CATALOG write path —
    // an INSERT INTO invalidates the target's stats (verified while
    // building this test: with stats gone, reorder skips and the written
    // order survives) — so the hazard is OUT-OF-BAND growth: files
    // land in an external table's directory from another engine or a
    // distcp, which is exactly how a 100 TB lakehouse dim grows. Stage a
    // star join (fact 20k rows; external dim_a ANALYZEd at 5 rows; dim_b
    // at 500), append 20k rows straight into dim_a's directory, REFRESH
    // (reads see them; stats don't). The optimizer still bottom-joins
    // the now-huge dim_a, and one fresh ANALYZE flips the plan to dim_b.
    // The query is WRITTEN dim_b-first, so the stale outcome (dim_a at
    // the bottom) also proves reorder FIRED on the stale numbers rather
    // than keeping the written order.
    val s = spark
    val fact = "graft_cbostale_fact"
    val dimA = "graft_cbostale_dima"
    val dimB = "graft_cbostale_dimb"
    val dimADir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_p${graft.operators.Scans.jvmTag}_cbostale_dima")
    def bottomJoin(q: String): String = {
      val joins = s.sql(q).queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.nonEmpty, "no Join in the optimized plan")
      joins.last.toString
    }
    val cboKeys =
      Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = cboKeys.map(k => k -> s.conf.getOption(k))
    try {
      Seq(fact, dimA, dimB).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      graft.operators.Scans.rmRecursive(dimADir)
      s.sql(s"""CREATE TABLE $fact USING parquet AS
        |SELECT id AS f_id, CAST(id % 100 AS BIGINT) AS a_key,
        |  CAST(id % 500 AS BIGINT) AS b_key FROM range(20000)""".stripMargin)
      s.range(5).selectExpr("id AS a_key", "concat('a', id) AS a_name")
        .write.option("path", dimADir.toString).saveAsTable(dimA)
      s.sql(s"""CREATE TABLE $dimB USING parquet AS
        |SELECT id AS b_key, concat('b', id) AS b_name
        |FROM range(500)""".stripMargin)
      Seq(fact -> "a_key, b_key", dimA -> "a_key", dimB -> "b_key")
        .foreach { case (t, c) =>
          s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS $c") }
      // 4000× growth the catalog never hears about: parquet appended to
      // the external directory, bypassing every catalog write hook.
      s.range(20000)
        .selectExpr("CAST(id % 100 AS BIGINT) AS a_key",
          "concat('a', id + 5) AS a_name")
        .write.mode("append").parquet(dimADir.toString)
      s.sql(s"REFRESH TABLE $dimA")
      assert(s.table(dimA).count() == 20005L,
        "out-of-band append not visible — staging broke")
      val q = s"""SELECT count(*) AS n FROM $fact
        |JOIN $dimB ON $fact.b_key = $dimB.b_key
        |JOIN $dimA ON $fact.a_key = $dimA.a_key""".stripMargin
      cboKeys.foreach(s.conf.set(_, "true"))
      val stale = bottomJoin(q)
      assert(stale.contains(dimA) && !stale.contains(dimB),
        s"expected the STALE plan to bottom-join $dimA (catalog says 5 " +
          s"rows):\n${stale.take(800)}")
      s.sql(s"ANALYZE TABLE $dimA COMPUTE STATISTICS FOR COLUMNS a_key")
      val fresh = bottomJoin(q)
      assert(fresh.contains(dimB) && !fresh.contains(dimA),
        s"fresh stats did not flip the bottom join to $dimB:" +
          s"\n${fresh.take(800)}")
    } finally {
      prev.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
      Seq(fact, dimA, dimB).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      graft.operators.Scans.rmRecursive(dimADir)
    }
  }
}
