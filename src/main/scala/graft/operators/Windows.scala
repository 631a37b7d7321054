package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Spec
import graft.functions.Det
import graft.sources.Tables

/** SURVEY.md §2.5 — window functions.
  *
  * Every window here partitions by a key (customer / user), so at scale the
  * plan is one shuffle on the partition key followed by an in-partition
  * sort — no global sort, no driver collection. Rank/row_number always carry
  * a total-order tiebreak (§7.4.5); running sums accumulate in decimal so
  * the result is partitioning-independent.
  *
  * events.ts hazard (FIXTURES.md §hazards): Spark sees µs, DuckDB ns — all
  * event-time windows order by epoch micros computed on each engine's own
  * value (truncation agrees) with event_id as tiebreak.
  */
object Windows {
  def specs: Seq[Spec] = Seq(winRank, topkPerGroup, lagLead, runningFrame,
    rangeFrame, firstLast, cumeDist, sessionGap, patternMatch, locf,
    rangeInterval)

  /** RANGE frame bounded by an INTERVAL literal over raw event-time —
    * the SQL-text spelling of a trailing time window
    * (`RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND CURRENT ROW`).
    * [[rangeFrame]] pins the same semantics over pre-derived epoch
    * seconds (the DataFrame-API spelling, since `rangeBetween` takes
    * longs); this row pins that the PARSER-level interval frame over a
    * TIMESTAMP ordering column agrees with it — no epoch derivation
    * column needed, which is how analysts write it. Same per-partition
    * sort, same running frame scan; both engines implement the
    * SQL-standard interval RANGE directly. */
  private val rangeInterval = Spec(
    "win_range_interval",
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_trailing,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
      |    AS sum_trailing
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
      |                       AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).createOrReplaceTempView("graft_wri_events")
    s.sql(
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_trailing,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
        |    AS sum_trailing
        |FROM graft_wri_events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING
        |                       AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin)
  }

  /** Last-observation-carried-forward via `last(col, ignoreNulls=true)`
    * over a running frame — the IGNORE NULLS window family that
    * [[firstLast]]'s plain first/last/nth does not exercise, and the
    * canonical gap-fill for sparse time series (sensor readings, price
    * marks: every row sees the latest non-null value at-or-before it).
    * One partitioned sort, no self-join, no per-gap subquery — the same
    * single window pass `win_running_frame` costs, so it survives 100 TB
    * wherever any windowed aggregate does. Nulls are manufactured
    * data-driven (orderkey mod 3) so runs of 1+ consecutive gaps occur
    * and leading-null groups stay null (the semantics edge the oracle
    * pins). DuckDB spells it `last_value(x IGNORE NULLS)`. */
  private val locf = Spec(
    "win_locf",
    """SELECT o_custkey, o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS p,
      |  last_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |                  ELSE o_totalprice END IGNORE NULLS)
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS p_filled
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(col("o_totalprice")).as("p"))
      .select(col("o_custkey"), col("o_orderkey"), col("p"),
        last(col("p"), ignoreNulls = true).over(w).as("p_filled"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Event-sequence pattern detection (the MATCH_RECOGNIZE use case on
    * plain window functions): find every strict view→click→purchase run
    * per user and report per-user funnel counts with the first
    * occurrence. Two LEADs over the user-partitioned event order turn
    * pattern detection into a per-row predicate — one window pass + one
    * hash aggregate, no self-joins, no state machine; a length-k pattern
    * costs k-1 LEADs in the same single pass. The window partitions by
    * user (never global) and the (ts, event_id) order pins ties, so the
    * match set is deterministic in both engines. */
  private val patternMatch = Spec(
    "win_pattern_match",
    """WITH s AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
      |    LEAD(event_type, 1) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS n1,
      |    LEAD(event_type, 2) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS n2
      |  FROM events),
      |m AS (SELECT user_id, ts_us FROM s
      |      WHERE event_type = 'view' AND n1 = 'click'
      |        AND n2 = 'purchase')
      |SELECT user_id, COUNT(*) AS n_funnels,
      |  MIN(ts_us) AS first_funnel_start_us
      |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        lead(col("event_type"), 1).over(byUser).as("n1"),
        lead(col("event_type"), 2).over(byUser).as("n2"))
      .filter(col("event_type") === "view" && col("n1") === "click"
        && col("n2") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_funnels"),
        min(col("ts_us")).as("first_funnel_start_us"))
      .orderBy(col("user_id"))
  }

  /** Batch sessionization — the gaps-and-islands idiom: a 30-minute gap
    * (or the user's first event) starts a new session, and the session
    * sequence number is the running sum of start flags. The batch twin of
    * stream_session: same per-user shuffle + in-partition scan shape, all
    * integer epoch-µs arithmetic with a total-order tiebreak. */
  private val sessionGap = Spec(
    "win_session_gap",
    """SELECT user_id, event_id, eus,
      |  CAST(SUM(new_sess) OVER (PARTITION BY user_id
      |    ORDER BY eus, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS session_seq
      |FROM (
      |  SELECT user_id, event_id, eus,
      |    CASE WHEN eus - LAG(eus) OVER (PARTITION BY user_id
      |        ORDER BY eus, event_id) > 1800000000
      |      OR LAG(eus) OVER (PARTITION BY user_id
      |        ORDER BY eus, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM (SELECT user_id, event_id, epoch_us(ts) AS eus FROM events))
      |ORDER BY user_id, eus, event_id""".stripMargin) { (s, d) =>
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("eus"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("eus"))
      .withColumn("new_sess",
        when(col("eus") - lag(col("eus"), 1).over(ord) > 1800000000L
          || lag(col("eus"), 1).over(ord).isNull, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(run))
      .select(col("user_id"), col("event_id"), col("eus"),
        col("session_seq"))
      .orderBy(col("user_id"), col("eus"), col("event_id"))
  }

  /** CUME_DIST over a total order (price, key): with the tiebreak the
    * distribution value is row_number/n — an exact int/int double division,
    * identical across engines and partitionings. */
  private val cumeDist = Spec(
    "win_cume_dist",
    """SELECT o_orderkey, o_orderstatus,
      |  CUME_DIST() OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice, o_orderkey) AS cd
      |FROM orders
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  /** first_value/last_value/nth_value over an explicit full-partition frame
    * (the default frame stops at CURRENT ROW, which silently breaks
    * last_value — a classic window-function trap, pinned here). */
  private val firstLast = Spec(
    "win_first_last",
    """SELECT o_custkey, o_orderkey,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
      |  LAST_VALUE(o_orderkey)  OVER w AS last_ok,
      |  NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val winRank = Spec(
    "win_rank",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  ROW_NUMBER() OVER w AS rn,
      |  RANK()       OVER w AS rk,
      |  DENSE_RANK() OVER w AS drk
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Top-3 orders per customer — the scalable top-k idiom (rank inside the
    * key partition + filter; never a global sort of the fact table). */
  private val topkPerGroup = Spec(
    "win_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Per-user inter-event gap in microseconds (epoch-µs arithmetic keeps
    * both engines in exact integer space despite the ns/µs split). */
  private val lagLead = Spec(
    "win_lag_lead",
    """SELECT event_id, user_id, eus,
      |  eus - LAG(eus)  OVER w AS gap_us,
      |  LEAD(eus) OVER w - eus AS next_us
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS eus FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)
      |ORDER BY user_id, eus, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("eus"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("eus"))
      .select(col("event_id"), col("user_id"), col("eus"),
        (col("eus") - lag(col("eus"), 1).over(w)).as("gap_us"),
        (lead(col("eus"), 1).over(w) - col("eus")).as("next_us"))
      .orderBy(col("user_id"), col("eus"), col("event_id"))
  }

  /** Running revenue per customer (explicit ROWS frame); decimal
    * accumulation so every prefix sum is exact and order-stable. */
  private val runningFrame = Spec(
    "win_running_frame",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_rev
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(Det.dec2(col("o_totalprice"))).over(w).cast("double")
          .as("running_rev"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** 10-minute trailing event count+sum per user — RANGE frame over epoch
    * seconds (the time-series "trailing window" shape; at scale this is the
    * batch twin of the streaming sliding window). */
  private val rangeFrame = Spec(
    "win_range_frame",
    """SELECT event_id, user_id, es,
      |  COUNT(*) OVER w AS n_trailing,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sum_trailing
      |FROM (SELECT event_id, user_id, epoch_us(ts) // 1000000 AS es, value
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY es
      |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, es, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
      .rangeBetween(-600, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) / lit(1000000L)).cast("long").as("es"),
        col("value"))
      .select(col("event_id"), col("user_id"), col("es"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(Det.dec6(col("value"))).over(w).cast("double").as("sum_trailing"))
      .orderBy(col("user_id"), col("es"), col("event_id"))
  }
}
