package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Negative controls for the band-oracle booleans (VERDICT r15 #5).
  *
  * The estimator rows emit guarantee booleans the ENGINE computes; the
  * DuckDB oracle hash-checks only their exact companions, so a broken
  * band check would emit TRUE and still pass the driver's gate. These
  * tests prove every band predicate is FALSIFIABLE: each one is run
  * against the REAL estimator output twice — once at the published
  * threshold (must hold) and once corrupted (demand fp ≤ 0, a 0σ band,
  * ε = 0 on a sketch forced to collide) where it must flip. The Spec
  * bodies call the same [[graft.operators.Bands]] functions, so green
  * here certifies the shipped predicates, not test doubles. */
class BandsSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.Bands
  import graft.sources.Tables

  private lazy val ord = Tables.orders(spark, SF001)

  test("bloom fp band: holds at 6 sigma, flips when fp <= 0 is demanded") {
    val nDistinct =
      ord.agg(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    val fpp = 0.03
    val bf = ord.stat.bloomFilter("o_custkey", math.max(nDistinct, 1L), fpp)
    val probes = 2000
    val fpCount = (1 to probes).count(i => bf.mightContain(-i.toLong)).toLong
    assert(fpCount > 0,
      "control needs real false positives (expected ~60 at fpp=0.03; " +
        "a zero count would make the corrupted band vacuous)")
    assert(Bands.bloomFpWithin(fpCount, probes, fpp, 6.0),
      s"published guarantee violated: $fpCount fps over $probes probes")
    assert(!Bands.bloomFpWithin(fpCount, probes, 0.0, 0.0),
      "corrupted band (demand fp <= 0) did not flip — the boolean is " +
        "not a live computation over the sketch's output")
  }

  test("CMS eps band: holds on the shipped sketch, flips at eps=0 on a " +
      "sketch forced to collide") {
    val exact = ord.groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = exact.map(_._2).sum
    // the shipped configuration: eps=1e-4 -> ~20k counters for 5 keys,
    // no collisions, estimate == exact, band trivially holds
    val cms = ord.stat.countMinSketch(col("o_orderpriority"), 1e-4, 0.999, 42)
    assert(exact.forall { case (k, n) =>
      Bands.cmsWithin(cms.estimateCount(k), n, 1e-4, total)
    })
    // force collisions: eps=0.5 -> width ~6 counters for 5 keys plus
    // hashing skew => some estimate MUST overcount; at eps=0 the band
    // demands estimate == exact and must flip on that overcount
    val tiny = ord.stat.countMinSketch(col("o_orderpriority"), 0.5, 0.9, 42)
    val overcounts = exact.count { case (k, n) => tiny.estimateCount(k) > n }
    assert(overcounts > 0,
      "control needs a real overcount — widen the collision forcing")
    assert(!exact.forall { case (k, n) =>
      Bands.cmsWithin(tiny.estimateCount(k), n, 0.0, total)
    }, "eps=0 band did not flip on a sketch with real overcounts")
    // and the shipped eps honors ITS contract even on the tiny sketch's
    // inputs: eps=0.5 must still hold there (the guarantee is relative)
    assert(exact.forall { case (k, n) =>
      Bands.cmsWithin(tiny.estimateCount(k), n, 0.5, total)
    }, "the eps-delta contract itself failed on the collision sketch")
  }

  test("approxQuantile rank band: holds at the published relErr, flips " +
      "when the value is demanded at an impossible rank") {
    val relErr = 0.01
    val p = 0.5
    val Array(v) = ord.stat.approxQuantile("o_totalprice", Array(p), relErr)
    val row = ord.agg(count(lit(1)),
      sum(when(col("o_totalprice") < v, 1L).otherwise(0L)),
      sum(when(col("o_totalprice") <= v, 1L).otherwise(0L))).collect()(0)
    val (n, lo, hi) = (row.getLong(0), row.getLong(1) + 1, row.getLong(2))
    assert(Bands.rankWithin(lo, hi, p, relErr, n),
      s"published rank guarantee violated: [$lo,$hi] vs p=$p n=$n")
    assert(!Bands.rankWithin(lo, hi, 0.99, 0.0, n),
      "the median's rank interval satisfied an exact-p99 demand — " +
        "the rank check is not reading real rank counts")
  }

  test("sampleBy binomial band: holds at 6 sigma, flips at f=0 with a " +
      "0 sigma band") {
    val fractions = Map("F" -> 0.5, "O" -> 0.5, "P" -> 0.5)
    val strata = ord.groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = ord.stat.sampleBy("o_orderstatus", fractions, 42L)
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strata.keySet.forall(k => sampled.getOrElse(k, 0L) > 0),
      "control needs non-empty strata samples")
    assert(strata.forall { case (k, m) =>
      Bands.binomialWithin(sampled.getOrElse(k, 0L), m, fractions(k), 6.0)
    })
    assert(strata.exists { case (k, m) =>
      !Bands.binomialWithin(sampled.getOrElse(k, 0L), m, 0.0, 0.0)
    }, "f=0 + 0 sigma band did not flip on non-empty samples")
  }

  test("summary-mean band: accepts the real summary value, flips on a " +
      "corrupted mean, and widens with n") {
    val exact = ord.agg(
      graft.functions.Det.dsum(col("o_totalprice")),
      count(col("o_totalprice"))).collect()(0)
    val exactMean = exact.getDouble(0) / exact.getLong(1)
    val n = exact.getLong(1)
    val measured = ord.select(col("o_totalprice")).summary("mean")
      .collect()(0).getString(1).toDouble
    assert(Bands.meanWithin(measured, exactMean, n))
    assert(!Bands.meanWithin(exactMean * (1 + 1e-6), exactMean, n),
      "a 1e-6-relative corruption passed the small-n band (floor 1e-9)")
    // the scale story: the band grows ~n*4e-16 past the floor, so the
    // same absolute summation drift that fails at small n is inside
    // contract at 1e11 rows, and the floor governs until ~2.5e6 rows
    assert(Bands.meanTol(1000) == 1e-9)
    assert(Bands.meanTol(100000000000L) > 1e-6,
      "band must widen with n or profile_summary flips at 100 TB scale")
  }

  test("HLL relative-band column flips when the estimate leaves the band") {
    import spark.implicits._
    val df = Seq((105L, 100L), (95L, 100L), (106L, 100L), (94L, 100L))
      .toDF("approx", "exact")
      .select(Bands.relBandCol(col("approx"), col("exact"), 0.05).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(df == Seq(true, true, false, false),
      s"the shipped agg_approx_distinct band column misclassified: $df")
  }

  test("stats-builtin floor band flips past 1e-9 and floors near zero") {
    import spark.implicits._
    val rows = Seq(
      (1000.0, 1000.0 * (1 + 5e-10)),  // inside: relative 5e-10
      (1000.0, 1000.0 * (1 + 5e-9)),   // outside: relative 5e-9
      (0.0, 5e-10),                     // inside: floor absorbs near-zero
      (0.0, 5e-9))                      // outside even with the floor
      .toDF("ex", "b")
      .select(Bands.relBandFloorCol(col("b"), col("ex"), 1e-9).as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(rows == Seq(true, false, true, false),
      s"the shipped agg_stats_builtin band column misclassified: $rows")
  }
}
