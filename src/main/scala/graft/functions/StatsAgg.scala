package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation surface (SURVEY.md §2.4 `agg_custom_typed`).
  *
  * Computes count / mean / population variance of a 2-decimal money column
  * with EXACT integer accumulation: values are scaled to cents (Long) and
  * squared cents (BigInt — encoder maps it to DecimalType(38,0); cents²
  * sums overflow Long at bench scale and BigDecimal's default (38,18)
  * encoding would overflow its 20 integer digits), so the merge is
  * associative+commutative and the result is independent of partitioning —
  * the property that makes a custom aggregate trustworthy on a
  * 1000-executor cluster. A running Welford would NOT have this property in
  * floating point; the scaled-integer moment form does.
  *
  * Final mean/variance are derived with a fixed sequence of IEEE double ops
  * mirrored verbatim in the oracle SQL, so results hash-match DuckDB.
  */
case class StatsBuf(n: Long, sumCents: Long, sumSqCents: BigInt)

class MoneyStats extends Aggregator[Double, StatsBuf, (Long, Double, Double)] {

  def zero: StatsBuf = StatsBuf(0L, 0L, BigInt(0))

  def reduce(b: StatsBuf, v: Double): StatsBuf = {
    val c = math.round(v * 100) // exact: inputs are 2-decimal money values
    StatsBuf(b.n + 1, b.sumCents + c, b.sumSqCents + BigInt(c) * BigInt(c))
  }

  def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
    StatsBuf(a.n + b.n, a.sumCents + b.sumCents, a.sumSqCents + b.sumSqCents)

  def finish(b: StatsBuf): (Long, Double, Double) = {
    val n = b.n.toDouble
    val meanCents = b.sumCents.toDouble / n
    val meanSqCents = b.sumSqCents.toDouble / n
    // population variance in money units; same op order as the oracle SQL
    val varPop = (meanSqCents - meanCents * meanCents) / 10000.0
    (b.n, meanCents / 100.0, varPop)
  }

  def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  def outputEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
      Encoders.scalaDouble)
}
