package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism conventions for DuckDB hash-matching (SURVEY.md §5.2, §7.4).
  *
  * All measure columns in the fixtures are doubles. Summing doubles is
  * order-dependent, and Spark's partition/AQE ordering differs from DuckDB's
  * sequential scan — so any `sum(double)` would hash-mismatch. Instead every
  * aggregated measure is cast to decimal FIRST (exact, order-independent
  * accumulation in both engines) and the exact decimal result is emitted as
  * double (identical bits on both sides).
  *
  * At 100 TB the same property is what makes results reproducible across
  * cluster re-runs with different partition counts / AQE decisions — decimal
  * aggregation is not just an oracle trick, it is the scale-correctness
  * convention.
  *
  * Oracle-SQL mirrors (see `Sql`): `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS
  * DOUBLE)`.
  */
object Det {
  /** Raw fixture measures are 2-decimal values: exact at scale 2. */
  val D2: DecimalType = DecimalType(18, 2)

  /** Computed double expressions (products etc.) are rounded at scale 6;
    * the cast input is the identical IEEE double in both engines, so the
    * rounding decision agrees. */
  val D6: DecimalType = DecimalType(28, 6)

  def dec2(c: Column): Column = c.cast(D2)
  def dec6(c: Column): Column = c.cast(D6)

  /** Exact order-independent sum of a 2-decimal measure, emitted as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of a computed double expression (scale-6 per-row rounding). */
  def dsum6(c: Column): Column = sum(dec6(c)).cast("double")

  /** Exact average: exact decimal sum / exact count, one double division. */
  def davg(c: Column): Column = sum(dec2(c)).cast("double") / count(c)

  /** Revenue expression l_extendedprice * (1 - l_discount), computed
    * entirely in decimal so the sum is exact. */
  def revenue: Column =
    dec2(col("l_extendedprice")) * (lit(1).cast(D2) - dec2(col("l_discount")))
}

/** Oracle-SQL fragments mirroring [[Det]] (DuckDB dialect = ANSI here). */
object Sql {
  def dsum(x: String, as: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) AS $as"
  def dsum6(x: String, as: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE) AS $as"
  def davg(x: String, as: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x) AS $as"
  val revenue: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
}
