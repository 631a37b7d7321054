package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator exposed by the engine.
  *
  * @param name   key in `SparkEntry.queries` (SURVEY.md §2 inventory name)
  * @param fn     lazy DataFrame constructor against a scale-factor dir
  * @param oracle DuckDB-equivalent ANSI SQL over the same parquet tables;
  *               None ⇒ operator is declared non-SQL-expressible and gets
  *               the driver's weaker rows-only check (SparkEntry contract).
  */
final case class Spec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Spec {
  /** Convenience constructor for the common (SQL-checkable) case. */
  def apply(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): Spec =
    Spec(name, fn, Some(sql))

  /** Non-SQL-expressible operator (rows-only driver check; covered by
    * scalatest instead). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Spec =
    Spec(name, fn, None)
}
