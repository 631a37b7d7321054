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

  // The former `noOracle` convenience constructor was removed in round 9
  // when its last two call sites (llm_ann_lsh/llm_ann_ivf) gained exact
  // oracles. A genuinely non-SQL-expressible operator would still use the
  // primary constructor with `oracle = None` — the driver contract's
  // rows-only fallback remains supported; the registry just has no such
  // operator today.
}
