package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 is one [[Spec]] contributed by the
  * operator modules below; this object is pure wiring.
  */
object SparkEntry {

  private def specs: Seq[Spec] =
    Scans.specs ++
      FilterProject.specs ++
      Joins.specs ++
      Aggregates.specs ++
      SetOps.specs ++
      Windows.specs ++
      SortLimit.specs ++
      Functions.specs ++
      Analytics.specs ++
      graft.streaming.StreamingOps.specs ++
      LlmText.specs ++
      LlmVector.specs ++
      LlmPipeline.specs ++
      LlmMultimodal.specs ++
      Maintenance.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_hash_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(sp => sp.name -> sp.fn).toMap

  /** All declared spec names, pre-Map (tests assert uniqueness — a name
    * collision would silently drop an operator from `queries`). */
  def specNames: Seq[String] = specs.map(_.name)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    specs.flatMap(sp => sp.oracle.map(sql => sp.name -> sql)).toMap
}
