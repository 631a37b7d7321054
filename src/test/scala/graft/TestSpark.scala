package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (SURVEY.md §5.3). */
object TestSpark {
  val SF001 = "/root/testdata/sf0.001"
  val SF01 = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The first n fixture events as typed rows — the one extraction shared
    * by every streaming parity test (StreamingSpec, StreamingRecoverySpec,
    * ChainedStream), so the column list can't drift between suites. */
  def fixtureEvents(n: Int): Seq[Ev] = {
    import org.apache.spark.sql.functions.col
    graft.sources.Tables.events(spark, SF001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .limit(n).collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
  }
}
