package graft.operators

import org.apache.spark.sql.functions._
import graft.Spec
import graft.sources.Tables

/** SURVEY.md §2.1 — scans / sources / sinks.
  *
  * Scale note: `spark.read.parquet` over a directory tree gives vectorized
  * columnar scan, predicate pushdown, column pruning and partition pruning
  * for free; at 100 TB the only change is the path pointing at a
  * partitioned dataset.
  */
object Scans {
  def specs: Seq[Spec] = Seq(scanParquet, scanCsv, scanJson)

  /** Full projection of the largest fixture table, deterministic order. */
  private val scanParquet = Spec(
    "scan_parquet",
    "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber") { (s, d) =>
    Tables.lineitem(s, d).orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** CSV round-trip: write a projected slice as CSV, read back with an
    * explicit schema. Exercises the text-source path (schema pinning, type
    * coercion); oracle recomputes the same slice from parquet. Timestamps
    * are formatted to ISO to stay engine-neutral. */
  private val scanCsv = Spec(
    "scan_csv",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types._
    val slice = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_roundtrip"
    slice.write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_returnflag", StringType)))
    s.read.option("header", "true").schema(schema).csv(tmp)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** JSON-lines round-trip of events (ts carried as epoch micros through
    * the text format to dodge ns-vs-µs precision hazards). */
  private val scanJson = Spec(
    "scan_json",
    """SELECT event_id, user_id, event_type, value,
      |       epoch_us(ts) AS ts_us
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types._
    val slice = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_json_roundtrip"
    slice.write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("ts_us", LongType)))
    s.read.schema(schema).json(tmp).orderBy(col("event_id"))
  }
}
