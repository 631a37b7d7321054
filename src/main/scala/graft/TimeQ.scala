package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time individual registered queries in isolation.
  * `runMain graft.TimeQ <sfDir> <name1,name2,...> [reps]` — builds the
  * same session shape as Bench, runs each named query `reps` times
  * (default 3) and prints per-rep wall seconds to stderr. Used to tune
  * the fixed lifecycle cost of the source demos (VERDICT r9 #1) without
  * paying a full 186-query bench per experiment. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count() // warm session/codegen outside timings
    graft.operators.LlmMultimodal.warmMediaCodecs() // match Bench's warmup
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[timeq] $name%-28s " +
        times.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
