package graft

import org.apache.spark.sql.SparkSession

/** Standard session builder (SURVEY.md §3).
  *
  * Local mode for the driver's verify/bench runs: shuffle
  * parallelism matched to the core count (not the 200 default — at
  * local scale extra partitions are pure scheduling overhead), AQE
  * on for runtime coalescing/skew handling, UTC so timestamp maths
  * is reproducible, and graft's SQL functions injected via the same
  * `SparkSessionExtensions` path a cluster deployment would use with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object Sessions {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      : SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
