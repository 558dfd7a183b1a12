package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** In-flight data-quality observation (SURVEY.md §2d) — the
  * production audit pattern: a 100 TB cleaning job cannot afford a
  * SECOND corpus scan just to report "how many rows did I see / drop
  * / find malformed", so the counters ride the job itself.
  * `Dataset.observe` attaches named aggregates to a plan node;
  * Spark's `CollectMetrics` operator accumulates them ON the
  * executors during the one pass the job already makes and delivers
  * the result to the driver with the action's completion — zero extra
  * shuffle, zero extra scan, exact (not sampled) counts. */
object Observability {

  /** t30: observed corpus-admission audit — the exact-dedup survivor
    * job (d01's shape) runs once with admission counters observed on
    * its scan: corpus size, empty/short documents, total characters,
    * and the post-job survivor count joins them into the one-row
    * audit record a pipeline run logs. The oracle replays the same
    * aggregates declaratively — pinning that the in-flight counters
    * equal what a dedicated audit pass would have computed. */
  def t30ObservedAudit(spark: SparkSession, dir: String): DataFrame = {
    val obs = Observation(s"t30_${System.nanoTime()}")
    val audited = Tables.load(spark, dir, "documents")
      .observe(obs,
        count(lit(1)).as("n_docs"),
        sum((length(col("text")) === 0).cast("long")).as("n_empty"),
        sum((col("n_chars") < 100).cast("long")).as("n_short"),
        sum(col("n_chars")).as("sum_chars"))
    // the job the metrics ride: exact-dedup survivor election.
    // NULL text is excluded BEFORE hashing (ADVICE r8): md5(NULL)
    // groups into a NULL-hash bucket the oracle's COUNT(DISTINCT …)
    // would not count — the filter makes both sides NULL-consistent.
    val survivors = audited
      .filter(col("text").isNotNull)
      .select(md5(col("text").cast("binary")).as("h"), col("doc_id"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
    val nSurvivors = survivors.count()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_docs").asInstanceOf[Long],
      m("n_empty").asInstanceOf[Long],
      m("n_short").asInstanceOf[Long],
      m("sum_chars").asInstanceOf[Long],
      nSurvivors))
      .toDF("n_docs", "n_empty", "n_short", "sum_chars", "n_survivors")
  }

  val t30Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN len(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_empty,
      |  CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_short,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_survivors
      |FROM documents""".stripMargin
}
