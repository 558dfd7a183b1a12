package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pathological-skew join drill (SURVEY §4; round-4 verdict #6).
  *
  * `Skew.saltedJoin` and the AQE runtime split were spec-pinned but
  * never benched against a genuinely hot key. This drill manufactures
  * the canonical failure shape from the sf1 lineitem replica — ONE
  * key holding ~30% of a multi-million-row fact, joined to a dim too
  * big to broadcast — and times three strategies on identical input:
  *
  *  - `plain`:  single shuffle join; the hot key lands on one task,
  *              wall-clock is that straggler.
  *  - `salted`: [[Skew.saltedJoin]] — shuffle key becomes
  *              (key, salt), the 30% partition scatters across `salt`
  *              tasks; dim replicated `salt` times.
  *  - `aqe`:    Spark's adaptive skew-join split, thresholds lowered
  *              so the local-scale hot partition qualifies the same
  *              way a multi-GB partition would on a cluster.
  *
  * All three aggregate the join output (sum of price×payload per
  * payload bucket) so the full join executes; broadcast is disabled
  * throughout (a broadcastable dim would dodge the skew entirely —
  * that's q03's job, not this drill's).
  */
object SkewBench {

  /** ~30% of fact rows collapse onto key 0; the rest spread uniformly
    * over [1, 50000]. Deterministic (hash of the row id), so every
    * strategy sees byte-identical input.
    */
  def zipfFact(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val h = xxhash64(col("l_orderkey"), col("l_linenumber"))
    li.select(
      when(pmod(h, lit(100)) < 30, lit(0L))
        .otherwise(pmod(xxhash64(h), lit(50000L)) + 1L).as("k"),
      col("l_extendedprice").as("price"))
  }

  /** 50,001-key narrow dim. At this size it WOULD broadcast under any
    * default threshold, so the drill simulates non-broadcastability
    * solely via autoBroadcastJoinThreshold=-1 (set in [[drill]]) —
    * all three strategies then pay a genuine shuffle (or salted
    * replication) for it, the cluster-scale big-dim situation.
    */
  def dim(spark: SparkSession): DataFrame =
    spark.range(0L, 50001L).select(
      col("id").as("k"),
      pmod(col("id"), lit(7L)).as("bucket"))

  /** Min of 2 back-to-back runs, the suite's methodology: the sf1
    * straggler costs ~1 s against ~3 s of job overhead, so a single
    * execution is noise-dominated — round 7's first single-rep pass
    * recorded plain FASTER than aqe, inverted by the very contention
    * it was measuring. */
  private def timed(body: => Unit): Double = {
    def once: Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once, once)
  }

  /** Returns (strategy → seconds) for plain/salted/aqe on the same
    * zipf-hot-key join. Saves and restores every config it touches.
    */
  def drill(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy("bucket").agg(sum("price").as("revenue"))

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = zipfFact(spark, dir)
      val d = dim(spark)
      // warm the source scan once so the three strategies compare
      // join execution, not first-touch parquet decode
      fact.write.format("noop").mode("overwrite").save()

      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = timed(run(agg(fact.join(d, "k"))))
      val salted = timed(run(agg(Skew.saltedJoin(fact, d, "k", salt = 32))))

      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // local-scale partitions are MBs, not the cluster-default 256 MB
      // threshold; lower the qualifying bar so the hot partition is
      // split the same way a multi-GB one would be in production
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      val aqe = timed(run(agg(fact.join(d, "k"))))

      Seq("plain" -> plain, "salted" -> salted, "aqe" -> aqe)
    } finally saved.foreach { case (k, v) =>
      v match {
        case Some(value) => conf.set(k, value)
        case None => scala.util.Try(conf.unset(k))
      }
    }
  }
}
