package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Scale tools (SURVEY.md §4): salting for pathological key skew and
  * bucketing for shuffle-free co-located joins. */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin returns exactly the plain join, with hot key spread") {
    // 90% of fact rows share one key — the shape where a plain
    // shuffle join puts 90% of the data in one task.
    val fact = spark.range(0, 10000)
      .select((when(col("id") % 10 === 0, col("id") % 7)
        .otherwise(lit(42L))).as("k"), col("id").as("v"))
    val dim = spark.range(0, 50).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))

    val plain = fact.join(dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().sorted
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().sorted
    assert(salted.sameElements(plain))

    // the salt must actually scatter the hot key across sub-keys
    val saltSpread = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*),
        monotonically_increasing_id()), lit(8)))
      .filter(col("k") === 42).select("__salt").distinct().count()
    assert(saltSpread == 8)
  }

  test("saltedJoin left join keeps unmatched fact rows once") {
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "c")).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    val out = Skew.saltedJoin(fact, dim, "k", salt = 4, joinType = "left")
      .select("k", "v", "name").collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(2)) == 1)
  }

  test("range join equals the naive inequality join, without nested loop") {
    val points = spark.range(0, 2000)
      .select(col("id"), (pmod(col("id") * 37 + 11, lit(997)))
        .cast("double").as("v"))
    val intervals = spark.range(0, 40).select(col("id").as("iv_id"),
      (col("id") * col("id") * 0.6).as("lo"),
      ((col("id") + 1) * (col("id") + 1) * 0.6).as("hi"))
    val naive = points.join(intervals,
        col("lo") <= col("v") && col("v") < col("hi"))
      .select("id", "iv_id").as[(Long, Long)].collect().sorted
    val bucketed = graft.operators.RangeJoin
      .pointInInterval(points, "v", intervals, "lo", "hi", 30.0)
      .select("id", "iv_id").as[(Long, Long)].collect().sorted
    assert(bucketed.sameElements(naive))

    val plan = graft.operators.RangeJoin
      .pointInInterval(points, "v", intervals, "lo", "hi", 30.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("stratified sample is rate-accurate and partitioning-invariant") {
    val ev = Tables.load(spark, sf, "events")
    val rates = Map("click" -> 0.5, "view" -> 0.1)
    val s1 = graft.operators.Sampling
      .stratifiedSample(ev, "event_type", "event_id", rates)
    val counts = s1.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("click", "view")) // others dropped
    val totals = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("click").toDouble / totals("click") - 0.5) < 0.2)
    assert(counts("view").toDouble / totals("view") < 0.3)

    // identical membership regardless of physical layout
    val ids1 = s1.select("event_id").as[Long].collect().sorted.toSeq
    val ids2 = graft.operators.Sampling
      .stratifiedSample(ev.repartition(7), "event_type", "event_id", rates)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("oracle queries are invariant to shuffle partitioning") {
    // the driver may run with any parallelism — results must not
    // depend on the partition count (ordering, first(), agg order)
    val names = Seq("q01_pricing_summary", "q13_asof_join",
      "d02_minhash_lsh", "g09_zoom_dedup", "t01_lang_id",
      // round-4 surface: reassembly order, integer argmin ties,
      // hash membership, as-of fill, full-pipeline composition
      "t11_boiler_strip", "d19_pq_codes", "d18_mixture_sample",
      "q48_gap_fill", "d21_pipeline_e2e")
    def run(n: String): Seq[String] =
      SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
    val base = names.map(run)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      assert(names.map(run) == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("events load is session-timezone-proof (NTZ vs nanos paths)") {
    // the sf1 bench replica carries ts as TIMESTAMP_NTZ; its UTC
    // wall-clock must map to the same instants as the nanos-long
    // path REGARDLESS of spark.sql.session.timeZone (a plain
    // cast("timestamp") shifts by the session offset and moves rows
    // across window boundaries)
    val sf1 = new java.io.File("/root/repo/localdata/sf1")
    assume(sf1.isDirectory, "sf1 replica not generated")
    def firstMicros(): Long = Tables.load(spark, sf1.toString, "events")
      .select(org.apache.spark.sql.functions.unix_micros(col("ts")))
      .orderBy(col("unix_micros(ts)")).limit(1).collect().head.getLong(0)
    val utc = firstMicros()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(firstMicros() == utc,
        "NTZ load shifted with the session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the OTHER skew tool besides manual salting: AQE detects an
    // oversized shuffle partition after the map stage and splits it.
    // Thresholds are lowered so a ~MB hot key triggers what a ~GB hot
    // key triggers in production; the executed plan must carry the
    // skew=true marker on the join.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = confs.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(confs(0), "262144")   // 256 KB counts as skewed
      spark.conf.set(confs(1), "65536")    // split to ~64 KB targets
      spark.conf.set(confs(2), "2")
      spark.conf.set(confs(3), "-1")       // force the shuffle join
      // one key owns ~95% of 200k fact rows with a fat payload column
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 20 === 0, col("id") % 7)
          .otherwise(lit(42L)).as("k"),
          concat(lit("p"), col("id"), lit("x" * 64)).as("payload"))
      val dim = spark.range(0, 50).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      // execute THIS dataset's own QueryExecution (count() would plan
      // a separate agg tree and leave this one's AQE un-finalized)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // the third join-scale tool (besides broadcast and salting):
    // Catalyst injects a bloom_filter_agg on the selective dim side
    // and a might_contain filter on the fact scan, so fact rows that
    // cannot match die before the shuffle. Size thresholds are
    // production-scale; lowered here so the sf-test tables qualify.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = confs.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(confs(0), "true")
      spark.conf.set(confs(1), "0")
      spark.conf.set(confs(2), "100MB")
      spark.conf.set(confs(3), "-1") // shuffle join, not broadcast
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val sel = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      assert(j.collect().nonEmpty)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter_agg"),
        s"no bloom creation on the dim side:\n$plan")
      assert(plan.contains("might_contain"),
        s"no runtime filter on the fact side:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("NTZ load is exact across a DST fall-back hour") {
    // US DST ended 2025-11-02 02:00 EDT: UTC 05:30 and 06:30 BOTH
    // read 01:30 on the America/New_York wall clock. A local-zone
    // round-trip (convert_timezone + cast) collapses them to one
    // offset; the field-wise make_timestamp(..., 'UTC') load must
    // keep the two instants distinct and exact.
    import org.apache.spark.sql.functions.{expr, unix_micros}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ntz-dst").toString
    spark.range(1).select(
      expr("to_timestamp_ntz('2025-11-02 05:30:00')").as("ts"))
      .union(spark.range(1).select(
        expr("to_timestamp_ntz('2025-11-02 06:30:00')").as("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val micros = Tables.load(spark, dir, "events")
        .select(unix_micros(col("ts"))).collect()
        .map(_.getLong(0)).sorted.toSeq
      // 2025-11-02T05:30Z and 06:30Z in epoch micros
      assert(micros == Seq(1762061400000000L, 1762065000000000L),
        s"DST-ambiguous instants shifted: $micros")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("bucketed tables join without a shuffle") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey")
    Tables.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Tables.writeBucketed(ord, "ord_bucketed", "o_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
