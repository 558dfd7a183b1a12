package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational4, Similarity, TextAnalysis}

/** Cross-checks for the fourth relational tranche (q60-q63) and the
  * r8 pipeline additions — each validated against an independent
  * formulation or hand-computed values. */
class Relational4Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q60 concurrency equals brute-force interval stabbing") {
    val dir = java.nio.file.Files.createTempDirectory("q60").toString
    // supplier 1: [d0,d0+3), [d0+1,d0+2), [d0+1,d0+4) → max 3 at d0+1
    // supplier 2: two disjoint intervals → max 1
    // durations come from quantity % 30 + 1
    Seq((1L, "1995-01-01", 3.0 - 1), (1L, "1995-01-02", 1.0 - 1),
        (1L, "1995-01-02", 3.0 - 1), (2L, "1995-03-01", 1.0 - 1),
        (2L, "1995-03-10", 1.0 - 1))
      .toDF("l_suppkey", "ship", "l_quantity")
      .select(col("l_suppkey"),
        col("ship").cast("timestamp").as("l_shipdate"),
        col("l_quantity"))
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val got = Relational4.q60Concurrency(spark, dir)
      .select("l_suppkey", "max_concurrent")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 3L && got(2L) == 1L)
    // testdata invariant: concurrency never exceeds interval count,
    // never drops below 1 for a supplier with shipments
    val bad = Relational4.q60Concurrency(spark, sf)
      .filter(col("max_concurrent") < 1).count()
    assert(bad == 0)
  }

  test("q61 islands: hand-planted bursts segment correctly") {
    val dir = java.nio.file.Files.createTempDirectory("q61").toString
    // cust 1: days 1,2,3 then (gap 20d) 23,24 → 2 islands, max len 3
    // cust 2: single order → 1 island of len 1, span 0
    Seq((1L, "1995-01-01"), (1L, "1995-01-02"), (1L, "1995-01-03"),
        (1L, "1995-01-23"), (1L, "1995-01-24"), (2L, "1995-06-01"))
      .toDF("o_custkey", "d")
      .select(col("o_custkey"), col("d").cast("timestamp")
        .as("o_orderdate"))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val got = Relational4.q61Islands(spark, dir)
      .select("o_custkey", "n_islands", "max_len", "max_span_days")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((2L, 3L, 2L)))
    assert(got(2L) == ((1L, 1L, 0L)))
  }

  test("q62 listagg matches the window-ranked formulation") {
    val got = Relational4.q62ListAgg(spark, sf)
      .select("s_nationkey", "top_suppliers")
      .as[(Long, String)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s_nationkey"))
      .orderBy((-round(col("s_acctbal") * 100, 0)).asc, col("s_name"))
    val exp = Tables.load(spark, sf, "supplier")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Relational4.TopSuppliers)
      .groupBy(col("s_nationkey"))
      .agg(concat_ws(",", sort_array(collect_list(
        struct(col("rn"), col("s_name"))))
        .getField("s_name")).as("csv"))
      .as[(Long, String)].collect().toMap
    assert(got.nonEmpty && got == exp)
  }

  test("q63 median/MAD agree with a driver-side sort on one group") {
    val rows = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "A")
      .select(round(col("l_extendedprice") * 100, 0).cast("long"))
      .as[Long].collect().sorted
    def medianOf(xs: Seq[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2)
      else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    val med = medianOf(rows.map(_.toDouble))
    val mad = medianOf(rows.map(x => math.abs(x - med)).sorted)
    val got = Relational4.q63RobustStats(spark, sf)
      .filter(col("l_returnflag") === "A")
      .select("median_c", "mad_c").as[(Double, Double)].head()
    assert(math.abs(got._1 - med) < 1e-9, s"median ${got._1} vs $med")
    assert(math.abs(got._2 - mad) < 1e-9, s"mad ${got._2} vs $mad")
  }

  test("t27 flags planted mojibake and control bytes, passes clean") {
    val dir = java.nio.file.Files.createTempDirectory("t27").toString
    Seq((1L, "clean text, nothing wrong here", "en", "s", 30L),
        (2L, "cafÃ© looks wrong", "en", "s", 17L), // Ã©
        (3L, "bad � byte and  control", "en", "s", 24L),
        (4L, "smart â€™ quote", "en", "s", 14L)) // â€™
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.t27Mojibake(spark, dir)
      .select("doc_id", "n_ctrl", "n_replacement", "n_mojibake",
        "is_suspect")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 0L, 0L, 0L)))
    assert(got(2L)._4 >= 1 && got(2L)._5 == 1, got(2L).toString)
    assert(got(3L)._2 == 1 && got(3L)._3 == 1 && got(3L)._5 == 1)
    assert(got(4L)._4 >= 1 && got(4L)._5 == 1)
  }

  test("t28 OOV: rare words fall outside the head vocabulary") {
    val out = TextAnalysis.t28OovAudit(spark, sf)
    // ratios well-formed, totals reconcile with the word explode
    val bad = out.filter(col("n_oov") > col("n_tokens") ||
      col("oov_ratio") < 0 || col("oov_ratio") > 1).count()
    assert(bad == 0)
    val total = out.agg(sum("n_tokens")).head.getLong(0)
    val words = Tables.load(spark, sf, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 1).count()
    assert(total == words)
    // distinct vocab smaller than VocabK at this sf → zero OOV;
    // planted rare words beyond a tiny vocab DO flag (direct check)
    val distinctWords = Tables.load(spark, sf, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 1).distinct().count()
    if (distinctWords <= TextAnalysis.VocabK)
      assert(out.agg(sum("n_oov")).head.getLong(0) == 0)
  }

  test("d49 kNN graph: bounded out-degree, planted duplicate is the " +
      "top neighbor") {
    val dir = java.nio.file.Files.createTempDirectory("d49").toString
    // 40 well-spread vectors + vec 100 = near-copy of vec 0
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 64).map(d =>
        math.sin(i * 13.7 + d * 2.3).toFloat), 0L)
    }
    val dup = (100L, base.head._2.map(x => x + 1e-4f), 0L)
    (base :+ dup).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val g = Similarity.d49KnnGraph(spark, dir).persist()
    try {
      assert(g.groupBy("vec_id").count()
        .filter(col("count") > Similarity.KnnK).count() == 0)
      val top0 = g.filter(col("vec_id") === 0 && col("rank") === 1)
        .select("nbr_id").as[Long].collect()
      assert(top0.sameElements(Array(100L)),
        s"vec 0's nearest should be its planted copy: ${top0.toSeq}")
    } finally g.unpersist()
  }

  test("q64 TWAP: hand-planted holding periods") {
    import graft.operators.Relational5
    val dir = java.nio.file.Files.createTempDirectory("q64").toString
    // supplier 1: level 10 held 2 days, level 40 held 1 day, then a
    // final observation (drops out) → TWAP = (10*2 + 40*1) / 3 = 20
    Seq((1L, "1995-01-01", 10.0), (1L, "1995-01-03", 40.0),
        (1L, "1995-01-04", 99.0))
      .toDF("l_suppkey", "ship", "l_quantity")
      .select(col("l_suppkey"),
        col("ship").cast("timestamp").as("l_shipdate"),
        col("l_quantity"))
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val r = Relational5.q64Twap(spark, dir)
      .select("l_suppkey", "n_intervals", "held_days", "twap_qty")
      .as[(Long, Long, Long, Double)].head()
    assert(r == ((1L, 2L, 3L, 20.0)))
  }

  test("q65 snapshot diff: statuses partition the key space") {
    import graft.operators.Relational5
    val out = Relational5.q65SnapshotDiff(spark, sf).persist()
    try {
      val cust = Tables.load(spark, sf, "customer")
      val n = cust.count()
      // one row per key, keys = old keys + inserted keys
      assert(out.count() == out.select("c_custkey").distinct().count())
      val byStatus = out.groupBy("status").count()
        .as[(String, Long)].collect().toMap
      assert(byStatus("deleted") ==
        cust.filter(col("c_custkey") % 100 === 13).count())
      assert(byStatus("inserted") ==
        cust.filter(col("c_custkey") % 100 === 7).count())
      assert(byStatus.values.sum == n + byStatus("inserted"))
      // changed rows carry both values, and they differ
      assert(out.filter(col("status") === "changed" &&
        (col("old_bal").isNull || col("new_bal").isNull ||
          col("old_bal") === col("new_bal"))).count() == 0)
    } finally out.unpersist()
  }

  test("d50 split: deterministic, complete, and ratio-plausible") {
    import graft.operators.PipelineExtras
    val a = PipelineExtras.d50SplitAssign(spark, sf).collect()
    val b = PipelineExtras.d50SplitAssign(spark, sf).collect()
    assert(a.sameElements(b), "split assignment must be deterministic")
    val bySplit = PipelineExtras.d50SplitAssign(spark, sf)
      .groupBy("split").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    val total = bySplit.values.sum
    assert(total == Tables.load(spark, sf, "documents").count())
    // 80/10/10 within generous tolerance at 500 docs
    assert(bySplit("train") > total * 6 / 10, bySplit.toString)
    assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L)
      > total / 20, bySplit.toString)
  }

  test("t29 blocklist: planted banned words count, clean docs pass") {
    import graft.operators.PipelineExtras
    val dir = java.nio.file.Files.createTempDirectory("t29").toString
    Seq((1L, "totally CLEAN prose", "en", "s", 19L),
        (2L, "buy SPAM and more Spam now", "en", "s", 26L),
        (3L, "spammy is not the word spam is", "en", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = PipelineExtras.t29Blocklist(spark, dir)
      .select("doc_id", "n_blocked", "is_clean")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 1L)))
    assert(got(2L) == ((2L, 2L, 0L)), "case-insensitive, both hits")
    assert(got(3L) == ((3L, 1L, 0L)), "word-bounded: spammy is not spam")
  }

  test("s26 STREAMED A/B monitor equals the batch window rollup") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.functions.col
    val batch = EventStreams.s26StreamAb(spark, sf)
      .select(col("w_start"), col("variant"), col("n_views"),
        col("n_purchases"), col("n_errors"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val q = EventStreams.streamingAbMonitor(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("s26_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("s26_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed == batch && streamed.nonEmpty)
      // both variants receive traffic (edge windows may be sparse at
      // sf0.001, so the pin is corpus-wide, not per-window)
      assert(streamed.map(_._2).toSet == Set(0L, 1L))
    } finally q.stop()
  }

  test("s14 deltas over the STREAMED s01 sink equal the batch query") {
    import graft.streaming.EventStreams
    val batch = EventStreams.s14WindowDelta(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getLong(4))).toSet
    val q = EventStreams.streamingWindowAgg(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("s14_stream").start()
    try {
      q.processAllAvailable()
      val streamed = EventStreams.windowDeltas(
        spark.table("s14_stream")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          Option(r.get(3)), r.getLong(4))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }
}
