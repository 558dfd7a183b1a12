package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Link-graph analytics (SURVEY.md §2d): PageRank centrality — the
  * link-quality signal web-corpus pipelines rank crawl frontiers and
  * filter training documents with (CommonCrawl-style harmonic/
  * PageRank document scoring; Page/Brin/Motwani/Winograd, public
  * algorithm). The graph here is the customer↔supplier trade graph
  * the TPC-H-ish tables define (an edge per distinct trading pair,
  * walked undirected so the chain has no dangling mass).
  *
  * Same engineering contract as the k-means trainer
  * ([[Similarity.kmeansQuantized]]): EXACT integer arithmetic —
  * ranks live on a 10⁶ grid, per-edge contributions are floor
  * divisions, the damping step is an integer multiply-then-floor —
  * so a fixed-iteration run is bit-identical on any partitioning and
  * the DuckDB oracle replays the iterations verbatim.
  */
object LinkGraph {

  /** Supplier node-id offset (disjoint from customer keys). */
  val SuppBase = 1000000L

  /** Fixed-point rank scale: r₀ = 1.0 ≡ 10⁶. */
  val RankScale = 1000000L

  /** Damping d = 0.85 as the integer pair 85/100. */
  val DampNum = 85L
  val DampDen = 100L

  val PrIters = 3

  /** The per-(session, dir) pinned adjacency RDDs the iterative
    * loops walk — iterative algorithms re-walk their edge relation
    * every round, so it materializes ONCE (the GraphX/Pregel
    * convention, and this repo's simCache pattern); without the pin
    * each iteration's lineage re-derives the edge build from the full
    * lineitem scan. [[releaseGraphCache]] drops the pins;
    * Bench/ScaleCurve call it between sections. */
  private val rddCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), org.apache.spark.rdd.RDD[_]]

  private def pinRdd[T](spark: SparkSession, dir: String, key: String)(
      build: => org.apache.spark.rdd.RDD[T])
      : org.apache.spark.rdd.RDD[T] =
    rddCache.getOrElseUpdate((spark, dir, key), build.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      .asInstanceOf[org.apache.spark.rdd.RDD[T]]

  /** Directed (c, s) trade-pair relation, pinned like [[rddCache]]
    * and shared by d32 (which folds it undirected) and d36 (which
    * walks it as-is) — one edge extraction serves both. */
  private val pairCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  def releaseGraphCache(): Unit = {
    rddCache.values.foreach(_.unpersist())
    rddCache.clear()
    pairCache.values.foreach(_.unpersist())
    pairCache.clear()
  }

  /** The pinned distinct customer→supplier pair relation.
    * Duplicate-tolerant: distinct BELOW the join bounds the orderkey
    * join by true key cardinality (measured 130 s → 13 s on the 100×
    * replica — re-ingested/replicated rows would otherwise multiply
    * on both sides). */
  private def tradePairs(spark: SparkSession, dir: String): DataFrame =
    pairCache.getOrElseUpdate((spark, dir), {
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")).distinct()
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      ord.join(li.hint("shuffle_hash"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** d32: PageRank over the customer↔supplier graph. Iteration k:
    * r'(v) = (1−d)·scale + floor(d · Σ_{u∼v} floor(r(u)/deg(u))).
    *
    * Plan shape at scale: the edge relation (src, dst, deg) builds
    * ONCE (one distinct + one degree aggregate, both hashing on the
    * edge key) and each iteration is one shuffled equi-join of the
    * current rank relation against it plus one dst-keyed sum — the
    * Pregel message-passing shape, 2 narrow shuffles per round,
    * nothing corpus-sized ever broadcast (ranks and degrees are
    * node-scale aggregate outputs with no stats — Catalyst would
    * happily broadcast them at test scale and OOM at real scale, so
    * the joins pin shuffled builds; the d16/t11 lesson). Nodes
    * outside every edge have no walk semantics and are excluded by
    * construction. */
  /** The loop body is RDD-based on a FIXED HashPartitioner — the
    * [[Dedup.connectedComponents]] treatment: an iterative DataFrame
    * loop re-plans and re-compiles fresh generated code every round
    * (measured ~2 s/round of pure overhead at sf10, the dominant cost
    * of the old form), while co-partitioned RDDs make the
    * adjacency⋈ranks join narrow and leave exactly ONE shuffle per
    * round (the rank messages, combiner-reduced map-side). All
    * arithmetic is the same positive-Long floor division the SQL
    * `div` form used, so results are bit-identical and the unrolled
    * oracle is unchanged. */
  def d32Pagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = new org.apache.spark.HashPartitioner(
      spark.sparkContext.defaultParallelism)
    // adjacency src -> (dst, deg(src)), symmetrized, co-partitioned
    // and pinned once per (session, dir)
    val adj = pinRdd[(Long, (Long, Long))](spark, dir, "pr_adj") {
      val edges = tradePairs(spark, dir)
      val und = edges.select(col("c").cast("long"),
          (col("s") + SuppBase).cast("long"))
        .unionAll(edges.select((col("s") + SuppBase).cast("long"),
          col("c").cast("long")))
        .rdd.map(r => (r.getLong(0), r.getLong(1)))
        .partitionBy(part)
      val deg = und.mapValues(_ => 1L).reduceByKey(part, _ + _)
      und.join(deg) // narrow: both sides on `part`; keeps `part`
    }
    val base = RankScale - RankScale * DampNum / DampDen
    var ranks = adj.keys.distinct(part.numPartitions)
      .map(n => (n, RankScale)).partitionBy(part)
    for (_ <- 1 to PrIters) {
      ranks = adj.join(ranks) // narrow, co-partitioned
        .map { case (_, ((dst, dg), r)) => (dst, r / dg) }
        .reduceByKey(part, _ + _) // the ONE shuffle per round
        .mapValues(m => base + m * DampNum / DampDen)
    }
    ranks.toDF("node", "r")
      .select(when(col("node") >= SuppBase, lit("supplier"))
          .otherwise(lit("customer")).as("kind"),
        when(col("node") >= SuppBase, col("node") - SuppBase)
          .otherwise(col("node")).as("key"),
        col("r").as("rank_fp"))
      .orderBy(col("kind"), col("key"))
  }

  /** HITS iterations for d36. */
  val HitsIters = 2

  /** d36: HITS hubs & authorities (Kleinberg, public algorithm) over
    * the directed customer→supplier trade graph — the OTHER classic
    * link-quality signal: a good hub (customer) buys from good
    * authorities (suppliers), a good authority sells to good hubs.
    * Web-corpus curation uses exactly this mutual-reinforcement score
    * to pick seed/source quality where PageRank's random walk
    * over-rewards raw degree.
    *
    * Exactness contract (the d32/k-means discipline): scores live on
    * the [[RankScale]] grid; each half-step is an integer edge sum
    * followed by max-normalization `(raw · scale) div max(raw)` —
    * Kleinberg's L₂ norm would need sqrt, max-norm is the standard
    * integer-friendly variant with the same fixed point — so a
    * fixed-iteration run is bit-identical on any partitioning and
    * the oracle replays it with scalar subqueries. Sums stay in
    * BIGINT while max-degree · scale² < 2⁶³, i.e. degrees to ~9·10⁶
    * — document-scale graphs far past this corpus.
    *
    * Plan shape at scale: the [[Dedup.connectedComponents]]/[[d32Pagerank]]
    * treatment — the directed pair relation lands on a FIXED
    * HashPartitioner in BOTH key orientations, pinned once
    * ([[pinRdd]]); each half-step is then a NARROW co-partitioned
    * join plus one combiner-reduced message shuffle, and ONE
    * collected scalar (the max — the d23 bounded-driver-scalar
    * pattern) turns normalization into a closure literal. No
    * per-round re-planning/codegen (the cost the DataFrame loop
    * paid), 2·[[HitsIters]] bounded driver round-trips total,
    * nothing corpus-sized ever on the driver. Each half-step's raw
    * sum is pinned (node-scale) because it is both max'd and
    * re-walked downstream. */
  def d36Hits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = new org.apache.spark.HashPartitioner(
      spark.sparkContext.defaultParallelism)
    val byC = pinRdd[(Long, Long)](spark, dir, "hits_byc") {
      tradePairs(spark, dir)
        .select(col("c").cast("long"), col("s").cast("long"))
        .rdd.map(r => (r.getLong(0), r.getLong(1))).partitionBy(part)
    }
    val byS = pinRdd[(Long, Long)](spark, dir, "hits_bys") {
      byC.map(_.swap).partitionBy(part)
    }
    var hubs = byC.keys.distinct(part.numPartitions)
      .map(c => (c, RankScale)).partitionBy(part)
    var auths: org.apache.spark.rdd.RDD[(Long, Long)] = null
    for (i <- 1 to HitsIters) {
      val aRaw = pinRdd[(Long, Long)](spark, dir, s"hits_ar$i") {
        byC.join(hubs) // narrow
          .map { case (_, (s, h)) => (s, h) }
          .reduceByKey(part, _ + _)
      }
      val amax = aRaw.values.max()
      auths = aRaw.mapValues(ar => ar * RankScale / amax)
      val hRaw = pinRdd[(Long, Long)](spark, dir, s"hits_hr$i") {
        byS.join(auths) // narrow
          .map { case (_, (c, a)) => (c, a) }
          .reduceByKey(part, _ + _)
      }
      val hmax = hRaw.values.max()
      hubs = hRaw.mapValues(hr => hr * RankScale / hmax)
    }
    hubs.toDF("c", "h")
      .select(lit("hub").as("kind"), col("c").as("key"),
        col("h").as("score_fp"))
      .unionByName(auths.toDF("s", "a")
        .select(lit("authority").as("kind"), col("s").as("key"),
          col("a").as("score_fp")))
      .orderBy(col("kind"), col("key"))
  }

  val d36Sql: String = {
    def halfA(i: Int) =
      s"""ar$i AS (
         |  SELECT s, CAST(sum(h) AS BIGINT) AS ar
         |  FROM ed JOIN h${i - 1} USING (c) GROUP BY 1),
         |a$i AS (
         |  SELECT s, (ar * $RankScale) // (SELECT max(ar) FROM ar$i)
         |    AS a
         |  FROM ar$i)""".stripMargin
    def halfH(i: Int) =
      s"""hr$i AS (
         |  SELECT c, CAST(sum(a) AS BIGINT) AS hr
         |  FROM ed JOIN a$i USING (s) GROUP BY 1),
         |h$i AS (
         |  SELECT c, (hr * $RankScale) // (SELECT max(hr) FROM hr$i)
         |    AS h
         |  FROM hr$i)""".stripMargin
    s"""WITH ed AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |h0 AS (
       |  SELECT DISTINCT c, CAST($RankScale AS BIGINT) AS h FROM ed),
       |${(1 to HitsIters).map(i => halfA(i) + ",\n" + halfH(i))
          .mkString(",\n")}
       |SELECT 'hub' AS kind, CAST(c AS BIGINT) AS key,
       |  h AS score_fp FROM h$HitsIters
       |UNION ALL
       |SELECT 'authority' AS kind, CAST(s AS BIGINT) AS key,
       |  a AS score_fp FROM a$HitsIters
       |ORDER BY kind, key""".stripMargin
  }

  val d32Sql: String = {
    val base = RankScale - RankScale * DampNum / DampDen
    def step(i: Int) =
      s"""r$i AS (
         |  SELECT un.dst AS node,
         |    CAST($base + (sum(r${i - 1}.r // dg.deg) * $DampNum)
         |      // $DampDen AS BIGINT) AS r
         |  FROM un
         |  JOIN dg ON dg.src = un.src
         |  JOIN r${i - 1} ON r${i - 1}.node = un.src
         |  GROUP BY un.dst)""".stripMargin
    s"""WITH ed AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |un AS (
       |  SELECT c AS src, s + $SuppBase AS dst FROM ed
       |  UNION ALL
       |  SELECT s + $SuppBase AS src, c AS dst FROM ed),
       |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
       |       FROM un GROUP BY 1),
       |r0 AS (SELECT src AS node, CAST($RankScale AS BIGINT) AS r
       |       FROM dg),
       |${(1 to PrIters).map(step).mkString(",\n")}
       |SELECT
       |  CASE WHEN node >= $SuppBase THEN 'supplier'
       |       ELSE 'customer' END AS kind,
       |  CAST(CASE WHEN node >= $SuppBase THEN node - $SuppBase
       |       ELSE node END AS BIGINT) AS key,
       |  r AS rank_fp
       |FROM r$PrIters
       |ORDER BY kind, key""".stripMargin
  }
}
