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

  /** The (src, dst, deg) graph relation pinned per (session, dir) —
    * iterative algorithms re-walk their edge relation every round, so
    * it materializes ONCE (the GraphX/Pregel convention, and this
    * repo's simCache pattern); without the pin each iteration's
    * lineage re-derives the edge build from the full lineitem scan.
    * [[releaseGraphCache]] drops the pin; Bench/ScaleCurve call it
    * between sections. */
  private val graphCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  def releaseGraphCache(): Unit = {
    graphCache.values.foreach(_.unpersist())
    graphCache.clear()
  }

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
  def d32Pagerank(spark: SparkSession, dir: String): DataFrame = {
    // duplicate-tolerant edge extraction: distinct BELOW the join.
    // Edge extraction only needs distinct pairs, so deduplicating
    // each side first bounds the orderkey join by the true key
    // cardinality — duplicated rows (re-ingested files, replicated
    // test data) would otherwise multiply on BOTH sides of the join
    // and make it quadratic in the duplication factor (measured:
    // 130 s → 13 s at the 100× replica). At clean scale the extra
    // aggregate is map-side combined and nearly free.
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).distinct()
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val edges = ord
      .join(li.hint("shuffle_hash"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    val und = edges.select(col("c").as("src"),
        (col("s") + SuppBase).as("dst"))
      .unionAll(edges.select((col("s") + SuppBase).as("src"),
        col("c").as("dst")))
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = graphCache.getOrElseUpdate((spark, dir),
      und.join(deg.hint("shuffle_hash"), Seq("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var ranks = withDeg.select(col("src").as("node")).distinct()
      .select(col("node"), lit(RankScale).as("r"))
    for (_ <- 1 to PrIters) {
      ranks = withDeg
        .join(ranks.hint("shuffle_hash"),
          col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("m"))
        .select(col("dst").as("node"),
          (lit(RankScale - RankScale * DampNum / DampDen) +
            expr(s"(m * $DampNum) div $DampDen")).as("r"))
    }
    ranks
      .select(when(col("node") >= SuppBase, lit("supplier"))
          .otherwise(lit("customer")).as("kind"),
        when(col("node") >= SuppBase, col("node") - SuppBase)
          .otherwise(col("node")).as("key"),
        col("r").as("rank_fp"))
      .orderBy(col("kind"), col("key"))
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
