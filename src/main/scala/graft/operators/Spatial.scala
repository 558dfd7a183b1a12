package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Grid-bucketed spatial radius join (SURVEY.md §2c) — "every POI
  * within radius R of each query point", the proximity query a map
  * engine answers constantly (nearest charger / store / tile
  * neighbor). The reference holds all features of a tile in memory
  * and scans (map2db.py:815-1077); at 100 TB the only viable shape is
  * the grid-cell equi-join: bucket POIs once into R-sized cells, fan
  * each query out to its 3×3 cell neighborhood (a radius-R disc can
  * only intersect those), equi-join on the cell key, then apply the
  * exact distance predicate to the few candidates. All-pairs work
  * never happens; the shuffle is a plain hash join on a composite
  * integer key. Coordinates are integer micro-degree-ish units so
  * the distance math is exact int64 — oracle-identical. */
object Spatial {

  /** Cell size = radius: a disc of radius R centered anywhere in a
    * cell is covered by the 3×3 neighborhood. */
  val RadiusUnits = 50000L

  /** Derived point cloud (the g02 coordinate discipline): x∈[0,3.5M),
    * y∈[0,1.6M) integer units from event_id — portable arithmetic
    * both engines replay. Every 97th event is a query point; the rest
    * are POIs. */
  private def points(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"),
        (col("event_id") * 7919 % 3500000).as("x"),
        (col("event_id") * 104729 % 1600000).as("y"))

  private val pointsSql =
    """SELECT event_id,
      |  event_id * 7919 % 3500000 AS x,
      |  event_id * 104729 % 1600000 AS y
      |FROM events""".stripMargin

  /** g17: per query point — how many POIs fall inside the R-disc and
    * the squared distance of the nearest one (NULL when the disc is
    * empty; left join keeps those queries honest instead of dropping
    * them). The oracle replays the SAME semantics as a direct
    * distance join — the 3×3 cell prefilter is provably lossless at
    * cell=R, so the quadratic DuckDB form and the bucketed Spark form
    * agree row-for-row. */
  def g17RadiusJoin(spark: SparkSession, dir: String): DataFrame = {
    val R = RadiusUnits
    val pts = points(spark, dir)
    val qs = pts.filter(col("event_id") % 97 === 0)
    val pois = pts.filter(col("event_id") % 97 =!= 0)
      .select(col("x").as("px"), col("y").as("py"),
        (col("x") / R).cast("long").as("cx"),
        (col("y") / R).cast("long").as("cy"))
    val qcells = qs
      .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
      .select(col("event_id"), col("x"), col("y"),
        ((col("x") / R).cast("long") + col("dcx")).as("cx"),
        ((col("y") / R).cast("long") + col("dcy")).as("cy"))
    val hits = qcells
      .join(pois.hint("shuffle_hash"), Seq("cx", "cy"))
      .withColumn("d2",
        (col("x") - col("px")) * (col("x") - col("px")) +
          (col("y") - col("py")) * (col("y") - col("py")))
      .filter(col("d2") <= R * R)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_within"), min(col("d2")).as("min_d2"))
    // hits is aggregate-derived (statless) and scales with the query
    // count — force the shuffle join so Catalyst can't broadcast it
    // (the d49 lesson, enforced by the global broadcast gate)
    qs.select(col("event_id"))
      .join(hits.hint("shuffle_hash"), Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_within"), lit(0L)).as("n_within"),
        col("min_d2"))
      .orderBy(col("event_id"))
  }

  /** Grid cell size for the g18 bbox prefilter: polygons are ≤50-unit
    * patches, so a bbox spans at most a 2×2 cell block at 100. */
  val PipCell = 100L

  /** Orderkey cap for the g18 area list — containment queries run
    * against a BOUNDED set of areas of interest (≤ cap/500 polygons
    * at any scale factor), never N areas × N points. */
  val PipMaxOrder = 100000L

  /** g18: point-in-polygon containment (even-odd ray cast) — the
    * query side of the reference's ring handling (map2db.py 815-1077
    * classifies and clips rings; a consumer then asks "which features
    * fall INSIDE these areas"). The area list is bounded by contract
    * ([[PipMaxOrder]]) and each ring is a compact ≤50-unit patch, so
    * the scale shape holds: per-polygon bboxes fan out to the ≤4 grid
    * cells they span, points carry exactly one cell key, the
    * candidate set forms on a plain cell equi-join + exact bbox
    * filter (lossless: outside-bbox ⇒ outside polygon), and only
    * candidates join the edge relation (fanout ≤ ring length) for the
    * crossing count. Nothing all-pairs — candidates are O(points ×
    * areas-per-cell), and areas-per-cell is bounded by the area-list
    * contract. Point/ring coordinates use distinct prime moduli so
    * the derived cloud fills the 2-D domain instead of collapsing
    * onto a 1-D lattice. The half-open edge rule ((y1≤p<y2) xor swap)
    * makes shared vertices count once; the intersection-x comparison
    * is one double division on identical integers — IEEE-identical in
    * the oracle, which replays the SAME math as a direct bbox join. */
  def g18PointInPolygon(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val C = PipCell
    val ring = Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 500 === 0 &&
        col("l_orderkey") <= PipMaxOrder)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") * 7919 % 947 + col("l_partkey") % 50)
          .as("x"),
        (col("l_orderkey") * 104729 % 941 + col("l_suppkey") % 50)
          .as("y"))
    val w = W.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("x"), col("y"))
    val wAll = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val edges = ring
      .withColumn("x2",
        coalesce(lead(col("x"), 1).over(w), first(col("x")).over(wAll)))
      .withColumn("y2",
        coalesce(lead(col("y"), 1).over(w), first(col("y")).over(wAll)))
      .select(col("l_orderkey"), col("x").as("x1"), col("y").as("y1"),
        col("x2"), col("y2"))
    val poly = ring.groupBy(col("l_orderkey"))
      .agg(min(col("x")).as("minx"), max(col("x")).as("maxx"),
        min(col("y")).as("miny"), max(col("y")).as("maxy"),
        count(lit(1)).as("n_vertices"))
      .filter(col("n_vertices") >= 3)
    val pts = Tables.load(spark, dir, "events")
      .select(col("event_id"),
        (col("event_id") * 7919 % 997).as("px"),
        (col("event_id") * 104729 % 991).as("py"))
      .withColumn("cx", (col("px") / C).cast("long"))
      .withColumn("cy", (col("py") / C).cast("long"))
    val polyCells = poly
      .withColumn("cx", explode(expr(s"sequence(minx div $C, maxx div $C)")))
      .withColumn("cy", explode(expr(s"sequence(miny div $C, maxy div $C)")))
      .select(col("l_orderkey"), col("cx"), col("cy"),
        col("minx"), col("maxx"), col("miny"), col("maxy"))
    // polyCells/edges/the final inside relation are aggregate- or
    // window-derived (statless) — force shuffles, never broadcast a
    // corpus-scaling build (the global-gate discipline)
    val cand = pts.join(polyCells.hint("shuffle_hash"), Seq("cx", "cy"))
      .filter(col("px") >= col("minx") && col("px") <= col("maxx") &&
        col("py") >= col("miny") && col("py") <= col("maxy"))
      .select(col("event_id"), col("px"), col("py"), col("l_orderkey"))
    val straddles =
      (col("y1") <= col("py") && col("y2") > col("py")) ||
        (col("y2") <= col("py") && col("y1") > col("py"))
    val xCross = col("x1") +
      (col("py") - col("y1")).cast("double") / (col("y2") - col("y1")) *
        (col("x2") - col("x1"))
    val crossed = cand.join(edges.hint("shuffle_hash"), Seq("l_orderkey"))
      .withColumn("c",
        when(straddles && col("px") < xCross, 1L).otherwise(0L))
      .groupBy(col("l_orderkey"), col("event_id"))
      .agg(sum(col("c")).as("nc"))
    val inside = crossed.groupBy(col("l_orderkey"))
      .agg(sum(when(col("nc") % 2 === 1, 1L).otherwise(0L))
        .as("n_inside"))
    poly.select(col("l_orderkey"), col("n_vertices"))
      .join(inside.hint("shuffle_hash"), Seq("l_orderkey"), "left")
      .select(col("l_orderkey"), col("n_vertices"),
        coalesce(col("n_inside"), lit(0L)).as("n_inside"))
      .orderBy(col("l_orderkey"))
  }

  val g18Sql: String =
    s"""WITH ring AS (
      |  SELECT l_orderkey, l_linenumber,
      |    l_orderkey * 7919 % 947 + l_partkey % 50 AS x,
      |    l_orderkey * 104729 % 941 + l_suppkey % 50 AS y
      |  FROM lineitem
      |  WHERE l_orderkey % 500 = 0 AND l_orderkey <= $PipMaxOrder),
      |e AS (
      |  SELECT l_orderkey, x AS x1, y AS y1,
      |    COALESCE(lead(x) OVER w, first_value(x) OVER
      |      (PARTITION BY l_orderkey ORDER BY l_linenumber, x, y
      |       ROWS BETWEEN UNBOUNDED PRECEDING
      |         AND UNBOUNDED FOLLOWING)) AS x2,
      |    COALESCE(lead(y) OVER w, first_value(y) OVER
      |      (PARTITION BY l_orderkey ORDER BY l_linenumber, x, y
      |       ROWS BETWEEN UNBOUNDED PRECEDING
      |         AND UNBOUNDED FOLLOWING)) AS y2
      |  FROM ring WINDOW w AS (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, x, y)),
      |poly AS (
      |  SELECT l_orderkey, MIN(x) AS minx, MAX(x) AS maxx,
      |    MIN(y) AS miny, MAX(y) AS maxy, COUNT(*) AS nv
      |  FROM ring GROUP BY 1 HAVING COUNT(*) >= 3),
      |pts AS (
      |  SELECT event_id, event_id * 7919 % 997 AS px,
      |    event_id * 104729 % 991 AS py
      |  FROM events),
      |crossed AS (
      |  SELECT p.l_orderkey, t.event_id,
      |    SUM(CASE WHEN ((e.y1 <= t.py AND e.y2 > t.py)
      |            OR (e.y2 <= t.py AND e.y1 > t.py))
      |          AND t.px < e.x1 + (t.py - e.y1) / (e.y2 - e.y1)
      |            * (e.x2 - e.x1)
      |        THEN 1 ELSE 0 END) AS nc
      |  FROM poly p
      |  JOIN pts t ON t.px BETWEEN p.minx AND p.maxx
      |            AND t.py BETWEEN p.miny AND p.maxy
      |  JOIN e ON e.l_orderkey = p.l_orderkey
      |  GROUP BY 1, 2)
      |SELECT p.l_orderkey, CAST(p.nv AS BIGINT) AS n_vertices,
      |  CAST(COALESCE(SUM(CASE WHEN c.nc % 2 = 1 THEN 1 ELSE 0 END), 0)
      |    AS BIGINT) AS n_inside
      |FROM poly p LEFT JOIN crossed c ON c.l_orderkey = p.l_orderkey
      |GROUP BY 1, p.nv ORDER BY 1""".stripMargin

  /** Base zoom for the g19 pyramid (1024×1024 tile grid). */
  val PyramidBaseZoom = 10
  /** Coarsest level the rollup emits. */
  val PyramidMinZoom = 8

  /** g19: tile-pyramid rollup — building the OVERVIEW levels every
    * tile server pre-computes (the reference's zoom-interval
    * architecture stores features per level; serving zoomed-out views
    * needs per-tile aggregates at every coarser level). The scale
    * shape is the halving chain: features aggregate ONCE into base
    * tiles (the only corpus-scale shuffle), then each coarser level
    * derives from the level below it — a shuffle over a relation that
    * QUARTERS at every step, never re-touching the corpus. Parent =
    * child div 2 per axis; pure integer arithmetic. */
  def g19TilePyramid(spark: SparkSession, dir: String): DataFrame = {
    val grid = 1L << PyramidBaseZoom
    val base = Tables.load(spark, dir, "events")
      .groupBy((col("event_id") * 7919 % grid).as("tile_x"),
        (col("event_id") * 104729 % grid).as("tile_y"))
      .agg(count(lit(1)).as("n_features"))
      .withColumn("level", lit(PyramidBaseZoom))
    val levels = (PyramidBaseZoom - 1 to PyramidMinZoom by -1)
      .scanLeft(base) { (finer, lvl) =>
        finer.groupBy(expr("tile_x div 2").as("tile_x"),
            expr("tile_y div 2").as("tile_y"))
          .agg(sum(col("n_features")).as("n_features"))
          .withColumn("level", lit(lvl))
      }
    levels.reduce(_ unionByName _)
      .select(col("level"), col("tile_x"), col("tile_y"),
        col("n_features"))
      .orderBy(col("level"), col("tile_x"), col("tile_y"))
  }

  val g19Sql: String =
    s"""WITH l10 AS (
       |  SELECT event_id * 7919 % ${1L << PyramidBaseZoom} AS tile_x,
       |    event_id * 104729 % ${1L << PyramidBaseZoom} AS tile_y,
       |    COUNT(*) AS n_features
       |  FROM events GROUP BY 1, 2),
       |l9 AS (
       |  SELECT tile_x // 2 AS tile_x, tile_y // 2 AS tile_y,
       |    SUM(n_features) AS n_features
       |  FROM l10 GROUP BY 1, 2),
       |l8 AS (
       |  SELECT tile_x // 2 AS tile_x, tile_y // 2 AS tile_y,
       |    SUM(n_features) AS n_features
       |  FROM l9 GROUP BY 1, 2)
       |SELECT 10 AS level, tile_x, tile_y,
       |  CAST(n_features AS BIGINT) AS n_features FROM l10
       |UNION ALL
       |SELECT 9, tile_x, tile_y, CAST(n_features AS BIGINT) FROM l9
       |UNION ALL
       |SELECT 8, tile_x, tile_y, CAST(n_features AS BIGINT) FROM l8
       |ORDER BY level, tile_x, tile_y""".stripMargin

  val g17Sql: String =
    s"""WITH pts AS ($pointsSql),
       |q AS (SELECT * FROM pts WHERE event_id % 97 = 0),
       |p AS (SELECT * FROM pts WHERE event_id % 97 <> 0),
       |hits AS (
       |  SELECT q.event_id, COUNT(*) AS n_within,
       |    MIN((q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y))
       |      AS min_d2
       |  FROM q JOIN p
       |    ON (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y)
       |       <= ${RadiusUnits * RadiusUnits}
       |  GROUP BY q.event_id)
       |SELECT q.event_id,
       |  CAST(COALESCE(h.n_within, 0) AS BIGINT) AS n_within,
       |  h.min_d2
       |FROM q LEFT JOIN hits h ON h.event_id = q.event_id
       |ORDER BY q.event_id""".stripMargin

  /** g20: nearest-neighbor SNAP join — not "how many POIs are near"
    * (g17) but WHICH one: every query point snaps to its nearest POI
    * within the R-disc (GPS-trace → road matching, address → parcel
    * assignment — the reference's consumers do exactly this against
    * its output db). Same lossless 3×3 grid prefilter as g17; the
    * nearest pick is ONE partial-aggregable struct-min per query
    * (min (d², poi_id) — the q36 argmax-without-sort shape, so ties
    * break on the smaller POI id deterministically), no per-query
    * sort, no window. Queries with an empty disc keep a NULL snap
    * (left join) — dropped rows would silently shrink the trace. */
  def g20NearestSnap(spark: SparkSession, dir: String): DataFrame = {
    val R = RadiusUnits
    val pts = points(spark, dir)
    val qs = pts.filter(col("event_id") % 97 === 0)
    val pois = pts.filter(col("event_id") % 97 =!= 0)
      .select(col("event_id").as("poi_id"),
        col("x").as("px"), col("y").as("py"),
        (col("x") / R).cast("long").as("cx"),
        (col("y") / R).cast("long").as("cy"))
    val qcells = qs
      .withColumn("dcx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dcy", explode(sequence(lit(-1L), lit(1L))))
      .select(col("event_id"), col("x"), col("y"),
        ((col("x") / R).cast("long") + col("dcx")).as("cx"),
        ((col("y") / R).cast("long") + col("dcy")).as("cy"))
    val best = qcells
      .join(pois.hint("shuffle_hash"), Seq("cx", "cy"))
      .withColumn("d2",
        (col("x") - col("px")) * (col("x") - col("px")) +
          (col("y") - col("py")) * (col("y") - col("py")))
      .filter(col("d2") <= R * R)
      .groupBy(col("event_id"))
      .agg(min(struct(col("d2"), col("poi_id"))).as("b"))
      .select(col("event_id"), col("b.poi_id").as("snap_id"),
        col("b.d2").as("d2"))
    qs.select(col("event_id"))
      .join(best.hint("shuffle_hash"), Seq("event_id"), "left")
      .select(col("event_id"), col("snap_id"), col("d2"))
      .orderBy(col("event_id"))
  }

  val g20Sql: String =
    s"""WITH pts AS ($pointsSql),
       |q AS (SELECT * FROM pts WHERE event_id % 97 = 0),
       |p AS (SELECT * FROM pts WHERE event_id % 97 <> 0),
       |cand AS (
       |  SELECT q.event_id, p.event_id AS poi_id,
       |    (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) AS d2
       |  FROM q JOIN p
       |    ON (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y)
       |       <= ${RadiusUnits * RadiusUnits}),
       |best AS (
       |  SELECT event_id, MIN(d2) AS d2 FROM cand GROUP BY 1),
       |sel AS (
       |  SELECT c.event_id, MIN(c.poi_id) AS snap_id, b.d2
       |  FROM best b JOIN cand c
       |    ON c.event_id = b.event_id AND c.d2 = b.d2
       |  GROUP BY c.event_id, b.d2)
       |SELECT q.event_id, s.snap_id, s.d2
       |FROM q LEFT JOIN sel s ON s.event_id = q.event_id
       |ORDER BY q.event_id""".stripMargin
}
