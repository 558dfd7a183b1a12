package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) spatial layout (SURVEY.md §2c) — the columnar-
  * scale answer to the reference's row-major flat tile index
  * (map2db.py:407-421, `tile_y * width + tile_x`).
  *
  * Row-major is a 1-D layout: consecutive index values share a
  * tile_y but sweep the whole x axis, so a bbox query over a
  * y-interval touches every stripe. Interleaving the bits of
  * (tile_x, tile_y) instead makes index-adjacent tiles SPATIALLY
  * adjacent (the Morton / Z-curve, public algorithm — Morton 1966,
  * the layout every columnar lakehouse ships as OPTIMIZE ZORDER BY):
  * sort the table by the interleave at write time and every output
  * file covers a compact square-ish patch, so each file's parquet
  * min/max column stats on tile_x AND tile_y are tight, and a bbox
  * read skips everything outside the patch — pruning on BOTH axes
  * from plain per-column stats, no spatial index structure needed.
  *
  * The interleave is exact integer bit arithmetic (the magic-number
  * spread), identical in Spark and DuckDB — g16 hash-verifies the
  * kernel AND the layout property (per-Z-range extents are tight
  * squares; per-row-major-range extents are full-width stripes).
  * ZOrderSpec reads the actual parquet footers back and pins the
  * pruning math the scanner runs: the fraction of files whose
  * min/max box intersects a bbox query is small under Z-order and
  * near-total under row-major, on both axes.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (classic
    * magic-number dilation; exact on BIGINT in both engines). */
  def spreadBits(c: Column): Column = {
    val s1 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two ≤16-bit tile coordinates: x owns the
    * even bits, y the odd. */
  def morton(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** The same dilation in DuckDB SQL (nested — no macros so the
    * oracle stays one statement). */
  private def spreadSql(v: String): String = {
    val s1 = s"(($v | ($v << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Tiles per layout bucket in g16 — the "file" surrogate: the
    * pruning statement is about the extent stats of each contiguous
    * key range, which is exactly what a range-partitioned sorted
    * write puts in each file's footer. */
  val BucketTiles = 256L

  /** g16: Morton layout vs row-major layout, the pruning math as a
    * relation. A deterministic 64×64 tile grid (dense — every
    * lineitem row lands on a tile) is bucketed two ways into
    * [[BucketTiles]]-tile "files": by Morton code and by the
    * reference's row-major index. Per bucket the query emits the
    * min/max extents on both axes — the exact numbers a parquet
    * footer would carry for that file. Under Morton every bucket is
    * a tight 16×16 square (span_x = span_y = 15); under row-major
    * it is 4 full-width stripes (span_x = 63). The hash match proves
    * the interleave arithmetic AND the tight-extents property;
    * ZOrderSpec proves the same numbers appear in real footers and
    * drive real file skipping. */
  def g16MortonLayout(spark: SparkSession, dir: String): DataFrame = {
    val grid = 64L
    val tiles = Tables.load(spark, dir, "lineitem")
      .select((col("l_partkey") % grid).as("tile_x"),
        (col("l_suppkey") % grid).as("tile_y"))
      .groupBy(col("tile_x"), col("tile_y"))
      .agg(count(lit(1)).as("n_features"))
    val coded = tiles.select(col("tile_x"), col("tile_y"),
      col("n_features"),
      (morton(col("tile_x"), col("tile_y")) / BucketTiles)
        .cast("long").as("z_bucket"),
      ((col("tile_y") * grid + col("tile_x")) / BucketTiles)
        .cast("long").as("rm_bucket"))
    val z = coded.groupBy(col("z_bucket").as("bucket"))
      .agg(min(col("tile_x")).as("min_x"), max(col("tile_x")).as("max_x"),
        min(col("tile_y")).as("min_y"), max(col("tile_y")).as("max_y"),
        sum(col("n_features")).cast("long").as("n_features"))
      .select(lit("zorder").as("layout"), col("bucket"), col("min_x"),
        col("max_x"), col("min_y"), col("max_y"), col("n_features"))
    val rm = coded.groupBy(col("rm_bucket").as("bucket"))
      .agg(min(col("tile_x")).as("min_x"), max(col("tile_x")).as("max_x"),
        min(col("tile_y")).as("min_y"), max(col("tile_y")).as("max_y"),
        sum(col("n_features")).cast("long").as("n_features"))
      .select(lit("rowmajor").as("layout"), col("bucket"), col("min_x"),
        col("max_x"), col("min_y"), col("max_y"), col("n_features"))
    z.unionAll(rm).orderBy(col("layout"), col("bucket"))
  }

  val g16Sql: String = {
    val m = mortonSql("tile_x", "tile_y")
    s"""WITH tiles AS (
       |  SELECT l_partkey % 64 AS tile_x, l_suppkey % 64 AS tile_y,
       |    CAST(COUNT(*) AS BIGINT) AS n_features
       |  FROM lineitem GROUP BY 1, 2),
       |coded AS (
       |  SELECT tile_x, tile_y, n_features,
       |    $m // $BucketTiles AS z_bucket,
       |    (tile_y * 64 + tile_x) // $BucketTiles AS rm_bucket
       |  FROM tiles)
       |SELECT layout, bucket, min_x, max_x, min_y, max_y, n_features
       |FROM (
       |  SELECT 'zorder' AS layout, z_bucket AS bucket,
       |    MIN(tile_x) AS min_x, MAX(tile_x) AS max_x,
       |    MIN(tile_y) AS min_y, MAX(tile_y) AS max_y,
       |    CAST(SUM(n_features) AS BIGINT) AS n_features
       |  FROM coded GROUP BY z_bucket
       |  UNION ALL
       |  SELECT 'rowmajor', rm_bucket,
       |    MIN(tile_x), MAX(tile_x), MIN(tile_y), MAX(tile_y),
       |    CAST(SUM(n_features) AS BIGINT)
       |  FROM coded GROUP BY rm_bucket)
       |ORDER BY layout, bucket""".stripMargin
  }

  /** Z-ordered parquet write: range-partition on the Morton code
    * (each output file owns one contiguous Z range = one compact
    * spatial patch), sort within partitions so row groups nest the
    * same property, and write. At 100 TB this is a one-shuffle
    * layout job whose payoff is every later bbox scan; `nFiles`
    * maps to the cluster's target file size. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, path: String): Unit = {
    val z = morton(col(xCol), col(yCol))
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
