package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Pruning evidence for the Z-order layout: not an assertion about
  * plans, but about the actual parquet FOOTER stats a scanner prunes
  * with — written files' per-column min/max on tile_x AND tile_y —
  * compared against the reference-shaped row-major layout on the
  * same grid. */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val Grid = 128L
  private val NFiles = 64

  /** (file, min_x, max_x, min_y, max_y) straight from the footers. */
  private def footerExtents(dir: String)
      : Seq[(String, Long, Long, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .toSeq.map { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getPath), conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala
          def stats(col: String): (Long, Long) = {
            val s = blocks.map(_.getColumns.asScala
              .find(_.getPath.toDotString == col).get.getStatistics)
            (s.map(_.genericGetMin.asInstanceOf[java.lang.Long]
              .longValue).min,
              s.map(_.genericGetMax.asInstanceOf[java.lang.Long]
                .longValue).max)
          }
          val (minX, maxX) = stats("tile_x")
          val (minY, maxY) = stats("tile_y")
          (f.getName, minX, maxX, minY, maxY)
        } finally reader.close()
      }
  }

  private def intersecting(ext: Seq[(String, Long, Long, Long, Long)],
      x0: Long, x1: Long, y0: Long, y1: Long): Int =
    ext.count { case (_, mnx, mxx, mny, mxy) =>
      mxx >= x0 && mnx <= x1 && mxy >= y0 && mny <= y1 }

  test("z-order files carry tight two-axis footer stats; row-major " +
      "stripes do not") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val grid = spark.range(Grid * Grid).select(
      (col("id") % Grid).as("tile_x"),
      (col("id") / Grid).cast("long").as("tile_y"),
      (col("id") * 7 % 1000).as("payload"))
    ZOrder.writeZOrdered(grid, "tile_x", "tile_y", NFiles, s"$base/z")
    // the reference's layout (map2db.py:407-421): row-major index
    val rm = col("tile_y") * Grid + col("tile_x")
    grid.repartitionByRange(NFiles, rm).sortWithinPartitions(rm)
      .write.mode("overwrite").parquet(s"$base/rm")

    val zExt = footerExtents(s"$base/z")
    val rmExt = footerExtents(s"$base/rm")
    assert(zExt.size == NFiles && rmExt.size == NFiles)

    // every z file is a compact patch: both spans ≤ a quarter of the
    // grid; every row-major file is a full-width stripe
    zExt.foreach { case (f, mnx, mxx, mny, mxy) =>
      assert(mxx - mnx <= Grid / 4 && mxy - mny <= Grid / 4,
        s"z file $f spans [$mnx,$mxx]x[$mny,$mxy] — not a patch") }
    rmExt.foreach { case (f, mnx, mxx, _, _) =>
      assert(mxx - mnx == Grid - 1,
        s"row-major file $f unexpectedly narrow on x") }

    // bbox query (16×16 corner box): z-order prunes to ≤2 files by
    // stats alone; row-major must open every stripe crossing the y
    // interval — and those stripes ALSO match any x, so an x-band
    // query (the other axis) prunes NOTHING under row-major
    val zBox = intersecting(zExt, 0, 15, 0, 15)
    val rmBox = intersecting(rmExt, 0, 15, 0, 15)
    assert(zBox <= 2, s"z-order bbox footprint: $zBox files")
    assert(rmBox >= NFiles / 16,
      s"row-major bbox footprint unexpectedly small: $rmBox")
    val zXBand = intersecting(zExt, 0, 15, 0, Grid - 1)
    val rmXBand = intersecting(rmExt, 0, 15, 0, Grid - 1)
    assert(zXBand <= NFiles / 4,
      s"z-order x-band footprint: $zXBand files")
    assert(rmXBand == NFiles,
      "row-major should be unable to prune an x-band")
    // y-band parity: both layouts prune y (row-major IS y-sorted)
    assert(intersecting(zExt, 0, Grid - 1, 0, 15) <= NFiles / 4)

    // runtime confirmation: the files that actually produce rows for
    // the bbox are exactly the stats footprint, and no rows are lost
    val zRead = spark.read.parquet(s"$base/z")
      .filter(col("tile_x") <= 15 && col("tile_y") <= 15)
    assert(zRead.count() == 256L)
    val touched = zRead.select(input_file_name()).distinct().count()
    assert(touched <= zBox,
      s"bbox read touched $touched files, stats footprint $zBox")
  }

  test("morton kernel: interleave round-trips and orders locally") {
    val rows = spark.range(256).select(
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
      .select(col("x"), col("y"),
        ZOrder.morton(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    def interleaveRef(x: Long, y: Long): Long =
      (0 until 16).map { b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }.reduce(_ | _)
    rows.foreach { case (x, y, z) =>
      assert(z == interleaveRef(x, y), s"morton($x,$y)") }
    // bijective on the grid
    assert(rows.map(_._3).distinct.length == 256)
  }
}
