package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tile ↔ EPSG:4326 coordinate transforms (map2db.py:321-347) and the
  * row-major flat tile index (map2db.py:407-421), as pure Column
  * compositions of built-in math functions — fully codegen'd, no UDF.
  *
  * These are the partition-key functions of the engine: at 100 TB the
  * tile number is the shuffle/bucket key, so they must stay inside
  * whole-stage codegen.
  */
object Tiles {
  private val Pi: Column = lit(math.Pi)

  /** Fractional tile X at zoom z for a longitude (map2db.py:322-323). */
  def tileXFromLon(z: Column, lonDeg: Column): Column =
    pow(lit(2.0), z - 1) * (lonDeg / 180.0 + 1.0)

  /** Fractional tile Y at zoom z for a latitude (map2db.py:326-330). */
  def tileYFromLat(z: Column, latDeg: Column): Column =
    pow(lit(2.0), z - 1) *
      (lit(2.0) - (log(tan((latDeg / 360.0 + 0.25) * Pi)) / Pi + 1.0))

  /** West edge longitude of tile x at zoom z (map2db.py:333-334). */
  def lonFromTileX(z: Column, x: Column): Column =
    (x / pow(lit(2.0), z) * 2.0 - 1.0) * 180.0

  /** North edge latitude of tile y at zoom z (map2db.py:337-347). */
  def latFromTileY(z: Column, y: Column): Column =
    (atan(exp(((pow(lit(2.0), z) - y) / pow(lit(2.0), z - 1) - 1.0) * Pi))
      / Pi - 0.25) * 360.0

  /** Row-major index of a tile within a subfile's bbox
    * (map2db.py:419-421). Integer-exact. */
  def tileNum(x: Column, y: Column, minX: Column, minY: Column,
      xCount: Column): Column =
    (y - minY) * xCount + (x - minX)
}
