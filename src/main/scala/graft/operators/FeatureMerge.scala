package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-level / cross-tile feature merge (SURVEY.md §2c).
  *
  * map2db resolves each incoming feature against the database
  * row-at-a-time (map2db.py:747-812): a feature present at several
  * zoom levels keeps the highest-level (least simplified) version and
  * extends its zoom range downward; fragments of a feature from
  * several tiles at one level union their geometries.
  *
  * Here both collapse to single partial-aggregable `groupBy(fid)`
  * passes — one shuffle each regardless of scale, map-side combined,
  * AQE-skew-splittable. No driver-side loop.
  */
object FeatureMerge {

  /** Keep the max-level row per feature; `minz` extends to the
    * minimum seen across levels (map2db.py:785-809). Expects columns
    * `lvl`, `minz`, `maxz` alongside the feature id. */
  def dedupLevels(feats: DataFrame, fidCol: String): DataFrame =
    feats.groupBy(col(fidCol))
      .agg(
        max(col("lvl")).as("level"),
        min(col("minz")).as("minz"),
        max_by(col("maxz"), col("lvl")).as("maxz"),
        count(lit(1)).as("n_frag"))

  /** Cross-tile geometry union per feature (map2db.py:776-784): one
    * partial-aggregable shuffle on the feature id. */
  def unionGeoms(feats: DataFrame, fidCol: String,
      wkbCol: String): DataFrame =
    feats.groupBy(col(fidCol))
      .agg(graft.functions.GeomFunctions.unionWkb(col(wkbCol)).as(wkbCol))

  /** The reference's post-union line stitching pass
    * (map2db.py:1080-1182): linemerge each feature's multi-part
    * geometry, snapping near-coincident endpoints (2.1 µdeg) before a
    * second merge. Row-local (the heavy co-location already happened
    * in [[unionGeoms]]), so it pipelines with no extra shuffle. */
  def mergeLines(feats: DataFrame, wkbCol: String): DataFrame = {
    val mergeUdf = udf { (wkb: Array[Byte]) =>
      if (wkb == null || wkb.isEmpty) wkb
      else graft.functions.GeomOps.toWkb(
        graft.functions.GeomOps.mergeLineFeature(
          graft.functions.GeomOps.fromWkb(wkb)))
    }
    feats.withColumn(wkbCol, mergeUdf(col(wkbCol)))
  }
}
