package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join (SURVEY.md §2a).
  *
  * Spark plans a raw `lo <= v AND v < hi` join as a nested-loop
  * (broadcast if one side is small, else catastrophic). The scale
  * path quantizes the domain: each interval explodes into the fixed-
  * width buckets it overlaps, points map to their single bucket, the
  * join becomes an equi-join on the bucket id, and the original range
  * predicate re-checks exactly. Work scales with
  * points + Σ(interval width)/bucketWidth instead of |points| ×
  * |intervals|; the bucket id shuffles like any other key (AQE/skew
  * tools apply).
  */
object RangeJoin {

  /** Join each row of `points` to every `intervals` row whose
    * [lo, hi) contains its `v`. `bucketWidth` trades replication of
    * wide intervals against bucket selectivity — pick it near the
    * median interval width. */
  def pointInInterval(points: DataFrame, v: String,
      intervals: DataFrame, lo: String, hi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(v) / bucketWidth).cast("long"))
    val iv = intervals
      .filter(col(hi) > col(lo)) // empty intervals match nothing
      .withColumn("__bucket",
        explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
          // hi lands in floor(hi/bw) even when exclusive-on-edge: the
          // one spurious bucket is removed by the exact re-check
          floor(col(hi) / bucketWidth).cast("long"))))
    p.join(iv, p("__bucket") === iv("__bucket") &&
        col(lo) <= col(v) && col(v) < col(hi))
      .drop("__bucket")
  }
}
