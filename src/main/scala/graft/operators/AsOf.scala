package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — the event-analytics / feature-extraction
  * staple Spark has no built-in operator for (SURVEY.md §2a).
  *
  * Declarative single-shuffle formulation instead of a custom
  * physical operator: tag both inputs, union them, and take the
  * running `last(right_value, ignoreNulls)` over a window partitioned
  * by the key and ordered by (ts, side). Right rows sort before left
  * rows at equal timestamps, so a right row at exactly the left
  * timestamp matches (backward-inclusive). One exchange on the key,
  * no join explosion, AQE/skew-safe — at 100 TB this is strictly
  * better than a range-condition join, whose inequality predicate
  * would force a cross-ish join per key.
  *
  * Right-side values arrive as `<prefix><rightColumn>` columns.
  * Duplicate (key, ts) rows on the RIGHT are deterministic: the
  * window order carries the right-value struct as a final tiebreak,
  * so the backward join matches the LARGEST right-value tuple among
  * exact-timestamp duplicates and the forward join the smallest
  * (DuckDB's ASOF JOIN leaves this unspecified — pre-dedup if a
  * specific winner is required). This requires the right value
  * columns to be of orderable types (no maps).
  */
object AsOf {
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, prefix: String = "r_")
      : DataFrame = {
    val rightVal = struct(
      right.columns.filterNot(_ == key).map(col).toIndexedSeq: _*)
    val r = right.select(col(key).as("__k"), col(rightTs).as("__ts"),
      rightVal.as("__rval"), lit(0).as("__side"))
    val l = left
      .withColumn("__k", col(key))
      .withColumn("__ts", col(leftTs))
      .withColumn("__rval",
        lit(null).cast(r.schema("__rval").dataType))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__rval"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val rFields = r.schema("__rval").dataType
      .asInstanceOf[StructType].fieldNames
    rFields.foldLeft(matched) { (df, f) =>
      df.withColumn(prefix + f, col(s"__m.$f"))
    }.drop("__k", "__ts", "__rval", "__side", "__m")
  }

  /** FORWARD as-of join — each left row takes the EARLIEST right row
    * at-or-after its timestamp (delivery-promise / next-event
    * semantics; [[asofJoin]] is the backward mirror). Same
    * single-key-shuffle union plan, with the window frame flipped to
    * `[current, following]` and the running `first(right_value)`;
    * left rows sort BEFORE right rows at equal timestamps so an
    * exactly-simultaneous right row matches (forward-inclusive).
    * Duplicate (key, ts) right rows resolve deterministically to the
    * smallest right-value tuple (the `__rval` tiebreak in the window
    * order). */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, prefix: String = "r_")
      : DataFrame = {
    val rightVal = struct(
      right.columns.filterNot(_ == key).map(col).toIndexedSeq: _*)
    val r = right.select(col(key).as("__k"), col(rightTs).as("__ts"),
      rightVal.as("__rval"), lit(1).as("__side"))
    val l = left
      .withColumn("__k", col(key))
      .withColumn("__ts", col(leftTs))
      .withColumn("__rval",
        lit(null).cast(r.schema("__rval").dataType))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // DESCENDING running frame, not [current, unboundedFollowing]:
    // Spark's UnboundedFollowingWindowFunctionFrame rescans the
    // partition tail per row — O(rows²) per key. Reversing the sort
    // turns "first (ts, side, rval)-tuple at or after me" into "last
    // non-null in the incremental O(rows) running frame"; tie
    // semantics are unchanged (at equal ts the right row, side=1,
    // sorts before the left row under desc, so a simultaneous right
    // row still matches, and duplicate right rows still resolve to
    // the smallest __rval — the tuple nearest the current row).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").desc, col("__side").desc, col("__rval").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val rFields = r.schema("__rval").dataType
      .asInstanceOf[StructType].fieldNames
    rFields.foldLeft(matched) { (df, f) =>
      df.withColumn(prefix + f, col(s"__m.$f"))
    }.drop("__k", "__ts", "__rval", "__side", "__m")
  }

  /** q48: time-series gap fill (resample + forward fill) — the
    * feature-pipeline staple: per-supplier daily shipped quantity
    * over a dense day spine, missing days carrying the last observed
    * value. Composition of owned operators: per-series bounds →
    * `sequence()` spine explode → backward [[asofJoin]] (one key
    * shuffle, no inequality join). The spine is generated, never
    * collected; series count grows with the data, so the as-of
    * window partitioning scales with the corpus — there is no
    * low-cardinality sort anywhere. 1995 scan range reaches the
    * parquet reader as a pushed filter. */
  def q48GapFill(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
    val daily = li
      .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    val spine = daily.groupBy(col("l_suppkey"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("l_suppkey"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    asofJoin(spine, daily, "l_suppkey", "day", "day")
      // flag BEFORE the string cast (date = string would be false)
      .withColumn("is_gap",
        when(col("r_day") === col("day"), lit(0)).otherwise(lit(1)))
      .select(col("l_suppkey"),
        col("day").cast("string").as("day"),
        col("r_qty").as("qty_filled"), col("is_gap"))
      .orderBy(col("l_suppkey"), col("day"))
  }

  val q48Sql: String =
    """WITH daily AS (
      |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
      |    CAST(SUM(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-01-01'
      |  GROUP BY 1, 2),
      |spine AS (
      |  SELECT l_suppkey,
      |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |      AS day
      |  FROM (SELECT l_suppkey, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY 1))
      |SELECT s.l_suppkey, CAST(s.day AS VARCHAR) AS day,
      |  d.qty AS qty_filled,
      |  CASE WHEN d.day = s.day THEN 0 ELSE 1 END AS is_gap
      |FROM spine s ASOF LEFT JOIN daily d
      |  ON s.l_suppkey = d.l_suppkey AND d.day <= s.day
      |ORDER BY s.l_suppkey, s.day""".stripMargin
}
