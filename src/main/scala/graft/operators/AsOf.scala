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
  * Right-side values arrive as `<prefix><rightColumn>` columns. If
  * the right side can hold duplicate timestamps per key, pre-dedup it
  * (e.g. keep max of a tiebreak column) — the winner among exact ties
  * is otherwise unspecified, same as DuckDB's ASOF JOIN.
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
      .orderBy(col("__ts"), col("__side"))
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
}
