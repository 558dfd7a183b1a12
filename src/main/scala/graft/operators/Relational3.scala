package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Third tranche of the relational surface (SURVEY.md §2a): OLS
  * regression aggregates and the higher-order array-function surface.
  */
object Relational3 {

  /** q55: per-group OLS regression (slope / intercept / R²) of
    * extendedprice on quantity — the `regr_*` aggregate family,
    * derived from the same exact DECIMAL moment sums as q30 (one
    * shuffle carrying five exact partials per group; every double op
    * happens once, identically, on any engine or executor count).
    * The asymmetric DECIMAL(19,4)×DECIMAL(12,4) operand trick and
    * the ROUND(·,8) margin are q30's (see its scaladoc). */
  def q55Regression(spark: SparkSession, dir: String): DataFrame = {
    val qw = col("l_quantity").cast(DecimalType(19, 4))
    val q = col("l_quantity").cast(DecimalType(12, 4))
    val pw = col("l_extendedprice").cast(DecimalType(19, 4))
    val p = col("l_extendedprice").cast(DecimalType(12, 4))
    val agg = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(q).cast("double").as("sx"),
        sum(qw * q).cast("double").as("sxx"),
        sum(p).cast("double").as("sy"),
        sum(pw * p).cast("double").as("syy"),
        sum(qw * p).cast("double").as("sxy"))
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val covn = col("sxy") * n - sx * sy   // n²·cov
    val varx = col("sxx") * n - sx * sx   // n²·var(x)
    val vary = col("syy") * n - sy * sy
    val slope = covn / varx
    agg.select(col("l_returnflag"), n.cast("long").as("n_rows"),
        round(slope, 8).as("slope"),
        round((sy - slope * sx) / n, 8).as("intercept"),
        round((covn * covn) / (varx * vary), 8).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  val q55Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) *
      |             CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
      |      AS sy,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
      |             CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
      |      AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) *
      |             CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
      |      AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  ROUND((sxy * n - sx * sy) / (sxx * n - sx * sx), 8) AS slope,
      |  ROUND((sy - ((sxy * n - sx * sy) / (sxx * n - sx * sx)) * sx)
      |    / n, 8) AS intercept,
      |  ROUND(((sxy * n - sx * sy) * (sxy * n - sx * sy)) /
      |    ((sxx * n - sx * sx) * (syy * n - sy * sy)), 8) AS r2
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** q56: higher-order functions over array columns — `transform`,
    * `filter`, `aggregate`, `zip_with` on a per-order item array.
    * The array is bounded by lines-per-order (≤ 7), so the per-row
    * lambda work is O(1) and the whole query is one key shuffle; all
    * lambda arithmetic is integer-exact in cents (engine-portable).
    * Arrays are sorted on (linenumber, qty, price) — (l_orderkey,
    * l_linenumber) alone is NOT unique in the testdata. Output stays
    * scalar (driver hashing contract). */
  def q56HigherOrder(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").as("ln"),
        // the source columns are DOUBLE cents-with-2-decimals; a bare
        // long cast TRUNCATES in Spark but ROUNDS in DuckDB — round
        // explicitly (the value is within 1e-9 of the true cent, so
        // every round-to-nearest mode agrees)
        round(col("l_quantity") * 100, 0).cast("long").as("qc"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("pc"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(col("ln"), col("qc"),
        col("pc")))).as("items"))
    items.select(col("l_orderkey"),
        expr("aggregate(items, 0L, (a, x) -> a + x.qc)")
          .as("sum_qty_c"),
        expr("size(filter(items, x -> x.qc > 2500))").cast("long")
          .as("n_big"),
        expr("""aggregate(
            zip_with(transform(items, x -> x.qc),
                     transform(items, x -> x.pc), (q, p) -> q * p),
            0L, (a, x) -> a + x)""").as("dot_qp"),
        expr("array_max(transform(items, x -> x.pc * 2))")
          .as("max_double_price"))
      .orderBy(col("l_orderkey"))
  }

  val q56Sql: String =
    """WITH it AS (
      |  SELECT l_orderkey,
      |    list(qc ORDER BY ln, qc, pc) AS qs,
      |    list(pc ORDER BY ln, qc, pc) AS ps
      |  FROM (SELECT l_orderkey, l_linenumber AS ln,
      |          CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc,
      |          CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
      |        FROM lineitem)
      |  GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(list_sum(qs) AS BIGINT) AS sum_qty_c,
      |  CAST(len(list_filter(qs, x -> x > 2500)) AS BIGINT) AS n_big,
      |  CAST(list_sum(list_transform(generate_series(1, len(qs)),
      |    i -> qs[i] * ps[i])) AS BIGINT) AS dot_qp,
      |  CAST(list_max(list_transform(ps, x -> x * 2)) AS BIGINT)
      |    AS max_double_price
      |FROM it ORDER BY l_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_regression" -> (q55Regression _),
    "q56_higher_order" -> (q56HigherOrder _))

  val oracles: Map[String, String] = Map(
    "q55_regression" -> q55Sql,
    "q56_higher_order" -> q56Sql)
}
