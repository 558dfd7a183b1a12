package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational3, TextAnalysis}

/** Cross-checks for the third relational tranche (q55/q56) and the
  * t22 source report — each validated against an independent Spark
  * formulation of the same statistic. */
class Relational3Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q55 slope/intercept/r2 agree with Spark's builtin regr stats") {
    val got = Relational3.q55Regression(spark, sf)
      .select("l_returnflag", "slope", "intercept", "r2")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val exp = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(regr_slope(col("l_extendedprice"), col("l_quantity"))
          .as("s"),
        regr_intercept(col("l_extendedprice"), col("l_quantity"))
          .as("i"),
        regr_r2(col("l_extendedprice"), col("l_quantity")).as("r"))
      .as[(String, Double, Double, Double)].collect()
    assert(exp.nonEmpty)
    exp.foreach { case (flag, s, i, r) =>
      val (gs, gi, gr) = got(flag)
      assert(math.abs(gs - s) < 1e-6, s"slope $flag: $gs vs $s")
      assert(math.abs(gi - i) < 1e-4, s"intercept $flag: $gi vs $i")
      assert(math.abs(gr - r) < 1e-6, s"r2 $flag: $gr vs $r")
    }
  }

  test("q56 higher-order results agree with flat aggregation") {
    val hof = Relational3.q56HigherOrder(spark, sf)
    val flat = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_quantity") * 100, 0).cast("long"))
          .as("f_sum"),
        sum(when(round(col("l_quantity") * 100, 0) > 2500, 1L)
          .otherwise(0L)).as("f_big"),
        max(round(col("l_extendedprice") * 100, 0).cast("long") * 2)
          .as("f_max"))
    val bad = hof.join(flat, "l_orderkey")
      .filter(col("sum_qty_c") =!= col("f_sum") ||
        col("n_big") =!= col("f_big") ||
        col("max_double_price") =!= col("f_max"))
      .count()
    assert(bad == 0)
    assert(hof.count() == flat.count())
  }

  test("t22 totals reconcile with the corpus") {
    val rep = TextAnalysis.t22SourceReport(spark, sf)
    val docs = Tables.load(spark, sf, "documents")
    assert(rep.agg(sum("n_docs")).head.getLong(0) == docs.count())
    assert(rep.agg(sum("total_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))
    // dup mass never exceeds the docs of its source, ratios in [0,1]
    val bad = rep.filter(col("dup_docs") > col("n_docs") ||
      col("dup_ratio") < 0 || col("dup_ratio") > 1).count()
    assert(bad == 0)
  }
}
