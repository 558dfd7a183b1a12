package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational9

/** Property pins for the round-13 relational additions beyond their
  * DuckDB oracles: q89's interpolation invariants and q90's regex
  * counts re-derived by an independent in-process implementation. */
class Relational9Spec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}
  import spark.implicits._

  test("q89 interpolation: observed days exact, gaps bounded by " +
    "their anchors, endpoints observed") {
    val out = Relational9.q89Interpolate(spark, sf)
      .as[(Long, String, Double, Long)].collect()
      .groupBy(_._1).toSeq
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // series endpoints are observed values, never interpolated
      assert(sorted.head._4 == 0L && sorted.last._4 == 0L)
      // every gap value lies within [prev-obs, next-obs] (linear
      // interpolation is bounded by its anchors)
      var prev = sorted.head._3
      sorted.indices.foreach { i =>
        if (sorted(i)._4 == 1L) {
          val next = sorted.drop(i).find(_._4 == 0L).get._3
          val lo = math.min(prev, next) - 1e-6
          val hi = math.max(prev, next) + 1e-6
          assert(sorted(i)._3 >= lo && sorted(i)._3 <= hi,
            s"gap value ${sorted(i)._3} outside [$lo, $hi]")
        } else prev = sorted(i)._3
      }
    }
  }

  test("q90 regex counts match an independent per-user recount") {
    val got = Relational9.q90SeqMatch(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // rebuild every journey in plain Scala from the raw events and
    // count with java.util.regex — an implementation independent of
    // both engines
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("c"))
      .as[(Long, Long, Long, String)].collect()
    val conv = java.util.regex.Pattern.compile(Relational9.ConversionRe)
    val abnd = java.util.regex.Pattern.compile(Relational9.AbandonRe)
    def count(p: java.util.regex.Pattern, s: String): Long = {
      val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
    }
    val want = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val j = rows.sortBy(r => (r._2, r._3)).map(_._4).mkString
      val (nc, na) = (count(conv, j), count(abnd, j))
      if (nc + na > 0) Some(uid -> ((j.length.toLong, nc, na)))
      else None
    }
    assert(got == want)
    assert(got.valuesIterator.map(_._2).sum > 0,
      "no conversions found at this SF — the pattern never fires")
  }
}
