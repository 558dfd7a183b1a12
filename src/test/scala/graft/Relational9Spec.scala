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

  test("q96 Apriori-3: the L2 gate is lossless (every frequent " +
    "triple survives), the gate cuts the fanout, measures check out") {
    val rules = Relational9.q96Apriori3(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rules.nonEmpty && rules.size <= Relational9.Apriori3TopK)
    // independent plain-Scala recount: baskets → UNGATED frequent
    // triples — the Apriori property says the gate can never drop one
    val baskets = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"),
        floor(sqrt(pmod(col("l_partkey"), lit(196)).cast("double")))
          .cast("long").as("it"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nB = baskets.size.toLong
    val pairCnt = baskets.values.toSeq.flatMap(s =>
      s.toSeq.sorted.combinations(2).map(c => (c(0), c(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tripCnt = baskets.values.toSeq.flatMap(s =>
      s.toSeq.sorted.combinations(3).map(c => (c(0), c(1), c(2))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val freqTrips = tripCnt.filter { case (_, n) =>
      n * 1000000L / nB >= Relational9.TripleMinSupPpm }
    // every ungated frequent triple appears as 3 rules upstream of
    // the top-k cut — verify via the rule key set when k allows
    val ruleTriples = rules.map(r => {
      val s = Seq(r._1, r._2, r._3).sorted; (s(0), s(1), s(2)) })
      .toSet
    if (freqTrips.size * 3 <= Relational9.Apriori3TopK)
      assert(ruleTriples == freqTrips.keySet,
        s"gate dropped triples: ${freqTrips.keySet -- ruleTriples}")
    else assert(ruleTriples.subsetOf(freqTrips.keySet))
    // measured counts replay: n_abc, n_pair, support/confidence
    rules.foreach { r =>
      val key = { val s = Seq(r._1, r._2, r._3).sorted
        (s(0), s(1), s(2)) }
      assert(r._4 == tripCnt(key), s"n_abc mismatch for $key")
      assert(r._5 == pairCnt((r._1, r._2)), s"n_pair mismatch")
      assert(r._7 == r._4 * 1000000L / nB)
      assert(r._8 == r._4 * 1000000L / r._5)
      // Apriori property: the antecedent pair is at least as
      // frequent as its triple, and itself clears the pair floor
      assert(r._5 >= r._4)
      assert(r._5 * 1000000L / nB >= Relational9.PairMinSupPpm)
    }
    // the gate is REAL: infrequent pairs exist to prune
    val frequentPairs = pairCnt.filter { case (_, n) =>
      n * 1000000L / nB >= Relational9.PairMinSupPpm }
    assert(frequentPairs.size < pairCnt.size,
      "every pair is frequent — the L2 gate cannot cut anything")
    // top-k ordering: (lift desc, confidence desc, names)
    val keys = rules.map(r => (-r._9, -r._8, r._1, r._2, r._3))
    assert(keys == keys.sorted, "top-k rows not in rank order")
  }
}
