package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MapOps, Sampling}
import graft.streaming.EventStreams

/** Semantics checks for the round-2 coverage additions (the oracle
  * hash-compare covers values; these pin the properties that make the
  * operators correct at scale). */
class BatchBSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("d09 stratified sample is identical under repartitioning") {
    val a = Sampling.d09StratifiedSample(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.d09StratifiedSample(spark, sf)
      .repartition(13).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("s03 hopping windows hold each event exactly twice") {
    val hopped = EventStreams.s03HoppingWindow(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    val events = Tables.load(spark, sf, "events").count()
    assert(hopped == 2 * events)
  }

  test("g12 neighbor degrees are in [0, 8] and mutual") {
    val rows = MapOps.g12TileNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.values.forall(n => n >= 0 && n <= 8))
    // adjacency is symmetric: if any tile counts k neighbors, each of
    // those neighbors counts this tile back — total degree is even
    assert(rows.values.sum % 2 == 0)
  }

  test("g11 lengths are nonnegative and zero-safe for 1-vertex ways") {
    val rows = MapOps.g11PolylineLength(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getLong(1)
      if (n > 0) assert(r.getDouble(2) >= 0.0)
    }
  }
}
