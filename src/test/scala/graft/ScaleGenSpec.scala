package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-engine bench-replica generation (Bench's self-healing sf1/sf10
  * drills). Factor-2 replica of sf0.001 — the full-scale shapes are
  * exercised by the bench itself.
  */
class ScaleGenSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private lazy val dst = {
    val d = java.nio.file.Files
      .createTempDirectory("scalegen").toString
    ScaleGen.generate(spark, sf, d, factor = 2)
    d
  }

  test("fact tables double, dimensions stay single-copy") {
    for (t <- Seq("customer", "orders", "lineitem", "events",
        "documents", "embeddings")) {
      val src = Tables.load(spark, sf, t).count()
      val rep = Tables.load(spark, dst, t).count()
      assert(rep == 2 * src, s"$t: $rep != 2*$src")
    }
    for (t <- Seq("region", "nation"))
      assert(Tables.load(spark, dst, t).count() ==
        Tables.load(spark, sf, t).count(), t)
  }

  test("copies occupy disjoint key slots and preserve join integrity") {
    // every replicated order key resolves to exactly one customer —
    // the offsets kept referential integrity
    val orders = Tables.load(spark, dst, "orders")
    val cust = Tables.load(spark, dst, "customer")
    val dangling = orders.join(cust,
        orders("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(dangling == 0)
    // and the two copies don't collide on the order key
    val orderDups = orders.groupBy("o_orderkey").count()
      .filter(col("count") > 1).count()
    assert(orderDups == 0)
  }

  test("doc_id copies stay below the 1e6 near-dup plant boundary") {
    val mx = Tables.load(spark, dst, "documents")
      .agg(max("doc_id")).head.getLong(0)
    assert(mx < 1000000L, s"doc_id $mx crossed the plant boundary")
    assert(ScaleGen.ready(dst), "completion marker missing")
  }

  test("events timestamps survive the round trip") {
    val src = Tables.load(spark, sf, "events")
      .select("event_id", "ts").orderBy("event_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val rep = Tables.load(spark, dst, "events")
      .select("event_id", "ts").orderBy("event_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(rep.sameElements(src))
  }
}
