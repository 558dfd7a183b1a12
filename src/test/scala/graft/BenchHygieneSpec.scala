package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 verdict #2: a bench run must leave /tmp no larger than it
  * found it. g13's per-invocation FDO output dir is deleted inside
  * [[graft.operators.MapBench.g13MapPipeline]] once the (eager)
  * counts are taken; the encoded fixture `.map` files are dropped by
  * `releaseFixtures()`, which Bench.main calls last.
  */
class BenchHygieneSpec extends AnyFunSuite {

  private val spark = Sessions.local()
  private val sf = "/root/testdata/sf0.001"
  private val tmp = new java.io.File(sys.props("java.io.tmpdir"))

  private def listTmp(prefix: String): Set[String] =
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith(prefix)).toSet

  test("g13 cleans its FDO output dir; releaseFixtures drops the maps") {
    graft.operators.MapBench.releaseFixtures() // known-clean start
    val fdoBefore = listTmp("graft-bench-fdo")
    val mapsBefore = listTmp("graft-test")
    val rows = graft.operators.MapBench.g13MapPipeline(spark, sf)
      .collect()
    assert(rows.nonEmpty, "g13 produced no table counts")
    // the invocation's own output dir is gone by return time
    assert(listTmp("graft-bench-fdo") == fdoBefore,
      "g13 leaked a graft-bench-fdo temp dir")
    // the fixture cache legitimately holds its encoded .map until the
    // explicit drop…
    assert(listTmp("graft-test").size >= mapsBefore.size)
    graft.operators.MapBench.releaseFixtures()
    // …after which /tmp is back to the starting set
    assert(listTmp("graft-test") == mapsBefore,
      "releaseFixtures left encoded fixture maps behind")
  }
}
