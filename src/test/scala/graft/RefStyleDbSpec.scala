package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reads a database written by the REAL sqlite3 engine (python
  * stdlib), with reference-style schema: INTEGER UNIQUE (creates a
  * sqlite_autoindex entry in sqlite_master), ALTER TABLE-added vtag
  * columns (including a pre-ALTER SHORT record whose stored width is
  * narrower than the final schema — the reference's own migration
  * path, map2db.py:865,945,1051), and an identifier with an embedded
  * escaped quote. The fixture is generated here by
  * tools/gen_ref_style_db.py; skips only if python3 is unavailable. */
class RefStyleDbSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("reader handles a real-engine reference-style database") {
    val p = "/tmp/ref_style.db"
    val gen = try {
      scala.sys.process.Process(
        Seq("python3", "tools/gen_ref_style_db.py", p)).! == 0
    } catch { case _: Throwable => false }
    assume(gen && new java.io.File(p).exists(), "fixture not generated")
    val pts = graft.sources.FdoSink.readSqliteTable(spark, p, "points")
    assert(pts.columns.toSeq == Seq("m2db_pnum", "m2db_level",
      "m2db_minz", "m2db_maxz", "m2db_geometry", "m2db_layer_num",
      "m2db_tags", "m2db_name", "name:en", "tag\"x"))
    val rows = pts.collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(0) == 7L)
    assert(rows(0).getAs[String]("m2db_name") == "Dortmund")
    assert(rows(0).getAs[String]("tag\"x") == "qv")
    assert(rows(0).getAs[Array[Byte]]("m2db_geometry").toSeq ==
      Seq(0x01.toByte, 0x04.toByte))
    assert(rows(1).getLong(0) == 1002L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("m2db_geometry")))
    // the pre-ALTER record is short on disk; the reader must NULL-pad
    // the vtag tail instead of failing or misaligning
    assert(rows(2).getLong(0) == 2000L)
    assert(rows(2).getLong(1) == 1L)
    assert(rows(2).getAs[String]("m2db_tags") == "old")
    assert(rows(2).isNullAt(rows(2).fieldIndex("m2db_name")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("name:en")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("tag\"x")))
    val lim = graft.sources.FdoSink.readSqliteTable(spark, p, "limits")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(lim == Map("minlat" -> 51.5, "maxlon" -> 7.6))
  }
}
