package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reads a database written by the REAL sqlite3 engine (python
  * stdlib), with reference-style schema: INTEGER UNIQUE (creates a
  * sqlite_autoindex entry in sqlite_master) and ALTER TABLE-added
  * vtag columns. Skips when the fixture is absent (it is generated
  * by tools — see tools/check_sqlite.py's sibling snippet). */
class RefStyleDbSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("reader handles a real-engine reference-style database") {
    val p = "/tmp/ref_style.db"
    assume(new java.io.File(p).exists(), "fixture not generated")
    val pts = graft.sources.FdoSink.readSqliteTable(spark, p, "points")
    assert(pts.columns.toSeq == Seq("m2db_pnum", "m2db_level",
      "m2db_minz", "m2db_maxz", "m2db_geometry", "m2db_layer_num",
      "m2db_tags", "m2db_name", "name:en"))
    val rows = pts.collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(0) == 7L)
    assert(rows(0).getAs[String]("m2db_name") == "Dortmund")
    assert(rows(0).getAs[Array[Byte]]("m2db_geometry").toSeq ==
      Seq(0x01.toByte, 0x04.toByte))
    assert(rows(1).getLong(0) == 1002L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("m2db_geometry")))
    val lim = graft.sources.FdoSink.readSqliteTable(spark, p, "limits")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(lim == Map("minlat" -> 51.5, "maxlon" -> 7.6))
  }
}
