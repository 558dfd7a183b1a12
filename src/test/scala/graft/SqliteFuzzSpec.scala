package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized real-engine databases round-tripped through
  * `FdoSink.readSqliteTable`: the stdlib sqlite3 engine writes tables
  * with random schemas (rowid aliases, quoted/colon/embedded-quote
  * identifiers), random values (NULLs, ±2⁶² integers, floats, multi-KB
  * strings that overflow pages, blobs) and mid-insert ALTER TABLE
  * (short records); the generator dumps every cell type-tagged and
  * this spec compares the DataFrame cell-for-cell. Exercises the
  * reader paths a migrating map2db user's real databases hit. */
class SqliteFuzzSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def check(seed: Int): Unit = {
    val db = s"/tmp/graft_fuzz_$seed.db"
    val dump = s"/tmp/graft_fuzz_$seed.jsonl"
    val gen = try {
      scala.sys.process.Process(Seq("python3",
        "tools/gen_fuzz_sqlite.py", db, dump, seed.toString)).! == 0
    } catch { case _: Throwable => false }
    assume(gen, "fixture not generated (python3 unavailable)")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val rows = scala.io.Source.fromFile(dump, "UTF-8").getLines()
      .map { line =>
        val j = JsonMethods.parse(line)
        val JString(t) = (j \ "t"): @unchecked
        val cells = (j \ "c") match {
          case JArray(cs) => cs.map { case JString(s) => s
            case other => fail(s"bad cell $other") }
          case other => fail(s"bad cells $other")
        }
        (t, cells)
      }.toSeq.groupBy(_._1)
    rows.foreach { case (table, expected) =>
      // the reader materializes rows in rowid order (tableRows walks
      // the b-tree in key order into a local relation)
      val got = graft.sources.FdoSink
        .readSqliteTable(spark, db, table).collect()
      assert(got.length == expected.length, s"$table row count")
      got.zip(expected.map(_._2)).zipWithIndex.foreach {
        case ((row, cells), rn) =>
          assert(row.length == cells.length,
            s"$table row $rn width: ${row.length} vs ${cells.length}")
          cells.zipWithIndex.foreach { case (cell, i) =>
            def ctx = s"$table row $rn col $i (${row.schema(i).name})"
            if (cell == "n") assert(row.isNullAt(i), s"$ctx not null")
            else {
              val (tag, v) = (cell.take(1), cell.drop(2))
              tag match {
                case "i" => assert(row.getLong(i) == v.toLong, ctx)
                case "f" =>
                  val bits = java.lang.Long.parseUnsignedLong(v, 16)
                  assert(java.lang.Double
                    .doubleToLongBits(row.getDouble(i)) == bits, ctx)
                case "s" => assert(row.getString(i) == v, ctx)
                case "b" =>
                  val exp = v.grouped(2)
                    .map(Integer.parseInt(_, 16).toByte).toArray
                  assert(java.util.Arrays.equals(
                    row.getAs[Array[Byte]](i), exp), ctx)
                case other => fail(s"unknown tag $other in $ctx")
              }
            }
          }
      }
    }
  }

  test("reader round-trips randomized real-engine databases (seed 11)") {
    check(11)
  }
  test("reader round-trips randomized real-engine databases (seed 42)") {
    check(42)
  }
}
