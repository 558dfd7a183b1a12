package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Interchange

/** Row-level round-trip pins for the interchange formats — stronger
  * than the f01/f02 digest oracles: every row must survive verbatim.
  */
class InterchangeSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  private def roundTripEquals(write: String => Unit,
      read: String => org.apache.spark.sql.DataFrame): Unit = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_interchange").toString
    val docs = Tables.load(spark, sf, "documents")
    write(dir)
    val back = read(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("jsonl round trip preserves every row verbatim") {
    val docs = Tables.load(spark, sf, "documents")
    roundTripEquals(
      d => docs.write.mode("overwrite").json(d),
      d => spark.read.schema(docs.schema)
        .option("mode", "FAILFAST").json(d))
  }

  test("csv round trip preserves every row verbatim") {
    val docs = Tables.load(spark, sf, "documents")
    roundTripEquals(
      d => docs.write.mode("overwrite").option("header", "true")
        .option("quote", "\"").option("escape", "\"").csv(d),
      d => spark.read.schema(docs.schema).option("header", "true")
        .option("quote", "\"").option("escape", "\"")
        .option("mode", "FAILFAST").csv(d))
  }

  test("csv round trip survives embedded quotes, commas, newlines") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "plain words"),
      (2L, "comma, separated, words"),
      (3L, "a \"quoted\" phrase"),
      (4L, "line one\nline two"),
      (5L, "trailing space "),
      (6L, ""),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_csv_tricky").toString
    tricky.write.mode("overwrite").option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      // the WRITER trims field whitespace by default — turn that off;
      // multiline fields need explicit opt-in on read; emptyValue
      // keeps "" distinct from null
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      // reader's default nullValue is "" — a \N sentinel keeps empty
      // string and NULL distinct through the round trip
      .option("emptyValue", "\"\"").option("nullValue", "\\N").csv(dir)
    val back = spark.read.schema(tricky.schema)
      .option("header", "true").option("quote", "\"")
      .option("escape", "\"").option("multiLine", "true")
      .option("emptyValue", "").option("nullValue", "\\N")
      .option("mode", "FAILFAST").csv(dir)
    assert(back.exceptAll(tricky).isEmpty
      && tricky.exceptAll(back).isEmpty)
  }

  test("digest queries run and agree between jsonl and csv paths") {
    val a = Interchange.f01JsonlRoundTrip(spark, sf).collect().toSeq
    val b = Interchange.f02CsvRoundTrip(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("compaction rewrites 50 planted files into 4, losing nothing") {
    val digest = Interchange.f05Compact(spark, sf).collect().toSeq
    assert(digest.nonEmpty)
    assert(Interchange.partFileCount(Interchange.smallDir(sf))
      == Interchange.SmallFiles)
    assert(Interchange.partFileCount(Interchange.compactedDir(sf))
      == Interchange.CompactTargets)
    // row mass is conserved: compacted digest == direct digest
    assert(digest == Interchange.f01JsonlRoundTrip(spark, sf)
      .collect().toSeq)
  }
}
