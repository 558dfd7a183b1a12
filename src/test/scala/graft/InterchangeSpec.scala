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

  test("f10 dynamic partition overwrite rewrites ONLY the incoming " +
    "partition; static mode would truncate the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "c", 40L)).toDF("id", "lang", "v")
    val reload = Seq((1L, "a", 99L)).toDF("id", "lang", "v")
    val key = "spark.sql.sources.partitionOverwriteMode"
    def files(dir: String, p: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/lang=$p")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val dynDir = java.nio.file.Files
      .createTempDirectory("graft_dynover").toString
    base.write.mode("overwrite").partitionBy("lang").parquet(dynDir)
    val untouched = files(dynDir, "b")
    assert(untouched.nonEmpty)
    val saved = spark.conf.get(key, "STATIC")
    try {
      spark.conf.set(key, "dynamic")
      reload.write.mode("overwrite").partitionBy("lang").parquet(dynDir)
      // the b partition's FILES are bit-for-bit untouched, and the
      // table is reload ∪ other-partitions
      assert(files(dynDir, "b") == untouched,
        "dynamic overwrite rewrote an uninvolved partition")
      val got = spark.read.parquet(dynDir)
        .select(col("id"), col("lang").cast("string"), col("v"))
        .as[(Long, String, Long)].collect().sortBy(_._1)
      assert(got.toSeq ==
        Seq((1L, "a", 99L), (3L, "b", 30L), (4L, "c", 40L)))
      // contrast: STATIC mode on the same reload truncates the table
      val statDir = java.nio.file.Files
        .createTempDirectory("graft_statover").toString
      base.write.mode("overwrite").partitionBy("lang").parquet(statDir)
      spark.conf.set(key, "static")
      reload.write.mode("overwrite").partitionBy("lang")
        .parquet(statDir)
      assert(spark.read.parquet(statDir).count() == 1,
        "static overwrite kept partitions dynamic mode must preserve")
    } finally spark.conf.set(key, saved)
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

  test("corrupt jsonl: FAILFAST throws, PERMISSIVE quarantines") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corrupt").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-000.json"),
      """{"doc_id": 1, "text": "good row"}
        |{"doc_id": 2, "text": "truncated
        |{"doc_id": 3, "text": "also good"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // FAILFAST: corruption is an error, never silent nulls
    val thrown = intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).option("mode", "FAILFAST")
        .json(dir).collect()
    }
    assert(thrown.getMessage.toLowerCase.contains("malformed")
      || Option(thrown.getCause).exists(
        _.getMessage.toLowerCase.contains("malformed")))
    // PERMISSIVE + columnNameOfCorruptRecord: bad line quarantined,
    // good rows parse — the audit-then-continue production shape
    val quarantineSchema = schema.add("_bad",
      org.apache.spark.sql.types.StringType)
    // (cache required: Spark refuses corrupt-column-only queries
    // over the raw file source)
    val rows = spark.read.schema(quarantineSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir).cache()
    try {
      assert(rows.filter($"_bad".isNotNull).count() == 1)
      assert(rows.filter($"_bad".isNull).select("doc_id")
        .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    } finally rows.unpersist()
  }

  test("csv and jsonl round trips hold on adversarial random strings") {
    import spark.implicits._
    import org.scalacheck.Gen
    // quotes, commas, newlines, CR, tabs, unicode, leading/trailing
    // whitespace, empty — the payloads that break naive writers
    val ch = Gen.frequency(
      (6, Gen.alphaNumChar.map(_.toString)),
      (1, Gen.oneOf("\"", ",", "\n", "\r", "\t", " ", "\\", "é",
        "𝄞", "ß", "'", ";")))
    val strGen = Gen.listOf(ch).map(_.mkString)
    val rows = org.scalacheck.Gen.listOfN(60, strGen)
      .sample.getOrElse(Seq.fill(60)("fallback"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fuzz_rt").toString
    df.write.mode("overwrite").option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("emptyValue", "\"\"").option("nullValue", "\\N")
      .csv(s"$dir/csv")
    val csvBack = spark.read.schema(df.schema)
      .option("header", "true").option("quote", "\"")
      .option("escape", "\"").option("multiLine", "true")
      .option("emptyValue", "").option("nullValue", "\\N")
      .option("mode", "FAILFAST").csv(s"$dir/csv")
    assert(csvBack.exceptAll(df).isEmpty && df.exceptAll(csvBack).isEmpty,
      "csv round trip drift")
    df.write.mode("overwrite").json(s"$dir/jsonl")
    val jsonBack = spark.read.schema(df.schema)
      .option("mode", "FAILFAST").json(s"$dir/jsonl")
    assert(jsonBack.exceptAll(df).isEmpty
      && df.exceptAll(jsonBack).isEmpty, "jsonl round trip drift")
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

  test("atomic batch commit: orphans invisible, partial writes " +
      "refused, size drift refused") {
    import graft.sources.AtomicCommit
    val dir = java.nio.file.Files
      .createTempDirectory("graft_atomic").toString + "/out"
    val docs = Tables.load(spark, sf, "documents")
    AtomicCommit.writeParquetCommitted(docs, dir)
    val n = docs.count()
    assert(AtomicCommit.readParquetCommitted(spark, dir).count() == n)
    // a failed later attempt leaves an ORPHAN part file: a listing
    // reader would double-count; the manifest reader must not see it
    val orphanSrc = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    val orphan = new java.io.File(dir,
      "part-99999-orphan-attempt.snappy.parquet")
    java.nio.file.Files.copy(orphanSrc.toPath, orphan.toPath)
    assert(spark.read.parquet(dir).count() > n,
      "control: a listing read DOES see the orphan")
    assert(AtomicCommit.readParquetCommitted(spark, dir).count() == n,
      "manifest reader must ignore orphan parts")
    // re-commit adopts the orphan (idempotent re-run semantics:
    // whatever is on disk at commit time IS the table)
    AtomicCommit.commit(spark, dir)
    assert(AtomicCommit.readParquetCommitted(spark, dir).count() > n)
    // size drift on a committed file fails loudly BEFORE any scan
    // (truncated/padded upload) — grow the adopted orphan
    val grown = new java.io.FileOutputStream(orphan, true)
    try grown.write(0) finally grown.close()
    assertThrows[IllegalArgumentException] {
      AtomicCommit.readParquetCommitted(spark, dir)
    }
    // a manifest-named file that vanished is refused
    orphan.delete()
    assertThrows[IllegalArgumentException] {
      AtomicCommit.readParquetCommitted(spark, dir)
    }
    // re-commit heals back to the original table
    AtomicCommit.commit(spark, dir)
    assert(AtomicCommit.readParquetCommitted(spark, dir).count() == n)
    // a write that died before its publish point — no marker — is
    // refused outright
    new java.io.File(dir, AtomicCommit.MarkerName).delete()
    assertThrows[IllegalArgumentException] {
      AtomicCommit.readParquetCommitted(spark, dir)
    }
    assert(orphanSrc.exists())
  }

  test("atomic commit keeps hive-partition columns through basePath") {
    import graft.sources.AtomicCommit
    val dir = java.nio.file.Files
      .createTempDirectory("graft_atomic_part").toString + "/out"
    val docs = Tables.load(spark, sf, "documents")
    AtomicCommit.writeParquetCommitted(docs, dir, Seq("lang"))
    val back = AtomicCommit.readParquetCommitted(spark, dir)
    assert(back.columns.contains("lang"))
    assert(back.count() == docs.count())
  }

  test("fixed-width round trip errs LOUDLY on an over-width field") {
    // the format's failure mode is SILENT truncation; the width
    // guard must turn it into an error before any byte is written
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("fw_over").toString
    Seq((1L, "t", "en", "this-source-name-is-way-over-sixteen", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Interchange.f07FixedWidthRoundTrip(spark, dir).collect()
    }
    assert(e.getMessage.contains("exceed fixed-field widths"))
  }

  test("publishCommitted: concurrent builders race safely — exactly " +
    "one whole tree publishes, losers discard, stale fp rebuilds") {
    import graft.sources.AtomicCommit
    import org.apache.hadoop.fs.Path
    val dst = s"${sys.props("java.io.tmpdir")}/graft_race_" +
      java.util.UUID.randomUUID().toString.take(8)
    val f = new Path(dst).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def build(payload: String)(tmp: String): Unit = {
      val out = f.create(new Path(tmp, "part-000"), true)
      try out.write(payload.getBytes("UTF-8")) finally out.close()
    }
    try {
      // eight concurrent builders, one fingerprint: the d56 contract
      // says whoever wins publishes a WHOLE tree and every loser
      // discards its attempt and reuses the winner's
      val payloads = (0 until 8).map(i => s"builder-$i-" + ("x" * i))
      val threads = payloads.map { p =>
        new Thread(() =>
          AtomicCommit.publishCommitted(spark, dst, "fp1", build(p)))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(AtomicCommit.isCommittedFor(spark, dst, "fp1"))
      val files = AtomicCommit.committedFiles(spark, dst)
      assert(files.size == 1)
      val in = f.open(new Path(files.head))
      val content = try {
        val bs = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { bs.write(buf, 0, n); n = in.read(buf) }
        bs.toString("UTF-8")
      } finally in.close()
      // the tree is exactly ONE builder's — never an interleaving
      assert(payloads.contains(content), s"torn tree: $content")
      // no leftover .build- temp trees
      val parent = new Path(dst).getParent
      val leftovers = f.listStatus(parent).map(_.getPath.getName)
        .filter(_.startsWith(new Path(dst).getName + ".build-"))
      assert(leftovers.isEmpty, leftovers.mkString(", "))
      // a changed fingerprint rebuilds in place
      AtomicCommit.publishCommitted(spark, dst, "fp2", build("fresh"))
      assert(AtomicCommit.isCommittedFor(spark, dst, "fp2"))
      assert(!AtomicCommit.isCommittedFor(spark, dst, "fp1"))
    } finally f.delete(new Path(dst), true)
  }

  test("f12 gzip jsonl round-trips verbatim; a single .gz archive " +
    "reads as ONE partition (non-splittable) and repartition is the " +
    "remedy") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sf, "documents")
    roundTripEquals(
      dir => docs.write.mode("overwrite")
        .option("compression", "gzip").json(dir),
      dir => spark.read.schema(docs.schema)
        .option("mode", "FAILFAST").json(dir))
    // the scale hazard, pinned: ONE gzip archive = ONE task no matter
    // how many cores — coalesce(1) forces a single .gz, and the read
    // back cannot parallelize it
    val dir = java.nio.file.Files
      .createTempDirectory("graft_gz_hazard").toString
    docs.coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").json(dir)
    val one = spark.read.schema(docs.schema).json(dir)
    assert(one.rdd.getNumPartitions == 1,
      s"expected the non-splittable archive to read as 1 partition, " +
        s"got ${one.rdd.getNumPartitions}")
    // the remedy: repartition immediately after ingest so downstream
    // stages never inherit archive-count parallelism
    assert(one.repartition(8).rdd.getNumPartitions == 8)
    // and the multi-archive writer (f12's form) parallelizes the read
    val multi = spark.read.schema(docs.schema)
      .json(java.nio.file.Files
        .createTempDirectory("graft_gz_multi").toString match {
          case d =>
            docs.repartition(4).write.mode("overwrite")
              .option("compression", "gzip").json(d)
            d
        })
    assert(multi.rdd.getNumPartitions > 1)
  }
}
