package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed BATCH output (SURVEY.md §2a) — the atomic-commit
  * story batch writes were missing (round-7 verdict #4): the
  * streaming file sink already reads back exactly-once via Spark's
  * manifest log, but a failed batch job used to leave partial parquet
  * visible to any directory-listing reader. The reference gets
  * transactional output for free from sqlite (map2db.py 1311-1345 —
  * one connection, one commit); at columnar scale the equivalent
  * contract is commit-by-manifest:
  *
  *   - the writer lists the data files it just produced and records
  *     (path, size) in `_graft_manifest`, then drops a `_GRAFT_COMMIT`
  *     marker LAST — the single atomic publish point (a create is
  *     atomic on HDFS and on object stores' PUT);
  *   - the committed reader refuses a directory with no marker (a
  *     died-mid-write job is invisible, not half-visible), reads the
  *     file list FROM the manifest — never from a directory listing —
  *     and verifies each file's size (a truncated upload fails
  *     loudly);
  *   - orphan files (a later failed attempt, a speculative task's
  *     leftovers, a concurrent writer) are simply not in the manifest
  *     and never reach the scan.
  *
  * Re-runs are idempotent: mode("overwrite") + re-commit replaces the
  * manifest wholesale. Everything goes through the Hadoop FileSystem
  * API, so the same code commits to local disk, HDFS, or an object
  * store. InterchangeSpec pins the contract (orphan invisible, no
  * marker refused, size drift refused); f05's compaction reads its
  * input and output through this reader.
  */
object AtomicCommit {

  val ManifestName = "_graft_manifest"
  val MarkerName = "_GRAFT_COMMIT"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data files under `root` (recursive — partitioned layouts), as
    * (relative path, size), sorted for a deterministic manifest. */
  private def dataFiles(f: FileSystem, root: Path): Seq[(String, Long)] = {
    val base = root.toUri.getPath
    val it = f.listFiles(root, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && name.startsWith("part-") &&
          !name.endsWith(".crc")) {
        val rel = s.getPath.toUri.getPath.stripPrefix(base)
          .stripPrefix("/")
        out += ((rel, s.getLen))
      }
    }
    out.result().sortBy(_._1)
  }

  /** Publish the data files currently under `path`: manifest first,
    * marker last. Call after any successful batch write. */
  def commit(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val root = new Path(path)
    val files = dataFiles(f, root)
    val body = files.map { case (rel, len) => s"$rel\t$len" }
      .mkString("", "\n", "\n")
    val mf = f.create(new Path(root, ManifestName), true)
    try mf.write(body.getBytes("UTF-8")) finally mf.close()
    // the marker create is the atomic publish point
    f.create(new Path(root, MarkerName), true).close()
  }

  /** Parquet write + commit, one call. */
  def writeParquetCommitted(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*)
     else w).parquet(path)
    commit(df.sparkSession, path)
  }

  /** Whether `path` holds a committed batch (the publish marker is
    * present) — the idempotence probe for build-once artifacts like
    * d56's fingerprint index: a committed directory is reused, an
    * absent or torn one is rebuilt. */
  def isCommitted(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(new Path(path), MarkerName))

  /** The committed file list: refuses an uncommitted directory,
    * verifies sizes. */
  def committedFiles(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val root = new Path(path)
    require(f.exists(new Path(root, MarkerName)),
      s"no $MarkerName marker at $path — refusing to read a " +
        "partial/uncommitted batch write")
    val in = f.open(new Path(root, ManifestName))
    val text = try {
      val bs = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bs.write(buf, 0, n); n = in.read(buf) }
      bs.toString("UTF-8")
    } finally in.close()
    text.split("\n").filter(_.nonEmpty).toSeq.map { line =>
      val Array(rel, len) = line.split("\t")
      val p = new Path(root, rel)
      require(f.exists(p), s"manifest names missing file $rel")
      val actual = f.getFileStatus(p).getLen
      require(actual == len.toLong,
        s"size drift on $rel: manifest $len, found $actual")
      p.toString
    }
  }

  /** Read EXACTLY the committed files — orphan parts from failed or
    * concurrent attempts never reach the scan. basePath keeps
    * hive-partition columns alive when the manifest points into a
    * partitioned layout. */
  def readParquetCommitted(spark: SparkSession, path: String)
      : DataFrame =
    spark.read.option("basePath", path)
      .parquet(committedFiles(spark, path): _*)

  // ---- durable derived artifacts (fingerprint + atomic publish) ----

  /** Source-change stamp a committed derived artifact records. */
  val SrcFpName = "_graft_src_fp"

  /** Change signal for a source parquet table: (relative path, size,
    * mtime) of every data file under `dir/table.parquet`, hashed — a
    * metadata-only probe (no data scan) that changes whenever the
    * source files are rewritten, replaced, or appended, so a derived
    * artifact (bucketed layout, ANN index) is never served stale.
    * mtime+len is exactly the change signal object-store ETags
    * encode, and the probe runs through the Hadoop FileSystem API on
    * local disk, HDFS, or an object store alike. */
  def tableFingerprint(spark: SparkSession, dir: String,
      table: String): String = {
    val root = new Path(s"$dir/$table.parquet")
    val f = fs(spark, root.toString)
    val entries = Seq.newBuilder[String]
    if (f.getFileStatus(root).isFile) {
      val s = f.getFileStatus(root)
      entries += s"${root.getName}\t${s.getLen}\t${s.getModificationTime}"
    } else {
      val it = f.listFiles(root, true)
      val base = root.toUri.getPath
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && !s.getPath.getName.endsWith(".crc"))
          entries += s"${s.getPath.toUri.getPath.stripPrefix(base)}" +
            s"\t${s.getLen}\t${s.getModificationTime}"
      }
    }
    val body = entries.result().sorted.mkString("\n")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The source fingerprint a committed artifact records, if any. */
  def readSrcFp(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(new Path(path), SrcFpName)
    val f = fs(spark, path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bs = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { bs.write(buf, 0, n); n = in.read(buf) }
        Some(bs.toString("UTF-8").trim)
      } finally in.close()
    }
  }

  /** Committed AND stamped with the expected source fingerprint. */
  def isCommittedFor(spark: SparkSession, path: String,
      fp: String): Boolean =
    isCommitted(spark, path) && readSrcFp(spark, path).contains(fp)

  /** Collision-free key for durable per-dataset artifact paths:
    * SHA-256 of the ABSOLUTE dataset dir (ADVICE r12: the previous
    * `Integer.toHexString(dir.hashCode)` key is 32-bit and
    * collision-prone — two aliasing dataset dirs would thrash
    * rebuilds or cross-serve one dataset's artifact for another; the
    * same adjudication moved d56's fingerprint index to SHA-256 in
    * round 9). The digest is the identity; staleness of data AT the
    * path is handled separately by [[tableFingerprint]]. */
  def dirKey(dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Build-once / reuse-everywhere publish of a derived artifact —
    * the d56 persisted-index contract (ADVICE r9), factored out so
    * every durable artifact (bucketed layout, ANN index) shares one
    * adjudicated implementation:
    *
    *  - a committed tree whose fingerprint matches `fp` is reused
    *    as-is and never DESTROYED: stale-tree removal moves the tree
    *    ASIDE atomically and re-checks its fingerprint before
    *    deleting the aside copy, so a matching tree published by a
    *    peer in the check→remove window (the r12-advice TOCTOU) is
    *    restored whole instead of deleted. Residual window: a reader
    *    that resolved [[committedFiles]] paths under `dst` before the
    *    move sees its files vanish mid-read and fails LOUDLY on the
    *    manifest existence/size checks — never a silent partial read
    *    — and succeeds on retry against the equivalently-republished
    *    tree (same fp, deterministic build);
    *  - otherwise `build(tmp)` writes a complete tree into a
    *    process-private temp dir, the fp stamp lands BEFORE the
    *    commit marker (a torn build can never present a marker
    *    without its fingerprint), and a rename is the single publish
    *    point;
    *  - losing the rename race is fine — the winner's artifact is
    *    equivalent (same source, deterministic build) — the loser
    *    discards its attempt and requires the winner's tree whole.
    *
    * Returns after `dst` holds a committed, fp-matching artifact. */
  def publishCommitted(spark: SparkSession, dst: String, fp: String,
      build: String => Unit): Unit = {
    val f = fs(spark, dst)
    val dstPath = new Path(dst)
    if (isCommittedFor(spark, dst, fp)) return
    val tmp = new Path(dst + ".build-" +
      ProcessHandle.current().pid() + "-" +
      java.util.UUID.randomUUID().toString.take(8))
    var published = false
    try {
      build(tmp.toString)
      val out = f.create(new Path(tmp, SrcFpName), true)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
      commit(spark, tmp.toString)
      if (f.exists(dstPath) && !isCommittedFor(spark, dst, fp)) {
        // Stale or torn tree (wrong/missing fp): move it ASIDE with
        // an atomic rename instead of deleting in place, then
        // re-check the aside copy — if a peer published a MATCHING
        // tree between the check above and the rename (ADVICE r12
        // TOCTOU), it is restored whole here, never destroyed.
        val aside = new Path(dst + ".stale-" +
          java.util.UUID.randomUUID().toString.take(8))
        if (f.rename(dstPath, aside)) {
          if (isCommittedFor(spark, aside.toString, fp) &&
              !f.exists(dstPath) && f.rename(aside, dstPath)) {
            // we had raced a matching publish: restored, nothing to
            // do — fall through, the lost-race check below passes
          } else if (f.exists(aside)) f.delete(aside, true)
        }
      }
      // Hadoop rename(tmp, dst) with dst an EXISTING directory moves
      // tmp INSIDE dst instead of returning false — re-check dst
      // right before the rename and treat any dst-existence as a
      // lost race rather than trusting rename's return value
      published = !f.exists(dstPath) && f.rename(tmp, dstPath) &&
        !f.exists(new Path(dstPath, tmp.getName))
      if (f.exists(new Path(dstPath, tmp.getName))) {
        // rename-into-dir happened anyway (dst appeared in the gap):
        // our tree nested inside the winner's — remove the orphan
        f.delete(new Path(dstPath, tmp.getName), true)
        published = false
      }
      if (!published) require(isCommittedFor(spark, dst, fp),
        s"lost artifact-publish race at $dst but no committed " +
          "matching artifact found")
    } finally {
      if (!published && f.exists(tmp)) f.delete(tmp, true)
    }
  }
}
