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
}
