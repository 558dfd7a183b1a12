package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale replicas, generated in-engine.
  *
  * Replicates a source SF directory `factor` times with disjoint key
  * offsets (referential integrity preserved) — the same layout
  * tools/gen_sf.py produced, re-expressed as one Spark plan per table
  * so the bench can REBUILD the sf1/sf10 drill replicas whenever the
  * scratch directory was wiped between rounds (round 6 shipped no
  * scale sections for exactly that reason). Correctness/oracle runs
  * stay on the driver-generated directories; these replicas exist
  * only to drill the bench at the next scale factors.
  *
  * Shape notes carried over from the Python generator:
  *  - dimensions (region, nation) stay single-copy;
  *  - documents.doc_id offsets shrink with the factor so every copy
  *    stays below the 1e6 near-dup plant boundary the dedup operators
  *    synthesize against (guarded — a too-large source fails loudly
  *    rather than silently crossing it);
  *  - events.ts rides [[Tables.load]]'s nano-normalization and is
  *    written back as a plain timestamp (the loader accepts both).
  *
  * The replicate step is a single scan: source × a broadcast
  * `range(factor)` relation, offsets computed per copy in-plan — at a
  * real 100 TB this is how you'd fan out a synthetic load too, no
  * driver loop over copies.
  */
object ScaleGen {

  /** Manual invocation: `runMain graft.ScaleGen <src> <dst> <factor>`. */
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factor) = args
    val spark = Sessions.local()
    generate(spark, src, dst, factor.toInt)
    Tables.names.foreach { t =>
      println(s"  $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    spark.stop()
  }

  /** Marker written after ALL tables land; `ensure` treats a
    * directory without it (e.g. a half-written replica from a killed
    * run) as absent and regenerates. */
  private val Marker = "_GRAFT_OK"

  def ready(dst: String): Boolean =
    new java.io.File(dst, Marker).isFile

  /** Build the replica at `dst` unless its marker says it's complete.
    * Returns true when the replica is usable. */
  def ensure(spark: SparkSession, src: String, dst: String,
      factor: Int): Boolean = {
    if (ready(dst)) return true
    generate(spark, src, dst, factor)
    true
  }

  def generate(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    require(factor >= 1, s"factor $factor")
    new java.io.File(dst).mkdirs()
    val copies = broadcast(spark.range(factor.toLong).toDF("rep_i"))

    def write(name: String, df: DataFrame): Unit =
      df.write.mode(SaveMode.Overwrite)
        .parquet(s"$dst/$name.parquet")

    /** One scan of `name`, fanned out `factor`× with `step`-spaced
      * offsets added to each keyed column. */
    def replicate(name: String, steps: (String, Long)*): Unit = {
      val base = Tables.load(spark, src, name)
      val stepOf = steps.toMap
      val out = base.crossJoin(copies).select(base.columns.map { c =>
        stepOf.get(c) match {
          case Some(step) => (col(c) + col("rep_i") * step).as(c)
          case None       => col(c)
        }
      }.toIndexedSeq: _*)
      write(name, out)
    }

    /** Loud guard that every copy's ids stay inside its slot (one
      * bounded scalar collect). */
    def assertMaxBelow(name: String, key: String, bound: Long): Unit = {
      val mx = Tables.load(spark, src, name)
        .agg(max(col(key))).head.getLong(0)
      require(mx < bound,
        s"$name.$key max $mx >= step $bound: replica ids would collide")
    }

    for (t <- Seq("region", "nation"))
      write(t, Tables.load(spark, src, t))
    replicate("customer", "c_custkey" -> 1000000L)
    replicate("supplier", "s_suppkey" -> 100000L)
    replicate("part", "p_partkey" -> 1000000L)
    replicate("orders", "o_orderkey" -> 10000000L,
      "o_custkey" -> 1000000L)
    replicate("lineitem", "l_orderkey" -> 10000000L,
      "l_partkey" -> 1000000L, "l_suppkey" -> 100000L)
    replicate("events", "event_id" -> 10000000L,
      "user_id" -> 1000000L)
    val docStep = 1000000L / factor
    assertMaxBelow("documents", "doc_id", docStep)
    replicate("documents", "doc_id" -> docStep)
    assertMaxBelow("embeddings", "vec_id", 100000L)
    replicate("embeddings", "vec_id" -> 100000L)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst, Marker), Array.emptyByteArray)
  }
}
