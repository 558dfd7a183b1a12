package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** STREAMING throughput measurement (round-9 verdict item 7): §2e had
  * stream==batch correctness pins but no throughput number anywhere in
  * scale_curve.json. This measures the real streaming leg of s01 — a
  * file-source stream through the watermarked 5-minute window
  * aggregation into the noop sink — at each scale factor's event
  * volume, recording rows/s and the per-micro-batch latency
  * distribution.
  *
  * Method: the events table is re-sharded into `shards` files in a
  * temp dir (SETUP, not workload — a production feed arrives as many
  * files; the driver testdata is one), then ONE streaming query with
  * `maxFilesPerTrigger = 1` and `Trigger.AvailableNow` drains it as
  * `shards` micro-batches. Wall-clock spans query start → drain;
  * per-batch latency comes from the query's own progress events
  * (`triggerExecution` ms). The temp source/checkpoint are deleted
  * before returning.
  */
object StreamBench {

  /** (total input rows, wall seconds, per-batch triggerExecution ms,
    * rows per second). */
  final case class Throughput(rows: Long, wallSec: Double,
      batchMs: Seq[Long]) {
    def rowsPerSec: Double = if (wallSec <= 0) 0.0 else rows / wallSec
    def avgBatchMs: Double =
      if (batchMs.isEmpty) 0.0 else batchMs.sum.toDouble / batchMs.size
    def maxBatchMs: Long = if (batchMs.isEmpty) 0L else batchMs.max
  }

  def s01Throughput(spark: SparkSession, dir: String,
      shards: Int = 16): Throughput = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-stream-bench").toString
    try {
      val src = s"$tmp/src"
      // setup: shard the batch-normalized events so the file source
      // has a multi-batch backlog
      Tables.load(spark, dir, "events")
        .repartition(shards).write.mode("overwrite").parquet(src)
      val schema = spark.read.parquet(src).schema
      val stream = Tables.normalizeEventsTs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src))
      val t0 = System.nanoTime()
      val q = EventStreams.windowedAgg(stream)
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      // AvailableNow over `shards` single-file batches stays far
      // below the 100-entry recentProgress retention, so the window
      // holds every batch of this run
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      Throughput(prog.map(_.numInputRows).sum, wall,
        prog.map(_.durationMs.get("triggerExecution").toLong))
    } finally deleteRecursively(tmp)
  }

  private def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(path))
  }
}
