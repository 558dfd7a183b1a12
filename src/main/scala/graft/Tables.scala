package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table; at 100 TB each of these would be a
  * partitioned parquet directory — the loader API is unchanged, only
  * the path contents differ, and every downstream operator is
  * declarative so Catalyst still prunes columns / pushes filters into
  * the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Write a table bucketed (and per-file sorted) by `key`, so
    * repeated joins/aggregations on that key read co-located buckets
    * and skip the shuffle entirely — the storage-level answer to "this
    * join runs every day on the same key". Catalog-registered because
    * bucket metadata lives in the table catalog, not in parquet. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively; read it as a long (nanos since epoch) and convert
    * with exact integer division (a double division would lose
    * precision above 2^53 ns). Files from other writers may carry ts
    * as an adjusted/unadjusted timestamp instead (e.g. the sf1 bench
    * replica) — normalize whatever arrives to a session-TZ timestamp
    * so downstream plans see one type. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize whatever ts representation arrived — INT64 nanos (the
    * historical driver encoding, read long under nanosAsLong), NTZ
    * wall-clock, or a plain adjusted timestamp (the round-7 driver
    * data is TIMESTAMP(MICROS)) — to one session-TZ timestamp type.
    * Shared by the batch loader and the streaming source, which MUST
    * dispatch on the arriving type the same way: round 7's testdata
    * flipped nanos→micros and the stream's hard-coded `div 1000`
    * silently shifted every event to 1970. */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // the NTZ wall-clock IS the UTC instant (the source data is
        // written in UTC). Rebuild the instant from the wall-clock
        // FIELDS interpreted as UTC: field extraction on NTZ is pure
        // wall-clock arithmetic and make_timestamp(..., 'UTC') is a
        // bijection (UTC has no DST), so this is exact under ANY
        // spark.sql.session.timeZone. The previous round's
        // convert_timezone(UTC, sessionTz).cast("timestamp") was
        // lossy across a DST fall-back: two UTC instants share one
        // local wall-clock and the cast resolves a single offset,
        // shifting events in the ambiguous hour (ScaleOpsSpec pins
        // the fall-back hour explicitly).
        raw.withColumn("ts", expr(
          "make_timestamp(year(ts), month(ts), day(ts), hour(ts), " +
            "minute(ts), extract(SECOND FROM ts), 'UTC')"))
      case _ => raw
    }
  }
}
