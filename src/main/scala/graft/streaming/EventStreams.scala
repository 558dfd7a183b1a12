package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables

/** Structured Streaming operators over the events table
  * (SURVEY.md §2e).
  *
  * The windowed aggregation is written once against a DataFrame so the
  * identical plan runs both as a batch query (driver-verified against
  * the DuckDB time_bucket oracle) and as a streaming query with a
  * watermark (exercised in the spec via a file source + memory sink).
  */
object EventStreams {

  /** 5-minute tumbling window per event type. Batch/stream agnostic. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** s01 batch form: window start as an ISO string for the oracle. */
  def s01WindowAgg(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(Tables.load(spark, dir, "events"))
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  val s01Sql: String =
    """SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS VARCHAR)
      |    AS w_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  /** The same aggregation as a real streaming query over a file
    * source; used by the spec. */
  def streamingWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = Tables.load(spark, dir, "events").schema
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(batchSchema.fields.foldLeft(
        new org.apache.spark.sql.types.StructType()) { (st, f) =>
        if (f.name == "ts")
          st.add("ts", org.apache.spark.sql.types.LongType)
        else st.add(f)
      })
      .parquet(dir)
    windowedAgg(raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming ingest dedup: duplicate event_ids arriving within the
    * watermark horizon are dropped exactly once; dedup state ages out
    * with the watermark, so state size is bounded by the horizon's
    * event rate rather than the stream's lifetime — the property that
    * makes exact ingest dedup viable on an unbounded 100 TB/day feed. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  // ---- stateful sessionization --------------------------------------
  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class Session(user_id: Long, n_events: Int, start: Timestamp,
      end: Timestamp)
  case class SessionState(n: Int, start: Long, last: Long)

  /** Gap-based sessionization with mapGroupsWithState semantics: a
    * session closes after `gapMinutes` of inactivity. Batch-testable
    * via the same flatMap logic. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val sorted = it.toSeq.sortBy(_.ts.getTime)
      val out = Seq.newBuilder[Session]
      var st: Option[SessionState] = None
      sorted.foreach { e =>
        val t = e.ts.getTime
        st match {
          case Some(s) if t - s.last <= gapMs =>
            st = Some(s.copy(n = s.n + 1, last = t))
          case Some(s) =>
            out += Session(uid, s.n, new Timestamp(s.start),
              new Timestamp(s.last))
            st = Some(SessionState(1, t, t))
          case None => st = Some(SessionState(1, t, t))
        }
      }
      st.foreach(s => out += Session(uid, s.n, new Timestamp(s.start),
        new Timestamp(s.last)))
      out.result().iterator
    }
  }

  /** Streaming form with explicit state, for the spec: one state
    * object per user, emitting closed sessions. */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = Seq.newBuilder[Session]
          var st = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            st match {
              case Some(s) if t - s.last <= gapMs =>
                st = Some(s.copy(n = s.n + 1, last = t))
              case Some(s) =>
                out += Session(uid, s.n, new Timestamp(s.start),
                  new Timestamp(s.last))
                st = Some(SessionState(1, t, t))
              case None => st = Some(SessionState(1, t, t))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
