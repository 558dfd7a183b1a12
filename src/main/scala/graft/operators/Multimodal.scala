package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2d).
  *
  * Images/audio/video travel as opaque `binary` columns with a typed
  * metadata struct; decode/feature-extraction runs batched per
  * partition (the Scala analogue of `mapInPandas`). The decode itself
  * is STUBBED — this container has no media libraries — with a
  * deterministic fake (byte statistics standing in for pixel
  * statistics), but everything Spark-level is real: schema, binary
  * payload handling, per-partition batching, and the feature output
  * contract.
  *
  * At scale the payload column dominates IO: the metadata struct is
  * columnar so filters on format/size prune row groups without
  * touching payload bytes.
  */
object Multimodal {

  case class MediaMeta(format: String, n_bytes: Long, sample_rate: Int)
  case class MediaRow(doc_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
      mean_byte: Double, first_byte: Int)

  /** Attach a binary payload + typed metadata to each document. The
    * payload here is the UTF-8 text bytes (deterministic stand-in for
    * an image blob). */
  def attachPayload(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        encode(trim(col("text")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        MediaRow(id,
          MediaMeta(format = if (id % 2 == 0) "png" else "jpeg",
            n_bytes = payload.length.toLong,
            sample_rate = 0),
          payload)
      }
  }

  /** STUB decode: a real implementation would decode image bytes here
    * (pixels, resize, model features). The deterministic fake computes
    * byte statistics so the batched per-partition flow — open codec
    * once, process a batch of rows, emit fixed-schema features — is
    * exercised end to end. */
  def decodeFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition init (a codec/model handle in the real path)
      it.map { r =>
        // integer-sum / integer-length division — bit-identical in any
        // engine, no rounding needed
        val mean =
          if (r.payload.isEmpty) 0.0
          else r.payload.map(b => (b & 0xFF).toLong).sum.toDouble /
            r.payload.length
        MediaFeatures(r.doc_id, r.meta.format, r.meta.n_bytes, mean,
          if (r.payload.isEmpty) -1 else r.payload.head & 0xFF)
      }
    }
  }

  /** m01: the full attach→batch-decode flow as a query. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(attachPayload(spark, dir)).toDF()
      .orderBy(col("doc_id"))

  /** Oracle mirrors the byte statistics via ascii() (ASCII corpus). */
  val mediaFeaturesSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |  CAST(octet_length(encode(trim(text))) AS BIGINT) AS n_bytes,
      |  CAST(list_sum(list_transform(
      |      generate_series(1, length(trim(text))),
      |      i -> ascii(substr(trim(text), i, 1)))) AS DOUBLE)
      |    / length(trim(text)) AS mean_byte,
      |  ascii(substr(trim(text), 1, 1)) AS first_byte
      |FROM documents ORDER BY doc_id""".stripMargin
}
