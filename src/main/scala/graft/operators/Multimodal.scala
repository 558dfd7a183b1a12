package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2d).
  *
  * Images/audio/video travel as opaque `binary` columns with a typed
  * metadata struct; decode/feature-extraction runs batched per
  * partition (the Scala analogue of `mapInPandas`). Image decode is
  * REAL (r9): payloads that are PNG/JPEG by magic sniff decode
  * through [[graft.functions.ImageCodec]] (JDK imageio) and features
  * come from grayscale PIXELS; non-media payloads take a
  * deterministic byte-statistics fallback — the oracle-checked path
  * on the synthetic text-payload corpus. Everything Spark-level is
  * identical on both arms: schema, binary payload handling,
  * per-partition batching, and the feature output contract.
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

  /** Batched per-partition decode — open codec once, process a batch
    * of rows, emit fixed-schema features. Real-image payloads
    * (PNG/JPEG) decode to grayscale pixels and the features are PIXEL
    * statistics; everything else computes the same statistics over
    * raw bytes (deterministic — the synthetic corpus path the oracle
    * replays; a text payload can never sniff as an image, so the two
    * arms cannot alias). */
  def decodeFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition init point (a model handle would live here;
      // ImageCodec is stateless so nothing to open per partition)
      it.map { r =>
        val data = graft.functions.ImageCodec.decodeGray(r.payload)
          .map(_._3).getOrElse(r.payload)
        // integer-sum / integer-length division — bit-identical in any
        // engine, no rounding needed
        val mean =
          if (data.isEmpty) 0.0
          else data.map(b => (b & 0xFF).toLong).sum.toDouble / data.length
        MediaFeatures(r.doc_id, r.meta.format, r.meta.n_bytes, mean,
          if (data.isEmpty) -1 else data.head & 0xFF)
      }
    }
  }

  /** m01: the full attach→batch-decode flow as a query. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(attachPayload(spark, dir)).toDF()
      .orderBy(col("doc_id"))

  case class AudioFeatures(doc_id: Long, is_wav: Boolean,
      sample_rate: Long, channels: Long, duration_us: Long,
      block_rms: Seq[Long], block_zcr: Seq[Long])

  /** Blocks per payload for the m11 feature pass. */
  val AudioBlocks = 8

  /** m11: the AUDIO feature arm (m01's decode shape on the WAV
    * container): real WAV payloads report header metadata plus
    * per-block PCM features — floor-RMS energy and zero-crossing
    * counts over [[AudioBlocks]] equal sample ranges of channel 0
    * ([[graft.functions.AudioCodec.blockFeatures]] — the silence /
    * clipping / voiced-vs-noise gates a media-ingest pipeline runs
    * before any model); non-WAV payloads take the -1/empty fallback
    * arm (a text payload can never satisfy the RIFF chunk-walk gate,
    * so the arms cannot alias — m01's contract). Spark-side plumbing
    * is the batched per-partition map over the typed binary rows,
    * exactly m01's; ImageCodecSpec pins hand-computed features on
    * planted PCM payloads through this path. */
  def audioFeatures(rows: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val meta = graft.functions.AudioCodec.parseWav(r.payload)
        val feats = graft.functions.AudioCodec
          .blockFeatures(r.payload, AudioBlocks)
        AudioFeatures(r.doc_id,
          is_wav = meta.isDefined,
          sample_rate = meta.map(_._1).getOrElse(-1L),
          channels = meta.map(_._2.toLong).getOrElse(-1L),
          duration_us = graft.functions.AudioCodec
            .wavField(r.payload, 3),
          block_rms = feats.map(_._1).getOrElse(Nil),
          block_zcr = feats.map(_._2).getOrElse(Nil))
      }
    }
  }

  /** m02: frame sampling — the video-style access pattern: each
    * payload splits into fixed-size "frames" and every k-th frame is
    * emitted as its own row with its byte offset, ready for a decode
    * stage to read just that slice. The frame geometry is the real
    * plumbing (row explosion, offset arithmetic, slice extraction);
    * only the notion of a 16-byte "frame" stands in for a codec. */
  val FrameBytes = 16
  val SampleEvery = 4

  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val rows = attachPayload(spark, dir).toDF()
    rows
      .withColumn("n_frames",
        (col("meta.n_bytes") / FrameBytes).cast("long"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L), col("n_frames") - 1,
          lit(SampleEvery.toLong))).as("frame_idx"))
      .withColumn("byte_off", col("frame_idx") * FrameBytes)
      // the decode stage would read exactly this slice; sliced here so
      // the plumbing is exercised, hex'd so the oracle can compare
      .withColumn("frame_hex", hex(substring(col("payload"),
        (col("byte_off") + 1).cast("int"), lit(FrameBytes))))
      .select(col("doc_id"), col("frame_idx"), col("byte_off"),
        col("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Oracle for m02: same frame geometry and hex'd slice; the corpus
    * is ASCII so byte offsets equal character offsets. */
  val frameSampleSql: String =
    s"""WITH media AS (
       |  SELECT doc_id, trim(text) AS t,
       |    octet_length(encode(trim(text))) // $FrameBytes AS n_frames
       |  FROM documents)
       |SELECT doc_id, frame_idx, frame_idx * $FrameBytes AS byte_off,
       |  hex(encode(substring(t, CAST(frame_idx * $FrameBytes + 1 AS INT),
       |    $FrameBytes))) AS frame_hex
       |FROM media, unnest(range(0, n_frames, $SampleEvery)) AS u(frame_idx)
       |WHERE n_frames > 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** m03: content-defined-style chunk fingerprints — fixed 64-byte
    * chunks of each payload hashed with md5, then grouped to find
    * chunks shared across documents (binary-level dedup: the
    * multimodal analogue of d01, catching shared prefixes/segments
    * that whole-file hashing misses). Runs over the planted-dup
    * corpus so shared chunks actually exist. */
  val ChunkBytes = 64

  def chunkHash(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Dedup.corpusWithPlants(spark, dir)
      .select(col("doc_id"), encode(trim(col("text")), "UTF-8").as("payload"))
    corpus
      .withColumn("n_chunks",
        ceil(length(col("payload")) / lit(ChunkBytes.toDouble)).cast("long"))
      .filter(col("n_chunks") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("chunk_md5", md5(substring(col("payload"),
        (col("chunk_idx") * ChunkBytes + 1).cast("int"), lit(ChunkBytes))))
      .groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_copies") > 1)
      .orderBy(col("chunk_md5"))
  }

  /** Chunks shared by more docs than this are dropped from m05's
    * candidate join — the degenerate-bucket cap (a boilerplate
    * header chunk shared by the whole corpus would otherwise emit a
    * quadratic pair set), same role as d02's MaxBucketSize. */
  val MaxChunkCopies = 1000L

  /** Containment threshold for m05: pair reported when the smaller
    * payload shares at least this fraction of its chunks. */
  val NearDupChunkRatio = 0.5

  /** m05: BINARY near-dup pairs via shared content chunks — the
    * multimodal analogue of d02 (image/video/audio payloads dedupe
    * by content blocks, not text shingles). Chunk hashes ARE the
    * buckets: candidates meet only where a chunk matches (equi-join
    * on the hash, nothing quadratic), capped at [[MaxChunkCopies]];
    * verification is exact containment — shared chunks over the
    * smaller doc's chunk count. Every aggregate-derived relation
    * (per-doc totals, pair counts) is corpus-scaling and statless,
    * so the joins pin shuffled builds. Like d02, the pair set is
    * quadratic in duplication DEPTH (measured 42 s on the
    * 100×-replicated sf10 corpus): on mass-duplicated media,
    * exact-collapse identical payloads first (`groupBy(payload)`,
    * the d01/d15 shape) and run this over representatives. */
  def m05BinaryNearDup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = Dedup.corpusWithPlants(spark, dir)
      .select(col("doc_id"),
        encode(trim(col("text")), "UTF-8").as("payload"))
      .withColumn("n_chunks",
        ceil(length(col("payload")) / lit(ChunkBytes.toDouble))
          .cast("long"))
      .filter(col("n_chunks") > 0)
      .select(col("doc_id"), col("n_chunks"), col("payload"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("chunk_md5", md5(substring(col("payload"),
        (col("chunk_idx") * ChunkBytes + 1).cast("int"),
        lit(ChunkBytes))))
      .select(col("doc_id"), col("n_chunks"), col("chunk_md5"))
      .distinct()
    val usable = chunks.join(
      chunks.groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") <= MaxChunkCopies)
        .select(col("chunk_md5"))
        .hint("shuffle_hash"),
      Seq("chunk_md5"))
    val shared = usable.select(col("chunk_md5"),
        col("doc_id").as("keep_id"), col("n_chunks").as("n_a"))
      .join(usable.select(col("chunk_md5"),
        col("doc_id").as("dup_id"), col("n_chunks").as("n_b"))
        .hint("shuffle_hash"),
        Seq("chunk_md5"))
      .filter(col("keep_id") < col("dup_id"))
      .groupBy(col("keep_id"), col("dup_id"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .withColumn("overlap", round(col("shared").cast("double")
        / least(col("n_a"), col("n_b")), 6))
      .filter(col("overlap") >= NearDupChunkRatio)
      .select(col("keep_id"), col("dup_id"), col("shared"),
        col("overlap"))
      .orderBy(col("keep_id"), col("dup_id"))
  }

  val binaryNearDupSql: String =
    s"""WITH corpus AS (${Dedup.corpusSql}),
       |c AS (
       |  SELECT doc_id, trim(text) AS t,
       |    CAST(CEIL(octet_length(encode(trim(text)))
       |      / ${ChunkBytes}.0) AS BIGINT) AS n_chunks
       |  FROM corpus),
       |chunks AS (
       |  SELECT DISTINCT doc_id, n_chunks,
       |    md5(substring(t, CAST(chunk_idx * $ChunkBytes + 1 AS INT),
       |      $ChunkBytes)) AS chunk_md5
       |  FROM c, unnest(range(0, n_chunks)) AS u(chunk_idx)
       |  WHERE n_chunks > 0),
       |usable AS (
       |  SELECT ch.* FROM chunks ch JOIN (
       |    SELECT chunk_md5 FROM chunks GROUP BY chunk_md5
       |    HAVING COUNT(*) <= $MaxChunkCopies) ok
       |  ON ch.chunk_md5 = ok.chunk_md5),
       |shared AS (
       |  SELECT a.doc_id AS keep_id, b.doc_id AS dup_id,
       |    a.n_chunks AS n_a, b.n_chunks AS n_b,
       |    COUNT(*) AS shared
       |  FROM usable a JOIN usable b
       |    ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT keep_id, dup_id, shared,
       |  ROUND(CAST(shared AS DOUBLE) / LEAST(n_a, n_b), 6) AS overlap
       |FROM shared
       |WHERE CAST(shared AS DOUBLE) / LEAST(n_a, n_b)
       |  >= $NearDupChunkRatio
       |ORDER BY keep_id, dup_id""".stripMargin

  /** Oracle: the corpus is ASCII, so VARCHAR md5 of the substring
    * hashes the same bytes Spark's binary md5 sees. */
  val chunkHashSql: String =
    s"""WITH corpus AS (${Dedup.corpusSql}),
       |c AS (
       |  SELECT doc_id, trim(text) AS t,
       |    CAST(CEIL(octet_length(encode(trim(text)))
       |      / ${ChunkBytes}.0) AS BIGINT) AS n_chunks
       |  FROM corpus),
       |chunks AS (
       |  SELECT doc_id,
       |    md5(substring(t, CAST(chunk_idx * $ChunkBytes + 1 AS INT),
       |      $ChunkBytes)) AS chunk_md5
       |  FROM c, unnest(range(0, n_chunks)) AS u(chunk_idx)
       |  WHERE n_chunks > 0)
       |SELECT chunk_md5, COUNT(*) AS n_copies, MIN(doc_id) AS first_doc
       |FROM chunks GROUP BY 1 HAVING COUNT(*) > 1
       |ORDER BY chunk_md5""".stripMargin

  /** m04: thumbnail resize — every payload resampled to a fixed
    * [[ThumbBytes]]-byte thumbnail via the nearest-neighbor kernel
    * (the 1-D stand-in for image resize; see [[graft.functions.
    * MultimediaKernel]]). Fixed-size outputs are what a downstream
    * embedding/training stage wants: constant-width batches. */
  val ThumbBytes = 32

  def resize(spark: SparkSession, dir: String): DataFrame =
    attachPayload(spark, dir).toDF()
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        hex(graft.functions.Multimedia.byteResample(col("payload"),
          ThumbBytes)).as("thumb_hex"))
      .orderBy(col("doc_id"))

  /** Oracle reconstructs the same nearest-neighbor byte picks from
    * the (ASCII) text. */
  val resizeSql: String =
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(trim(text))) AS BIGINT) AS n_bytes,
       |  hex(encode(array_to_string(list_transform(
       |    generate_series(0, ${ThumbBytes - 1}),
       |    i -> substring(trim(text),
       |      CAST(i * octet_length(encode(trim(text)))
       |        // $ThumbBytes AS INT) + 1, 1)), ''))) AS thumb_hex
       |FROM documents
       |WHERE octet_length(encode(trim(text))) > 0
       |ORDER BY doc_id""".stripMargin

  /** aHash thumbnail width — 48 bits keeps the packed hash positive
    * in a signed long on both engines. */
  val AHashBytes = 48

  /** m06: PERCEPTUAL-hash dedup groups — the image-dedup signal that
    * survives re-encodes (average hash, the public aHash family):
    * resample to a fixed [[AHashBytes]]-byte thumbnail, set bit i iff
    * byte i exceeds the thumbnail mean (compared in integers — no
    * float mean), group by the packed hash. Both steps are codegen'd
    * unary kernels, so the 100 TB pass is scan → two expressions →
    * one hash aggregate; payload bytes never shuffle (only the 8-byte
    * hash does). Runs over the planted-duplicate corpus (m03/m05's
    * convention). On the 1-D byte-stream stub the dropped-word plants
    * land statistically closer to their originals than unrelated
    * pairs (≈18 vs ≈24 of 48 bits, spec-pinned) without being
    * bit-stable — the tail edit rescales every 1-D block boundary; a
    * real 2-D box-filtered image gives the strong stability the
    * algorithm is known for.
    * Pixel decode is REAL (r9): a PNG/JPEG payload routes through
    * [[graft.functions.ImageCodec]] to an 8×6 box-filtered grayscale
    * grid before the mean-bit pack (spec-pinned: re-encoded/rescaled
    * real images land within a few bits, unrelated scenes far apart);
    * the synthetic text corpus keeps the byte-domain path the oracle
    * replays. */
  def m06PerceptualHash(spark: SparkSession, dir: String): DataFrame =
    Dedup.corpusWithPlants(spark, dir)
      .select(col("doc_id"),
        encode(trim(col("text")), "UTF-8").as("payload"))
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"),
        graft.functions.Multimedia.aHash(
          graft.functions.Multimedia.blockMean(col("payload"),
            AHashBytes)).as("ahash"))
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("ahash"))

  /** Oracle: block-mean thumbnail (integer average per block, the
    * boundary-byte fallback for degenerate blocks), mean-bit pack in
    * exact integers (bit i ⇔ b·k > Σb). */
  val m06Sql: String =
    s"""WITH corpus AS (${Dedup.corpusSql}),
       |c AS (
       |  SELECT doc_id, trim(text) AS t,
       |    octet_length(encode(trim(text))) AS len
       |  FROM corpus
       |  WHERE octet_length(encode(trim(text))) > 0),
       |th AS (
       |  SELECT doc_id, list_transform(
       |    generate_series(0, ${AHashBytes - 1}),
       |    i -> CASE
       |      WHEN (i + 1) * len // $AHashBytes
       |          <= i * len // $AHashBytes
       |        THEN ascii(substring(t, CAST(LEAST(
       |          i * len // $AHashBytes, len - 1) AS INT) + 1, 1))
       |      ELSE list_sum(list_transform(generate_series(
       |          CAST(i * len // $AHashBytes AS INT) + 1,
       |          CAST((i + 1) * len // $AHashBytes AS INT)),
       |          j -> ascii(substring(t, j, 1))))
       |        // ((i + 1) * len // $AHashBytes
       |          - i * len // $AHashBytes)
       |    END) AS bytes
       |  FROM c),
       |h AS (
       |  SELECT doc_id, CAST(list_sum(list_transform(
       |      generate_series(1, $AHashBytes),
       |      i -> CASE WHEN bytes[i] * $AHashBytes > ls
       |        THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END))
       |    AS BIGINT) AS ahash
       |  FROM (SELECT doc_id, bytes, list_sum(bytes) AS ls FROM th))
       |SELECT ahash, CAST(count(*) AS BIGINT) AS n_docs,
       |  MIN(doc_id) AS first_doc
       |FROM h GROUP BY 1 HAVING count(*) > 1
       |ORDER BY ahash""".stripMargin

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

  /** Bytes per packed shard for m07. */
  val ShardBytes = 4096L

  /** m07: blob shard packing — assign every blob its training-shard
    * file and byte offset (the webdataset/tar-shard layout multimodal
    * training jobs stream: thousands of blobs concatenated into
    * fixed-size shard files, readers seek by offset). shard =
    * floor(exclusive-byte-prefix-sum / [[ShardBytes]]), offset =
    * position within that shard; a writer consuming this relation
    * lays the bytes down without any further coordination.
    *
    * Same distributed prefix sum as d23 (the naive global byte
    * cumsum is a single-partition sort — the t05 scale-killer):
    * contiguous doc_id bins from one collected scalar, per-bin
    * totals windowed over |bins| rows, parallel within-bin running
    * sums. The oracle is the naive global-window form — semantics
    * are partitioning-invisible. */
  def m07BlobShards(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val blobs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        length(encode(trim(col("text")), "UTF-8")).cast("long")
          .as("n_bytes"))
    val bins = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val maxId = blobs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val binOf = least(lit(bins - 1),
      (col("doc_id") * bins / (maxId + 1)).cast("int"))
    val binned = blobs.withColumn("bin", binOf)
    val w = W.orderBy(col("bin")).rowsBetween(W.unboundedPreceding, -1)
    val offsets = binned.groupBy(col("bin"))
      .agg(sum(col("n_bytes")).as("bin_bytes"))
      .withColumn("offset",
        coalesce(sum(col("bin_bytes")).over(w), lit(0L)))
      .select(col("bin"), col("offset"))
    val wRow = W.partitionBy(col("bin")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    binned.join(broadcast(offsets), Seq("bin"))
      .withColumn("cum_before",
        col("offset") + coalesce(sum(col("n_bytes")).over(wRow), lit(0L)))
      .select(col("doc_id"), col("n_bytes"),
        (col("cum_before") / ShardBytes).cast("long").as("shard"),
        (col("cum_before") % ShardBytes).as("shard_offset"))
      .orderBy(col("doc_id"))
  }

  val blobShardsSql: String =
    s"""SELECT doc_id, n_bytes,
       |  CAST(FLOOR(CAST(cum - n_bytes AS DOUBLE) / $ShardBytes)
       |    AS BIGINT) AS shard,
       |  CAST((cum - n_bytes) % $ShardBytes AS BIGINT) AS shard_offset
       |FROM (
       |  SELECT doc_id,
       |    CAST(octet_length(encode(trim(text))) AS BIGINT) AS n_bytes,
       |    SUM(CAST(octet_length(encode(trim(text))) AS BIGINT))
       |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** m08: shard FIXITY manifest — the integrity sidecar a webdataset
    * writer ships with m07's shards: per shard, the blob count, byte
    * total, id range, and an order-sensitive md5 over the members (a
    * reader can verify a downloaded shard without the source; any
    * lost/reordered/resized blob moves the digest). One |shards|-row
    * aggregate over m07's output; the ordered member concat is
    * sorted per shard (bounded by blobs-per-shard), never
    * corpus-wide. */
  def m08ShardManifest(spark: SparkSession, dir: String): DataFrame =
    m07BlobShards(spark, dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        md5(to_binary(concat_ws(",",
          expr("transform(sort_array(collect_list(struct(" +
            "shard_offset, doc_id, n_bytes))), " +
            "x -> concat(x.doc_id, ':', x.n_bytes))")), lit("utf-8")))
          .as("fixity"))
      .orderBy(col("shard"))

  val m08Sql: String =
    s"""WITH blobs AS ($blobShardsSql)
       |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_blobs,
       |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       |  md5(string_agg(doc_id || ':' || n_bytes, ','
       |    ORDER BY shard_offset, doc_id, n_bytes)) AS fixity
       |FROM blobs GROUP BY shard ORDER BY shard""".stripMargin
}
