package graft

import org.apache.spark.sql.{GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._
import graft.operators.Similarity

/** SQL surface for graft's functions.
  *
  * Two entry points, both exposing the same function set:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) injects them at
  *    session build time — the idiomatic deployment on a cluster;
  *  - `GraftExtensions.register(spark)` retrofits an existing session.
  *
  * Expression-backed functions resolve to the native codegen'd
  * Catalyst expressions; the tile/cosine functions expand to built-in
  * function compositions, so every registered function stays inside
  * whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def intArg(e: Expression, fn: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  /** Wrap a Column-composition function as an expression builder.
    * The eager converter is required here: the lazy wrapper from
    * `GraftShim.expression` is Unevaluable inside a resolved plan. */
  private def composed(f: Seq[org.apache.spark.sql.Column] =>
      org.apache.spark.sql.Column): Builder =
    exprs => GraftShim.catalystExpression(f(exprs.map(GraftShim.column)))

  private def fn(name: String, usage: String, builder: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftExtensions", name),
      builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    fn("uleb128_encode", "uleb128_encode(n) - ULEB128 bytes of n",
      e => ULeb128Encode(e.head)),
    fn("uleb128_decode", "uleb128_decode(bin) - long from ULEB128 bytes",
      e => ULeb128Decode(e.head)),
    fn("sleb128_encode",
      "sleb128_encode(n) - sign-magnitude LEB128 bytes of n",
      e => SLeb128Encode(e.head)),
    fn("sleb128_decode",
      "sleb128_decode(bin) - long from sign-magnitude LEB128 bytes",
      e => SLeb128Decode(e.head)),
    fn("graft_fingerprint",
      "graft_fingerprint(text) - polynomial rolling hash of text",
      e => Fingerprint(e.head)),
    fn("graft_minhash",
      "graft_minhash(hashes, k) - k-permutation minhash signature",
      e => MinHashSig(e.head, intArg(e(1), "graft_minhash"))),
    fn("graft_shingle_hashes",
      "graft_shingle_hashes(text, n) - sorted distinct word n-gram hashes",
      e => ShingleHashes(e.head, intArg(e(1), "graft_shingle_hashes"))),
    fn("graft_lsh_signature",
      "graft_lsh_signature(vec, planes) - random-hyperplane sign bits",
      e => LshSignature(e.head, intArg(e(1), "graft_lsh_signature"))),
    fn("graft_simhash",
      "graft_simhash(hashes) - 64-bit simhash of pre-hashed shingles",
      e => SimHashSig(e.head)),
    fn("graft_sorted_jaccard",
      "graft_sorted_jaccard(a, b) - exact jaccard of sorted hash arrays",
      e => SortedJaccard(e.head, e(1))),
    fn("graft_byte_resample",
      "graft_byte_resample(bin, k) - nearest-neighbor resample to k bytes",
      e => ByteResample(e.head, intArg(e(1), "graft_byte_resample"))),
    fn("graft_block_mean",
      "graft_block_mean(bin, k) - average-pool resample to k bytes" +
        " (real PNG/JPEG payloads take the 2-D pixel path)",
      e => BlockMean(e.head, intArg(e(1), "graft_block_mean"))),
    fn("graft_ahash",
      "graft_ahash(bin) - average-hash bit pack of a thumbnail",
      e => AHash(e.head)),
    fn("graft_png_dims",
      "graft_png_dims(bin) - (width << 32) | height from a PNG" +
        " header, -1 for non-PNG; no pixel decode",
      e => PngDims(e.head)),
    fn("graft_image_dims",
      "graft_image_dims(bin) - (width << 32) | height from a PNG/" +
        "JPEG/GIF header by magic dispatch, -1 otherwise; no decode",
      e => ImageDims(e.head)),
    fn("graft_exif_orientation",
      "graft_exif_orientation(bin) - EXIF orientation (1-8) from the" +
        " JPEG APP1 TIFF IFD0, -1 for non-JPEG/no-EXIF; no decode",
      e => ExifOrientation(e.head)),
    fn("graft_image_stats",
      "graft_image_stats(bin, idx) - decoded luminance stats: idx 0" +
        " = floor mean luma, 1 = range, 2 = floor variance; -1 for" +
        " non-image (the blank/flat admission gate)",
      e => ImageStats(e.head, intArg(e(1), "graft_image_stats"))),
    fn("graft_mp4_field",
      "graft_mp4_field(bin, idx) - ISO-BMFF moov/mvhd probe: idx 0 " +
        "= timescale, 1 = duration ticks, 2 = duration micros, 3 = " +
        "track count, 4 = video tracks, 5 = audio tracks, 6 = video " +
        "frame count (stts), 7 = fps milli; -1 for non-MP4; no demux",
      e => Mp4Field(e.head, intArg(e(1), "graft_mp4_field"))),
    fn("graft_mp3_field",
      "graft_mp3_field(bin, idx) - MP3 Layer III frame probe: idx 0" +
        " = sample rate, 1 = bitrate kbps, 2 = channels, 3 = frame" +
        " bytes; ID3v2 skipped, -1 for non-MP3; no decode",
      e => graft.functions.Mp3Field(e.head,
        intArg(e(1), "graft_mp3_field"))),
    fn("graft_gif_field",
      "graft_gif_field(bin, idx) - GIF animation probe: idx 0 = " +
        "frames, 1 = loop count (0=forever, -1=once), 2 = duration " +
        "centiseconds, 3 = animated flag; -1 for non-GIF; no decode",
      e => graft.functions.GifField(e.head,
        intArg(e(1), "graft_gif_field"))),
    fn("graft_flac_field",
      "graft_flac_field(bin, idx) - FLAC STREAMINFO probe: idx 0 =" +
        " sample rate, 1 = channels, 2 = bits/sample, 3 = duration" +
        " micros, 4 = total samples; -1 for non-FLAC; no decode",
      e => graft.functions.FlacField(e.head,
        intArg(e(1), "graft_flac_field"))),
    fn("graft_mp4_tracks",
      "graft_mp4_tracks(bin) - ISO-BMFF trak walk: handler/codec " +
        "4CC pairs comma-joined in file order (hdlr + stsd), '' for " +
        "track-less MP4, '-' for non-MP4; no demux",
      e => graft.functions.Mp4Tracks(e.head)),
    fn("graft_shingle_hashes_all",
      "graft_shingle_hashes_all(text, n) - one hash per shingle" +
        " occurrence (multiset; feed graft_simhash)",
      e => ShingleHashes(e.head,
        intArg(e(1), "graft_shingle_hashes_all"), dedup = false)),
    fn("graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity" +
        " (DuckDB/RapidFuzz semantics; byte-wise, exact for ASCII)",
      e => graft.functions.JaroWinkler(e.head, e(1))),
    fn("graft_word_stats",
      "graft_word_stats(text) - struct(n_words, stop_hits, len_sum," +
        " bpe_sum) in one byte scan",
      e => WordStats(e.head)),
    fn("graft_bigrams",
      "graft_bigrams(text) - adjacent-word bigram array (zero-copy)",
      e => Bigrams(e.head)),
    fn("graft_word_ngrams",
      "graft_word_ngrams(text, n) - adjacent word n-gram array" +
        " (zero-copy)",
      e => WordNgrams(e.head, intArg(e(1), "graft_word_ngrams"))),
    fn("graft_l2_norm",
      "graft_l2_norm(vec) - L2 norm of a float vector",
      e => L2Norm(e.head)),
    fn("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float vectors",
      composed(c => Similarity.cosine(c(0), c(1)))),
    fn("graft_norm_stats",
      "graft_norm_stats(text) - struct(norm_len, norm_fp) of the" +
        " normalized text (one-pass, no regex)",
      e => graft.functions.NormStats(e.head)),
    fn("graft_quantized_sub_l2",
      "graft_quantized_sub_l2(vec, code, sub, subdim) - exact integer" +
        " squared L2 over subspace sub (PQ inner loop)",
      e => graft.functions.QuantizedSubL2(e(0), e(1), e(2),
        intArg(e(3), "graft_quantized_sub_l2"))),
    fn("graft_tile_x", "graft_tile_x(z, lon) - fractional tile x",
      composed(c => Tiles.tileXFromLon(c(0), c(1)))),
    fn("graft_tile_y", "graft_tile_y(z, lat) - fractional tile y",
      composed(c => Tiles.tileYFromLat(c(0), c(1)))),
    fn("graft_lon_from_x", "graft_lon_from_x(z, x) - tile west edge",
      composed(c => Tiles.lonFromTileX(c(0), c(1)))),
    fn("graft_lat_from_y", "graft_lat_from_y(z, y) - tile north edge",
      composed(c => Tiles.latFromTileY(c(0), c(1)))),
    fn("graft_tilenum",
      "graft_tilenum(x, y, minx, miny, xcount) - row-major tile index",
      composed(c => Tiles.tileNum(c(0), c(1), c(2), c(3), c(4)))))

  /** Register every graft function into an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = GraftShim.functionRegistry(spark)
    functions.foreach { case (id, info, b) =>
      reg.registerFunction(id, info, b)
    }
  }
}
