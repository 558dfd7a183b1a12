package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL function registration (SURVEY.md §2: API surface). */
class GraftExtensionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  GraftExtensions.register(spark)

  test("varint SQL functions round-trip") {
    val r = spark.sql(
      "SELECT uleb128_decode(uleb128_encode(624485L)) AS u," +
        " sleb128_decode(sleb128_encode(-123456L)) AS s")
      .collect().head
    assert(r.getLong(0) == 624485L && r.getLong(1) == -123456L)
  }

  test("text and similarity SQL functions evaluate") {
    val r = spark.sql(
      "SELECT graft_fingerprint('hello world') AS fp," +
        " graft_minhash(graft_shingle_hashes('a b c d e', 3), 16) AS mh," +
        " graft_lsh_signature(array(CAST(1.0 AS FLOAT)," +
        "   CAST(-2.0 AS FLOAT)), 16) AS lsh," +
        " round(graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))," +
        "   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 6) AS cos")
      .collect().head
    assert(r.getLong(0) == graft.functions.TextCodec.fingerprint(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    assert(r.getSeq[Long](1).length == 16)
    assert(r.getDouble(3) == 1.0)
  }

  test("jaro_winkler matches DuckDB-pinned reference values") {
    // every pin below was read off DuckDB's jaro_winkler_similarity
    // (the oracle engine) — including the two semantics traps: any
    // empty input -> 0 (even both-empty), and INTEGER transposition
    // halving ('arnab'/'raanb' has 4 mismatched matched positions ->
    // t=2; 'b00aabbb0'/'00abb0aab' splits floor from fractional)
    val pins = Seq(
      ("martha", "marhta", 0.961111), ("dixon", "dicksonx", 0.813333),
      ("jellyfish", "smellyfish", 0.896296),
      ("crate", "trace", 0.733333), ("dwayne", "duane", 0.84),
      ("arnab", "raanb", 0.866667),
      ("b00aabbb0", "00abb0aab", 0.800926),
      ("abcdefgh", "abzzzzzz", 0.5), ("aaaa", "aabb", 0.666667),
      ("ab", "abcdefghij", 0.786667),
      ("hello world", "hello word", 0.981818),
      ("abc", "abc", 1.0), ("", "abc", 0.0), ("", "", 0.0),
      ("a", "b", 0.0))
    pins.foreach { case (a, b, want) =>
      val got = spark.sql(
        s"SELECT round(graft_jaro_winkler('$a', '$b'), 6) AS jw")
        .collect().head.getDouble(0)
      assert(got == want, s"jw('$a','$b') = $got, want $want")
      // symmetry
      val rev = spark.sql(
        s"SELECT round(graft_jaro_winkler('$b', '$a'), 6) AS jw")
        .collect().head.getDouble(0)
      assert(rev == got, s"jw not symmetric on ('$a','$b')")
    }
  }

  test("simhash and sorted-jaccard SQL functions evaluate") {
    val r = spark.sql(
      "SELECT graft_simhash(graft_shingle_hashes('a b c d e', 3)) AS sh," +
        " graft_sorted_jaccard(graft_shingle_hashes('a b c d e', 3)," +
        "   graft_shingle_hashes('a b c d e', 3)) AS j_same," +
        " graft_sorted_jaccard(graft_shingle_hashes('a b c', 3)," +
        "   graft_shingle_hashes('x y z', 3)) AS j_diff")
      .collect().head
    // identical docs: identical signature and jaccard 1; disjoint: 0
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0)
    val sh2 = spark.sql(
      "SELECT graft_simhash(graft_shingle_hashes('a b c d e', 3)) AS sh")
      .collect().head.getLong(0)
    assert(r.getLong(0) == sh2)
  }

  test("word-stats, bigram, multiset-shingle and norm SQL functions") {
    val r = spark.sql(
      "SELECT graft_word_stats('the cat sat') AS ws," +
        " graft_bigrams('a b c') AS bg," +
        " size(graft_shingle_hashes_all('a b a b a b a b', 2)) AS n_all," +
        " size(graft_shingle_hashes('a b a b a b a b', 2)) AS n_set," +
        " round(graft_l2_norm(array(CAST(3.0 AS FLOAT)," +
        "   CAST(4.0 AS FLOAT))), 6) AS l2")
      .collect().head
    val ws = r.getStruct(0)
    assert(ws.getLong(0) == 3) // n_words
    assert(ws.getLong(1) == 1) // "the"
    assert(ws.getLong(2) == 9) // the+cat+sat
    assert(ws.getLong(3) == 3) // ceil/4 each
    assert(r.getSeq[String](1) == Seq("a b", "b c"))
    // 7 bigram occurrences, 2 distinct — multiset vs set semantics
    assert(r.getAs[Number](2).intValue == 7)
    assert(r.getAs[Number](3).intValue == 2)
    assert(r.getDouble(4) == 5.0)
    val ng = spark.sql(
      "SELECT graft_word_ngrams('a b c d', 3) AS g3," +
        " graft_word_ngrams('a b', 3) AS g_short").collect().head
    assert(ng.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(ng.getSeq[String](1).isEmpty)
    val ns = spark.sql(
      "SELECT graft_norm_stats('  Hello,  WORLD! 42 ') AS ns")
      .collect().head.getStruct(0)
    assert(ns.getLong(0) == "hello world 42".length)
    // PQ inner loop: subspace 1 of dim 2 differs by (1e6)^2 + 0
    val pq = spark.sql(
      "SELECT graft_quantized_sub_l2(" +
        "array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)," +
        "      CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT))," +
        "array(CAST(9.0 AS FLOAT), CAST(9.0 AS FLOAT)," +
        "      CAST(0.0 AS FLOAT), CAST(0.5 AS FLOAT))," +
        " 1, 2) AS d").collect().head
    assert(pq.getLong(0) == 1000000L * 1000000L)
  }

  test("tile SQL functions match the reference transforms") {
    val r = spark.sql(
      "SELECT graft_tile_x(10, 7.3) AS tx, graft_tile_y(10, 51.55) AS ty," +
        " graft_lon_from_x(10, 532) AS lon, graft_lat_from_y(10, 340) AS lat," +
        " graft_tilenum(533, 341, 530, 338, 8) AS tn")
      .collect().head
    assert(r.getDouble(0) == graft.sources.Mapsforge.xFromLon(10, 7.3))
    assert(r.getDouble(1) == graft.sources.Mapsforge.yFromLat(10, 51.55))
    assert(r.getDouble(2) == graft.sources.Mapsforge.lonFromX(10, 532))
    assert(r.getDouble(3) == graft.sources.Mapsforge.latFromY(10, 340))
    assert(r.getAs[Number](4).longValue == (341 - 338) * 8 + (533 - 530))
  }

  test("media SQL functions: block_mean/ahash/png_dims evaluate, " +
    "real PNG routes to the pixel path") {
    val png = graft.functions.ImageCodec.pngBytes(32, 24)((_, _) => 0x808080)
    val row = spark.sql(
      s"""SELECT graft_ahash(graft_block_mean(payload, 48)) AS h,
         |  graft_png_dims(payload) AS d,
         |  graft_png_dims(CAST('words' AS BINARY)) AS nd
         |FROM VALUES (X'${png.map("%02X".format(_)).mkString}')
         |  AS t(payload)""".stripMargin).head()
    assert(row.getLong(0) == graft.functions.MultimediaKernel.ahash(
      graft.functions.ImageCodec.thumbK(png, 48).get))
    assert(row.getLong(1) == ((32L << 32) | 24L))
    assert(row.getLong(2) == -1L)
    // m12: the format-dispatching probe routes each container to its
    // header walk in one SQL expression; JPEG-magic-but-no-SOF → -1
    val jpg = graft.functions.ImageCodec.imageBytes("jpg", 48, 16)(
      (x, y) => ((x + y) & 0xff) * 0x010101)
    val r2 = spark.sql(
      s"""SELECT graft_image_dims(payload) AS j,
         |  graft_image_dims(X'FFD8FFD9') AS bad,
         |  graft_image_dims(CAST('words' AS BINARY)) AS nd
         |FROM VALUES (X'${jpg.map("%02X".format(_)).mkString}')
         |  AS t(payload)""".stripMargin).head()
    assert(r2.getLong(0) == ((48L << 32) | 16L))
    assert(r2.getLong(1) == -1L && r2.getLong(2) == -1L)
    // m14: the decoded-luminance gate through the SQL surface
    val solid = graft.functions.ImageCodec.pngBytes(16, 16)(
      (_, _) => 0x808080)
    val r3 = spark.sql(
      s"""SELECT graft_image_stats(payload, 0) AS mean,
         |  graft_image_stats(payload, 1) AS rng,
         |  graft_image_stats(payload, 2) AS vr,
         |  graft_image_stats(CAST('words' AS BINARY), 0) AS nd
         |FROM VALUES (X'${solid.map("%02X".format(_)).mkString}')
         |  AS t(payload)""".stripMargin).head()
    assert(r3.getLong(0) == 128L && r3.getLong(1) == 0L
      && r3.getLong(2) == 0L && r3.getLong(3) == -1L)
  }

  test("extensions injector applies cleanly") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
