package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis primitives (SURVEY.md §2d). */
object TextCodec {
  final val Mod = 2147483647L // 2^31-1
  final val Mult = 131L

  /** Polynomial rolling hash over the UTF-8 bytes of a string —
    * the document fingerprint. Static so generated code calls it
    * directly inside whole-stage codegen. */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Mult + (bytes(i) & 0xFF)) % Mod
      i += 1
    }
    h
  }

  /** One-pass normalize-and-fingerprint: the t07 composition
    * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]",
    * " "), " +", " "))` followed by length + [[fingerprint]], with
    * NO normalized string ever materialized and no regex engine —
    * ASCII letters lowercase in place, every other byte is a
    * separator, separator runs collapse to one interior space.
    * Equivalent to the Column form whenever Unicode-lowercasing
    * never turns a non-ASCII character into an ASCII alphanumeric
    * (true of Latin-1 and essentially all real text; the known
    * exceptions are exotica like U+0130 and U+212A). Multi-byte
    * UTF-8 sequences become separator runs byte-wise, which the
    * collapse makes equivalent to the regex's one-space-per-char. */
  def normStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    var fp = 0L
    var len = 0L
    var pendingSep = false
    var emitted = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      val c = if (b >= 'A' && b <= 'Z') b + 32 else b
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSep && emitted) {
          fp = (fp * Mult + ' ') % Mod
          len += 1
        }
        pendingSep = false
        emitted = true
        fp = (fp * Mult + c) % Mod
        len += 1
      } else {
        pendingSep = true
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](len, fp))
  }

  /** The t01-t03 stopword list, as UTF-8 byte arrays for the kernel. */
  private val StopBytes: Array[Array[Byte]] =
    Array("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
      .map(_.getBytes("UTF-8"))

  private def isStopword(bytes: Array[Byte], start: Int, len: Int)
      : Boolean = {
    var s = 0
    while (s < StopBytes.length) {
      val sw = StopBytes(s)
      if (sw.length == len) {
        var j = 0
        while (j < len && bytes(start + j) == sw(j)) j += 1
        if (j == len) return true
      }
      s += 1
    }
    false
  }

  /** Single-pass per-word statistics over an (already trimmed) text:
    * word count, English-stopword hits, total word length (in code
    * points) and the BPE-ish `ceil(len/4)` subword estimate. Word
    * semantics mirror `split(text, " ")` exactly — every run between
    * single spaces is a word, including empty runs from repeated
    * spaces, and the empty string is one zero-length word. Replaces
    * four interpreted HOF folds over the split array with one
    * allocation-free byte scan (the per-token hot loop of a 100 TB
    * text pipeline). */
  def wordStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    var nWords = 0L; var stopHits = 0L; var lenSum = 0L; var bpeSum = 0L
    var wordStart = 0
    var chars = 0L
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        nWords += 1
        lenSum += chars
        bpeSum += (chars + 3) / 4
        if (isStopword(bytes, wordStart, i - wordStart)) stopHits += 1
        wordStart = i + 1
        chars = 0
      } else if ((bytes(i) & 0xC0) != 0x80) {
        chars += 1 // count code points, matching length(str) semantics
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nWords, stopHits, lenSum, bpeSum))
  }

  /** Adjacent-word bigrams of an (already trimmed) text. Because the
    * word separator is exactly one space, each bigram
    * `concat_ws(" ", w(i), w(i+1))` is a contiguous substring of the
    * input, so the result array just wraps byte ranges — no string
    * building at all (vs the interpreted
    * `transform(sequence, element_at)` HOF). Fewer than two words →
    * empty array, mirroring the `when(size >= 2, ...)` guard. */
  def bigrams(s: UTF8String): ArrayData = wordNgrams(s, 2)

  /** Adjacent word n-grams, generalizing [[bigrams]]: each n-gram is
    * a contiguous substring of the single-space-separated input, so
    * the result array wraps byte ranges — no string building. Fewer
    * than n words → empty array (the oracle's `ELSE []`). */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // word start offsets
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    if (nWords < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var w = 0; var wordStart = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        starts(w) = wordStart; ends(w) = i; w += 1; wordStart = i + 1
      }
      i += 1
    }
    val out = new Array[Any](nWords - n + 1)
    var b = 0
    while (b < nWords - n + 1) {
      out(b) =
        UTF8String.fromBytes(bytes, starts(b), ends(b + n - 1) - starts(b))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Jaro–Winkler similarity over UTF-8 bytes — the record-linkage
    * verifier next to Levenshtein (d24/d60). Semantics pinned to the
    * public RapidFuzz/DuckDB definition (verified empirically against
    * DuckDB's `jaro_winkler_similarity`): match window
    * `max(|a|,|b|)/2 - 1` (floor, min 0), transpositions = the
    * mismatched matched positions halved by INTEGER division (the
    * floor matters: fuzz-verified on 50k random pairs, 780 of which
    * split the textbook fractional half from DuckDB's floor),
    * Winkler prefix boost p=0.1 over at
    * most 4 leading matches applied only when jaro > 0.7, and ANY
    * empty input → 0 (including both-empty). Byte-wise, so exact for
    * ASCII inputs (the normalized keys it verifies are [a-z0-9]);
    * multi-byte code points would need code-point matching. Static so
    * whole-stage codegen calls it directly. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes; val t = b.getBytes
    val ls = s.length; val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    // transpositions halve by INTEGER division — fuzz-verified
    // against DuckDB on 50k random pairs (a fractional half is the
    // textbook form; DuckDB/RapidFuzz floor it)
    val jaro = (m.toDouble / ls + m.toDouble / lt +
      (m - trans / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPref = math.min(4, math.min(ls, lt))
    while (l < maxPref && s(l) == t(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `fingerprint(text)` as a codegen'd Catalyst expression. */
case class Fingerprint(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextCodec.fingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodec.fingerprint($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass word statistics struct (see TextCodec.wordStats). */
case class WordStats(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("len_sum", LongType, nullable = false),
    StructField("bpe_sum", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextCodec.wordStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodec.wordStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass text normalization stats (see TextCodec.normStats). */
case class NormStats(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("norm_len", LongType, nullable = false),
    StructField("norm_fp", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextCodec.normStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodec.normStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Zero-copy adjacent-word bigram array (see TextCodec.bigrams). */
case class Bigrams(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextCodec.bigrams(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodec.bigrams($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Zero-copy adjacent word n-grams (see TextCodec.wordNgrams); `n`
  * is fixed at plan time. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be positive, got $n")
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextCodec.wordNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextCodec.wordNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `jaro_winkler(a, b)` as a codegen'd Catalyst expression (see
  * TextCodec.jaroWinkler for the pinned semantics). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextCodec.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextCodec.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextFunctions {
  def fingerprint(c: Column): Column =
    GraftShim.column(Fingerprint(GraftShim.expression(c)))

  /** Jaro–Winkler similarity (DuckDB/RapidFuzz semantics; exact for
    * ASCII inputs). */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftShim.column(JaroWinkler(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** One-pass word statistics over trimmed text: struct(n_words,
    * stop_hits, len_sum, bpe_sum). */
  def wordStats(text: Column): Column =
    GraftShim.column(WordStats(GraftShim.expression(trim(text))))

  /** Adjacent-word bigram array over trimmed text. */
  def bigrams(text: Column): Column =
    GraftShim.column(Bigrams(GraftShim.expression(trim(text))))

  /** One-pass normalization stats: struct(norm_len, norm_fp). */
  def normStats(text: Column): Column =
    GraftShim.column(NormStats(GraftShim.expression(text)))

  def wordNgrams(text: Column, n: Int): Column =
    GraftShim.column(WordNgrams(GraftShim.expression(trim(text)), n))

  /** Whitespace tokens of trimmed text. */
  def words(text: Column): Column = split(trim(text), " ")

  /** SQL fragment mirroring [[words]] for the DuckDB oracle. */
  val wordsSql = "string_split(trim(text), ' ')"

  /** SQL fragment for distinct word 3-gram shingles over an alias of
    * words — the DuckDB oracle side of the hashed `ShingleHashes`
    * kernel (the Spark side hashes shingles zero-copy; the Column-API
    * string form it mirrored was removed once d04 switched to the
    * kernel). */
  def shinglesSql(w: String): String =
    s"""CASE WHEN len($w) >= 3 THEN
       |  list_distinct(list_transform(generate_series(1, len($w) - 2),
       |    i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2]))
       |ELSE list_distinct([array_to_string($w, ' ')]) END""".stripMargin
}
