package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signatures (SURVEY.md §2d).
  *
  * The HOF formulation (32 × transform+array_min over the shingle
  * array) costs ~3 ms/doc in generic ArrayData traversal; this
  * expression hashes each shingle once (XXH64 over its UTF-8 bytes)
  * and folds all `numHashes` minima in one allocation-free loop —
  * the difference between a demo and a 100 TB dedup pass. Generated
  * code calls the static kernel directly, keeping the scan inside
  * whole-stage codegen.
  */
object MinHashKernel {
  /** splitmix64 — independent mixing word per permutation. */
  private def mix(k: Long): Long = {
    var z = k + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The permutation words, exposed so an oracle can replay the
    * signature: slot k of [[signature]] is min over shingle hashes h
    * of `h XOR mixWords(n)(k)` — one XOR and a signed-BIGINT min,
    * replayable in any SQL engine given these constants. */
  def mixWords(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(k => mix(k + 1L))

  /** Fold all minima over pre-hashed shingles (array<long>). */
  def signature(hashes: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val mixes = Array.tabulate(numHashes)(k => mix(k + 1L))
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      val h = hashes.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = h ^ mixes(k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    MinHashKernel.signature(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernel.signature($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Zero-copy shingle hashing (SURVEY.md §2d).
  *
  * A word n-gram joined with single spaces is, by construction, a
  * contiguous substring of the (trimmed, single-space-tokenized)
  * document — so each shingle can be hashed directly from the
  * document's UTF-8 byte range with no string building at all. The
  * kernel finds word starts, hashes each [start(i), end(i+n-1)]
  * window with XXH64, and dedups into a sorted long array: the
  * hashed equivalent of `array_distinct(shingles)`.
  */
object ShingleKernel {
  final val Seed = 42L

  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val all = rawHashes(text, n)
    val set = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < all.length) { set.add(all(i)); i += 1 }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Multiset variant: one hash per shingle OCCURRENCE, in document
    * order. SimHash consumes this so repeated shingles vote once per
    * occurrence — Charikar's frequency-weighted definition — while
    * MinHash/Jaccard keep the dedup'd variant (they are statistics of
    * the shingle SET). */
  def shingleHashesAll(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(rawHashes(text, n))

  private def rawHashes(text: UTF8String, n: Int): Array[Long] = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    // word start offsets (single-space separation)
    val starts = new java.util.ArrayList[Integer]()
    var i = 0
    starts.add(0)
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ')
        starts.add(i + 1)
      i += 1
    }
    val nw = starts.size()
    if (nw < n) {
      if (len > 0)
        Array(XXH64.hashUnsafeBytes(base, off, len, Seed))
      else Array.empty[Long]
    } else {
      val out = new Array[Long](nw - n + 1)
      var w = 0
      while (w + n - 1 < nw) {
        val s = starts.get(w)
        val e = if (w + n < nw) starts.get(w + n) - 1 else len
        out(w) = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
        w += 1
      }
      out
    }
  }
}

case class ShingleHashes(child: Expression, n: Int,
    dedup: Boolean = true) extends UnaryExpression {
  private val kernel = if (dedup) "shingleHashes" else "shingleHashesAll"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    if (dedup) ShingleKernel.shingleHashes(v.asInstanceOf[UTF8String], n)
    else ShingleKernel.shingleHashesAll(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernel.$kernel($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash over pre-hashed shingles: bit k of the signature is
  * the sign of the per-bit vote Σ ±1 across shingle hashes. One pass
  * over the array (the HOF formulation — aggregate over sequence(0,63)
  * nested in an aggregate over the hashes — is interpreted, not
  * codegen'd, and walks the array 64 times: ~100 ms/doc vs ~1 µs
  * here). The vote is a commutative sum, so hash ORDER is irrelevant,
  * but MULTIPLICITY is not: feed the multiset variant
  * (shingleHashesAll) so a repeated shingle votes once per occurrence
  * — Charikar's frequency-weighted definition. */
object SimHashKernel {
  def signature(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) != 0L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }
}

case class SimHashSig(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashKernel.signature(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashKernel.signature($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Exact Jaccard of two SORTED distinct long arrays (the shape
  * ShingleHashes emits) by merge-walk — no per-pair hash sets, no
  * intermediate arrays, unlike array_intersect/array_union. */
object JaccardKernel {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

object IntersectKernel {
  /** |a ∩ b| for two SORTED distinct long arrays — the same
    * merge-walk as [[JaccardKernel]] but returning the raw count, so
    * asymmetric measures (containment) can divide by either side. */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** `sorted_intersect(a, b)` as a codegen'd expression. */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectKernel.intersectCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.IntersectKernel.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `sorted_jaccard(a, b)` as a codegen'd expression. */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.jaccard(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaccardKernel.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Random-hyperplane LSH signature kernel (SURVEY.md §2d): bit i of
  * the result = sign of <v, h_i>, h_i[d] = ±1 from splitmix64(i·64+d).
  * Replaces a 16×64 HOF fold (data-independent hashes recomputed per
  * row) with one tight loop over the vector. */
object LshKernel {
  private def mix(k: Long): Long = {
    var z = k + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def signature(vec: ArrayData, numPlanes: Int): Long = {
    val n = vec.numElements()
    var sig = 0L
    var i = 0
    while (i < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val r = if ((mix(i.toLong * 64 + d) & 1L) != 0L) 1.0 else -1.0
        dot += vec.getFloat(d) * r
        d += 1
      }
      if (dot > 0) sig |= 1L << i
      i += 1
    }
    sig
  }
}

case class LshSignature(child: Expression, numPlanes: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    LshKernel.signature(v.asInstanceOf[ArrayData], numPlanes)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshKernel.signature($c, $numPlanes)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHash {
  def minhash(shingles: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(shingles), numHashes))

  def shingleHashes(text: Column, n: Int = 3): Column =
    GraftShim.column(ShingleHashes(GraftShim.expression(text), n))

  /** One hash per shingle occurrence (no dedup) — for SimHash. */
  def shingleHashesAll(text: Column, n: Int = 3): Column =
    GraftShim.column(
      ShingleHashes(GraftShim.expression(text), n, dedup = false))

  def lshSignature(vec: Column, numPlanes: Int): Column =
    GraftShim.column(LshSignature(GraftShim.expression(vec), numPlanes))

  def simhash(shingles: Column): Column =
    GraftShim.column(SimHashSig(GraftShim.expression(shingles)))

  def sortedJaccard(a: Column, b: Column): Column =
    GraftShim.column(SortedJaccard(GraftShim.expression(a),
      GraftShim.expression(b)))

  def sortedIntersect(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersect(GraftShim.expression(a),
      GraftShim.expression(b)))
}
