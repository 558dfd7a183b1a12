package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE merge training (d43) and application (t23) on a PLANTED
  * corpus whose merge sequence is known by hand, plus invariants on
  * the real testdata. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** documents.parquet with a vocabulary whose merges are computable
    * by hand: "abab"×10, "abc"×5 (one word per doc keeps the word
    * frequencies explicit). */
  private lazy val planted: String = {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    val docs = (1 to 10).map(i => (i.toLong, "abab", "en", "s1", 4L)) ++
      (11 to 15).map(i => (i.toLong, "abc", "en", "s1", 3L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted corpus trains the hand-computed merge sequence") {
    // round 1: pair (a,b) has non-overlap count 2 in abab, 1 in abc
    //   → total 10*2 + 5*1 = 25, beats (b,a)=10 and (b,c)=5
    // round 2: (ab,ab) 10 beats (ab,c) 5
    // round 3: only (ab,c) 5 remains
    // round 4: no pairs anywhere → training stops early
    val rules = Bpe.trainMerges(spark, planted)
    assert(rules == Seq(
      Bpe.Rule(1, "|a| |b|", "|ab|", 25L),
      Bpe.Rule(2, "|ab| |ab|", "|abab|", 10L),
      Bpe.Rule(3, "|ab| |c|", "|abc|", 5L)))
  }

  test("planted encode collapses trained words to one token") {
    val enc = Bpe.t23BpeEncode(spark, planted)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect()
      .map { case (k, v, w) => (k, (v, w)) }.toMap
    // every doc is a single fully-merged word
    assert(enc.values.forall(_ == (1L, 1L)))
    assert(enc.size == 15)
  }

  test("testdata merges are |-wrapped, applied in rounds, with " +
    "non-increasing yields") {
    val rules = Bpe.trainMerges(spark, sf)
    assert(rules.size == Bpe.Rounds)
    assert(rules.map(_.rnd) == (1 to Bpe.Rounds))
    rules.foreach { r =>
      assert(r.pair.matches("\\|[a-z]+\\| \\|[a-z]+\\|"), r.pair)
      assert(r.merged == r.pair.replace("| |", ""), r.merged)
      assert(r.freq > 0)
    }
    // each round merges the then-best pair; a LATER round can never
    // beat an earlier one's yield (its pair existed then too, unless
    // created by a merge — in which case it's bounded by the merge
    // that created it)
    rules.sliding(2).foreach { case Seq(a, b) =>
      assert(b.freq <= a.freq, s"$a -> $b")
    }
  }

  test("training is memoized: t23 never re-trains in-process") {
    val a = Bpe.trainMerges(spark, sf)
    val b = Bpe.trainMerges(spark, sf)
    assert(a eq b, "second call must hand back the cached rules")
  }

  test("iterative batched encode equals the result of applying every " +
    "rule in training order — across EncodeBatch boundaries") {
    // the r13 re-base's contract: t23EncodeWith fuses EncodeBatch
    // replaces per plan step with checkpoints between steps; the
    // result must be bit-identical to one sequential pass of all
    // rules. Train past one batch (EncodeBatch + 4 rounds) on the
    // testdata and check a hand-replayed per-word merge agrees.
    val rules = Bpe.trainMerges(spark, sf, Bpe.EncodeBatch + 4)
    assert(rules.size > Bpe.EncodeBatch,
      s"need >${Bpe.EncodeBatch} rules to cross a batch boundary")
    val got = Bpe.t23EncodeWith(spark, sf, rules)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // reference: apply the same replaces sequentially per word on the
    // driver (the definitionally-correct single chain)
    def encTokens(word: String): Long = {
      var seq = word.map(c => s"|$c|").mkString(" ")
      rules.foreach(r => seq = seq.replace(r.pair, r.merged))
      seq.count(_ == ' ') + 1L
    }
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.take(50).foreach { case (id, text) =>
      val words = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val expected = (words.length.toLong,
        words.map(encTokens).sum)
      assert(got(id) == expected,
        s"doc $id: got ${got(id)}, hand-replayed $expected")
    }
  }

  test("a deeper run extends the default run — same rule prefix") {
    // 12-round training's first 8 rules == the 8-round rules: the
    // configurable depth changes vocabulary size, never the sequence
    val r8 = Bpe.trainMerges(spark, planted)
    val r12 = Bpe.trainMerges(spark, planted, Bpe.Rounds + 4)
    assert(r12.take(r8.size) == r8)
  }

  test("testdata encode: BPE tokens never exceed chars, never " +
    "undercut words") {
    val enc = Bpe.t23BpeEncode(spark, sf)
    val bad = enc.join(
        Tables.load(spark, sf, "documents").select("doc_id", "n_chars"),
        "doc_id")
      .filter(col("n_bpe_tokens") > col("n_chars") ||
        col("n_bpe_tokens") < col("n_words"))
      .count()
    assert(bad == 0)
  }
}
