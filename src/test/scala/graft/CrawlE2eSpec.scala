package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CrawlE2e

class CrawlE2eSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("t41 composition: structural round trip, gates, plan shape") {
    val df = CrawlE2e.t41CrawlE2e(spark, sf).cache()
    try {
      val n = df.count()
      assert(n > 0)

      // the whole extract->decode->repair chain is lossless by
      // construction: every row must restore its original text
      assert(df.filter(col("restored") =!= 1L).count() == 0)

      // robots gate: /private/x and /tmp/z paths are never admitted;
      // the /private/ok longest-match override always wins
      assert(df.filter(col("cpath").startsWith("/private/ok") &&
        col("allowed") =!= 1L).count() == 0)
      assert(df.filter((col("cpath") === "/private/x" ||
        col("cpath") === "/tmp/z") && col("allowed") === 1L)
        .count() == 0)

      // frontier: exactly one non-dup per canonical URL, and it is
      // the minimum doc_id of its group
      val perCanon = df.groupBy("canon_url").agg(
        sum(when(col("is_dup") === 0L, 1L).otherwise(0L)).as("reps"),
        min("doc_id").as("mn"))
      assert(perCanon.filter(col("reps") =!= 1L).count() == 0)
      assert(df.filter(col("is_dup") === 0L)
        .join(perCanon, "canon_url")
        .filter(col("doc_id") =!= col("mn")).count() == 0)

      // the deliverable contract: clean text is nonempty exactly on
      // admitted rows, and admitted = allowed & first-arrival & kept
      assert(df.filter((col("clean_text") =!= "") =!=
        (col("admitted") === 1L)).count() == 0)
      assert(df.filter(col("admitted") === 1L &&
        (col("allowed") =!= 1L || col("is_dup") =!= 0L ||
          col("n_kept") <= 0L)).count() == 0)

      // entity accounting from the planted prefix: 9 decoded + the
      // preserved &bogus; on every page (corpus text carries no '&')
      assert(df.filter(col("n_entities") =!= 9L ||
        col("n_unknown") =!= 1L).count() == 0)
    } finally df.unpersist()

    // PLAN SHAPE — the composition's reason to exist: the text
    // pipeline is pure map work, so the physical plan carries exactly
    // one hash exchange (the canonical-URL frontier window) and one
    // range exchange (the presentation sort) — no joins, no
    // aggregates, no per-stage reassembly shuffles
    val plan = CrawlE2e.t41CrawlE2e(spark, sf)
      .queryExecution.executedPlan.toString
    assert("(?i)exchange hashpartitioning".r
      .findAllIn(plan).size == 1, plan.take(2000))
    assert("(?i)exchange rangepartitioning".r
      .findAllIn(plan).size == 1)
    // operator names, not substrings — array_join the expression is
    // fine, a physical join operator is not
    assert(("(?i)(sortmergejoin|broadcasthashjoin|shuffledhashjoin|" +
      "nestedloop|cartesianproduct)").r.findFirstIn(plan).isEmpty)
    assert(!plan.toLowerCase.contains("hashaggregate"))
  }

  test("t45 widened composition: charset/sentence/line gates, " +
    "round trip, exchange budget") {
    val df = CrawlE2e.t45CrawlFull(spark, sf).cache()
    try {
      val n = df.count()
      assert(n > 0)

      // losslessness survives the THREE new stages: header+footer
      // lines removed, hyphens rejoined, wraps unwrapped, planted
      // terminators/abbreviations intact — every row restores
      assert(df.filter(col("restored") =!= 1L).count() == 0)

      // the line rule removed EXACTLY the two planted boilerplate
      // lines per doc (min-length guard keeps every fragment)
      assert(df.filter(col("n_removed") =!= 2L).count() == 0)

      // charset gate: t42's four-arm plant — doc_id%4 in {2,3} are
      // legacy (Latin-1 prefix / truncated tail) and never admitted
      assert(df.filter(pmod(col("doc_id"), lit(4)) >= 2 &&
        col("charset_class") =!= "legacy").count() == 0)
      assert(df.filter(pmod(col("doc_id"), lit(4)) < 2 &&
        col("charset_class") === "legacy").count() == 0)
      assert(df.filter(col("charset_class") === "legacy" &&
        col("admitted") === 1L).count() == 0)

      // sentence gate: the structural count — the prefix's planted
      // '!' boundary + (n_words-1) div 7 terminators + 1
      val docs = Tables.load(spark, sf, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          size(split(trim(col("text")), " ")).cast("long").as("nw"))
      assert(df.join(docs, "doc_id")
        .filter(col("n_sentences") =!=
          expr("(nw - 1) div 7") + lit(2L)).count() == 0)

      // admission now composes all five gates
      assert(df.filter(col("admitted") === 1L &&
        (col("allowed") =!= 1L || col("is_dup") =!= 0L ||
          col("n_kept") <= 0L || col("keep_c4") =!= 1L ||
          col("charset_class") === "legacy")).count() == 0)
      assert(df.filter((col("clean_text") =!= "") =!=
        (col("admitted") === 1L)).count() == 0)
    } finally df.unpersist()

    // PLAN SHAPE — everything through entity decode is still one
    // zero-shuffle codegen map; the line stage adds the keyed work
    // it must: the exploded-lines exchange (join probe), the
    // two-phase distinct doc-frequency aggregate (its exchanges on
    // (line, doc_id) then line), the doc_id reassembly, the hinted
    // doc-side rejoin, and the frontier window — a bounded hash-
    // exchange budget, one range exchange, zero broadcasts of
    // corpus-scaling sides
    val plan = CrawlE2e.t45CrawlFull(spark, sf)
      .queryExecution.executedPlan.toString
    val hashEx = "(?i)exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(hashEx <= 7, s"hash exchanges grew to $hashEx")
    assert("(?i)exchange rangepartitioning".r
      .findAllIn(plan).size == 1)
    assert(!plan.contains("BroadcastHashJoin"),
      "a corpus-scaling side got broadcast")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
