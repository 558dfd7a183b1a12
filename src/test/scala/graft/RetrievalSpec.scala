package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, TextAnalysis}

class RetrievalSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("t13 ranks per term in the bounded heap, queries ride a broadcast") {
    val plan = Retrieval.t13Bm25(spark, sf)
      .queryExecution.executedPlan.toString
    // the per-term ranking must be the mergeable heap (≤5 rows per
    // term per partition cross the shuffle), not a window sorting a
    // head term's corpus-sized posting list
    assert(plan.contains("partial_topkagg"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("t16 bigram model: natural word order beats reversed") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val model = Retrieval.bigramModel(docs).cache()
    val nat = Retrieval.scoreBigrams(docs, model)
      .agg(avg(col("mean_lp")), sum(col("n_trans"))).first()
    val rev = docs.select(col("doc_id"),
      array_join(reverse(split(trim(col("text")), " ")), " ")
        .as("text"))
    val revScored = Retrieval.scoreBigrams(rev, model)
      .agg(avg(col("mean_lp")), sum(col("n_trans"))).first()
    model.unpersist()
    val (natLp, natN) = (nat.getDouble(0), nat.getLong(1))
    val (revLp, revN) = (revScored.getDouble(0), revScored.getLong(1))
    info(s"natural mean_lp $natLp over $natN; reversed $revLp over $revN")
    // word order is the signal: reversing destroys it two ways —
    // transitions fall out of the model entirely (coverage drops)
    // and the surviving ones are rarer (mean log-prob drops)
    assert(revN < natN, "reversed corpus lost no transitions")
    assert(natLp > revLp, "natural order not favored")
  }

  test("t12/t13/t14 contract shapes: dense ranks, consistent df, no stopword queries") {
    import org.apache.spark.sql.functions._
    val tfidf = Retrieval.t12Tfidf(spark, sf).cache()
    // per-doc ranks are dense from 1
    val badRank = tfidf.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        min(col("rank")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
      .count()
    assert(badRank == 0, "t12 ranks not dense from 1")
    // df in the postings equals the count of postings rows per term
    val post = Retrieval.t14Postings(spark, sf).cache()
    val badDf = post.groupBy(col("term"), col("df"))
      .agg(count(lit(1)).as("n"))
      .filter(col("df") =!= col("n")).count()
    assert(badDf == 0, "t14 df disagrees with the postings it indexes")
    // BM25 query terms exclude stopwords; every term returns BmTopK
    // docs with positive scores (head terms occur in > BmTopK docs)
    val bm = Retrieval.t13Bm25(spark, sf).cache()
    val stop = TextAnalysis.EnStopwords.toSet
    assert(bm.filter(col("term").isin(stop.toSeq: _*)).count() == 0)
    val perTerm = bm.groupBy(col("term"))
      .agg(count(lit(1)).as("n"), min(col("score")).as("mn"))
    assert(perTerm.filter(col("n") =!= Retrieval.BmTopK).count() == 0,
      "a query term returned fewer than BmTopK docs")
    assert(perTerm.filter(col("mn") <= 0.0).count() == 0,
      "non-positive BM25 score")
    tfidf.unpersist(); post.unpersist(); bm.unpersist()
  }

  test("t17 zipf slopes are negative and the fit is scale-free in rank") {
    import org.apache.spark.sql.functions._
    val slopes = Retrieval.t17ZipfSlope(spark, sf).collect()
    // every source has a multi-term vocabulary here
    val srcs = Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(slopes.length == srcs)
    slopes.foreach { r =>
      val (src, n, sl) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(n >= 2, src)
      // frequency must FALL with rank on any real token distribution;
      // the synthetic near-uniform draw keeps it shallow (> -1), true
      // Zipfian text sits near -1 — the diagnostic's whole point is
      // that this number separates the two regimes
      assert(sl < 0.0, s"$src slope $sl not negative")
      assert(sl > -5.0, s"$src slope $sl implausibly steep")
    }
  }
}
