package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines
  * (SURVEY.md §2d).
  *
  * Curriculum/mixture construction needs per-stratum rates ("3% of
  * web, 40% of books") that are (a) exactly reproducible across
  * runs and engines and (b) stable under repartitioning. Spark's
  * `sampleBy` draws from a partition-order-dependent RNG stream, so
  * the SAMPLE is not stable under shuffle-partition changes; these
  * operators hash the row's own key instead — membership is a pure
  * function of (key, seed, rate), independent of partitioning,
  * cluster size, or row order, and any engine with the same hash
  * picks the identical sample.
  */
object Sampling {

  /** True iff the key falls in the sampled fraction: uniform in
    * [0, 1) via xxhash64(key, seed). */
  def hashInFraction(key: Column, fraction: Column, seed: Long): Column =
    (pmod(xxhash64(key, lit(seed)), lit(1000000L)).cast("double")
      / 1000000.0) < fraction

  /** Per-stratum deterministic sample: `rates` maps stratum value →
    * fraction; strata not listed are dropped. */
  def stratifiedSample(df: DataFrame, stratum: String, key: String,
      rates: Map[String, Double], seed: Long = 42L): DataFrame = {
    val rate = rates.foldLeft(lit(-1.0)) { case (acc, (s, r)) =>
      when(col(stratum) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashInFraction(col(key), rate, seed))
  }

  /** d09: the oracle-checkable form of [[stratifiedSample]] — the
    * hash is Knuth multiplicative (plain integer arithmetic), so any
    * engine reproduces membership exactly: keep doc iff
    * (doc_id·2654435761) mod 10⁶ < rate·10⁶. Mixture: 50% of en, 20%
    * of de, drop the rest. */
  def d09StratifiedSample(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    val bucket = pmod(col("doc_id") * 2654435761L, lit(1000000L))
    val cut = when(col("lang") === "en", lit(500000L))
      .when(col("lang") === "de", lit(200000L))
      .otherwise(lit(0L))
    docs.filter(bucket < cut)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  val d09Sql: String =
    """SELECT doc_id, lang, source
      |FROM documents
      |WHERE (doc_id * 2654435761) % 1000000 <
      |  CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 200000
      |    ELSE 0 END
      |ORDER BY doc_id""".stripMargin

  /** d18's normalizer: per-source keep rate = min(1, K/√chars(s)) —
    * the α=0.5 temperature mixture (sampled mass ∝ √source size:
    * big sources are flattened, small ones kept whole) with a fixed
    * normalizing constant instead of a cross-source Σ√chars, so no
    * double is ever SUMMED across rows in float space (summation
    * order is the one thing two engines won't agree on bit-for-bit;
    * √ and ÷ of exact integers they will). */
  val MixtureK = 40.0

  /** d18: deterministic temperature-mixture sample. Pass 1 is a
    * map-side-combined per-source char count (|sources| rows);
    * pass 2 broadcasts the 20-row rate table and filters by the same
    * engine-portable Knuth-hash membership as d09 — the sample is a
    * pure function of (doc_id, source size), stable under
    * repartitioning, cluster size, and engine. */
  /** Per-source sampling cut table (|sources| rows) — reusable by
    * any pipeline stage that wants the same mixture membership. */
  def mixtureCuts(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("cs"))
      .withColumn("cut", floor(
        least(lit(1.0), lit(MixtureK) / sqrt(col("cs").cast("double")))
          * 1000000).cast("long"))
      .select(col("source"), col("cut"))

  def d18MixtureSample(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.join(broadcast(mixtureCuts(docs)), Seq("source"))
      .filter(pmod(col("doc_id") * 2654435761L, lit(1000000L))
        < col("cut"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  val d18Sql: String =
    s"""WITH cuts AS (
       |  SELECT source,
       |    CAST(FLOOR(LEAST(1.0,
       |      $MixtureK / SQRT(CAST(SUM(n_chars) AS DOUBLE)))
       |      * 1000000) AS BIGINT) AS cut
       |  FROM documents GROUP BY source)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN cuts c ON d.source = c.source
       |WHERE (d.doc_id * 2654435761) % 1000000 < c.cut
       |ORDER BY d.doc_id""".stripMargin

  // ---- token-budget sharding (training split packing) ---------------

  /** Tokens per training shard for d23. */
  val ShardBudget = 4096L

  /** d23: deterministic token-budget sharding — pack the corpus, in
    * doc_id order, into shards of ~[[ShardBudget]] tokens (the
    * fixed-budget splits a data-parallel training run feeds each
    * worker). shard = floor(exclusive-prefix-sum(tokens) / budget):
    * a pure function of the corpus, independent of partitioning.
    *
    * The naive formulation is `sum(n) OVER (ORDER BY doc_id)` — a
    * GLOBAL window, which Spark executes as a single-partition sort:
    * the whole corpus funnels through one task (the t05-class
    * scale-killer). This is instead the textbook DISTRIBUTED prefix
    * sum: (1) bin rows into contiguous doc_id ranges (deterministic
    * arithmetic on the one collected scalar max — not
    * repartitionByRange, whose sampled boundaries could differ
    * between the two passes over the data); (2) one narrow per-bin
    * total (|bins| rows, bounded by the shuffle width) whose own
    * prefix sum is a window over that TINY relation; (3) per-row
    * running sums inside each bin — [[spark.sql.shuffle.partitions]]
    * windows running in parallel, each sorting only its slice. Same
    * semantics, no global funnel, at any corpus size.
    */
  def d23TokenShards(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
    val bins = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // one scalar — bounded driver materialization (the vtag-universe
    // precedent); makes the bin function a literal, so both passes
    // below see identical bins with no re-sampling hazard
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val binOf = least(lit(bins - 1),
      (col("doc_id") * bins / (maxId + 1)).cast("int"))
    val binned = docs.withColumn("bin", binOf)
    // per-bin totals; prefix over |bins| rows is legitimately a
    // single tiny window (bounded by the configured shuffle width)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = binned.groupBy(col("bin"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
      .withColumn("offset", coalesce(sum(col("bin_tokens")).over(w), lit(0L)))
      .select(col("bin"), col("offset"))
    // per-row running sum WITHIN each bin — parallel across bins
    val wRow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bin")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    binned.join(broadcast(offsets), Seq("bin"))
      .withColumn("cum_before",
        col("offset") + coalesce(sum(col("n_tokens")).over(wRow), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        (col("cum_before") / ShardBudget).cast("long").as("shard"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle: the single-window formulation — semantics are
    * partitioning-invisible, so the naive global cumsum IS the
    * correctness contract the distributed form must hit. */
  val d23Sql: String =
    s"""SELECT doc_id, n_tokens,
       |  CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / $ShardBudget)
       |    AS BIGINT) AS shard
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
       |    SUM(CAST(len(string_split(trim(text), ' ')) AS BIGINT))
       |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---- d78: fixed-length sequence packing (doc-spanning) ------------

  /** Tokens per packed training sequence for d78. A power of two so
    * the offset→sequence division is exact under any arithmetic. */
  val SeqLen = 512L

  /** d78: FIXED-LENGTH sequence packing — the layout a pretraining
    * run actually feeds the model: the corpus concatenates in doc_id
    * order and splits into [[SeqLen]]-token sequences, documents
    * SPANNING sequence boundaries (d23 packs whole docs into ~budget
    * shards; packed batches cut mid-document — both layouts exist in
    * production, this is the dense one with zero padding waste).
    * Output is the span relation a packed-batch loader consumes:
    * (seq_id, doc_id, doc_off, seq_off, len) — every token of every
    * doc lands in exactly one span, every sequence except the last
    * holds exactly [[SeqLen]] tokens (both spec-pinned).
    *
    * Scale shape: the global token offset comes from d23's
    * distributed prefix sum (contiguous doc_id bins → per-bin totals
    * → tiny window → per-bin row sums; no global window), then each
    * doc explodes into its ⌈span⌉ sequences via a bounded
    * `sequence()` — output size Σ(n/L + 1), linear in the corpus. */
  def d78SequencePack(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n"))
    val bins = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val binOf = least(lit(bins - 1),
      (col("doc_id") * bins / (maxId + 1)).cast("int"))
    val binned = docs.withColumn("bin", binOf)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = binned.groupBy(col("bin"))
      .agg(sum(col("n")).as("bin_tokens"))
      .withColumn("offset",
        coalesce(sum(col("bin_tokens")).over(w), lit(0L)))
      .select(col("bin"), col("offset"))
    val wRow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bin")).orderBy(col("doc_id"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    binned.join(broadcast(offsets), Seq("bin"))
      .withColumn("o",
        col("offset") + coalesce(sum(col("n")).over(wRow), lit(0L)))
      .select(col("doc_id"), col("n"), col("o"),
        explode(sequence(expr(s"o DIV $SeqLen"),
          expr(s"(o + n - 1) DIV $SeqLen"))).as("seq_id"))
      .withColumn("start", greatest(col("o"), col("seq_id") * SeqLen))
      .select(col("seq_id"), col("doc_id"),
        (col("start") - col("o")).as("doc_off"),
        (col("start") - col("seq_id") * SeqLen).as("seq_off"),
        (least(col("o") + col("n"), (col("seq_id") + 1) * SeqLen)
          - col("start")).as("len"))
      .orderBy(col("seq_id"), col("doc_id"))
  }

  /** DuckDB oracle: the single-window global-cumsum formulation —
    * the partitioning-invisible contract (d23's convention). */
  val d78Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
       |    SUM(CAST(len(string_split(trim(text), ' ')) AS BIGINT))
       |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM documents),
       |d AS (SELECT doc_id, n, CAST(cum - n AS BIGINT) AS o FROM t),
       |sp AS (
       |  SELECT doc_id, n, o,
       |    unnest(generate_series(o // $SeqLen,
       |      (o + n - 1) // $SeqLen)) AS seq_id
       |  FROM d)
       |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       |  CAST(GREATEST(o, seq_id * $SeqLen) - o AS BIGINT) AS doc_off,
       |  CAST(GREATEST(o, seq_id * $SeqLen) - seq_id * $SeqLen
       |    AS BIGINT) AS seq_off,
       |  CAST(LEAST(o + n, (seq_id + 1) * $SeqLen)
       |    - GREATEST(o, seq_id * $SeqLen) AS BIGINT) AS len
       |FROM sp ORDER BY seq_id, doc_id""".stripMargin

  // ---- d35: weighted sampling without replacement -------------------

  /** Sample size for d35. */
  val WsrK = 100

  /** Priority resolution: u is a 10⁶-grid uniform, priority =
    * u·10⁶ ÷ weight in pure integer arithmetic. */
  val WsrScale = 1000000L

  /** d35: deterministic weighted sampling without replacement —
    * sequential Poisson sampling (Ohlsson 1998, the public πps
    * survey-sampling scheme): each row draws a uniform u and the k
    * rows with the SMALLEST priority u/w are the sample, so
    * inclusion probability is approximately proportional to the
    * weight w (here n_chars — "sample long documents more").
    *
    * Training-data use: char-weighted corpus subsampling picks the
    * documents carrying the most text mass without a global sort by
    * size (which would take the same docs every run) and without
    * `sample()`'s partition-order RNG (not reproducible across
    * cluster shapes).
    *
    * Everything is exact integer arithmetic — u is the same Knuth
    * multiplicative hash as d09 (a pure function of doc_id), and the
    * priority is one integer multiply + floor division, so the
    * sample is bit-identical on any engine, partitioning, or cluster
    * size, with NO transcendentals to disagree on (the
    * Efraimidis–Spirakis u^(1/w) key needs pow; u/w ranks
    * identically for one-draw-per-row πps and stays in ℤ).
    *
    * Plan shape at scale: one narrow projection, then
    * TakeOrderedAndProject with k=[[WsrK]] — per-partition bounded
    * heaps, no global sort, no shuffle of the corpus. Ties break by
    * doc_id (exact duplicates of (u, w) are possible across the id
    * space). */
  def d35WeightedSample(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    docs
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr(s"((pmod(doc_id * 2654435761, $WsrScale) + 1) * $WsrScale)" +
          " div n_chars").as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(WsrK)
  }

  val d35Sql: String =
    s"""SELECT doc_id, source, n_chars,
       |  (((doc_id * 2654435761) % $WsrScale + 1) * $WsrScale)
       |    // n_chars AS priority
       |FROM documents
       |ORDER BY priority, doc_id
       |LIMIT $WsrK""".stripMargin

  // ---- d38: quality-weighted source mixture -------------------------

  /** Weight grid for d38 (parts-per-million). */
  val MixScale = 1000000L

  /** d38: quality-driven source reweighting — the data-mixture lever
    * tuned from the corpus's own quality signal (the DoReMi-family
    * idea reduced to its measurable core): each source's sampling
    * weight is its share of total quality mass, so a source whose
    * documents score well under t02's rubric is upsampled relative
    * to its raw size. Downstream, d09/d18-style hash membership
    * consumes weight_fp directly as a per-source keep rate.
    *
    * Exactness: the per-doc quality (already engine-exact — t02
    * hash-matches) quantizes to integer micros per DOCUMENT, so the
    * per-source and corpus totals are exact integer sums and
    * weight_fp = one integer multiply + floor division. The 1-row
    * corpus total rides a broadcast cross join (the t15
    * bounded-literal pattern). One doc-level aggregate, one
    * |sources|-row pass — nothing else moves. */
  def d38SourceWeights(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
      .withColumn("st", graft.functions.TextFunctions.wordStats(col("text")))
      .withColumn("n_chars", length(trim(col("text"))).cast("long"))
      .withColumn("alpha_ratio", round(
        length(regexp_replace(trim(col("text")), "[^a-z]", ""))
          .cast("double") / col("n_chars"), 6))
      .withColumn("avg_word_len", round(
        col("st.len_sum").cast("double") / col("st.n_words"), 6))
      .withColumn("q_fp", round(lit(MixScale.toDouble) * (
        least(col("st.n_words").cast("double") / 100.0, lit(1.0)) * 0.5 +
          col("alpha_ratio") * 0.3 +
          when(col("avg_word_len").between(3.0, 8.0), 0.2)
            .otherwise(0.0)), 0).cast("long"))
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("q_fp")).as("q_sum"))
    val total = perSource.agg(sum(col("q_sum")).as("q_total"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("q_sum"),
        expr(s"(q_sum * $MixScale) div q_total").as("weight_fp"))
      .orderBy(col("source"))
  }

  val d38Sql: String = {
    val w = graft.functions.TextFunctions.wordsSql
    s"""WITH q AS (
       |  SELECT source,
       |    CAST(ROUND($MixScale.0 * (
       |      LEAST(CAST(len($w) AS DOUBLE) / 100.0, 1.0) * 0.5 +
       |      ROUND(CAST(length(regexp_replace(trim(text), '[^a-z]', '',
       |        'g')) AS DOUBLE) / length(trim(text)), 6) * 0.3 +
       |      CASE WHEN ROUND(CAST(list_sum(list_transform($w,
       |          x -> length(x))) AS DOUBLE) / len($w), 6)
       |        BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END), 0)
       |      AS BIGINT) AS q_fp
       |  FROM documents),
       |ps AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(q_fp) AS BIGINT) AS q_sum
       |  FROM q GROUP BY 1),
       |tt AS (SELECT CAST(sum(q_sum) AS BIGINT) AS q_total FROM ps)
       |SELECT source, n_docs, q_sum,
       |  (q_sum * $MixScale) // q_total AS weight_fp
       |FROM ps CROSS JOIN tt
       |ORDER BY source""".stripMargin
  }

  /** d57: distribution-drift gate (two-sample Kolmogorov–Smirnov) —
    * the admission check a recurring corpus load runs before mixing a
    * new batch in: "does this delta's length profile still look like
    * the base corpus, per source?" The statistic is computed EXACTLY
    * on the integer grid: KS = max|F_base − F_delta| =
    * max|cumA·nB − cumB·nA| / (nA·nB), whose numerator is pure int64
    * (value-histogram counts + prefix sums over the bounded distinct
    * domain, per source — the q71 discipline), the division the one
    * double op. Both engines replay digit-for-digit. int64 bound:
    * cum·n < 2^63 holds through ~3·10⁹ rows/side/source; the bound
    * is ENFORCED in-plan (ADVICE r8): an `assert_true` on
    * n_base·n_delta fails the query loudly instead of letting the
    * non-ANSI multiply wrap and corrupt the statistic. Beyond the
    * bound, widen to decimal or gate on a stratified sample. */
  def d57DriftKs(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the delta split uses mod 7: doc_ids stripe by source mod 20
    // in this data, so a mod-10 split would give most sources an
    // empty half; 7 is coprime to the stripe and cuts every source
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("n_chars"),
        (col("doc_id") % 7 === 0).cast("int").as("is_delta"))
    val hist = docs.groupBy(col("source"), col("n_chars"))
      .agg(sum(lit(1) - col("is_delta")).cast("long").as("ca"),
        sum(col("is_delta")).cast("long").as("cb"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    hist
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .groupBy(col("source"))
      .agg(max(col("na")).as("n_base"), max(col("nb")).as("n_delta"),
        max(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .as("ks_numer"))
      .filter(col("n_base") > 0 && col("n_delta") > 0)
      // the documented int64 contract, enforced: NULL (guard passed)
      // coalesces to 0.0, a violation raises instead of wrapping.
      // n_base/n_delta themselves are multiply-free, so they are
      // trustworthy even when the numerator would have wrapped.
      .select(col("source"), col("n_base"), col("n_delta"),
        (round(col("ks_numer").cast("double")
          / (col("n_base") * col("n_delta")), 6)
          + coalesce(assert_true(
              col("n_base").cast("double") * col("n_delta").cast("double")
                < 9.0e18,
              concat(lit("d57: n_base*n_delta exceeds the int64 KS " +
                "numerator bound for source "), col("source")))
            .cast("double"), lit(0.0))).as("ks"))
      .orderBy(col("source"))
  }

  val d57Sql: String =
    """WITH h AS (
      |  SELECT source, n_chars,
      |    SUM(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS ca,
      |    SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS cb
      |  FROM documents GROUP BY 1, 2),
      |c AS (
      |  SELECT source,
      |    SUM(ca) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    SUM(cb) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
      |    SUM(ca) OVER (PARTITION BY source) AS na,
      |    SUM(cb) OVER (PARTITION BY source) AS nb
      |  FROM h)
      |SELECT source, CAST(MAX(na) AS BIGINT) AS n_base,
      |  CAST(MAX(nb) AS BIGINT) AS n_delta,
      |  ROUND(CAST(MAX(ABS(cuma * nb - cumb * na)) AS DOUBLE)
      |    / (MAX(na) * MAX(nb)), 6) + 0.0 AS ks
      |FROM c GROUP BY source
      |HAVING MAX(na) > 0 AND MAX(nb) > 0
      |ORDER BY source""".stripMargin

  /** Slots d53 apportions. */
  val QuotaSlots = 1000000L

  /** d53: largest-remainder (Hamilton) quota apportionment — "give
    * each source EXACTLY its proportional share of N sample slots,
    * and make the shares sum to N": floor shares from exact integer
    * division, then the leftover slots go to the largest fractional
    * remainders (source-name tiebreak). The rounding step d18's
    * per-source rates and d38's weights both stop short of — a
    * sampler that draws `alloc` per source hits the budget exactly,
    * no stochastic drift. Everything after the one corpus aggregate
    * runs on the |sources|-row relation (bounded global windows,
    * gate-allowlisted); arithmetic is pure int64, oracle-identical. */
  def d53QuotaAlloc(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val T = QuotaSlots
    val n = graft.Tables.load(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy(col("rem").desc, col("source"))
    n.withColumn("total", sum(col("n_docs")).over(wAll))
      .withColumn("floor_share",
        expr(s"($T * n_docs) div total"))
      .withColumn("rem", expr(s"($T * n_docs) % total"))
      .withColumn("deficit",
        lit(T) - sum(col("floor_share")).over(wAll))
      .withColumn("rk", row_number().over(wRank))
      .select(col("source"), col("n_docs"), col("floor_share"),
        (col("floor_share") +
          when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy(col("source"))
  }

  val d53Sql: String =
    s"""WITH n AS (
       |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
       |t AS (
       |  SELECT source, n_docs,
       |    CAST(SUM(n_docs) OVER () AS BIGINT) AS total
       |  FROM n),
       |f AS (
       |  SELECT source, n_docs,
       |    ($QuotaSlots * n_docs) // total AS floor_share,
       |    ($QuotaSlots * n_docs) % total AS rem
       |  FROM t),
       |r AS (
       |  SELECT source, n_docs, floor_share,
       |    $QuotaSlots - CAST(SUM(floor_share) OVER () AS BIGINT)
       |      AS deficit,
       |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
       |  FROM f)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(floor_share AS BIGINT) AS floor_share,
       |  CAST(floor_share + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
       |    AS BIGINT) AS alloc
       |FROM r ORDER BY source""".stripMargin

  /** d61 shard counts: the topology change under audit (N → N+1). */
  val ShardsOld = 16
  val ShardsNew = 17

  /** d61: shard-topology rebalance audit — mod-N vs RENDEZVOUS
    * (highest-random-weight, Thaler–Ravishankar, public algorithm)
    * assignment when a 100 TB corpus grows its shard fleet from
    * [[ShardsOld]] to [[ShardsNew]]: mod-N remaps ~(1 − 1/N′) of ALL
    * keys (a full-corpus rewrite), rendezvous provably moves only
    * ~1/N′ (each key re-homes only if the NEW node wins its hash
    * race). The report measures both on the same corpus — the number
    * a storage migration plan starts from. Exact and engine-portable:
    * the per-(doc, shard) weight is the md5 hex string of
    * "shard#doc", argmax'd per doc by (weight, shard) struct order —
    * one 17-wide narrow explode + one partial-aggregable max, no
    * shuffle before the per-doc aggregate, scalar audit rows out. */
  def d61RendezvousShards(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
    val wt = docs
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(ShardsNew - 1))).as("s"))
      .withColumn("wt", md5(concat(col("s").cast("string"), lit("#"),
        col("doc_id").cast("string")).cast("binary")))
    val homes = wt.groupBy(col("doc_id"))
      .agg(
        max(when(col("s") < ShardsOld, struct(col("wt"), col("s"))))
          .getField("s").as("rv_old"),
        max(struct(col("wt"), col("s"))).getField("s").as("rv_new"))
    val modRow = docs.agg(count(lit(1)).as("n_docs"),
        sum((col("doc_id") % ShardsOld =!=
          col("doc_id") % ShardsNew).cast("long")).as("n_moved"))
      .select(lit("mod").as("scheme"), col("n_docs"), col("n_moved"))
    val rvRow = homes.agg(count(lit(1)).as("n_docs"),
        sum((col("rv_old") =!= col("rv_new")).cast("long"))
          .as("n_moved"))
      .select(lit("rendezvous").as("scheme"), col("n_docs"),
        col("n_moved"))
    modRow.unionByName(rvRow)
      .withColumn("moved_rate",
        round(col("n_moved").cast("double") / col("n_docs"), 6)
          + lit(0.0))
      .orderBy(col("scheme"))
  }

  val d61Sql: String =
    s"""WITH ex AS (
       |  SELECT doc_id, s.s AS s,
       |    md5(CAST(s.s AS VARCHAR) || '#' || CAST(doc_id AS VARCHAR))
       |      AS wt
       |  FROM documents CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${ShardsNew - 1})) AS s)
       |      s),
       |homes AS (
       |  SELECT doc_id,
       |    MAX(CASE WHEN s < $ShardsOld THEN wt || '|' ||
       |      lpad(CAST(s AS VARCHAR), 2, '0') END) AS ko,
       |    MAX(wt || '|' || lpad(CAST(s AS VARCHAR), 2, '0')) AS kn
       |  FROM ex GROUP BY doc_id),
       |rv AS (
       |  SELECT doc_id,
       |    CAST(substring(ko, 34, 2) AS BIGINT) AS rv_old,
       |    CAST(substring(kn, 34, 2) AS BIGINT) AS rv_new
       |  FROM homes)
       |SELECT scheme, n_docs, n_moved,
       |  ROUND(CAST(n_moved AS DOUBLE) / n_docs, 6) + 0.0
       |    AS moved_rate
       |FROM (
       |  SELECT 'mod' AS scheme, COUNT(*) AS n_docs,
       |    CAST(SUM(CASE WHEN doc_id % $ShardsOld
       |      <> doc_id % $ShardsNew THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_moved
       |  FROM documents
       |  UNION ALL
       |  SELECT 'rendezvous', COUNT(*),
       |    CAST(SUM(CASE WHEN rv_old <> rv_new THEN 1 ELSE 0 END)
       |      AS BIGINT)
       |  FROM rv)
       |ORDER BY scheme""".stripMargin

  /** d62: deterministic EPOCH SHUFFLE — the training-order
    * permutation a data loader needs: reproducible across runs,
    * engines and partitioning (seeded hash order, no RNG state), yet
    * statistically shuffled. Assigning the POSITION is the scale
    * problem (a global row_number is a single-task sort); the d23
    * bin-parallel form solves it: the first hash byte buckets docs
    * into 256 bins whose offsets come from one bounded 256-row
    * window, positions are bin offset + intra-bin rank (windows
    * partitioned per bin) — and because the bin byte IS the hash
    * prefix, (bin, rest-of-hash) order equals global hash order, so
    * the oracle can state the plain global ROW_NUMBER form. */
  def d62EpochShuffle(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seed = "epoch1"
    val hashed = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit(seed), lit("#"), col("doc_id").cast("string"))
          .cast("binary")).as("h"))
      .withColumn("bin", substring(col("h"), 1, 2))
    val offsets = hashed.groupBy(col("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(
        Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bin"), col("off"))
    val wBin = Window.partitionBy(col("bin"))
      .orderBy(col("h"), col("doc_id"))
    hashed
      .withColumn("rn", row_number().over(wBin).cast("long"))
      .join(offsets.hint("shuffle_hash"), Seq("bin"))
      .select(col("doc_id"), (col("off") + col("rn") - 1).as("pos"))
      .orderBy(col("doc_id"))
  }

  val d62Sql: String =
    """SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (
      |    ORDER BY md5('epoch1#' || CAST(doc_id AS VARCHAR)), doc_id)
      |    - 1 AS BIGINT) AS pos
      |FROM documents ORDER BY doc_id""".stripMargin
}
