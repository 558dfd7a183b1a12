package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.EventStreams

/** Query registry for the training-data pipeline + streaming operators
  * (SURVEY.md §2d/§2e). */
object PipelineOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_exact_dedup" -> (Dedup.exactDedup _),
    "d02_minhash_lsh" -> (Dedup.minhashLsh _),
    "d03_simhash" -> (Dedup.simhash _),
    "d04_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "d05_cosine_topk" -> (Similarity.cosineTopK _),
    "d06_ann_lsh" -> (Similarity.annLsh _),
    "d07_dedup_clusters" -> (Dedup.dedupClusters _),
    "d08_embedding_norm" -> (Similarity.d08EmbeddingNorm _),
    "d09_stratified_sample" -> (Sampling.d09StratifiedSample _),
    "d10_ivf_assign" -> (Similarity.d10IvfAssign _),
    "d11_embed_neardup" -> (Similarity.embedNearDup _),
    "d12_embed_neardup_lsh" -> (Similarity.embedNearDupLsh _),
    "d13_decontaminate" -> (TextAnalysis.d13Decontaminate _),
    "d14_clusters_scale" -> (Dedup.d14ClustersAtScale _),
    "d15_embed_clusters_scale" -> (Similarity.d15EmbedClustersScale _),
    "t01_lang_id" -> (TextAnalysis.langId _),
    "t02_quality_score" -> (TextAnalysis.qualityScore _),
    "t03_token_count" -> (TextAnalysis.tokenCount _),
    "t04_fingerprint" -> (TextAnalysis.fingerprintDocs _),
    "t05_bigram_freq" -> (TextAnalysis.t05BigramFreq _),
    "t06_repetition" -> (TextAnalysis.t06Repetition _),
    "t07_normalize" -> (TextAnalysis.t07Normalize _),
    "t08_pii_scrub" -> (TextAnalysis.t08PiiScrub _),
    "t09_common_ratio" -> (TextAnalysis.t09CommonRatio _),
    "t10_heavy_hitters" -> (TextAnalysis.t10HeavyHitters _),
    "d16_boilerplate" -> (TextAnalysis.d16Boilerplate _),
    "d17_ingest_neardup" -> (Dedup.d17IngestNearDup _),
    "d18_mixture_sample" -> (Sampling.d18MixtureSample _),
    "d20_dedup_corpus" -> (Dedup.d20DedupCorpus _),
    "d19_pq_codes" -> (Similarity.d19PqCodes _),
    "t11_boiler_strip" -> (TextAnalysis.t11BoilerStrip _),
    "m01_multimodal_meta" -> (Multimodal.mediaFeatures _),
    "m02_frame_sample" -> (Multimodal.frameSample _),
    "m03_chunk_hash" -> (Multimodal.chunkHash _),
    "m04_resize" -> (Multimodal.resize _),
    "s01_window_agg" -> (EventStreams.s01WindowAgg _),
    "s02_sessionize" -> (EventStreams.s02Sessionize _),
    "s03_hopping_window" -> (EventStreams.s03HoppingWindow _),
    "s04_window_users" -> (EventStreams.s04WindowUsers _),
    "s05_stream_enrich" -> (EventStreams.s05StreamEnrich _),
    "s06_stream_hitters" -> (EventStreams.s06StreamHitters _))

  val oracles: Map[String, String] = Map(
    "d01_exact_dedup" -> Dedup.exactDedupSql,
    "d02_minhash_lsh" -> Dedup.minhashLshSql,
    "d04_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "d05_cosine_topk" -> Similarity.cosineTopKSql,
    "d07_dedup_clusters" -> Dedup.dedupClustersSql,
    "d08_embedding_norm" -> Similarity.d08Sql,
    "d09_stratified_sample" -> Sampling.d09Sql,
    "d10_ivf_assign" -> Similarity.d10Sql,
    "d11_embed_neardup" -> Similarity.embedNearDupSql,
    "d13_decontaminate" -> TextAnalysis.decontaminateSql,
    // d14 intentionally shares d07's oracle: the star reduction must
    // land on the SAME clusters as the all-pairs path on this corpus
    "d14_clusters_scale" -> Dedup.dedupClustersSql,
    "t01_lang_id" -> TextAnalysis.langIdSql,
    "t02_quality_score" -> TextAnalysis.qualityScoreSql,
    "t03_token_count" -> TextAnalysis.tokenCountSql,
    "t04_fingerprint" -> TextAnalysis.fingerprintSql,
    "t05_bigram_freq" -> TextAnalysis.bigramFreqSql,
    "t06_repetition" -> TextAnalysis.repetitionSql,
    "t07_normalize" -> TextAnalysis.normalizeSql,
    "t08_pii_scrub" -> TextAnalysis.piiScrubSql,
    "t09_common_ratio" -> TextAnalysis.commonRatioSql,
    "t10_heavy_hitters" -> TextAnalysis.heavyHittersSql,
    "d16_boilerplate" -> TextAnalysis.boilerplateSql,
    "d17_ingest_neardup" -> Dedup.ingestNearDupSql,
    "d18_mixture_sample" -> Sampling.d18Sql,
    "d20_dedup_corpus" -> Dedup.dedupCorpusSql,
    "d19_pq_codes" -> Similarity.d19Sql,
    "t11_boiler_strip" -> TextAnalysis.boilerStripSql,
    "m01_multimodal_meta" -> Multimodal.mediaFeaturesSql,
    "m02_frame_sample" -> Multimodal.frameSampleSql,
    "m03_chunk_hash" -> Multimodal.chunkHashSql,
    "m04_resize" -> Multimodal.resizeSql,
    "s01_window_agg" -> EventStreams.s01Sql,
    "s02_sessionize" -> EventStreams.s02Sql,
    "s03_hopping_window" -> EventStreams.s03Sql,
    "s04_window_users" -> EventStreams.s04Sql,
    "s05_stream_enrich" -> EventStreams.s05Sql,
    "s06_stream_hitters" -> EventStreams.s06Sql)
}
