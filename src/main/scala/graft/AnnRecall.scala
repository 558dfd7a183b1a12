package graft

/** Machine-recorded ANN quality artifact (round-5 verdict #1).
  *
  * Writes `ann_recall.json`: recall@10 vs brute force per nprobe for
  * the trained IVF index over [[graft.operators.AnnQuality]]'s
  * planted clustered corpus. Every input is deterministic, so the
  * curve is exactly reproducible — PipelineSpec pins its floor
  * (recall ≥ 0.9 at nprobe = 4), its monotone climb, and exactness
  * at full probe; this main commits the whole curve so the tuning
  * trade-off (probe width vs quality) is readable, not asserted.
  *
  * Run: `sbt "runMain graft.AnnRecall"`.
  */
object AnnRecall {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val a = operators.AnnQuality
    def curveJson(c: Seq[(Int, Double)]) =
      c.map { case (np, r) => s""""$np":${fmt(r)}""" }.mkString(",")
    // `nav` arg: print only the d84 curve (knob-tuning loop) without
    // touching the committed artifact
    if (args.contains("nav")) {
      println(s"""{"nav_recall_by_beam":{${
        curveJson(a.navRecallCurve(spark))}}}""")
      spark.stop()
      return
    }
    val curve = a.recallCurve(spark)
    val pqByCodes = a.BookSizes.map { n =>
      s""""$n":{${curveJson(a.ivfpqRecallCurve(spark, nCodes = n))}}"""
    }.mkString(",")
    val residByCodes = a.BookSizes.map { n =>
      s""""$n":{${curveJson(a.residualRecallCurve(spark, nCodes = n))}}"""
    }.mkString(",")
    val projByR = curveJson(a.projectedRecallCurve(spark))
    val projByDims = curveJson(a.projectedDimsCurve(spark))
    val mrlByR = curveJson(a.mrlRerankCurve(spark))
    val mrlByWidth = curveJson(a.mrlWidthCurve(spark))
    val binByR = curveJson(a.binaryRerankCurve(spark))
    val (fuseH, fuseP, fuseCurve) = a.fusionRecallCurve(spark)
    // d47 production config: residual IVF+PQ shortlist + exact
    // re-rank, (nprobe × codes × R) — the round-7 verdict's sweep.
    // Recall is CAPPED by the full-precision probe ceiling (recall_
    // at_k above); the re-rank recovers ≥95% of that ceiling at
    // every nprobe (PipelineSpec pins the recovery at nprobe=4 and
    // the ≥0.9 absolute floor at 256 codes, R=100, nprobe=8).
    val rerankByCodes = Seq(4, 8).map { np =>
      val byCodes = Seq(64, 256).map { n =>
        s""""$n":{${curveJson(
          a.residualRerankRecallCurve(spark, nCodes = n, np = np))}}"""
      }.mkString(",")
      s""""nprobe$np":{$byCodes}"""
    }.mkString(",")
    val json =
      s"""{"k":${a.RecallK},"corpus":${a.CorpusN},"queries":${a.QueryN
        },"clusters":${a.Clusters},"cells":${a.Clusters
        },"kmeans_iters":${operators.Similarity.KmIters
        },"recall_at_k":{${curveJson(curve)
        }},"ivfpq_recall_by_codes":{$pqByCodes
        },"residual_ivfpq_recall_by_codes":{$residByCodes
        },"projected_rerank_by_R":{$projByR
        },"projected_rerank_by_dims_at_R50":{$projByDims
        },"mrl_rerank_by_R_at_width16":{$mrlByR
        },"mrl_rerank_by_width_at_R50":{$mrlByWidth
        },"binary_rerank_by_R":{$binByR
        },"fusion_rank_recall":{"hamming_only":${fmt(fuseH)
        },"prefix_only":${fmt(fuseP)},"fused_by_R":{${
          curveJson(fuseCurve)}}
        },"residual_rerank_by_nprobe_codes_R":{$rerankByCodes
        },"nav_recall_by_beam_at_hops${operators.Similarity.NavHops}":{${
          curveJson(a.navRecallCurve(spark))
        }},"hnsw_recall_by_beam_at_hops${operators.Similarity.NavHops}":{${
          curveJson(a.hnswRecallCurve(spark))
        }},"insert_recall_by_beam_at_hops${operators.Similarity.NavHops}":{${
          curveJson(a.insertRecallCurve(spark))
        }},"banding_edge_recall":{${
          a.bandingRecall(spark).map { case (k, v) =>
            s""""$k":${fmt(v)}""" }.mkString(",")
        }},"candidate_volume":{${
          a.candidateVolumes(spark).map { case (k, v) =>
            s""""$k":$v""" }.mkString(",")
        }},"geometry":"centers U[0,${a.CentScale}) per dim, jitter U[0,${
          a.Jitter}) — overlapping by design","note":"ivfpq keys are codes/subspace; 16 codes collapse onto the 16 planted clusters (no within-cluster ranking — the small-book failure mode), recall climbs with book size; residual encoding (d29) spends the same codes on within-cell structure — the measured fix. projected_rerank keys are shortlist R (d45, 16 dims) / projection dims (at R=50): JL distortion at 4x compression cannot rank within-cluster structure, so recall climbs with BOTH levers — the projection buys a cheap shortlist, not a ranking. binary_rerank_by_R is d88's 1-bit leg on the same ladder, and the measured surprise: at equal R it BEATS the 16-dim JL projection and the 16-dim MRL prefix (0.29 vs 0.15/0.18 at R=20) at 8x their compression — each dimension's corpus mean splits the planted centers near-evenly, so all 64 sign bits carry cluster-discriminative signal, while a 16-dim slice (either flavor) keeps 16 noisy coordinates; 1-bit-times-all-dims binarization preserves BETWEEN-cluster structure better than few-dims-at-full-width, exactly the regime binary quantization is shipped for. Within-cluster ranking is what it cannot do, so recall still climbs with R like every cheap shortlist. fusion_rank_recall measures d91's Borda fusion of the Hamming and prefix rankings: fused beats the weaker list (prefix, 0.11) at every depth and passes the stronger list (hamming, 0.19) only from R=50 — rank fusion pays when the lists are comparably informative and deep enough to vote, and the pair of scalars next to the curve makes that read from data. banding_edge_recall/candidate_volume pair the trade per candidate scheme: d66's trained-cell blocking (16 cells, 2 probes) proposes ~1.8x the true edges of d59's data-blind multi-probe at ~39% of its candidate volume — a trained coarse quantizer spends buckets where the data is. nav_recall_by_beam is the d84 graph-navigable serving leg (entry medoid + beam walk over the NavK-out-degree trained-cell graph): beam width is the recall knob, monotone by construction, each step costing O(beam x NavK) scored candidates per hop independent of corpus size. hnsw_recall_by_beam is d86's layer-descent entry over the same layer-0 graph at the same beams: it TRAILS the medoid entries on this corpus (0.51 vs 0.64 at beam 8) — a trained router already provides query-specific entry, which is what the hierarchy's global-entry descent re-derives; the pair of curves is the measured form of the published flat-graph-with-good-entries ~= HNSW observation. insert_recall_by_beam is d94's inserted graph (base built without the delta slice, delta batch-inserted via bidirectional link + shrink, walk from the BASE medoid entries) against the FULL-corpus truth at the same beams — read next to nav_recall_by_beam: the gap is the quality price of freshness-by-insert, the number an operator needs before trusting inserts between rebuilds"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("ann_recall.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
