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
    val curve = a.recallCurve(spark)
    def curveJson(c: Seq[(Int, Double)]) =
      c.map { case (np, r) => s""""$np":${fmt(r)}""" }.mkString(",")
    val pqByCodes = a.BookSizes.map { n =>
      s""""$n":{${curveJson(a.ivfpqRecallCurve(spark, nCodes = n))}}"""
    }.mkString(",")
    val residByCodes = a.BookSizes.map { n =>
      s""""$n":{${curveJson(a.residualRecallCurve(spark, nCodes = n))}}"""
    }.mkString(",")
    val json =
      s"""{"k":${a.RecallK},"corpus":${a.CorpusN},"queries":${a.QueryN
        },"clusters":${a.Clusters},"cells":${a.Clusters
        },"kmeans_iters":${operators.Similarity.KmIters
        },"recall_at_k":{${curveJson(curve)
        }},"ivfpq_recall_by_codes":{$pqByCodes
        },"residual_ivfpq_recall_by_codes":{$residByCodes
        },"geometry":"centers U[0,${a.CentScale}) per dim, jitter U[0,${
          a.Jitter}) — overlapping by design","note":"ivfpq keys are codes/subspace; 16 codes collapse onto the 16 planted clusters (no within-cluster ranking — the small-book failure mode), recall climbs with book size; residual encoding (d29) spends the same codes on within-cell structure — the measured fix"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("ann_recall.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
