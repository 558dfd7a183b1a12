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
    val curve = operators.AnnQuality.recallCurve(spark)
    val a = operators.AnnQuality
    val json =
      s"""{"k":${a.RecallK},"corpus":${a.CorpusN},"queries":${a.QueryN
        },"clusters":${a.Clusters},"cells":${a.Clusters
        },"kmeans_iters":${operators.Similarity.KmIters
        },"recall_at_k":{${
          curve.map { case (np, r) => s""""$np":${fmt(r)}""" }.mkString(",")
        }},"geometry":"centers U[0,${a.CentScale}) per dim, jitter U[0,${
          a.Jitter}) — overlapping by design"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("ann_recall.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
