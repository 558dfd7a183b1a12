package graft


object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // Warm the JVM/codegen paths once so the first timed query doesn't
    // absorb startup cost; not part of any measurement. Fixture maps
    // pre-encode here too: g13/g14 measure the distributed pipeline,
    // and their input .map is setup (the reference reads a
    // pre-existing file), not workload.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.operators.MapBench.warmFixtures(spark, sfDir)
    catch { case _: Throwable => () }
    // Optional comma-separated key filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=d07_dedup_clusters,d02_minhash_lsh
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map {
      case (name, fn) =>
        // drop cross-query operator caches so every query pays its
        // OWN pipeline: d02 fills the LSH cache that d07 would
        // otherwise read, turning d07's number into clustering-only —
        // a measurement artifact, not a speedup (per-query times must
        // stay comparable across rounds)
        graft.operators.Dedup.releaseLshCache()
        graft.operators.Similarity.releaseSimCache()
        graft.operators.MapBench.releaseFleetCache()
        val t0 = System.nanoTime()
        // noop sink executes the COMPLETE plan (count() would let
        // Catalyst drop sorts/projections from row-level queries and
        // read no parquet columns at all for pure selects).
        val err =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            None
          } catch { case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200))
          }
        (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // a failed query records -1 (NOT its elapsed-until-throw time, so
    // a broken query can't masquerade as a fast one) + an errors entry.
    // Durations are ms-rounded: the driver captures a bounded stdout
    // tail and the round-3 full-precision line overflowed it, so the
    // JSON arrived head-truncated and unparseable.
    // 2 decimals (10 ms grain), trailing zeros stripped — every byte
    // counts toward keeping the whole line inside the driver's
    // stdout tail window even with three drill sections
    def fmt(v: Double): String = {
      val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      if (s.contains('.'))
        s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else fmt(v))
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":\"" + m + "\""
    }.mkString("{", ",", "}")
    val ok = results.filter(_._3.isEmpty)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    // Scale drills: if a replica exists (tools/gen_sf.py →
    // localdata/sf1 at 10x, localdata/sf10 at 100x), also run a
    // bounded headline subset there, so every bench report carries a
    // scale CURVE (sf0.1 → sf1 → sf10) without unbounded wall-clock
    // cost. The sf10 list holds only plant-semantics-safe queries
    // (doc_id offsets stay below the 1e6 plant boundary, but the
    // minhash corpus at 100x would dominate the run).
    def drill(tag: String, dir: String, keys: Seq[String]): String =
      if (!new java.io.File(dir).isDirectory || only.isDefined) ""
      else {
        val ran = keys.flatMap(k => SparkEntry.queries.get(k)
          .map(fn => (k, fn))).map { case (name, fn) =>
          graft.operators.Dedup.releaseLshCache()
          graft.operators.Similarity.releaseSimCache()
          graft.operators.MapBench.releaseFleetCache()
          val t0 = System.nanoTime()
          val err =
            try {
              fn(spark, dir).write.format("noop").mode("overwrite")
                .save()
              None
            } catch { case e: Throwable =>
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\n\r\t]", " ").take(200))
            }
          (name, (System.nanoTime() - t0) / 1e9, err)
        }
        val entries = ran.map { case (name, v, err) =>
          "\"" + name + "\":" + (if (err.isDefined) "-1" else fmt(v))
        }
        val drillErrs = ran.collect { case (k, _, Some(m)) =>
          "\"" + k + "\":\"" + m + "\""
        }
        val errPart =
          if (drillErrs.isEmpty) ""
          else s""","${tag}_errors":${drillErrs.mkString("{", ",", "}")}"""
        s""","$tag":{${entries.mkString(",")}}$errPart"""
      }
    val sf1Json = drill("sf1",
      sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/localdata/sf1"),
      // kept to the queries whose scale behavior is informative
      // (LSH pipelines, the fixed t11, the near-linear g11, one agg
      // + one stream baseline) — byte budget: the whole stdout line
      // must fit the driver's bounded tail capture
      Seq("q01_pricing_summary", "d02_minhash_lsh",
        "t11_boiler_strip", "d21_pipeline_e2e",
        "g13_map_pipeline", "g11_polyline_length")) +
      drill("sf10",
        sys.env.getOrElse("SPARK_GRAFT_SF10_DIR",
          "/root/repo/localdata/sf10"),
        // g11 (23 s at sf10, near-linear window sort — measured once,
        // recorded in SURVEY §4) stays out so the whole bench keeps
        // fitting the driver's per-round budget
        Seq("q01_pricing_summary", "d14_clusters_scale"))
    // note: r1 timed count()-only execution, which let Catalyst skip
    // sorts/projections/column reads; totals across rounds compare
    // only per-query against the same execution mode. Keep this line
    // COMPACT (empty objects omitted, short note): it must fit whole
    // inside the driver's stdout tail window to be parseable.
    val errPart = if (results.forall(_._3.isEmpty)) "" else s""","errors":$errs"""
    // stdout gets the compact form (bounded driver capture); the file
    // copy below carries the full sfDir path + execution-mode note
    val sfTag = sfDir.split('/').lastOption.getOrElse(sfDir)
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$errPart,"sf":"$sfTag"$sf1Json}"""
    println(json)
    val fileJson = json.dropRight(1) +
      s""","sf_dir":"$sfDir","execution":"full-plan noop"}"""
    // belt-and-braces copy: the round-2 stdout capture truncated and
    // lost 20 per-query entries, so also write the line to a file
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "bench_out.json")),
      (fileJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
