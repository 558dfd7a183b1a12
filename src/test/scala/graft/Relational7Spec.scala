package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Relational7, Retrieval, Sampling, Spatial}

/** Property pins for the round-9 operators beyond their DuckDB
  * oracles: structural invariants and brute-force cross-checks at
  * spec scale. */
class Relational7Spec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}
  import spark.implicits._

  test("q75 equi-depth: buckets partition each group, populations " +
    "flat up to tie mass, ranges disjoint and ordered") {
    val got = Relational7.q75EquiDepth(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(got.nonEmpty)
    val totals = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    got.foreach { case (f, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 10L))
      assert(sorted.map(_._3).sum == totals(f))
      // ranges ascend without overlap
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 < b._4)
        case _ => ()
      }
      // equal population up to tie tolerance on this corpus
      val target = totals(f) / 10.0
      sorted.foreach { case (_, _, n, _, _) =>
        assert(math.abs(n - target) / target < 0.2,
          s"$f bucket population $n far from $target")
      }
    }
  }

  test("q76 referential integrity: clean corpus audits clean; " +
    "planted orphans are counted exactly") {
    val res = Relational7.q76RefIntegrity(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(res.length == 6)
    res.foreach { case (edge, n, orphans) =>
      assert(n > 0 && orphans == 0L, s"$edge: $orphans orphans")
    }
    // planted: 2 of 5 child rows point nowhere
    val child = Seq(1L, 2L, 3L, 98L, 99L).toDF("fk")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val a = Relational7.fkAudit("t", child, "fk", parent, "pk")
      .as[(String, Long, Long)].head()
    assert(a == (("t", 5L, 2L)))
  }

  test("q77 weighted median equals the brute-force definition") {
    val got = Relational7.q77WeightedMedian(spark, sf)
      .as[(String, Long, Long)].collect().toMap2
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long"),
        round(col("l_quantity") * 100, 0).cast("long"))
      .as[(String, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (f, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val total = sorted.map(_._2).sum
      var cum = 0L
      val wmed = sorted.collectFirst {
        case (pc, w) if { cum += w; cum * 2 >= total } => pc
      }.get
      val (gotTotal, gotMed) = got(f)
      assert(gotTotal == total && gotMed == wmed,
        s"$f: got ($gotTotal, $gotMed) want ($total, $wmed)")
    }
  }

  private implicit class ToMap2(
      rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("d60 SNM: every pair within the edit bound, no duplicates, " +
    "and adjacent planted dups are recovered") {
    val pairs = Dedup.d60SortedNeighborhood(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      assert(a < b && d <= Dedup.SnmMaxEdit)
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
    // planted pairs (doc, doc+1e6) share their whole normalized key
    // prefix; those long enough to key identically MUST be adjacent
    // in sort order and therefore recovered
    val found = pairs.map(p => (p._1, p._2)).toSet
    val keyOf = (t: String) =>
      t.toLowerCase.replaceAll("[^a-z0-9]", "").take(Dedup.SnmKeyLen)
    val docs = Dedup.corpusWithPlants(spark, sf)
      .as[(Long, String)].collect().toMap
    val recoverable = docs.keys.filter(_ >= 1000000L).filter { pid =>
      val oid = pid - 1000000L
      docs.contains(oid) && keyOf(docs(oid)) == keyOf(docs(pid)) &&
        keyOf(docs(oid)).length >= 8
    }
    val hit = recoverable.count(pid => found((pid - 1000000L, pid)))
    assert(recoverable.nonEmpty &&
      hit >= (recoverable.size * 0.9).toInt,
      s"SNM recovered $hit of ${recoverable.size} identical-key plants")
  }

  test("d61 rendezvous vs mod: minimal movement holds and counts " +
    "match the HRW definition") {
    val got = Sampling.d61RendezvousShards(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (nDocs, nModMoved, modRate) = got("mod")
    val (n2, nRvMoved, rvRate) = got("rendezvous")
    assert(nDocs == n2 && nDocs > 0)
    // mod-N remaps nearly everything; rendezvous only ~1/17
    assert(modRate > 0.8, s"mod moved rate $modRate")
    assert(rvRate < 0.15, s"rendezvous moved rate $rvRate")
    assert(nRvMoved < nModMoved / 4)
    // brute-force HRW on a sample of doc ids
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def home(doc: Long, n: Int) =
      (0 until n).maxBy(s => (md5hex(s"$s#$doc"), s))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").as[Long].collect()
    val expMoved = docs.count(d =>
      home(d, Sampling.ShardsOld) != home(d, Sampling.ShardsNew))
    assert(nRvMoved == expMoved)
  }

  test("d62 epoch shuffle: positions are an exact permutation in " +
    "global hash order") {
    val got = Sampling.d62EpochShuffle(spark, sf)
      .as[(Long, Long)].collect()
    val n = got.length
    assert(got.map(_._2).sorted.toSeq == (0L until n))
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = got.map(_._1)
      .sortBy(d => (md5hex(s"epoch1#$d"), d)).zipWithIndex
      .map { case (d, i) => d -> i.toLong }.toMap
    got.foreach { case (d, pos) => assert(pos == expected(d)) }
  }

  test("g20 snap equals brute-force nearest within R, NULL on " +
    "empty discs, deterministic tiebreak") {
    val R = Spatial.RadiusUnits
    val pts = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"),
        (col("event_id") * 7919 % 3500000).as("x"),
        (col("event_id") * 104729 % 1600000).as("y"))
      .as[(Long, Long, Long)].collect()
    val qs = pts.filter(_._1 % 97 == 0)
    val pois = pts.filter(_._1 % 97 != 0)
    val got = Spatial.g20NearestSnap(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(got.size == qs.length)
    qs.foreach { case (qid, qx, qy) =>
      val inDisc = pois.iterator.map { case (pid, px, py) =>
        val d2 = (qx - px) * (qx - px) + (qy - py) * (qy - py)
        (d2, pid)
      }.filter(_._1 <= R * R).toSeq
      val want =
        if (inDisc.isEmpty) None
        else Some { val m = inDisc.min; (m._2, m._1) }
      assert(got(qid) == want, s"query $qid")
    }
  }

  test("d65 survivorship: per-source totals reconcile with the " +
    "corpus and with d20's survivor count") {
    val got = Dedup.d65DedupSurvivorship(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, s, r) =>
      assert(s >= 1 && s <= n)
      assert(math.abs(r - s.toDouble / n) < 1e-6)
    }
    val corpusN = Dedup.corpusWithPlants(spark, sf).count()
    val survN = Dedup.d20DedupCorpus(spark, sf).count()
    assert(got.map(_._2).sum == corpusN)
    assert(got.map(_._3).sum == survN)
    // plants make survivorship a real signal: at least one source
    // must have lost documents
    assert(got.exists(_._4 < 1.0))
  }

  test("d64 matryoshka audit: full-width control at recall 1.0, " +
    "all widths in (0,1], counts consistent") {
    val got = graft.operators.Similarity.d64MatryoshkaAudit(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq ==
      graft.operators.Similarity.MatryoshkaDims.map(_.toLong))
    val full = graft.operators.Similarity.NumQueries.toLong *
      graft.operators.Similarity.TopK
    got.foreach { case (dims, hits, recall) =>
      assert(hits >= 1 && hits <= full)
      assert(recall > 0.0 && recall <= 1.0)
      assert(math.abs(recall - hits.toDouble / full) < 1e-6,
        s"dims=$dims recall/hits mismatch")
    }
    val (d64, h64, r64) = got.last
    assert(d64 == 64L && h64 == full && r64 == 1.0,
      "full-width control is not at recall 1.0")
  }

  test("d63 sparse cosine: bounds hold and every pair matches the " +
    "brute-force capped-space cosine") {
    val pairs = Retrieval.d63SparseCosine(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, dot, cos) =>
      assert(a < b && dot >= 1 &&
        cos >= Retrieval.SparseCosMin && cos <= 1.000001)
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
    // brute force the capped term space locally and replay every
    // reported pair's dot and cosine exactly (over the same planted
    // corpus the operator reads)
    val docs = Dedup.corpusWithPlants(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // mirror the operator exactly: split(trim(text), " ") words,
    // 3-word shingle terms, no case folding
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      val ws = Option(t).getOrElse("").trim.split(" ", -1).toSeq
      val shingles =
        if (ws.length < 3) Seq.empty[String]
        else ws.sliding(3).map(_.mkString(" ")).toSeq
      id -> shingles.groupBy(identity)
        .map { case (w, o) => w -> o.length.toLong }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size }
    val rare: Map[Long, Map[String, Long]] = tf.map { case (id, m) =>
      id -> m.filter { case (w, _) => df(w) <= Retrieval.SparseDfCap }
    }
    pairs.foreach { case (a, b, dot, cos) =>
      val (ma, mb) = (rare(a), rare(b))
      val expDot = ma.keysIterator.filter(mb.contains)
        .map(w => ma(w) * mb(w)).sum
      assert(dot == expDot, s"pair ($a,$b) dot $dot != $expDot")
      def n2(m: Map[String, Long]) = m.values.map(v => v * v).sum
      val expCos = math.rint(expDot.toDouble /
        (math.sqrt(n2(ma).toDouble) * math.sqrt(n2(mb).toDouble))
        * 1e6) / 1e6
      assert(math.abs(cos - expCos) < 1e-9,
        s"pair ($a,$b) cos $cos != $expCos")
    }
  }

  test("q80 profile: metrics reconcile with direct per-column queries") {
    val got = Relational7.q80Profile(spark, sf)
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(got.length == 11)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val n = li.count()
    got.foreach { case (c, rows, nulls, nd, mn, mx) =>
      assert(rows == n && nulls >= 0 && nd >= 1 && nd <= rows,
        s"$c: rows=$rows nulls=$nulls nd=$nd")
      assert(mn.nonEmpty && mx.nonEmpty)
    }
    val m = got.map(r => r._1 -> r).toMap
    // spot-check three kinds against direct aggregates
    val ok = li.agg(countDistinct(col("l_orderkey")),
      min(col("l_orderkey")), max(col("l_orderkey"))).head()
    assert(m("l_orderkey")._4 == ok.getLong(0) &&
      m("l_orderkey")._5 == ok.getLong(1).toString &&
      m("l_orderkey")._6 == ok.getLong(2).toString)
    val rf = li.agg(countDistinct(col("l_returnflag")),
      min(col("l_returnflag")), max(col("l_returnflag"))).head()
    assert(m("l_returnflag")._4 == rf.getLong(0) &&
      m("l_returnflag")._5 == rf.getString(1) &&
      m("l_returnflag")._6 == rf.getString(2))
    val q = li.agg(
      countDistinct(round(col("l_quantity") * 100, 0).cast("long")),
      min(round(col("l_quantity") * 100, 0).cast("long")),
      max(round(col("l_quantity") * 100, 0).cast("long"))).head()
    assert(m("l_quantity")._4 == q.getLong(0) &&
      m("l_quantity")._5 == q.getLong(1).toString &&
      m("l_quantity")._6 == q.getLong(2).toString)
  }

  test("d71 JW pairs: bounds, symmetry with the kernel, and planted " +
    "identical-key dups recovered at jw = 1") {
    val pairs = Dedup.d71JaroWinkler(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, jw) =>
      assert(a < b && jw >= Dedup.JwMin && jw <= 1.000001)
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
    // identical-key plants (the d60 recoverable set) must appear with
    // jw exactly 1.0
    val keyOf = (t: String) =>
      t.toLowerCase.replaceAll("[^a-z0-9]", "").take(Dedup.SnmKeyLen)
    val docs = Dedup.corpusWithPlants(spark, sf)
      .as[(Long, String)].collect().toMap
    val found = pairs.map(p => ((p._1, p._2), p._3)).toMap
    val recoverable = docs.keys.filter(_ >= 1000000L).filter { pid =>
      val oid = pid - 1000000L
      docs.contains(oid) && keyOf(docs(oid)) == keyOf(docs(pid)) &&
        keyOf(docs(oid)).length >= 8
    }
    val hit = recoverable.count { pid =>
      found.get((pid - 1000000L, pid)).contains(1.0)
    }
    assert(recoverable.nonEmpty &&
      hit >= (recoverable.size * 0.9).toInt,
      s"JW recovered $hit of ${recoverable.size} identical-key plants")
  }

  test("d72 simhash blocks: equals the brute-force hamming<=3 pair " +
    "set (pigeonhole recall 1.0 at spec scale)") {
    val got = Dedup.d72SimhashBlocks(spark, sf)
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= Dedup.SimHamMax)
    }
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
    // brute force: all-pairs hamming over the collected signatures
    // (no bucket at spec scale can exceed the cap, so the block join
    // must find EVERY pair within the bound — the pigeonhole claim)
    val sigs = Dedup.corpusWithPlants(spark, sf)
      .withColumn("t", trim(col("text")))
      .withColumn("w", split(col("t"), " "))
      .select(col("doc_id"),
        Dedup.simhashCol(col("t"), col("w")).as("sig"))
      .as[(Long, Long)].collect()
    val exp = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= Dedup.SimHamMax
    } yield {
      val (a, b) = (sigs(i), sigs(j))
      val (lo, hi) = if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
      (lo, hi, h.toLong)
    }).toSet
    assert(got.toSet == exp,
      s"d72: got ${got.length} pairs, brute force ${exp.size}")
    assert(exp.nonEmpty, "planted dups must yield hamming<=3 pairs")
  }

  test("q81 user paths: equals the brute-force journey table") {
    val got = Relational7.q81UserPaths(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    // counts descend (ties broken by path asc)
    got.sliding(2).foreach {
      case Array(x, y) =>
        assert(x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
      case _ => ()
    }
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tsl"),
        col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val exp = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._3, r._4)).take(Relational7.PathLen)
        .map(_._2).mkString(">")
    }
    val expTable = exp.groupBy(_._2).map { case (path, us) =>
      (path, us.size.toLong, us.keys.min)
    }.toSet
    assert(got.toSet == expTable)
  }

  test("q82 variant props: equals the brute-force JSON parse") {
    val got = Relational7.q82VariantProps(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("props"))
      .as[(String, String)].collect()
    val kRe = """"k"\s*:\s*(-?\d+)""".r
    val exp = ev.groupBy(_._1).map { case (t, rows) =>
      val ks = rows.flatMap(r =>
        kRe.findFirstMatchIn(Option(r._2).getOrElse(""))
          .map(_.group(1).toLong))
      (t, rows.length.toLong, ks.length.toLong,
        ks.distinct.length.toLong, ks.min, ks.max)
    }.toSet
    assert(got.toSet == exp)
  }

  test("d73 OPH: per-pair bins and matches equal the brute-force " +
    "replay; exact jaccard agrees; estimator error bounded") {
    val got = Dedup.d73OphMinhash(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, na, nm, est, j, err) =>
      assert(na >= 1 && nm >= 0 && nm <= na)
      assert(est >= 0 && est <= 1 && j > 0 && j <= 1.000001)
      assert(math.abs(err - math.abs(est - j)) <= 1e-6)
    }
    val docs = Dedup.corpusWithPlants(spark, sf)
      .as[(Long, String)].collect().toMap
    def shingles(t0: String): Set[String] = {
      val t = Option(t0).getOrElse("").trim
      if (t.isEmpty) Set.empty
      else {
        val w = t.split(" ", -1)
        if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
        else Set(t)
      }
    }
    def h64(s: String): Long =
      java.nio.ByteBuffer.wrap(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))).getLong
    got.foreach { case (aId, na, nm, _, j, _) =>
      val sa = shingles(docs(aId))
      val sb = shingles(docs(aId + 1000000L))
      val i = sa.intersect(sb).size
      val expJ = i.toDouble / (sa.size + sb.size - i)
      assert(math.abs(j - math.rint(expJ * 1e6) / 1e6) < 1e-9,
        s"pair $aId jaccard $j != $expJ")
      def bins(s: Set[String]): Map[Long, Long] =
        s.groupBy(x => h64(x) & (Dedup.OphBins - 1).toLong)
          .map { case (b, xs) => b -> xs.map(h64).min }
      val (ba, bb) = (bins(sa), bins(sb))
      val al = ba.keySet.intersect(bb.keySet)
      assert(na == al.size && nm == al.count(b => ba(b) == bb(b)),
        s"pair $aId bins: got ($na,$nm), " +
          s"want (${al.size},${al.count(b => ba(b) == bb(b))})")
    }
    // the estimator must actually track jaccard on this corpus
    assert(got.map(_._6).sum / got.length < 0.2,
      "mean |est - jaccard| too large")
  }

  test("q83 incremental merge equals the one-shot full aggregation") {
    val got = Relational7.q83IncrementalAgg(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val full = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey").as("k"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("pc"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("pc")).as("sum_pc"),
        min(col("pc")).as("min_pc"), max(col("pc")).as("max_pc"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSet == full.toSet,
      s"incremental merge diverges from full: got ${got.length}, " +
        s"full ${full.length}")
    // both sides of the cut must be non-trivially populated, or the
    // merge was never exercised
    val cut = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_shipdate").cast("date") <
        lit(Relational7.Q83Cut).cast("date")).as("pre"))
      .groupBy(col("pre")).count()
      .as[(Boolean, Long)].collect().toMap
    assert(cut.getOrElse(true, 0L) > 0 && cut.getOrElse(false, 0L) > 0)
  }

  test("d74 triangles: equals the brute-force count over the " +
    "collected edge set") {
    val got = graft.operators.LinkGraph.d74Triangles(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (nNodes, nEdges, nWedges, nTri, cc) = got.head
    // brute force over the SAME kNN graph (the d66 relation is
    // oracle-verified in its own right; here it is the graph input)
    val edges = graft.operators.Similarity.d66CellKnn(spark, sf)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v"))
      .distinct().as[(Long, Long)].collect().map {
        case (u, v) => (u, v)
      }.toSet
    val nbrs = scala.collection.mutable.Map
      .empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      nbrs(u) = nbrs(u) + v; nbrs(v) = nbrs(v) + u
    }
    val nodes = nbrs.keySet
    val expTri = edges.toSeq.map { case (u, v) =>
      (nbrs(u) intersect nbrs(v)).size
    }.sum / 3
    val expWedges = nodes.toSeq
      .map(n => { val d = nbrs(n).size.toLong; d * (d - 1) / 2 }).sum
    assert(nNodes == nodes.size && nEdges == edges.size,
      s"nodes/edges: got ($nNodes,$nEdges), " +
        s"want (${nodes.size},${edges.size})")
    assert(nWedges == expWedges && nTri == expTri,
      s"wedges/triangles: got ($nWedges,$nTri), " +
        s"want ($expWedges,$expTri)")
    assert(math.abs(cc - math.rint(3.0 * expTri / expWedges * 1e6)
      / 1e6) < 1e-9)
    assert(nTri > 0, "graph must contain triangles at spec scale")
  }

  test("d75 filtered IVF: every hit matches the query label, ranks " +
    "are clean, and pre-filter strictly beats post-filter") {
    import graft.operators.Similarity
    val got = Similarity.d75FilteredIvf(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1L to rows.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 <= b._4
        case _ => true
      }, s"query $q distances not monotone")
      rows.foreach { case (_, want, vid, _, _) =>
        assert(labels(vid) == want && labels(q) == want,
          s"query $q hit $vid label ${labels(vid)} != $want")
      }
    }
    // the post-filter failure mode, measured: filtering the
    // UNFILTERED top-k afterwards keeps only ~k/L rows
    val post = Similarity.d25IvfSearch(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .count { case (q, vid, _, _) => labels(vid) == labels(q) }
    assert(got.length > post,
      s"pre-filter ${got.length} rows must beat post-filter $post")
  }

  test("d68 CDC chunks: report equals the brute-force chunker and " +
    "planted copies share interior chunks cross-doc") {
    val got = Dedup.d68CdcChunks(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nDocs, nOcc, first, last, nWords) =>
      assert(nDocs >= 2 && nOcc >= nDocs && first <= last &&
        nWords >= Dedup.MinChunkWords)
    }
    // brute-force the identical content-defined chunking on the
    // driver (same words, same shingle hash digit, same mod) and
    // require the FULL report to match
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunksOf(text: String): Seq[(String, Int)] = {
      val ws = Option(text).getOrElse("").trim.split(" ", -1)
      val bounds = ws.indices.map { i =>
        i >= Dedup.ChunkShingle - 1 && Integer.parseInt(
          md5hex(s"${ws(i - 2)} ${ws(i - 1)} ${ws(i)}")
            .substring(15, 16), 16) % Dedup.ChunkMod == 0
      }
      val idxs = ws.indices.map(i => bounds.take(i).count(identity))
      ws.indices.groupBy(idxs).toSeq.map { case (ci, ps) =>
        val words = ps.sorted.map(ws)
        (ci, (md5hex(words.mkString(" ")), words.length))
      }.sortBy(_._1).map(_._2)
    }
    val docs = Dedup.corpusWithPlants(spark, sf)
      .as[(Long, String)].collect()
    val exp = docs.flatMap { case (id, t) =>
      chunksOf(t).filter(_._2 >= Dedup.MinChunkWords)
        .map { case (h, n) => (h, id, n) }
    }.groupBy(_._1).map { case (h, occ) =>
      val ids = occ.map(_._2)
      (h, ids.distinct.length.toLong, occ.length.toLong,
        ids.min, ids.max, occ.map(_._3).min.toLong)
    }.filter(_._2 >= 2).toSeq.sortBy(_._1)
    assert(got.toSeq.sortBy(_._1) == exp,
      s"CDC report mismatch: got ${got.length} rows, want ${exp.length}")
    // offset-invariance: at least one chunk is shared between an
    // original (<1e6) and its planted truncated copy (>=1e6)
    assert(got.exists { case (_, _, _, first, last, _) =>
      first < 1000000L && last >= 1000000L })

    // ---- d69 strip: brute-force the keeper election + re-assembly
    val all = docs.flatMap { case (id, t) =>
      chunksOf(t).zipWithIndex.map { case ((h, n), ci) =>
        (h, id, ci.toLong, n)
      }
    }
    val keepK = all.filter(_._4 >= Dedup.MinChunkWords)
      .groupBy(_._1).collect { case (h, occ) if occ.length >= 2 =>
        h -> occ.map(o => o._2 * 1000000L + o._3).min
      }
    val expStrip = all.groupBy(_._2).map { case (id, occ) =>
      val marked = occ.sortBy(_._3).map { case (h, _, ci, n) =>
        val dropped = keepK.get(h).exists(_ != id * 1000000L + ci)
        (dropped, n)
      }
      id -> ((id, occ.length.toLong,
        marked.count(_._1).toLong,
        marked.map(_._2.toLong).sum,
        marked.filterNot(_._1).map(_._2.toLong).sum))
    }
    val gotStrip = Dedup.d69CdcStrip(spark, sf)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(gotStrip.map(_._1).toSeq == gotStrip.map(_._1).sorted.toSeq)
    assert(gotStrip.length == expStrip.size)
    var anyDropped = false
    gotStrip.foreach { case (id, nc, nd, wi, wo, text) =>
      assert(expStrip(id) == ((id, nc, nd, wi, wo)),
        s"d69 counts for doc $id: got ($nc,$nd,$wi,$wo), " +
          s"want ${expStrip(id)}")
      // the re-assembled text is exactly the surviving chunks of the
      // original in order — check word count agreement (full-text
      // equality is pinned by the oracle hash compare)
      val n = if (wo == 0L) { assert(text.isEmpty); 0L }
        else text.split(" ", -1).length.toLong
      assert(n == wo, s"doc $id text_out has $n words, wants $wo")
      anyDropped ||= nd > 0
    }
    assert(anyDropped, "plants must force at least one stripped chunk")
  }
}
