package graft

import org.scalatest.funsuite.AnyFunSuite

/** t91/t92 semantics beyond the oracle gate: both queries are re-derived
  * INDEPENDENTLY on the driver from their raw inputs (t02's pair list /
  * the fixture's token stream) in plain Scala — a second implementation
  * of the integer recurrences that a co-edited Spark+oracle pair could
  * drift away from together. */
class GraphStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  test("t91: structural invariants + driver-side lift recompute") {
    val rows = SparkEntry.queries("t91_pmi_collocations")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent counts straight off the fixture text
    val texts = graft.queries.Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val uni = new scala.collection.mutable.HashMap[String, Long]()
    val big = new scala.collection.mutable.HashMap[(String, String), Long]()
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      ws.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      ws.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0), p(1)); big(k) = big.getOrElse(k, 0L) + 1
      }
    }
    val tUni = uni.values.sum
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      val (cab, ca, cb, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cab >= 5, "min-count floor")
      assert(cab <= math.min(ca, cb), "a pair can't outnumber its words")
      assert(cab == big((w1, w2)), s"c_ab mismatch for ($w1,$w2)")
      assert(ca == uni(w1) && cb == uni(w2), s"unigram mismatch for ($w1,$w2)")
      assert(lift == cab * 1000000L * tUni / (ca * cb),
        s"fixed-point lift recurrence mismatch for ($w1,$w2)")
      assert(lift <= prev, "output must be lift-descending")
      prev = lift
    }
    // the top-50 really is the top: no excluded pair may beat the cut
    val cut = rows.last.getLong(5)
    val emitted = rows.map(r => (r.getString(0), r.getString(1))).toSet
    big.filter(_._2 >= 5).foreach { case ((w1, w2), cab) =>
      val l = cab * 1000000L * tUni / (uni(w1) * uni(w2))
      if (!emitted((w1, w2)))
        assert(l <= cut, s"($w1,$w2) lift $l beats the emitted cut $cut")
    }
  }

  test("t91: over-headroom totals raise instead of wrapping (r12 advice)") {
    import spark.implicits._
    // synthetic pair row whose token total is past the int64 bound the
    // scaladoc documents — the guarded expression must raise, because
    // non-ANSI Spark would otherwise wrap while DuckDB promotes to
    // HUGEINT and the engines silently diverge
    val over = Seq((10L, 9300000000000L, 7L, 8L))
      .toDF("c_ab", "t_uni", "c_a", "c_b")
    val e = intercept[Exception] {
      over.selectExpr(graft.queries.TrainingData.liftFpGuarded).collect()
    }
    assert(e.getMessage.contains("t91"))
    // denominator overflow arm (c_a * c_b) fires independently
    val overDen = Seq((10L, 1000L, 4000000000L, 4000000000L))
      .toDF("c_ab", "t_uni", "c_a", "c_b")
    val e2 = intercept[Exception] {
      overDen.selectExpr(graft.queries.TrainingData.liftFpGuarded).collect()
    }
    assert(e2.getMessage.contains("c_a * c_b"))
    // in-bounds values keep the exact unguarded arithmetic
    val ok = Seq((10L, 1000L, 7L, 8L)).toDF("c_ab", "t_uni", "c_a", "c_b")
    assert(ok.selectExpr(graft.queries.TrainingData.liftFpGuarded)
      .collect().head.getLong(0) == 10L * 1000000 * 1000 / 56)
  }

  test("t92: mass headroom guard raises before the rounds (r12 advice)") {
    val S = 1000000000000L
    graft.queries.TrainingData.requirePagerankHeadroom(100000, S) // fits
    val e = intercept[IllegalArgumentException] {
      graft.queries.TrainingData.requirePagerankHeadroom(120000, S)
    }
    assert(e.getMessage.contains("t92"))
    // scale-equivariance escape hatch: one decade down buys 10x nodes
    graft.queries.TrainingData.requirePagerankHeadroom(1000000, S / 10)
  }

  test("t92: the derived rank scale clears the headroom guard at every node decade") {
    import graft.queries.TrainingData.{pagerankScale, requirePagerankHeadroom}
    // fixture decades derive the pinned 1e12 (oracle point unchanged)
    assert(pagerankScale(52) == 1000000000000L)
    assert(pagerankScale(99999) == 1000000000000L)
    // the r20 300x probe's 246 700-node graph — the regime that used to
    // throw — now derives 1e11 and fits
    assert(pagerankScale(246700) == 100000000000L)
    // a decade of resolution per decade of nodes, never tripping the
    // backstop across the schedule's domain (nodes < 10^17 — beyond
    // that 85*nodes exceeds int64 even at scale 1 and the backstop
    // fires loudly BY DESIGN):
    for (d <- 1 to 17; nodes = (1 to d).foldLeft(1L)((a, _) => a * 10) - 1) {
      requirePagerankHeadroom(nodes, pagerankScale(nodes))
      // oracle parity: 10^greatest(0, least(12, 17 - digits))
      val digits = nodes.toString.length
      val e = math.max(0, math.min(12, 17 - digits))
      assert(pagerankScale(nodes) == math.pow(10, e).toLong,
        s"schedule diverges from the scfg CTE at nodes=$nodes")
    }
  }

  test("t92: driver-side PageRank recompute matches exactly") {
    val S = 1000000000000L
    val out = SparkEntry.queries("t92_dup_pagerank")(spark, sf).collect()
    assert(out.nonEmpty)
    val pairs = SparkEntry.queries("t02_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = nbrs.view.mapValues(_.length.toLong).toMap
    var rank = deg.keys.map(_ -> S).toMap
    for (_ <- 1 to 4) {
      val in = new scala.collection.mutable.HashMap[Long, Long]()
      rank.foreach { case (u, r) =>
        val c = r / deg(u)
        nbrs(u).foreach(v => in(v) = in.getOrElse(v, 0L) + c)
      }
      rank = in.map { case (v, s) => v -> (15L * S / 100 + 85L * s / 100) }.toMap
    }
    val expected = rank.toSeq.map { case (id, r) => (r, id) }
      .sortBy { case (r, id) => (-r, id) }.take(100)
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (row, (r, id)) =>
      assert(row.getLong(0) == id && row.getLong(2) == r,
        s"rank mismatch at doc ${row.getLong(0)}")
      assert(row.getLong(1) == deg(id), "degree mismatch")
      assert(row.getLong(2) >= 15L * S / 100, "teleport floor")
    }
  }

  test("t95: driver-side triangle recompute matches per degree class") {
    val out = SparkEntry.queries("t95_dup_clustering_coeff")(spark, sf)
      .collect()
    val pairs = SparkEntry.queries("t02_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count {
        case Seq(x, y) => adj(x)(y); case _ => false }
    }
    val expected = adj.keys.toSeq.map { v =>
      val d = adj(v).size.toLong
      val t = triPerNode(v).toLong // one count per unordered neighbor pair
      val c = if (d <= 1) 0L else 2L * t * 1000000L / (d * (d - 1))
      (d, t, c)
    }.groupBy(_._1).map { case (d, vs) =>
      d -> (vs.size.toLong, vs.map(_._2).sum, vs.map(_._3).sum / vs.size)
    }
    assert(out.nonEmpty && out.length == expected.size)
    out.foreach { r =>
      val (n, st, ac) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == st && r.getLong(3) == ac,
        s"degree class ${r.getLong(0)} mismatch")
      assert(r.getLong(3) <= 1000000L, "coefficient cannot exceed 1")
    }
  }

  test("t94: merged sketch equals the direct union sketch bit-for-bit") {
    val rows = SparkEntry.queries("t94_kmv_merge")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (exM, hkM, estM) = rows("ALL_merged")
    val (exD, hkD, estD) = rows("ALL_direct")
    // the KMV merge theorem: min-k of the per-source minima IS min-k of
    // the union — identical k-th value, identical estimate
    assert(hkM == hkD && estM == estD && exM == exD,
      s"merge must be lossless: merged ($hkM, $estM) vs direct ($hkD, $estD)")
    // and every per-source sketch is the k smallest of a real source
    rows.removedAll(Seq("ALL_merged", "ALL_direct")).foreach {
      case (scope, (nExact, _, nEst)) =>
        assert(nEst > 0, s"$scope: empty sketch")
        if (nExact < 64) assert(nEst == nExact,
          s"$scope: under-full sketch must be exact")
    }
  }

  test("t96: last session tests, single-session users stay in train") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_t96").toString
    // user 1: two sessions (45-min gap) → last is test
    // user 2: one session → must stay train (no holdout possible)
    Seq((1L, 1L, 0L), (2L, 1L, 60L), (3L, 1L, 60L + 45L * 60L),
      (4L, 2L, 0L), (5L, 2L, 120L))
      .toDF("event_id", "user_id", "sec")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)")).drop("sec")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("t96_temporal_split")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("test") == ((1L, 1L, 1L)),
      "exactly user 1's last session (1 event) is held out")
    assert(out("train") == ((2L, 2L, 4L)),
      "user 1's first session and ALL of user 2 stay in train")
  }

  test("t97: merged ≡ direct sketch bit-for-bit; answers bound the exact quantiles") {
    import graft.queries.TrainingData
    val raw = graft.queries.Tables.t(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue()))
    // driver-side reference sketch (pure Scala hdrIdx) — the third
    // independent implementation beside the Spark query and the oracle
    val direct = raw.groupBy { case (s, v) => (s, TrainingData.hdrIdx(v)) }
      .view.mapValues(_.length.toLong).toMap
    // merge theorem: shard-wise sketches summed elementwise == direct
    val sharded = raw.zipWithIndex
      .groupBy { case ((s, v), i) => (i % 4, s, TrainingData.hdrIdx(v)) }
      .view.mapValues(_.length.toLong).toMap
    val mergedFromShards = sharded.groupBy { case ((_, s, i), _) => (s, i) }
      .view.mapValues(_.values.sum).toMap
    assert(mergedFromShards == direct,
      "counter addition must reproduce the direct sketch exactly")
    // the query's answers: each q_ub bounds the exact ceil-rank
    // quantile from below-bucket logic: exact <= ub <= exact + exact/8 + 1
    val rows = SparkEntry.queries("t97_quantile_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySource = raw.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val (src, p, n, ub) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))
      val vs = bySource(src)
      assert(n == vs.length)
      val target = (p.toLong * n + 99) / 100 // ceil rank
      val exact = vs((target - 1).toInt)
      assert(exact <= ub && ub <= exact + exact / 8 + 1,
        s"$src p$p: exact=$exact ub=$ub outside the 12.5% bucket bound")
    }
  }

  test("t98: driver-side cosine recompute matches exactly") {
    // third independent implementation (plain Scala ascending-fold dots)
    // beside the Spark query and the DuckDB oracle — drift in the
    // float_dot kernel, the eval split, or the threshold shows here
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val evs = emb.filter(_._1 % 20 == 0)
    val corpus = emb.filter(_._1 % 20 != 0)
    val want = corpus.map { case (id, v) =>
      val cs = evs.map { case (_, e) =>
        dot(v, e) / (math.sqrt(dot(v, v)) * math.sqrt(dot(e, e))) }
      id -> ((cs.count(_ >= 0.2).toLong, cs.max))
    }.toMap
    val rows = SparkEntry.queries("t98_semantic_decontaminate")(spark, sf)
      .collect()
    assert(rows.length == corpus.length)
    rows.foreach { r =>
      val (id, hits, mc, verdict) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))
      val (wHits, wMax) = want(id)
      assert(hits == wHits, s"vec $id hits")
      assert(mc == wMax, s"vec $id max_cos: $mc vs $wMax (must be EXACT)")
      assert(verdict == (if (wHits > 0) "drop" else "keep"))
    }
  }

  test("t77: driver-side CMS recompute matches; shard-summed cells equal direct (merge law)") {
    // completes the sketch-triad merge pins (t94 KMV, t97 histogram):
    // CMS cells are counters, so sketches over disjoint sub-corpora
    // must sum to the whole corpus's sketch — and a plain-Scala CMS
    // (third implementation) must reproduce t77's estimates exactly
    val texts = graft.queries.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def buckets(w: String): Seq[(Int, Long)] = {
      val h = md5hex(w)
      (0 until 4).map(r =>
        r -> java.lang.Long.parseLong(h.substring(r * 8, r * 8 + 8), 16) % 1024)
    }
    def cellsOf(docs: Seq[(Long, String)]): Map[(Int, Long), Long] = {
      val m = new scala.collection.mutable.HashMap[(Int, Long), Long]()
      docs.foreach { case (_, t) =>
        t.split(" ", -1).foreach(w =>
          buckets(w).foreach(b => m(b) = m.getOrElse(b, 0L) + 1))
      }
      m.toMap
    }
    val direct = cellsOf(texts.toSeq)
    val shardSummed = (0 until 3)
      .map(k => cellsOf(texts.filter(_._1 % 3 == k).toSeq))
      .reduce { (a, b) =>
        (a.keySet ++ b.keySet).map(k =>
          k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      }
    assert(shardSummed == direct,
      "counter addition over shards must reproduce the direct CMS")
    // t77's estimates: min over the word's 4 cells of the DIRECT sketch
    val rows = SparkEntry.queries("t77_cms_heavyhitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, nEst) = (r.getString(0), r.getLong(2))
      val est = buckets(w).map(direct).min
      assert(nEst == est, s"'$w': spark $nEst vs driver $est")
    }
  }

  test("t99: protocol answer equals the exact global top-20; estimates bound counts; CMS ≡ t77's") {
    val texts = graft.queries.Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val exact = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(_.split(" ", -1).foreach(w =>
      exact(w) = exact.getOrElse(w, 0L) + 1))
    val exactTop = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
    val rows = SparkEntry.queries("t99_federated_heavyhitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    // CMS never undercounts
    rows.foreach { case (w, est, _) =>
      assert(est >= exact(w), s"'$w': est $est < exact ${exact(w)}") }
    // the candidate-union lemma holds on the fixture: the protocol's
    // top-20 IS the exact global top-20 (word sets equal)
    assert(rows.map(_._1).toSet == exactTop.map(_._1).toSet,
      s"protocol missed: ${exactTop.map(_._1).toSet -- rows.map(_._1).toSet}")
    // the merged sketch is THE sketch: estimates agree with t77's for
    // every word both report
    val t77est = SparkEntry.queries("t77_cms_heavyhitters")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.foreach { case (w, est, _) =>
      t77est.get(w).foreach(e => assert(e == est, s"'$w': $est vs t77 $e")) }
    // every shard nomination count is within [1, 4]
    rows.foreach { case (_, _, ns) => assert(ns >= 1 && ns <= 4) }
  }

  test("t93: 50-cap truncates a degenerate session the fixture never has") {
    // the fixture's longest session is 3 events, so the cap branch only
    // runs here: 60 events 1 min apart (one session), then a >30-min gap
    // opening a second session of 2
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_t93").toString
    val rows = (0 until 60).map(i =>
      (i.toLong, 7L, s"e${i % 4}", i * 60L * 1000000L)) ++
      Seq((100L, 7L, "late", (59 * 60L + 45 * 60L) * 1000000L),
        (101L, 7L, "later", (59 * 60L + 46 * 60L) * 1000000L))
    rows.toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("t93_session_sequences")(spark, dir)
      .collect()
    assert(out.length == 2)
    val first = out(0)
    assert(first.getLong(2) == 60L, "n_events counts ALL events")
    assert(first.getString(4).split(">").length == 50,
      "seq must cap at the first 50 events")
    assert(first.getString(4).startsWith("e0>e1>e2>e3>e0"),
      "seq must be (us, event_id)-ordered from the session head")
    assert(first.getLong(3) == 59L * 60L * 1000000L, "exact µs duration")
    assert(out(1).getLong(2) == 2L, "the >30-min gap opens a new session")
  }
}
