package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Classify, CountMin, Events, Graphs, Multimodal, PageRank, Similarity, TextAnalysis}

/** Unit coverage for the event-analytics + classifier operators added in
  * round 4: sessionization boundaries, as-of strict-prior semantics, HLL
  * estimator accuracy on both correction branches, SemDeDup subset/recall
  * properties, and Naive Bayes accuracy on a separable corpus.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ sessionize

  private def ev(user: Long, id: Long, t: Long, v: Double = 1.0,
      typ: String = "view") = (user, id, t, typ, v)

  test("sessionize splits on gap, aggregates per session") {
    // user 1: events at t=0,10,20 (one session), t=1000 (new session)
    // user 2: single event
    val events = Seq(
      ev(1, 1, 0), ev(1, 2, 10), ev(1, 3, 20), ev(1, 4, 1000),
      ev(2, 5, 500)
    ).toDF("user_id", "event_id", "tsn", "event_type", "value")
    val out = Events.sessionize(events, gapNs = 100)
      .orderBy("user_id", "sess_seq")
      .select("user_id", "sess_seq", "n_events", "t_start", "t_end", "first_ev")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 0L, 20L, 1L),
      (1L, 2L, 1L, 1000L, 1000L, 4L),
      (2L, 1L, 1L, 500L, 500L, 5L)))
  }

  test("sessionize boundary: a gap of exactly gapNs does NOT split") {
    val events = Seq(ev(1, 1, 0), ev(1, 2, 100), ev(1, 3, 201))
      .toDF("user_id", "event_id", "tsn", "event_type", "value")
    val out = Events.sessionize(events, gapNs = 100)
    // 0→100 = gap 100 (kept), 100→201 = gap 101 (split)
    assert(out.count() == 2)
  }

  // -------------------------------------------------------------- asofJoin

  test("asofJoin attaches latest strictly-prior right event per user") {
    val events = Seq(
      ev(1, 1, 10, 5.0, "click"),
      ev(1, 2, 20, 6.0, "click"),
      ev(1, 3, 30, 0.0, "purchase"),   // sees click 2
      ev(1, 4, 40, 7.0, "click"),
      ev(1, 5, 40, 0.0, "purchase"),   // same ts as click 4, click id smaller → sees 4
      ev(2, 6, 99, 0.0, "purchase")    // no click for user 2 → null
    ).toDF("user_id", "event_id", "tsn", "event_type", "value")
    val out = Events.asofJoin(events, "purchase", "click")
      .select("event_id", "r_ev").as[(Long, Option[Long])].collect().toMap
    assert(out(3L) == Some(2L))
    assert(out(5L) == Some(4L))
    assert(out(6L) == None)
  }

  test("asofJoin equal-ts right event with LARGER id is not prior") {
    val events = Seq(
      ev(1, 2, 40, 0.0, "purchase"),
      ev(1, 9, 40, 7.0, "click")  // same ts, larger event_id → not visible
    ).toDF("user_id", "event_id", "tsn", "event_type", "value")
    val out = Events.asofJoin(events, "purchase", "click")
      .select("r_ev").as[Option[Long]].head()
    assert(out.isEmpty)
  }

  // ------------------------------------------------------------------- HLL

  test("HLL estimate within 3 sigma on the raw branch (n=5000)") {
    val df = spark.range(5000)
      .select(lit("g").as("g"),
        udf((x: Long) => TextAnalysis.fnv1a64(x.toString)).apply(col("id")).as("h"))
    val (vZero, est) = Events.hllEstimate(df)
      .select("v_zero", "est").as[(Long, Double)].head()
    // sigma ≈ 1.04/sqrt(256) ≈ 6.5%; 3 sigma ≈ 20%
    assert(math.abs(est - 5000) / 5000.0 < 0.20, s"est=$est vZero=$vZero")
  }

  test("HLL linear-counting branch is near-exact for small n (n=40)") {
    val df = spark.range(40)
      .select(lit("g").as("g"),
        udf((x: Long) => TextAnalysis.fnv1a64(x.toString)).apply(col("id")).as("h"))
    val est = Events.hllEstimate(df).select("est").as[Double].head()
    // m·ln(m/V) with V ≥ 216: relative error ≲ 8% at this occupancy
    assert(math.abs(est - 40) / 40.0 < 0.10, s"est=$est")
  }

  test("HLL register math: known hash lands in the right register/rank") {
    // h = 0b...1_00000000: reg 0, rest = 1 → rank 1... construct directly
    val df = Seq(("g", 256L), ("g", 512L)).toDF("g", "h")
    // 256 >> 8 = 1 → trailing zeros 0 → rank 1; 512 >> 8 = 2 → rank 2
    // both land in register 0; max rank = 2; V = 255
    val (vZero, est) = Events.hllEstimate(df)
      .select("v_zero", "est").as[(Long, Double)].head()
    assert(vZero == 255L)
    assert(est == math.rint(256.0 * math.log(256.0 / 255.0) * 10000) / 10000)
  }

  // -------------------------------------------------------------- SemDeDup

  test("semantic pairs are a subset of exact pairs; within-cluster recall is total") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(8)(Array.fill(16)(rnd.nextGaussian().toFloat))
    // 40 vectors: small perturbations of 8 bases → plenty of near-dups
    val vecs = (0 until 40).map { i =>
      val b = base(i % 8)
      (i.toLong, b.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.exactNearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sem = Similarity.semanticNearDupPairs(vecs, "vec_id", "embedding", 0.9, nlist = 4)
    val semPairs = sem.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(semPairs.subsetOf(exact), "semantic pair not in exact set")
    // recall contract: any exact pair whose two members share a cluster is found
    val assign = Similarity.semanticNearDupPairs(vecs, "vec_id", "embedding", -2.0, nlist = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet // all same-cluster pairs
    val sameCluster = exact.intersect(assign)
    assert(sameCluster.subsetOf(semPairs), "missed a same-cluster exact pair")
    assert(semPairs.nonEmpty)
  }

  // -------------------------------------------------------------- PageRank

  test("pageRank on a symmetric star: mass conserved, hub dominates") {
    val spokes = (1L to 5L)
    val edges = spokes.flatMap(s => Seq((0L, s), (s, 0L))).toDF("src", "dst")
    val ranks = PageRank.pageRank(edges, iters = 10)
      .select("node", "rank").as[(Long, Double)].collect().toMap
    // symmetric graph, no dangling nodes → total rank mass stays 1
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    val hub = ranks(0L)
    spokes.foreach { s =>
      assert(hub > ranks(s), s"hub $hub should outrank spoke ${ranks(s)}")
    }
    // spokes are symmetric → identical ranks
    assert(spokes.map(ranks).toSet.size == 1)
  }

  // ---------------------------------------------------------------- funnel

  test("funnel: strictly-after ordering, horizon from stage 1, per-stage counts") {
    val events = Seq(
      // user 1 converts fully: view@0 → click@5 → purchase@9
      ev(1, 1, 0, 0, "view"), ev(1, 2, 5, 0, "click"), ev(1, 3, 9, 0, "purchase"),
      // user 2: click BEFORE the first view never counts; purchase without
      // a qualifying click never counts
      ev(2, 4, 5, 0, "click"), ev(2, 5, 6, 0, "view"), ev(2, 6, 9, 0, "purchase"),
      // user 3: click at the SAME tsn as the first view fails the strict >
      ev(3, 7, 4, 0, "view"), ev(3, 8, 4, 0, "click"),
      // user 4: click exactly AT the horizon boundary qualifies (<=),
      // purchase one past it does not
      ev(4, 9, 0, 0, "view"), ev(4, 10, 10, 0, "click"), ev(4, 11, 11, 0, "purchase"),
      // user 5: no view at all — in no stage
      ev(5, 12, 1, 0, "click"), ev(5, 13, 2, 0, "purchase")
    ).map { case (u, id, t, ty, _) => (u, id, t, ty) }
      .toDF("user_id", "event_id", "tsn", "event_type")
    val out = Events.funnel(events, Seq("view", "click", "purchase"), horizonUs = 10)
      .orderBy("stage").select("stage", "n_users").as[(Int, Long)].collect().toSeq
    assert(out == Seq((1, 4L), (2, 2L), (3, 1L)))
  }

  // ------------------------------------------------------------- retention

  test("retention: cohorts by first day, distinct users per offset") {
    val d = 86400000000L
    val events = Seq(
      (1L, 0L), (1L, 10L), (1L, d + 5),          // user 1: day0 cohort, active d0+d1
      (2L, d * 2), (2L, d * 2 + 7), (2L, d * 4), // user 2: day2 cohort, d0+d2
      (3L, 5L)                                   // user 3: day0 cohort, d0 only
    ).toDF("user_id", "tsn")
    val out = Events.retention(events)
      .orderBy("cohort_day", "day_offset")
      .select("cohort_day", "day_offset", "n_users")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 2L), (0L, 1L, 1L), (2L, 0L, 1L), (2L, 2L, 1L)))
  }

  // ------------------------------------------------------------- Count-Min

  test("CMS estimate is never below exact, and exact when no collisions") {
    val keys = (1L to 60L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val df = keys.toDF("user_id")
    val sk = CountMin.sketch(df, "user_id")
    val exact = df.groupBy("user_id").agg(count(lit(1)).as("n")).as[(Long, Long)]
      .collect().toMap
    val est = CountMin.estimate(df.select("user_id").distinct(), "user_id", sk)
      .as[(Long, Long)].collect().toMap
    est.foreach { case (k, e) => assert(e >= exact(k), s"under-estimate for $k") }
    // 60 keys into 4 independent rows of 512 buckets: the min over rows is
    // almost surely collision-free — require ≥ 90% of keys exact
    val nExact = est.count { case (k, e) => e == exact(k) }
    assert(nExact >= 54, s"only $nExact/60 exact")
  }

  // ------------------------------------------------------------- triangles

  test("triangle counts match brute force on a known graph") {
    // K4 on {1,2,3,4} (4 triangles, 3 per node) + pendant 5-1 + isolated
    // triangle {6,7,8}; duplicates/reversed/self edges must be normalized
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 3L), (1L, 5L), (6L, 7L), (7L, 8L), (8L, 6L)
    ).toDF("src", "dst")
    val out = Graphs.triangleCounts(edges)
      .select("node", "n_tri").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      6L -> 1L, 7L -> 1L, 8L -> 1L))
  }

  // ----------------------------------------------------------------- pHash

  test("phash near-dup finds byte-identical images, nothing else (stub decode)") {
    // every 9th id reuses the bytes of id−3 → image pairs (0,3),(9,12),(18,21)
    val media = Multimodal.syntheticMedia(spark, 30, i => if (i % 9 == 3) i - 3 else i)
    val pairs = Multimodal.phashNearDupPairs(media, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((0L, 3L, 0), (9L, 12L, 0), (18L, 21L, 0)))
  }

  test("phash signature is stable and 64-bit distributed") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val sigs = Multimodal.phash64(media).select("sig").as[Long].collect()
    assert(sigs.distinct.length == sigs.length) // FNV avalanche: all distinct
    // mean-threshold: each signature has 1..63 bits set (never none/all)
    sigs.foreach(s => assert(java.lang.Long.bitCount(s) > 0 && java.lang.Long.bitCount(s) < 64))
  }

  // ----------------------------------------------------------- Naive Bayes

  test("Naive Bayes separable corpus: perfect held-out accuracy") {
    val mk = (id: Long, label: String, words: String) => (id, label, words)
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) mk(i, "aa", "alpha beta gamma alpha " + s"w${i % 5}")
      else mk(i, "bb", "delta epsilon zeta delta " + s"v${i % 5}")
    }
    val df = rows.toDF("id", "label", "text")
    val out = Classify.naiveBayes(
      df.filter(col("id") % 5 =!= 0), df.filter(col("id") % 5 === 0))
    val res = out.select("id", "predicted", "correct").as[(Long, String, Boolean)].collect()
    assert(res.length == 8)
    assert(res.forall(_._3), s"misclassified: ${res.filterNot(_._3).mkString(",")}")
    // margins strictly positive on a separable corpus
    val margins = out.select("margin").as[Double].collect()
    assert(margins.forall(_ > 0))
  }

  test("Naive Bayes doc with only OOV words falls back to priors") {
    val train = Seq((1L, "aa", "alpha beta"), (2L, "aa", "alpha"), (3L, "bb", "delta"))
      .toDF("id", "label", "text")
    val score = Seq((10L, "aa", "unseen tokens here")).toDF("id", "label", "text")
    val out = Classify.naiveBayes(train, score)
      .select("predicted").as[String].head()
    // all-OOV doc scores l as ln P(l) − 3·ln(n_l + V): aa = ln(2/3) − 3·ln 6
    // ≈ −5.78, bb = ln(1/3) − 3·ln 4 ≈ −5.26 — bb's smaller token mass wins
    assert(out == "bb")
  }

  test("anomalies flags exactly the spiked hour with the closed-form z-score") {
    val hourNs = 3600000000000L
    // type "a": hours 0..9 at 10 events each, except hour 5 spikes to 100;
    // type "b": flat 5 events over hours 0..3 (sd = 0 -> never flagged)
    val rows =
      (for (h <- 0 until 10; i <- 0 until (if (h == 5) 100 else 10))
        yield (h * hourNs + i, "a")) ++
      (for (h <- 0 until 4; i <- 0 until 5) yield (h * hourNs + i, "b"))
    val events = rows.toDF("ts", "event_type")
    val out = Events.anomalies(events, z = 2.0)
      .as[(String, Long, Long, Double)].collect()
    // mean = 19, var = (9*100 + 10000)/10 - 361 = 729, z = 81/27 = 3 exactly
    assert(out.toSeq == Seq(("a", 5L, 100L, 3.0)))
  }

  test("dedupWindow drops lag-rule duplicates and hides clean keys") {
    // user 1 "c": events at t=0,3,4,10 with window 5 -> 3 and 4 are dups of
    // their predecessors (lag rule, NOT anchor rule: 4-3=1 <= 5 counts even
    // though 4-0 > ... both within here), 10-4=6 kept -> n_kept=2
    // user 2 "c": 0, 100 -> clean key, filtered out of the report
    val events = Seq(
      (1L, "c", 0L, 10L), (1L, "c", 3L, 11L), (1L, "c", 4L, 12L), (1L, "c", 10L, 13L),
      (2L, "c", 0L, 20L), (2L, "c", 100L, 21L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Events.dedupWindow(events, windowNs = 5L)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, "c", 4L, 2L, 10L)))
  }

  test("dailyAggMerge rewrites only the batch's day partitions") {
    val dayNs = 86400000000000L
    val rows = for (d <- 0L until 5L; i <- 0 until 50) yield
      (d * dayNs + i * 1000L, (i % 7).toLong, i.toLong + d * 100, s"t${i % 3}",
        (i % 10).toDouble)
    val ev = rows.toDF("ts", "user_id", "event_id", "event_type", "value")
    val p = java.nio.file.Files.createTempDirectory("graft-mvspec").toString + "/mv"
    assert(Events.dailyAggMerge(ev.filter(expr(s"ts div $dayNs") < 3), p) == 3)
    def state = new java.io.File(p).listFiles
      .filter(_.getName.startsWith("day="))
      .map(d => d.getName -> d.listFiles.filter(_.getName.startsWith("part-"))
        .map(f => (f.getName, f.length)).toSet).toMap
    val before = state
    assert(Events.dailyAggMerge(ev.filter(expr(s"ts div $dayNs") >= 3), p) == 2)
    val after = state
    (0 to 2).foreach(d => assert(before(s"day=$d") == after(s"day=$d"),
      s"bootstrap day $d was rewritten"))
    assert(after.keySet == (0 to 4).map(d => s"day=$d").toSet)
    // read-back equals a full recompute
    val got = spark.read.parquet(p)
      .select(col("day").cast("long"), col("event_type"), col("n"),
        col("sum_cents"), col("n_users"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val want = ev.withColumn("day", expr(s"ts div $dayNs"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("hllRollup: merging daily sketches equals the single-pass estimate") {
    val rows = (1 to 3000).map(i =>
      ("a", (i % 7).toLong, TextAnalysis.fnv1a64((i % 800).toString)))
    val df = rows.toDF("g", "day", "h")
    val rolled = Events.hllRollup(df)
      .select("g", "v_zero", "est", "n_days")
      .as[(String, Long, Double, Long)].head()
    val direct = Events.hllEstimate(df.select("g", "h"))
      .as[(String, Long, Double)].head()
    assert(rolled._2 == direct._2 && rolled._3 == direct._3)   // lossless merge
    assert(rolled._4 == 7L)
    // sane estimate: ~4σ at m=256 (σ ≈ 1.04/√256 ≈ 6.5%); this fixed hash
    // set happens to sit ~19% low, which is within a plausible tail
    assert(math.abs(rolled._3 - 800.0) < 0.25 * 800)
  }

  test("histQuantiles: closed-form bin edges, error bounded by bin width") {
    // 100 values at i*0.5 + 0.1 -> value i lands exactly in bin i; with
    // cum(b) = b+1 the q-rank bin is ceil(q*100)-1 and the edge (b+1)*0.5
    val events = (0 until 100).map(i => ("a", i * 0.5 + 0.1))
      .toDF("event_type", "value")
    val out = Events.histQuantiles(events)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.toSeq == Seq(("a", 100L, 25.0, 45.0, 49.5)))
    // out-of-range clamp: values past the last bin edge land in maxBin
    val big = Seq(("b", 1e9), ("b", 2.0)).toDF("event_type", "value")
    val clamped = Events.histQuantiles(big)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(clamped.head._5 == 512.0)   // (1023+1)*0.5
  }

  test("transitions: closed-form counts and exact conditional probabilities") {
    // user 1: a -> b -> a -> b   transitions: (a,b)x2, (b,a)x1
    // user 2: a -> a             transitions: (a,a)x1
    // equal-ts tie inside user 3 ordered by event_id: a(id1) -> b(id2)
    val events = Seq(
      (1L, 1L, 0L, "a"), (1L, 2L, 10L, "b"), (1L, 3L, 20L, "a"), (1L, 4L, 30L, "b"),
      (2L, 5L, 0L, "a"), (2L, 6L, 5L, "a"),
      (3L, 7L, 7L, "a"), (3L, 8L, 7L, "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Events.transitions(events)
      .as[(String, String, Long, Double)].collect()
    // from a: (a,a)=1, (a,b)=3 -> probs 0.25 / 0.75; from b: (b,a)=1 -> 1.0
    assert(out.toSeq == Seq(
      ("a", "a", 1L, 0.25), ("a", "b", 3L, 0.75), ("b", "a", 1L, 1.0)))
  }

  test("salted join equals the unsalted join for any salt count") {
    val rnd = new scala.util.Random(4071)
    val events = (1 to 500).map { i =>
      // user 7 is the hot key (~60% of rows)
      val u = if (rnd.nextBoolean() || rnd.nextInt(5) == 0) 7L else rnd.nextInt(20).toLong
      (u, i.toLong, i.toLong, Seq("x", "y", "z")(rnd.nextInt(3)),
        rnd.nextInt(50).toDouble)
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    val plain = Events.saltedUserMaxHits(events, salts = 1)
      .as[(String, Long, Long)].collect().toSeq
    val salted = Events.saltedUserMaxHits(events, salts = 8)
      .as[(String, Long, Long)].collect().toSeq
    assert(plain == salted)
    assert(plain.map(_._2).sum == 500L)   // every fact row joins exactly once
  }

  test("intervalJoin equals the naive band join, each pair exactly once") {
    val rnd = new scala.util.Random(20260816)
    val left = (1 to 80).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("l_id", "l_ts")
    val right = (1 to 120).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("r_id", "r_ts")
    for (delta <- Seq(1L, 250L, 4000L); cell <- Seq(None, Some(100L), Some(7L))) {
      val got = Events.intervalJoin(left, right, "l_ts", "r_ts", delta, cell)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
      val ls = left.as[(Long, Long)].collect()
      val rs = right.as[(Long, Long)].collect()
      val want = for { (li, lt) <- ls.toSeq; (ri, rt) <- rs if math.abs(rt - lt) <= delta }
        yield (li, ri)
      // multiset equality: no pair may be duplicated by the cell fan-out
      assert(got.sorted == want.sorted, s"delta=$delta cell=$cell")
    }
    // boundary inclusivity: |Δt| == delta joins
    val g = Events.intervalJoin(Seq((1L, 100L)).toDF("l_id", "l_ts"),
      Seq((9L, 150L)).toDF("r_id", "r_ts"), "l_ts", "r_ts", 50L)
    assert(g.count() == 1)
  }

  test("did: 2x2 cells and parallel-trends estimate on a hand panel") {
    // control user 0: pre means 200c, post 300c (delta +100); treated user 1:
    // pre 100c, post 700c (delta +600) => DiD = +500 cents
    def r(u: Long, day: Long, v: Double) = (u, day * 86400000000000L, v)
    val events = Seq(
      r(0, 0, 1.0), r(0, 1, 3.0), r(0, 2, 2.0), r(0, 3, 4.0),
      r(1, 0, 1.0), r(1, 1, 1.0), r(1, 2, 5.0), r(1, 3, 9.0)
    ).toDF("user_id", "ts", "value")
    val out = Events.did(events).collect()
    assert(out.length == 4)
    assert(out.forall(_.getDouble(5) == 500.0))
    val cells = out.map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(4))).toMap
    assert(cells((0L, 0L)) == 200.0 && cells((0L, 1L)) == 300.0)
    assert(cells((1L, 0L)) == 100.0 && cells((1L, 1L)) == 700.0)
  }

  test("abPower: planning n from exact per-user moments (hand case)") {
    // one type, two users with totals 100c and 300c: mean 200, var 10000,
    // delta = 10 => n = ceil(2 (z_a/2+z_b)^2 sigma^2 / delta^2) = 1570
    val events = Seq(
      (1L, 0L, "view", 1.0), (2L, 1L, "view", 3.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Events.abPower(events).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 200.0 && r.getDouble(3) == 10000.0)
    assert(r.getLong(4) == 1570L)
  }

  test("srmCheck: exact chi-square and the 95% flag on hand splits") {
    // 60/40 of 100 users: chi2 = (10^2/50)*2 = 4.0 > 3.8415 => SRM
    val bad = (0 until 60).map(i => (i * 2L, 0L)) ++
      (0 until 40).map(i => (i * 2 + 1L, 0L))
    val r1 = Events.srmCheck(bad.toDF("user_id", "ts")).collect().head
    assert(r1.getLong(0) == 60L && r1.getLong(1) == 40L)
    assert(r1.getDouble(2) == 4.0 && r1.getBoolean(3))
    // 51/49: chi2 = 0.04 => healthy
    val ok = (0 until 51).map(i => (i * 2L, 0L)) ++
      (0 until 49).map(i => (i * 2 + 1L, 0L))
    val r2 = Events.srmCheck(ok.toDF("user_id", "ts")).collect().head
    assert(r2.getDouble(2) == 0.04 && !r2.getBoolean(3))
  }

  test("banditReplay: daily greedy argmax over prior days, replay credit") {
    val D = 86400000000000L
    // day 0: a mean 100c (2 pulls), b mean 300c. day 1: policy=b, logged
    // pulls a(1: 900c), b(2: 200c+400c) => matched 2, 600c. day 2: cum
    // means a=(100+100+900)/3=366.7 > b=300 => a; logged only b => 0.
    val events = Seq(
      (1L, 0L * D, "a", 1.0), (2L, 0L * D, "a", 1.0), (3L, 0L * D, "b", 3.0),
      (4L, 1L * D, "a", 9.0), (5L, 1L * D, "b", 2.0), (6L, 1L * D, "b", 4.0),
      (7L, 2L * D, "b", 1.0)
    ).map { case (id, t, a, v) => (id, t, a, v) }
      .toDF("user_id", "ts", "event_type", "value")
    val out = Events.banditReplay(events)
      .select("day", "chosen", "n_matched", "cents_matched")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "b", 2L, 600L), (2L, "a", 0L, 0L)))
  }

  test("eventStudy: pre-days ~0, post-days show the lift (hand panel)") {
    val D = 86400000000000L
    // 4 days, mid = 2. Pre: T mean 300c, C mean 100c both days => base
    // gap 200, pre effects 0. Day 2: T 600, C 100 => +300. Day 3: T 800,
    // C 200 => +400.
    val events = Seq(
      (0L, 0L * D, 1.0), (1L, 0L * D, 3.0),
      (0L, 1L * D, 1.0), (1L, 1L * D, 3.0),
      (0L, 2L * D, 1.0), (1L, 2L * D, 6.0),
      (0L, 3L * D, 2.0), (1L, 3L * D, 8.0)
    ).toDF("user_id", "ts", "value")
    val out = Events.eventStudy(events)
      .select("day", "post", "effect_cents")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 0L, 0.0), (1L, 0L, 0.0),
      (2L, 1L, 300.0), (3L, 1L, 400.0)))
  }
}
