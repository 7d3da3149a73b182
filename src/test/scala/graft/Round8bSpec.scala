package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Corpus, Events, Groups, LanguageModel}

/** Round-8 second-session additions: the KS two-sample test and the
  * deterministic Poisson bootstrap (both on the distributed prefix-sum /
  * global-rank primitives), interpolated Kneser–Ney bigram scoring, HTML
  * boilerplate extraction, and the leakage-safe cluster-aware split.
  */
class Round8bSpec extends SparkSpec {
  import spark.implicits._

  test("prefixSums: two running totals in one pass match local scans") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 400).map(i =>
      (rnd.nextInt(50).toLong, i.toLong, (i % 7).toLong))
    val df = rows.toDF("k", "v", "u").repartition(5)
    val got = Events.prefixSums(df, Seq(col("k"), col("v")),
        Seq("v", "u"), Seq("cv", "cu"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getLong(4))))
      .toMap
    var rv = 0L; var ru = 0L
    rows.sortBy(t => (t._1, t._2)).foreach { case (k, v, u) =>
      assert(got((k, v)) == ((rv, ru)), s"at ($k,$v)")
      rv += v; ru += u
    }
  }

  test("ksTest: hand-checked fixture A={1,2,3} B={2,3,4}") {
    // F_A - F_B at v=1,2,3,4: 1/3, 1/3, 1/3, 0  =>  D = 1/3
    // d_num = max|ca*n_b - cb*n_a| = 3; lambda = sqrt(9/6)/3 = 0.408248
    val df = Seq((1L, 0L), (2L, 0L), (3L, 0L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("m", "variant")
    val r = Events.ksTest(df, "m", "variant").head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Long]("d_num") == 3)
    assert(math.abs(r.getAs[Double]("d") - 0.333333) < 1e-9)
    assert(math.abs(r.getAs[Double]("ks_lambda") - 0.408248) < 1e-9)
    assert(!r.getAs[Boolean]("reject_05"))
  }

  test("ksTest: identical samples give D = 0, disjoint give D = 1") {
    val same = Seq((5L, 0L), (7L, 0L), (5L, 1L), (7L, 1L)).toDF("m", "variant")
    val r0 = Events.ksTest(same, "m", "variant").head()
    assert(r0.getAs[Long]("d_num") == 0 && r0.getAs[Double]("d") == 0.0)
    val disj = Seq((1L, 0L), (2L, 0L), (10L, 1L), (11L, 1L)).toDF("m", "variant")
    val r1 = Events.ksTest(disj, "m", "variant").head()
    assert(r1.getAs[Double]("d") == 1.0)
  }

  test("bootstrapDiff: deterministic, exact point estimate, ordered CI") {
    // variant 0 mean = 30, variant 1 mean = 10 => point_diff = 20
    val users = (0 until 40).map { i =>
      val variant = i % 2
      val m = if (variant == 0) 20L + (i % 5) * 5L else (i % 5) * 5L
      (i.toLong, m, variant.toLong)
    }
    val df = users.toDF("uid", "m", "variant")
    val a = Events.bootstrapDiff(df, "uid", "m", "variant", reps = 200).head()
    val b = Events.bootstrapDiff(df, "uid", "m", "variant", reps = 200).head()
    assert(a == b, "bootstrap must be bit-deterministic (hash-driven weights)")
    assert(a.getAs[Long]("n_reps") == 200)
    val want = users.filter(_._3 == 0).map(_._2).sum.toDouble / 20 -
      users.filter(_._3 == 1).map(_._2).sum.toDouble / 20
    assert(math.abs(a.getAs[Double]("point_diff") - want) < 1e-9)
    val (lo, hi) = (a.getAs[Double]("lo"), a.getAs[Double]("hi"))
    assert(lo <= hi)
    // a true 20-unit gap with small variance: the 95% CI must exclude 0
    assert(lo > 0, s"CI [$lo, $hi] should exclude 0 for a 20-unit true gap")
  }

  test("knBigramScore: hand-computed Kneser-Ney fixture") {
    // train "a b a b": bi = {(a,b):2, (b,a):1}; ctx a:(cu 2,n1f 1),
    // b:(cu 1,n1f 1); cont a:1, b:1; B=2, V=2
    // score "a b c": P(b|a) = 1.25/2 + .75*(1/2)*(2/5) = 0.775
    //                P(c|b) = 0 + .75*(1/1)*(1/5)      = 0.15
    // avg_nll = (-ln .775 - ln .15)/2 = 1.0760
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a b c")).toDF("doc_id", "text")
    val r = LanguageModel.knBigramScore(train, score, "doc_id", "text").head()
    assert(r.getAs[Long]("n_bigrams") == 2)
    assert(r.getAs[Long]("n_known") == 1)
    val want = -(math.log(0.775) + math.log(0.15)) / 2
    assert(math.abs(r.getAs[Double]("avg_nll") -
      math.rint(want * 1e4) / 1e4) < 1e-12)
  }

  test("knBigramScore: unseen context backs off to the continuation dist") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // "z a": context z unseen => P(a|z) = Pc(a) = (1+1)/(2+2+1) = 0.4
    val score = Seq((10L, "z a")).toDF("doc_id", "text")
    val r = LanguageModel.knBigramScore(train, score, "doc_id", "text").head()
    assert(r.getAs[Long]("n_known") == 0)
    val want = -math.log(0.4)
    assert(math.abs(r.getAs[Double]("avg_nll") -
      math.rint(want * 1e4) / 1e4) < 1e-12)
  }

  test("htmlExtract: boilerplate dropped, entities decoded, link density exact") {
    val df = Seq((1L, "hello world & goodbye", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Corpus.htmlExtract(df, "doc_id", "text", "lang", "source").head()
    // anchors: "Home"(4) + "EN"(2) + "Terms &amp; Conditions"(22) = 28
    assert(r.getAs[Long]("n_links") == 3)
    assert(r.getAs[Long]("anchor_chars") == 28)
    val body = "web #1 Home EN web hello world & goodbye " +
      "Terms & Conditions (c) 2026"
    assert(r.getAs[Int]("extracted_len") == body.length)
    assert(r.getAs[String]("head") == body.take(60))
    assert(math.abs(r.getAs[Double]("link_density") -
      math.rint(28.0 / body.length * 1e6) / 1e6) < 1e-12)
    // the script body and style rules must NOT leak into the text
    assert(!body.contains("track") && !body.contains("color"))
  }

  test("msprtDaily: ln-lambda matches the closed form, reject latches") {
    // day 1: A = {10, 20}, B = {0}; day 2: A += {30}, B += {0, 0}
    val obs = Seq(
      (1L, 0L, 10L), (1L, 0L, 20L), (1L, 1L, 0L),
      (2L, 0L, 30L), (2L, 1L, 0L), (2L, 1L, 0L)).toDF("day", "variant", "x")
    // σ² = 25 so day-2's cumulative evidence (θ = 20, V = 16.7) crosses
    // ln 20 ≈ 3.0 (ln Λ ≈ 9.9) while day-1's (θ = 15, V = 37.5) does not
    val s2 = 25.0; val t2 = 400.0
    def lnl(sa: Long, na: Long, sb: Long, nb: Long): Double = {
      val theta = sa.toDouble / na - sb.toDouble / nb
      val v = s2 * (1.0 / na + 1.0 / nb)
      0.5 * math.log(v / (v + t2)) + theta * theta * t2 / (2.0 * v * (v + t2))
    }
    val rows = Events.msprtDaily(obs, "day", "variant", "x", s2, t2)
      .collect()
    assert(rows.length == 2)
    val d1 = rows(0); val d2 = rows(1)
    assert(d1.getAs[Long]("n_a") == 2 && d1.getAs[Long]("n_b") == 1)
    assert(math.abs(d1.getAs[Double]("ln_lambda") -
      math.rint(lnl(30, 2, 0, 1) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(d2.getAs[Double]("ln_lambda") -
      math.rint(lnl(60, 3, 0, 3) * 1e6) / 1e6) < 1e-9)
    // day-2 evidence (mean gap 20, tiny V) crosses ln 20; day 1 does not
    assert(d1.getAs[Long]("reject_so_far") == (if (lnl(30, 2, 0, 1) > 2.995732) 1L else 0L))
    assert(d2.getAs[Long]("reject_so_far") == 1L)
    // the latch: once rejected, later flat days stay rejected
    val obs3 = obs.unionByName(
      Seq((3L, 0L, 0L), (3L, 1L, 0L)).toDF("day", "variant", "x"))
    val r3 = Events.msprtDaily(obs3, "day", "variant", "x", s2, t2).collect()
    assert(r3.last.getAs[Long]("reject_so_far") == 1L)
  }

  test("leakageSafeSplit: cluster split leaks zero pairs, naive split leaks") {
    def naiveTrain(id: Long) =
      Math.floorMod((id * 2654435761L) >> 7, 1000L) < 800
    // find a duplicate pair the naive per-doc split would separate
    val ids = (1L to 60L)
    val a = ids.find(naiveTrain).get
    val b = ids.find(i => !naiveTrain(i)).get
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ids.map { i =>
      val t = if (i == a || i == b) dup
      else s"unique document number $i with words w${i}a w${i}b w${i}c w${i}d"
      (i, t)
    }.toDF("doc_id", "text")
    val r = Groups.leakageSafeSplit(docs, "doc_id", "text",
      threshold = 0.9).head()
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == 60)
    assert(r.getAs[Long]("n_dup_pairs") >= 1)
    assert(r.getAs[Long]("leak_pairs_cluster_split") == 0,
      "cluster-aware split must never separate near-duplicates")
    assert(r.getAs[Long]("leak_pairs_naive_split") >= 1,
      "the naive split control should cross at least the planted pair")
  }
}
