package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Events}

/** Round-9 (second session) additions: experimentation-stats operators —
  * Welch z + Benjamini–Hochberg FDR across a metric family, winsorized /
  * trimmed robust means, quantile treatment effects.
  */
class Round9bSpec extends SparkSpec {
  import spark.implicits._

  test("welchBh: equal arms → p ≈ 1; q ≥ p and q non-decreasing in p-rank") {
    // group "flat": identical arms (z = 0 → two-sided p = 1);
    // group "shift": arm 1 shifted far (tiny p); group "mild": small shift
    val rows =
      (1 to 100).flatMap(k => Seq(
        ("flat", 0L, 50L + (k % 7)), ("flat", 1L, 50L + (k % 7)),
        ("shift", 0L, 10L), ("shift", 1L, 500L + (k % 3)),
        ("mild", 0L, 50L + (k % 7)), ("mild", 1L, 52L + (k % 7))))
    val df = rows.toDF("g", "v", "x")
    val out = Events.welchBh(df, "g", "v", "x", alpha = 0.1)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
    val (pFlat, qFlat, sFlat) = out("flat")
    val (pShift, qShift, sShift) = out("shift")
    assert(math.abs(pFlat - 1.0) < 1e-6, s"flat arms p=$pFlat")
    assert(sFlat == 0L && sShift == 1L)
    assert(pShift < 1e-4 && qShift < 1e-4)
    // step-up invariants: q >= p everywhere; q monotone along the p order
    val all = Events.welchBh(df, "g", "v", "x").collect()
      .map(r => (r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    all.foreach { case (p, q) => assert(q >= p - 1e-12) }
    all.sliding(2).foreach {
      case Array((_, q1), (_, q2)) => assert(q2 >= q1 - 1e-12)
      case _ =>
    }
  }

  test("winsorMeans: k=⌊0.05n⌋ order statistics clip exactly one outlier") {
    // variant 0: 1..19 plus one outlier 1000 (n=20, k=1):
    //   raw mean (190-20+1020)/20 = 59.5; winsor/trim both 10.5
    val v0 = (1L to 19L) :+ 1000L
    // variant 1: 1..20 — symmetric, all three means 10.5
    val v1 = (1L to 20L)
    val df = (v0.map(x => (0L, x)) ++ v1.map(x => (1L, x))).zipWithIndex
      .map { case ((v, x), i) => (i.toLong, v, x) }.toDF("uid", "v", "x")
    val out = Events.winsorMeans(df, "uid", "x", "v", frac = 0.05)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0L) == ((59.5, 10.5, 10.5)))
    assert(out(1L) == ((10.5, 10.5, 10.5)))
  }

  test("lshPlan: lower-τ geometries emit a superset of candidate pairs; " +
      "exact duplicates collide under every plan") {
    // 30 distinct docs + 3 planted exact duplicates (identical text ⇒
    // identical signature ⇒ band-collision under EVERY (b, r) geometry)
    val docs = ((0 until 30).map(i =>
        (i.toLong, s"alpha bravo charlie delta echo ${i} foxtrot golf " +
          s"hotel india juliet kilo lima mike november ${i * 7} oscar papa"))
      ++ Seq(100L, 101L, 102L).map(id =>
        (id, "alpha bravo charlie delta echo 1 foxtrot golf " +
          "hotel india juliet kilo lima mike november 7 oscar papa")))
      .toDF("doc_id", "text")
    val plans = Seq((8, 16), (16, 8), (32, 4), (64, 2))
    val out = Dedup.lshPlan(docs, "doc_id", "text", plans)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.map(t => (t._1.toInt, t._2.toInt)).toSeq == plans.sortBy(_._1))
    // τ falls as bands widen relative to rows → candidate counts rise
    val byB = out.sortBy(_._1)
    byB.sliding(2).foreach {
      case Array((_, _, t1, c1), (_, _, t2, c2)) =>
        assert(t2 < t1, "est_threshold must fall as b grows (r shrinks)")
        assert(c2 >= c1, "looser plans must emit at least as many candidates")
      case _ =>
    }
    // doc 1 and the three planted copies: C(4,2) = 6 pairs under every plan
    byB.foreach { case (_, _, _, c) => assert(c >= 6L) }
  }
}
