package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Events}
import graft.sources.{Robots, Warc}

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

  // ------------------------------------------------------------------ WARC

  private def oneRecord(warcType: String, url: Option[String], ct: String,
      payload: Array[Byte]): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    Warc.writeRecord(b, warcType, url, ct, payload)
    b.toByteArray
  }

  test("Warc: plain and gzip-member streams parse identically; HTTP " +
      "split yields status + body; truncation fails loudly") {
    val body = "héllo wörld".getBytes(UTF_8)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
    val req = "GET / HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes(UTF_8)
    val recs =
      oneRecord("warcinfo", None, "application/warc-fields", Warc.InfoPayload) ++
      oneRecord("response", Some("https://A.example/?x=1"),
        "application/http;msgtype=response", http) ++
      oneRecord("request", Some("https://a.example/"),
        "application/http;msgtype=request", req)
    val plain = Warc.records(new ByteArrayInputStream(recs), "t.warc").toVector
    assert(plain.map(_.warcType) == Vector("warcinfo", "response", "request"))
    assert(plain(0).bodyLen == Warc.InfoPayload.length && plain(0).host.isEmpty)
    assert(plain(1).httpStatus.contains(200L))
    assert(plain(1).body.sameElements(body))
    assert(plain(1).host.contains("a.example"))
    assert(plain(2).httpStatus.isEmpty && plain(2).bodyLen == 0L)

    // gzip: one member per record, chained transparently
    val members = Seq(
      oneRecord("warcinfo", None, "application/warc-fields", Warc.InfoPayload),
      oneRecord("response", Some("https://A.example/?x=1"),
        "application/http;msgtype=response", http))
      .map(Warc.gzipMember).reduce(_ ++ _)
    val unz = Warc.records(new java.io.BufferedInputStream(
      new java.util.zip.GZIPInputStream(
        new ByteArrayInputStream(members))), "t.warc.gz").toVector
    assert(unz.map(_.warcType) == Vector("warcinfo", "response"))
    assert(unz(1).body.sameElements(body))

    // truncated payload: loud failure, not a silent partial record
    val cut = recs.take(recs.length - 30)
    val ex = intercept[Exception] {
      Warc.records(new ByteArrayInputStream(cut), "cut.warc").toVector
    }
    assert(ex.getMessage != null)
  }

  test("Warc.canonicalUrl: case, default ports, fragments, tracking " +
      "params, param order and empty paths all normalize") {
    assert(Warc.canonicalUrl("HTTPS://WWW.Ex.COM:443/a?b=2&a=1#frag")
      == "https://www.ex.com/a?a=1&b=2")
    assert(Warc.canonicalUrl("http://ex.com:80/") == "http://ex.com/")
    assert(Warc.canonicalUrl("http://ex.com:8080/x") == "http://ex.com:8080/x")
    assert(Warc.canonicalUrl("https://ex.com") == "https://ex.com/")
    assert(Warc.canonicalUrl("https://ex.com/p?utm_source=a&utm_campaign=b")
      == "https://ex.com/p")
    assert(Warc.canonicalUrl("https://ex.com/p?gclid=zz&q=1&fbclid=aa")
      == "https://ex.com/p?q=1")
    assert(Warc.canonicalUrl("https://ex.com/p?utmx=1") // not a utm_ param
      == "https://ex.com/p?utmx=1")
    intercept[IllegalArgumentException] { Warc.canonicalUrl("not-a-url") }
  }

  test("Robots: group selection, longest-rule precedence, Allow ties, " +
      "wildcards and $ anchors") {
    val txt =
      """# crawl policy
        |User-agent: megacrawler
        |Disallow: /private/
        |
        |User-agent: *
        |Disallow: /doc/
        |Allow: /doc/2
        |Disallow: /*.pdf$
        |Allow: /a
        |Disallow: /a
        |""".stripMargin
    val star = Robots.parse(txt, "*")
    assert(Robots.allowed(star, "/"))            // no matching rule
    assert(!Robots.allowed(star, "/doc/17"))     // Disallow /doc/
    assert(Robots.allowed(star, "/doc/21"))      // longer Allow /doc/2 wins
    assert(!Robots.allowed(star, "/x/file.pdf")) // wildcard + anchor
    assert(Robots.allowed(star, "/x/file.pdfx")) // anchor really anchors
    assert(Robots.allowed(star, "/a/b"))         // equal length: Allow wins
    // exact-agent group preferred over *
    val mega = Robots.parse(txt, "MegaCrawler")
    assert(!Robots.allowed(mega, "/private/x"))
    assert(Robots.allowed(mega, "/doc/17"))      // * group not applied
    // empty Disallow = no rule = allow all
    val open = Robots.parse("User-agent: *\nDisallow:\n", "*")
    assert(open.isEmpty && Robots.allowed(open, "/anything"))
    // Warc.pathOf feeds the matcher
    assert(Warc.pathOf("https://h.example/doc/3?x=1#f") == "/doc/3")
    assert(Warc.pathOf("https://h.example") == "/")
    assert(Warc.pathOf("https://h.example?q=1") == "/")
  }
}
