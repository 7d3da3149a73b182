package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Corpus, Dedup, TextAnalysis}

/** Corpus-governance operators: each checked against a driver-side
  * brute-force reimplementation on a mixed corpus (the oracle gate then
  * hash-matches the same operators against DuckDB at sf0.01).
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "en", "the quick brown fox jumps over the lazy dog"),
    (1L, "en", "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "de", "der schnelle braune fuchs springt gern"),
    (3L, "en", "spark shuffles hash joins and window functions"),
    (4L, "fr", "spark spark spark spark spark spark spark spark"),
    (5L, "en", ""),
    (6L, "zh", "a b"),
    (7L, "en", "completely unrelated content about storage engines"))
    .toDF("doc_id", "lang", "text")

  private def wordGrams(s: String, k: Int): Set[Seq[String]] = {
    val ts = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (ts.length < k) Set.empty else ts.sliding(k).map(_.toSeq).toSet
  }

  test("decontaminate matches brute-force k-gram overlap") {
    val eval = docs.filter(col("doc_id").isin(0L, 3L))
    val train = docs.filter(!col("doc_id").isin(0L, 3L))
    val out = Corpus.decontaminate(train, eval, "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    val evalGrams = Map(0L -> wordGrams("the quick brown fox jumps over the lazy dog", 3),
      3L -> wordGrams("spark shuffles hash joins and window functions", 3))
    val allEval = evalGrams.values.flatten.toSet
    for (id <- Seq(1L, 2L, 4L, 5L, 6L, 7L)) {
      val g = wordGrams(docs.filter(col("doc_id") === id).select("text").as[String].head(), 3)
      val shared = g.intersect(allEval)
      val hits = evalGrams.count { case (_, eg) => eg.intersect(g).nonEmpty }
      if (shared.isEmpty) assert(!out.contains(id), s"doc $id should be clean")
      else assert(out(id) == ((shared.size.toLong, hits.toLong)), s"doc $id")
    }
    // doc 1 shares the full 9-token prefix with eval doc 0 → 7 shared 3-grams
    assert(out(1L) == ((7L, 1L)))
    // the decontaminated corpus is exactly the unflagged training rows
    val clean = Corpus.decontaminatedCorpus(train, eval, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 4L, 5L, 6L, 7L).diff(out.keySet))
  }

  test("repetitionSignals matches brute force, including empty docs") {
    val out = Corpus.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.size == docs.count())
    for ((id, _, text) <- docs.as[(Long, String, String)].collect()) {
      val ts = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val grams = if (ts.length < 3) Seq.empty else ts.sliding(3).map(_.mkString(" ")).toSeq
      val (n, nd, top) = (ts.length, ts.distinct.length,
        if (ts.isEmpty) 0 else ts.groupBy(identity).values.map(_.size).max)
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      val exp = (n.toLong,
        if (n == 0) 0.0 else r6(nd.toDouble / n),
        if (n == 0) 0.0 else r6(top.toDouble / n),
        if (grams.isEmpty) 0.0 else r6(1.0 - grams.distinct.size.toDouble / grams.size))
      assert(out(id) == exp, s"doc $id: got ${out(id)} expected $exp")
    }
    // the degenerate all-same-token doc: top-token fraction 1, and its six
    // identical 3-grams leave one distinct → dup fraction 5/6
    assert(out(4L)._3 == 1.0 && out(4L)._4 == 0.833333)
  }

  test("bm25TopK ranks the all-term doc first and matches brute force") {
    val terms = Seq("spark", "hash", "window")
    val out = Corpus.bm25TopK(docs, "doc_id", "text", terms, topK = 5)
      .as[(Long, Long, Double)].collect()
    // doc 3 contains all three query terms; doc 4 only "spark" (×8)
    assert(out.head._1 == 3L && out.head._2 == 3L)
    assert(out.map(_._1).contains(4L))
    // brute-force BM25 with the same formula
    val corpus = docs.as[(Long, String, String)].collect()
      .map { case (id, _, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val nDocs = corpus.length.toDouble
    val avgdl = corpus.map(_._2.length).sum / nDocs
    val dft = terms.map(t => t -> corpus.count(_._2.contains(t)).toDouble).toMap
    val expect = corpus.flatMap { case (id, ts) =>
      val ws = terms.sorted.flatMap { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) None
        else Some(math.log(1.0 + (nDocs - dft(t) + 0.5) / (dft(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ts.length / avgdl)))
      }
      if (ws.isEmpty) None else Some((id, ws.length.toLong, ws.foldLeft(0.0)(_ + _)))
    }.sortBy(r => (-r._3, r._1)).take(5)
      .map(r => (r._1, r._2, math.rint(r._3 * 1e6) / 1e6))
    assert(out.toSeq == expect.toSeq)
  }

  test("piiScan counts and redacts emails, ips, phones") {
    val pii = Seq(
      (1L, "reach me at a.b+c@example.org or admin@x.io thanks"),
      (2L, "host 192.168.0.1 and 10.0.0.255 port"),
      (3L, "call +1-555-0134 or +44-555-9999"),
      (4L, "nothing here")).toDF("doc_id", "text")
    val out = Corpus.piiScan(pii, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 2 && out(1L)._5 == "reach me at <EMAIL> or <EMAIL> thanks")
    assert(out(2L)._3 == 2 && out(2L)._5 == "host <IP> and <IP> port")
    assert(out(3L)._4 == 2 && out(3L)._5 == "call <PHONE> or <PHONE>")
    assert(out(4L) == ((4L, 0L, 0L, 0L, "nothing here")))
  }

  test("stratifiedSample is deterministic, stratum-scoped, and rate-shaped") {
    val n = 2000
    val big = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val rates = Map("en" -> 0.25, "de" -> 0.75)
    val kept = Corpus.stratifiedSample(big, "doc_id", "lang", rates, 1.0, "t:")
    val again = Corpus.stratifiedSample(big, "doc_id", "lang", rates, 1.0, "t:")
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // binomial bounds: ±5σ of n·p (n=1000 per stratum)
    assert(math.abs(byLang("en") - 250.0) < 5 * math.sqrt(1000 * 0.25 * 0.75))
    assert(math.abs(byLang("de") - 750.0) < 5 * math.sqrt(1000 * 0.75 * 0.25))
    // decision is a pure per-row hash: kept set under a different salt differs
    val other = Corpus.stratifiedSample(big, "doc_id", "lang", rates, 1.0, "u:")
    assert(other.select("doc_id").as[Long].collect().toSet !=
      kept.select("doc_id").as[Long].collect().toSet)
  }

  test("cross-corpus minhash pairs are bipartite and Jaccard-exact") {
    val out = Dedup.minhashCrossCorpusPairs(docs, "doc_id", "text",
        isRef = col("doc_id") % 2 === 1, threshold = 0.2)
      .as[(Long, Long, Double)].collect()
    // every pair is (even new, odd ref)
    assert(out.forall { case (a, b, _) => a % 2 == 0 && b % 2 == 1 })
    // docs 0/1 share the 9-token prefix: 7 shared 3-grams of 7 and 10
    // distinct → Jaccard 7/(7+10−7) = 0.7
    val p01 = out.find(p => p._1 == 0L && p._2 == 1L)
    assert(p01.isDefined && math.abs(p01.get._3 - 0.7) < 1e-12)
    // verify values equal brute-force shingle Jaccard for every emitted pair
    val texts = docs.as[(Long, String, String)].collect().map(t => t._1 -> t._3).toMap
    def sh(s: String) = {
      val ts = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (ts.isEmpty) Set.empty[String]
      else if (ts.length < 3) Set(ts.mkString(" "))
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    out.foreach { case (a, b, j) =>
      val (sa, sb) = (sh(texts(a)), sh(texts(b)))
      val exp = sa.intersect(sb).size.toDouble / (sa.size + sb.size - sa.intersect(sb).size)
      assert(math.abs(j - exp) < 1e-12, s"pair ($a,$b)")
    }
  }

  test("lineDedup keeps exactly the globally-first occurrence of each line") {
    // the boilerplate line appears in docs 1, 2, 3 — only doc 1 pos 0
    // survives; within-doc repeats (doc 2) also collapse to first
    val lines = Seq(
      (1L, 0, "subscribe now"), (1L, 1, "unique alpha"),
      (2L, 0, "subscribe now"), (2L, 1, "unique beta"), (2L, 2, "unique beta"),
      (3L, 0, "unique gamma"), (3L, 1, "subscribe now")
    ).toDF("doc_id", "pos", "line")
    val surv = Corpus.lineDedup(lines)
      .select("doc_id", "pos").as[(Long, Int)].collect().toSet
    assert(surv == Set((1L, 0), (1L, 1), (2L, 1), (3L, 0)))
    val out = Corpus.reassemble(Corpus.lineDedup(lines))
      .select("doc_id", "n_kept", "text_clean").as[(Long, Long, String)]
      .collect().map { case (d, k, t) => d -> ((k, t)) }.toMap
    assert(out(2L) == ((1L, "unique beta")))
    assert(out(1L) == ((2L, "subscribe now unique alpha")))
  }

  test("dsirTopK matches brute-force hashed-ngram log-likelihood ratios") {
    val B = 64
    val target = docs.filter(col("doc_id").isin(0L, 3L))
    val out = Corpus.dsirTopK(docs, "doc_id", "text",
        targetPred = col("doc_id").isin(0L, 3L), buckets = B, topK = 10)
      .as[(Long, Long, Double)].collect()

    def feats(s: String): Seq[String] = {
      val ts = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      ts ++ (if (ts.length < 2) Seq.empty else ts.sliding(2).map(_.mkString(" ")).toSeq)
    }
    def bucket(f: String): Long = {
      val h = f.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      ((h % B) + B) % B
    }
    val all = docs.as[(Long, String, String)].collect().map(r => r._1 -> feats(r._3)).toMap
    val tIds = Set(0L, 3L)
    val ct = all.filter(t => tIds(t._1)).values.flatten.groupBy(bucket).map(t => t._1 -> t._2.size)
    val cr = all.filter(t => !tIds(t._1)).values.flatten.groupBy(bucket).map(t => t._1 -> t._2.size)
    val (nt, nr) = (ct.values.sum.toDouble, cr.values.sum.toDouble)
    def weight(b: Long) = math.log((ct.getOrElse(b, 0) + 1) / (nt + B)) -
      math.log((cr.getOrElse(b, 0) + 1) / (nr + B))
    val expected = all.filter(t => !tIds(t._1)).collect { case (id, fs) if fs.nonEmpty =>
      val byB = fs.groupBy(bucket).toSeq.sortBy(_._1)
      (id, fs.size.toLong, byB.foldLeft(0.0)((a, t) => a + t._2.size * weight(t._1)))
    }.toSeq

    assert(out.map(_._1).toSet == expected.map(_._1).toSet) // empty doc 5 excluded
    val expMap = expected.map(t => t._1 -> ((t._2, t._3))).toMap
    for ((id, nf, sc) <- out) {
      assert(nf == expMap(id)._1, s"n_feats doc $id")
      assert(math.abs(sc - expMap(id)._2) < 1e-6, s"score doc $id")
    }
    // doc 1 shares the target doc 0's 9-token prefix → it must outrank the
    // unrelated doc 7
    val rank = out.sortBy(t => (-t._3, t._1)).map(_._1)
    assert(rank.indexOf(1L) < rank.indexOf(7L))
  }

  test("bloomDecontaminate never misses a true overlap and counts every gram") {
    val eval = docs.filter(col("doc_id").isin(0L, 3L))
    val train = docs.filter(!col("doc_id").isin(0L, 3L))
    val bloom = Corpus.bloomDecontaminate(train, eval, "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = Corpus.decontaminate(train, eval, "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap

    // every doc with >= 1 gram appears, n_grams == its distinct gram count
    for (id <- Seq(1L, 2L, 4L, 7L))
      assert(bloom(id)._1 ==
        wordGrams(docs.filter(col("doc_id") === id).select("text").as[String].head(), 3).size)
    assert(!bloom.contains(5L) && !bloom.contains(6L)) // sub-k docs: no grams
    // Bloom membership has no false negatives: flagged >= exact overlap count
    for ((id, nOverlap) <- exact) assert(bloom(id)._2 >= nOverlap)
    // and a doc sharing nothing textually stays clean unless a (deterministic)
    // collision occurs — on this corpus there is none
    assert(bloom(7L)._2 == 0L)
  }

  test("chunkDocs covers every token, overlaps by chunkSize-stride, clamps the tail") {
    val out = Corpus.chunkDocs(docs, "doc_id", "text", chunkSize = 5, stride = 3)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // doc 1 has 12 tokens -> chunks start at 0,3,6,9: sizes 5,5,5,3
    assert(out(1L).map(_._3).toSeq == Seq(5L, 5L, 5L, 3L))
    val toks1 = "the quick brown fox jumps over the lazy dog again and again".split(" ")
    assert(out(1L)(1)._4 == toks1.slice(3, 8).mkString(" "))
    // reconstruction: stride-aligned prefixes of each chunk reassemble the doc
    val rebuilt = out(1L).map(_._4.split(" ").take(3)).flatten.take(12) ++
      out(1L).last._4.split(" ").drop(3)
    assert(rebuilt.take(12).toSeq == toks1.toSeq)
    // empty and sub-chunk docs
    assert(!out.contains(5L))           // zero tokens -> dropped
    assert(out(6L).map(_._3).toSeq == Seq(2L)) // "a b": one short chunk
  }

  test("entropySignals matches closed forms on degenerate and uniform text") {
    val e = docs.select(col("doc_id"),
        TextAnalysis.entropySignals(col("text")).as("e"))
      .select(col("doc_id"), col("e.char_entropy"), col("e.n_distinct_chars"),
        col("e.token_entropy"), col("e.n_distinct_tokens"))
      .as[(Long, Double, Int, Double, Int)].collect().map(r => r._1 -> r).toMap
    // doc 4: 8x the same token -> token entropy 0, 6 distinct chars (s,p,a,r,k,' ')
    assert(e(4L)._4 == 0.0 && e(4L)._5 == 1 && e(4L)._3 == 6)
    // doc 5: empty -> all zeros
    assert(e(5L) == ((5L, 0.0, 0, 0.0, 0)))
    // doc 6: "a b" -> uniform 2-token entropy = ln 2; chars a,b,' ' uniform = ln 3
    assert(math.abs(e(6L)._4 - math.log(2)) < 1e-6)
    assert(math.abs(e(6L)._2 - math.log(3)) < 1e-6)
  }

  test("plan shapes: chunk/blocklist scans have no exchange; bloom filter broadcasts") {
    val chunkPlan = Corpus.chunkDocs(docs, "doc_id", "text", 8, 6)
      .queryExecution.executedPlan.toString()
    assert(!chunkPlan.contains("Exchange"),
      s"chunkDocs must be a shuffle-free projection:\n$chunkPlan")
    val banPlan = Corpus.bannedTermScan(docs, "doc_id", "text", Seq("spark"))
      .queryExecution.executedPlan.toString()
    assert(!banPlan.contains("Exchange"),
      s"bannedTermScan must be a shuffle-free scan:\n$banPlan")
    val bloomPlan = Corpus.bloomDecontaminate(
        docs.filter(col("doc_id") > 1), docs.filter(col("doc_id") <= 1),
        "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString()
    // the 1024-row bitset must reach the train side as a broadcast
    assert(bloomPlan.contains("BroadcastHashJoin"),
      s"bloom membership join is not broadcast:\n$bloomPlan")
  }

  test("spanDedup removes non-first copies of duplicated k-gram passages") {
    val corpus = Seq(
      // doc 10 holds the first occurrence of the shared 6-token passage
      (10L, "intro words here license header text retained verbatim tail ten"),
      // doc 11 repeats it verbatim mid-document → those 6 tokens are cut
      (11L, "other opening license header text retained verbatim tail closing words"),
      // doc 12: intra-doc repeat — the second copy of its own 5-token
      // passage is cut, the first kept
      (12L, "aa bb cc dd ee aa bb cc dd ee"),
      (13L, "un related short"),  // exactly k tokens, unique → untouched
      (14L, "x y"),               // sub-k → no grams, survives verbatim
      (15L, ""))                  // empty
      .toDF("doc_id", "text")
    val out = Corpus.spanDedup(corpus, "doc_id", "text", k = 3)
      .select("doc_id", "n_tokens", "n_removed", "text_clean")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(out.size == 6)
    // first occurrence keeps everything
    assert(out(10L) == ((10L, 0L,
      "intro words here license header text retained verbatim tail ten")))
    // doc 11 loses exactly the 6 shared tokens: duplicated 3-grams are the
    // 4 inside "license … verbatim tail", covering those 6 positions
    assert(out(11L) == ((10L, 6L, "other opening closing words")))
    // doc 12: positions 5..9 repeat positions 0..4 → all 5 repeat tokens cut
    assert(out(12L) == ((10L, 5L, "aa bb cc dd ee")))
    assert(out(13L) == ((3L, 0L, "un related short")))
    assert(out(14L) == ((2L, 0L, "x y")))
    assert(out(15L) == ((0L, 0L, "")))
  }

  test("tfidfTopTerms matches a brute-force replay on the mixed corpus") {
    val out = Corpus.tfidfTopTerms(docs, "doc_id", "text", topPerDoc = 3)
      .as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap

    // brute force
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val tok: String => Seq[String] = s => s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val n = texts.size
    val dfCounts = texts.values.toSeq.flatMap(t => tok(t).distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    val expected = texts.map { case (id, t) =>
      val tf = tok(t).groupBy(identity).view.mapValues(_.size).toMap
      val scored = tf.toSeq.map { case (w, f) =>
        val raw = f * (math.log((n + 1.0) / (dfCounts(w) + 1.0)) + 1.0)
        (w, BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (w, sc) => (-sc, w) }.take(3)
      id -> scored
    }
    for ((id, exp) <- expected if exp.nonEmpty)
      assert(out(id) == exp, s"doc $id: got ${out.get(id)} expected $exp")
    assert(!out.contains(5L)) // empty doc has no terms
  }

  test("collocations matches a brute-force PMI replay") {
    val out = Corpus.collocations(docs, "doc_id", "text", minCount = 2, topK = 10)
      .as[(String, String, Long, Double)].collect().toSeq

    val tok: String => Seq[String] = s => s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val texts = docs.select("text").as[String].collect().toSeq
    val uni = texts.flatMap(tok).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = texts.map(tok).filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTot = uni.values.sum.toDouble
    val bTot = bis.values.sum.toDouble
    val expected = bis.filter(_._2 >= 2).toSeq.map { case ((w1, w2), cxy) =>
      val raw = math.log((cxy.toDouble * tTot * tTot) / (bTot * uni(w1) * uni(w2)))
      (w1, w2, cxy, BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }.take(10)
    assert(out == expected)
    // the "again and again" / repeated-spark corpus guarantees candidates
    assert(out.nonEmpty && out.exists(r => r._1 == "spark" && r._2 == "spark"))
  }

  test("lengthPercentileGate keeps exactly the docs at or above the stratum percentile") {
    // stratum a: token counts 1..5 → percent_rank 0, .25, .5, .75, 1
    // stratum b: counts 2,2 (tie broken by id) → pr 0, 1
    val d = Seq(
      (0L, "a", "w"), (1L, "a", "w w"), (2L, "a", "w w w"),
      (3L, "a", "w w w w"), (4L, "a", "w w w w w"),
      (10L, "b", "x y"), (11L, "b", "x y"))
      .toDF("doc_id", "lang", "text")
    val out = Corpus.lengthPercentileGate(d, "doc_id", "text", "lang", minPct = 0.2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 5L, 4L, 2L), ("b", 2L, 1L, 2L)))
  }

  test("cdcChunkStats matches a brute-force CDC replay and reconstructs documents") {
    // shared passage across docs 0/1 must produce at least one shared chunk
    val out = Corpus.cdcChunkStats(docs, "doc_id", "text", k = 4, divisor = 8, topK = 100)
      .as[(Long, Long, Long, Long)].collect().toSeq

    def polyHash(s: String): Long = {
      var h = 7L
      s.foreach { c => h = (h * 31 + c.toLong) % 1000000007L }
      h
    }
    def cdcChunks(text: String): Seq[String] = {
      if (text.isEmpty) return Seq.empty
      val bounds = (1 to math.max(text.length - 3, 0))
        .filter(i => polyHash(text.substring(i - 1, i + 3)) % 8 == 0)
      val starts = 1 +: bounds
      val ends = bounds.map(_ - 1) :+ text.length
      starts.zip(ends).map { case (s, e) => text.substring(s - 1, e) }.filter(_.nonEmpty)
    }
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    // chunks reassemble each document exactly (no content lost at cuts)
    texts.foreach { case (_, t) => assert(cdcChunks(t).mkString == t) }
    val all = texts.flatMap { case (id, t) => cdcChunks(t).map(c => (id, c)) }
    val expected = all.groupBy(c => polyHash(c._2)).map { case (h, cs) =>
      (h, cs.head._2.length.toLong, cs.size.toLong, cs.map(_._1).distinct.size.toLong)
    }.toSeq.sortBy { case (h, _, occ, nd) => (-nd, -occ, h) }.take(100)
    assert(out == expected)
    // insertion robustness: a prefix edit only changes chunks near the edit
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val edited = "XX " + base
    val cb = cdcChunks(base); val ce = cdcChunks(edited)
    assert(cb.intersect(ce).nonEmpty || cb.size <= 1) // shared tail chunks survive
  }

  test("wordpiece: greedy longest-first, ## continuations, [UNK] collapse") {
    import graft.pipeline.Corpus
    // default vocab segments the corpus vocabulary with zero UNKs
    assert(Corpus.wordpiece("scan") == Seq("sc", "##an"))
    assert(Corpus.wordpiece("table") == Seq("ta", "##ble"))
    assert(Corpus.wordpiece("customer") == Seq("cus", "##tomer"))
    assert(Corpus.wordpiece("a") == Seq("a"))
    // longest-first beats an earlier shorter entry: "st" over "s" for stream
    assert(Corpus.wordpiece("stream") == Seq("st", "##ream"))
    // head vocab applies ONLY at position 0: "sc" never re-matches mid-word
    assert(Corpus.wordpiece("ascan", Seq("a", "sc"), Seq("##s", "##c", "##a", "##n"))
      == Seq("a", "##s", "##c", "##a", "##n"))
    // any unmatchable position collapses the WHOLE word, even a late one
    assert(Corpus.wordpiece("scanz", Seq("sc"), Seq("##an")) == Seq("[UNK]"))
    assert(Corpus.wordpiece("xcan", Seq("sc"), Seq("##an")) == Seq("[UNK]"))
  }
}
