package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators, exact → fuzzy, each designed around ONE shuffle
  * on a compact key (never on raw text):
  *
  *  - exact: hash-groupBy on md5(text) — shuffle carries (hash, id) only.
  *  - minhashLsh: shingle → 128-perm minhash → band → bucket-join. The
  *    self-join is on (band_idx, band_hash) — tiny keys, and bucket sizes
  *    bound the pair blow-up; exact Jaccard verification only on candidates.
  *  - simhash: 64-bit weighted token hash; Hamming-≤r candidates via 4-chunk
  *    pigeonhole banding, exact Hamming verify.
  *  - ngramJaccard: character-n-gram Jaccard on LSH candidates (not O(n²)).
  *  - embeddingCosine: near-dup by cosine ≥ τ via random-hyperplane (SRP)
  *    buckets, exact cosine verify.
  *
  * All stages are deterministic (seeded permutations, FNV hashing) so reruns
  * and retries produce identical results.
  */
object Dedup {

  // --------------------------------------------------------------- exact

  /** Exact dedup groups: one row per distinct text, with the surviving
    * (minimum) id and the duplicate count. Shuffle key = 128-bit md5.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact-dedup survivor rows (keep min id per identical text). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // -------------------------------------------------------------- minhash

  val NumPerms = 128
  val NumBands = 16          // 16 bands × 8 rows: τ ≈ (1/16)^(1/8) ≈ 0.71
  private val RowsPerBand = NumPerms / NumBands
  private val MersennePrime = (1L << 61) - 1

  // seeded permutation parameters — deterministic across the cluster
  private lazy val perms: Array[(Long, Long)] = {
    val rnd = new java.util.Random(42)
    Array.fill(NumPerms)((math.abs(rnd.nextLong()) % MersennePrime + 1,
      math.abs(rnd.nextLong()) % MersennePrime))
  }

  private def shingles(s: String, k: Int): Iterator[Long] = {
    val toks = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) Iterator(TextAnalysis.fnv1a64(toks.mkString(" ")))
    else toks.sliding(k).map(w => TextAnalysis.fnv1a64(w.mkString(" ")))
  }

  /** Distinct hashed shingle set with the minhash pipeline's short-text
    * fallback: ZERO tokens ⇒ empty set (so vacuous documents never pair —
    * matching the DuckDB replay, which maps len(ts)=0 to an empty list);
    * 1..k-1 tokens ⇒ the single hash of the joined tokens.
    */
  private def minhashShingleSet(s: String, k: Int): Array[Long] = {
    if (s == null) return Array.empty[Long]
    val toks = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) Array.empty[Long]
    else if (toks.length < k) Array(TextAnalysis.fnv1a64(toks.mkString(" ")))
    else {
      val set = scala.collection.mutable.HashSet.empty[Long]
      toks.sliding(k).foreach(w => set += TextAnalysis.fnv1a64(w.mkString(" ")))
      // ascending, so the verify step can merge-count (signatureOfSet is
      // order-independent, so sorting here changes nothing else)
      set.toArray.sorted
    }
  }

  /** 128-long minhash signature from a hashed shingle set (empty ⇒ all
    * Long.MaxValue, same as the all-sentinel signature of an empty text).
    */
  private def signatureOfSet(ss: Seq[Long]): Array[Long] = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    ss.foreach { sh =>
      val x = (sh & Long.MaxValue) % MersennePrime
      var i = 0
      while (i < NumPerms) {
        val (a, b) = perms(i)
        val v = mulmod(a, x) + b
        val h = if (v >= MersennePrime) v - MersennePrime else v
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** 128-long minhash signature over k-word shingles. */
  def minhashSignature(text: Column, shingleK: Int = 3): Column =
    udf((s: String) => {
      if (s == null || s.trim.isEmpty) Array.fill(NumPerms)(Long.MaxValue)
      else {
        val sig = Array.fill(NumPerms)(Long.MaxValue)
        shingles(s, shingleK).foreach { sh =>
          val x = sh & Long.MaxValue
          var i = 0
          while (i < NumPerms) {
            val (a, b) = perms(i)
            // (a*x+b) mod p via Math.multiplyHigh-free 61-bit trick is
            // overkill here; BigInt-free mulmod on 61-bit prime:
            val v = mulmod(a, x % MersennePrime) + b
            val h = if (v >= MersennePrime) v - MersennePrime else v
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
        sig
      }
    }).apply(text)

  private def mulmod(a: Long, b: Long): Long = {
    // (a*b) mod 2^61-1 using 128-bit via Math.multiplyHigh (JDK9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // 2^64 ≡ 8 (mod 2^61-1): fold hi*8 + lo
    val folded = (hi << 3) + (lo >>> 61) + (lo & MersennePrime)
    val r = (folded >>> 61) + (folded & MersennePrime)
    if (r >= MersennePrime) r - MersennePrime else r
  }

  /** Exact word-shingle Jaccard between two texts (verification step). */
  def jaccardShingles(a: Column, b: Column, shingleK: Int = 3): Column =
    udf((x: String, y: String) => {
      val sa = shingles(if (x == null) "" else x, shingleK).toSet
      val sb = shingles(if (y == null) "" else y, shingleK).toSet
      if (sa.isEmpty && sb.isEmpty) 1.0
      else sa.intersect(sb).size.toDouble / sa.union(sb).size
    }).apply(a, b)

  /** MinHash-LSH near-duplicate PAIRS above `threshold` Jaccard.
    * Plan shape: sig (narrow) → band explode (×16) → bucket self-join on
    * (band, hash) → distinct pairs → exact-Jaccard verify over the
    * int64-HASHED shingle sets (the verify joins ship ~8 bytes/shingle, not
    * the full texts, and each document tokenizes once — not once per
    * candidate pair).
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, shingleK: Int = 3): DataFrame = {
    val (banded, sets) = bandsAndSets(df, idCol, textCol, shingleK)
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    // two zero-token documents share the all-sentinel signature (candidate
    // pair) but have EMPTY sets: jaccard 0 here and NULL-filtered in the
    // DuckDB replay — vacuous documents never pair on either side
    verifiedPairs(cand, sets, threshold, "id_a", "id_b")
  }

  /** Edit-distance near-duplicate pairs (levenshtein ≤ k) with GUARANTEED
    * recall: positional q-gram filtering (Gravano et al. VLDB 2001) in its
    * ≥1-shared-gram form — a pair within k edits and max length ≥ q·(k+1)
    * must share some q-gram whose positions differ by ≤ k, so candidates
    * come from an equi-join on (gram, position-band) with band width 2k
    * (the ±k position interval spans at most the two emitted endpoint
    * bands). Pairs where BOTH sides are shorter than q·(k+1) fall outside
    * the theorem and are paired brute-force inside that constant-length
    * bucket instead. Exact verify = the built-in codegen `levenshtein`.
    *
    * Plan: gram explode (≈len rows/doc) → one (gram, band) equi-join —
    * never all-pairs; text ships only for the verified candidates. The
    * edit-distance member of the dedup family beside shingle-Jaccard
    * (content), SimHash (bit), and winnowing (substring).
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, q: Int = 8): DataFrame = {
    require(k >= 1 && q > k, s"need k>=1 and q>k, got k=$k q=$q")
    val W = 2 * k
    val OFF = 1024 // keeps band arithmetic positive (floor/truncate parity)
    val docs = df.select(col(idCol).as("id"), col(textCol).as("t"),
      length(col(textCol)).as("len")).persist()
    // size the (gram, band) candidate join ∝ corpus chars (exploded gram
    // volume ≈ chars) — the round-7 INIT_PARTS lever in the plan; the
    // persisted docs frame makes this agg a cache scan
    val chars = docs.filter(col("len") >= q)
      .agg(coalesce(sum(col("len")), lit(0L))).head().getLong(0)
    val n = Autosize.parts(df, chars, Autosize.CharsPerPart)
    // One explode pass, hashed grams (round 10, guide §2.3 + §5):
    // - positions explode directly (no intermediate array-of-structs per
    //   doc as before — the transform+struct form materialized ~len
    //   12-char string copies per document before the Generate);
    // - the join key is xxhash64(gram), not the q-char string — an 8-byte
    //   shuffle key. Hash equality is implied by gram equality so recall
    //   is untouched; a collision can only ADD candidate join rows, and
    //   both the Gravano count filter (a lower bound collisions can only
    //   help pass) and the final banded-DP levenshtein verify are exact,
    //   so the OUTPUT is provably unchanged;
    // - persisted: probe AND index consume it, and unpersisted lineage
    //   re-ran the whole corpus explode once per side (measured 2.6 s per
    //   pass at sf0.1 — the query's single largest component).
    val withGrams = docs.filter(col("len") >= q)
      .select(col("id"), col("len"), col("t"),
        explode(sequence(lit(1), col("len") - lit(q - 1))).as("p"))
      .select(col("id"), col("len"), col("p"),
        xxhash64(col("t").substr(col("p"), lit(q))).as("g"))
      .persist()
    val probe = Autosize.keyed(
      withGrams.select(col("id"), col("len"), col("g"),
        ((col("p") + OFF) / W).cast("long").as("band")),
      n, col("g"), col("band"))
    val index = Autosize.keyed(
      withGrams.select(col("id"), col("len"), col("g"),
        explode(array_distinct(array(
          ((col("p") + (OFF - k)) / W).cast("long"),
          ((col("p") + (OFF + k)) / W).cast("long")))).as("band")),
      n, col("g"), col("band"))
    // the FULL Gravano count filter, not just >=1: a pair within k edits
    // shares at least max(len)-q+1-k·q one-to-one positional gram matches,
    // and every such match contributes a distinct join row, so filtering
    // on the relaxed row count keeps recall while dropping the pairs that
    // share only a few common phrases — without this, every pair sharing
    // one stock 8-gram reaches the verify (measured 184 s at sf0.1; with
    // it, candidates collapse to the near-identical pairs)
    val gramCand = probe.as("l").join(index.as("r"),
        col("l.g") === col("r.g") && col("l.band") === col("r.band") &&
        col("l.id") =!= col("r.id") &&
        abs(col("l.len") - col("r.len")) <= k)
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"),
        greatest(col("l.len"), col("r.len")).as("ml"))
      .groupBy("id_a", "id_b", "ml").agg(count(lit(1)).as("c"))
      .filter(col("c") >= greatest(lit(1L),
        col("ml") - lit(q - 1) - lit(k * q)))
      .select(col("id_a"), col("id_b"))
    // both-short bucket, PassJoin segment filter (Li, Deng, Wang, Feng,
    // PVLDB 5(3) 2011): partition each indexed short doc into k+1 even
    // segments — each single edit destroys the verbatim substring-presence
    // of at most ONE segment (later segments merely shift, and the match
    // is position-free), so any string within k edits still CONTAINS one
    // segment verbatim. The exact segment equi-join therefore gives
    // guaranteed-recall candidates whose volume follows matching content.
    // (The previous len-banded self-join was the one quadratic term left
    // in this tier: doc LENGTH is bounded here but doc COUNT is not, and
    // lengths are corpus-invariant, so the 100× rung paired every copy's
    // shorts with every other copy's — measured super-linear. Candidates
    // changed, output did not: both schemes guarantee recall and the DP
    // verify decides membership, so the oracle replay is untouched.)
    val shortLen = q * (k + 1)
    val shorts = docs.filter(col("len") < shortLen && col("len") > k)
    // index side: segment j covers 1-based [1 + j*len div (k+1),
    // (j+1)*len div (k+1)] — all k+1 segments nonempty for len > k
    // both segment sides join on xxhash64(segment) — the same narrower-key
    // argument as the gram band join above (the probe's all-positions
    // explode is the volume; hashing also makes its distinct an 8-byte op)
    val segIdx = shorts.select(col("id"), col("len"),
        explode(expr(s"transform(sequence(0, $k), j -> " +
          s"substring(t, 1 + j * len DIV ${k + 1}, " +
          s"(j + 1) * len DIV ${k + 1} - j * len DIV ${k + 1}))")).as("seg"))
      .filter(length(col("seg")) >= 1)
      .select(col("id"), col("len"), xxhash64(col("seg")).as("seg"))
    // probe side: every substring whose length any partner's segment could
    // have (partner len within ±k ⇒ segment lengths in
    // [(len-k) div (k+1), (len+k) div (k+1) + 1])
    val segProbe = shorts.select(col("id").as("pid"), col("len").as("plen"),
        explode(expr(s"flatten(transform(" +
          s"sequence(greatest(1, (len - $k) DIV ${k + 1}), " +
          s"(len + $k) DIV ${k + 1} + 1), " +
          s"L -> transform(sequence(1, len - L + 1), " +
          s"i -> substring(t, i, L))))")).as("seg"))
      .select(col("pid"), col("plen"), xxhash64(col("seg")).as("seg"))
      .distinct()
    val shortCand = segIdx.as("l").join(segProbe.as("r"),
        col("l.seg") === col("r.seg") && col("l.id") =!= col("r.pid") &&
        abs(col("l.len") - col("r.plen")) <= k)
      .select(least(col("l.id"), col("r.pid")).as("id_a"),
        greatest(col("l.id"), col("r.pid")).as("id_b"))
    // len <= k stragglers (every segment could be edited away): a
    // vanishing slice by construction — pair them directly
    val tiny = docs.filter(col("len") <= k)
    val tinyCand = tiny.as("l").join(
        docs.filter(col("len") <= 2L * k).as("r"),
        col("l.id") =!= col("r.id") &&
        abs(col("l.len") - col("r.len")) <= k)
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
    val cand = gramCand.union(shortCand).union(tinyCand).distinct()
    cand
      .join(docs.select(col("id").as("id_a"), col("t").as("ta")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("t").as("tb")), "id_b")
      // threshold form = banded O(k·n) DP with early exit (-1 past k),
      // not the full O(n·m) matrix — the verify's hot loop
      .withColumn("dist", levenshtein(col("ta"), col("tb"), k).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= k)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** DuckDB replay of [[editDistancePairs]]: identical grams, bands,
    * short-bucket, and levenshtein verify.
    */
  def editDistanceDuckSql(k: Int, q: Int): String = {
    val W = 2 * k
    val OFF = 1024
    val shortLen = q * (k + 1)
    s"""WITH gr AS (
       |  SELECT doc_id, length(text) AS len, text,
       |         unnest(range(1, length(text) - ${q - 2})) AS p
       |  FROM documents WHERE length(text) >= $q
       |), grams AS (
       |  SELECT doc_id, len, p, substr(text, p, $q) AS g FROM gr
       |), probe AS (
       |  SELECT doc_id, len, g, (p + $OFF) // $W AS band FROM grams
       |), idx AS (
       |  SELECT doc_id, len, g,
       |         unnest(list_distinct([(p + ${OFF - k}) // $W,
       |                               (p + ${OFF + k}) // $W])) AS band
       |  FROM grams
       |), gcand AS (
       |  SELECT least(a.doc_id, b.doc_id) AS id_a,
       |         greatest(a.doc_id, b.doc_id) AS id_b
       |  FROM probe a JOIN idx b
       |    ON a.g = b.g AND a.band = b.band AND a.doc_id <> b.doc_id
       |   AND abs(a.len - b.len) <= $k
       |), scand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM documents a JOIN documents b
       |    ON a.doc_id < b.doc_id
       |   AND length(a.text) < $shortLen AND length(b.text) < $shortLen
       |   AND abs(length(a.text) - length(b.text)) <= $k
       |), cand AS (
       |  SELECT DISTINCT id_a, id_b FROM (
       |    SELECT * FROM gcand UNION ALL SELECT * FROM scand)
       |)
       |SELECT c.id_a, c.id_b, levenshtein(x.text, y.text)::BIGINT AS dist
       |FROM cand c JOIN documents x ON x.doc_id = c.id_a
       |            JOIN documents y ON y.doc_id = c.id_b
       |WHERE levenshtein(x.text, y.text) <= $k
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** (banded, sets) for a corpus: `banded` = (id, band, bh), the LSH
    * candidate-index rows; `sets` = (id, ss), the ascending hashed shingle
    * sets the exact verify consumes (persisted — tokenize/hash ONCE per
    * document, ~8 bytes/shingle, spills cleanly). Shared by the one-shot
    * pair pipelines and the stored-index lifecycle.
    */
  private def bandsAndSets(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int): (DataFrame, DataFrame) = {
    val shSet = udf((s: String) => minhashShingleSet(s, shingleK))
    val sets = df.select(col(idCol).as("id"), shSet(col(textCol)).as("ss"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigOf = udf((ss: Seq[Long]) => signatureOfSet(ss))
    val sigs = sets.select(col("id"), sigOf(col("ss")).as("sig"))
    val bandHash = udf((sig: Seq[Long], band: Int) => {
      var h = 0xcbf29ce484222325L
      var i = band * RowsPerBand
      val end = i + RowsPerBand
      while (i < end) { h ^= sig(i); h *= 0x100000001b3L; i += 1 }
      h
    })
    val banded = sigs
      .select(col("id"), col("sig"), explode(array((0 until NumBands).map(lit): _*)).as("band"))
      .select(col("id"), col("band"), bandHash(col("sig"), col("band")).as("bh"))
    (banded, sets)
  }

  /** Write the deployed dedup index for a corpus: `path/bands` holds the
    * LSH candidate rows (id, band, bh), `path/sets` the hashed shingle sets
    * (id, ss) the exact verify needs — the dedup sibling of the stored IVF
    * index lifecycle (Similarity.writeIvfIndex). At 100 TB the index is a
    * few percent of corpus bytes (hashes, never text) and both tables are
    * plain parquet any batch can append to.
    */
  def writeMinhashIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, shingleK: Int = 3): Unit = {
    val (banded, sets) = bandsAndSets(df, idCol, textCol, shingleK)
    sets.write.mode("overwrite").parquet(s"$path/sets")
    banded.write.mode("overwrite").parquet(s"$path/bands")
    sets.unpersist()
  }

  /** Incremental dedup against a stored index — the production ingest
    * pattern: a new batch pairs against the EXISTING corpus through the
    * stored band table (new×stored bipartite join) plus itself (new×new
    * self-join), is exact-verified against stored + fresh shingle sets,
    * and is then appended to the index. The historical corpus is never
    * re-paired: per-batch work is ∝ batch × collision rate, not corpus².
    *
    * The returned pairs are materialized BEFORE the append (the plan reads
    * the same parquet tables the append mutates). Ids must be new to the
    * index (append-only contract, same as the IVF store).
    */
  def appendMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleK: Int = 3): DataFrame = {
    val (nb, ns) = bandsAndSets(batch, idCol, textCol, shingleK)
    nb.persist()
    val ob = spark.read.parquet(s"$path/bands")
    val os = spark.read.parquet(s"$path/sets")
    // stored side holds only pre-batch ids, so cross (new×old) and self
    // (new×new) are disjoint; least/greatest normalizes pair orientation
    val cross = nb.as("l").join(ob.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh"))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
    val self = nb.as("l").join(nb.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    val cand = cross.union(self).distinct()
    // eager localCheckpoint, not persist: the append below fires
    // refreshByPath on the very parquet this plan reads, which INVALIDATES
    // a cache entry (re-evaluating it would pair the batch against its own
    // appended copy); checkpointing cuts the lineage so the result is
    // immune to the store mutation
    val out = verifiedPairs(cand, os.unionByName(ns), threshold, "id_a", "id_b")
      .localCheckpoint(true)
    ns.write.mode("append").parquet(s"$path/sets")
    nb.write.mode("append").parquet(s"$path/bands")
    nb.unpersist()
    out
  }

  /** DuckDB replay of the [[writeMinhashIndex]]→[[appendMinhashIndex]]
    * lifecycle: over the FULL corpus, the surviving pairs are exactly the
    * banded pairs with at least one endpoint in the new batch (the stored
    * index contributes the other side), verified at the same threshold.
    */
  def minhashIncrementalDuckSql(threshold: Double, shingleK: Int,
      newPred: String): String =
    minhashDuckCtes(shingleK) +
      s""", cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
         |  WHERE (a.doc_id $newPred) OR (b.doc_id $newPred)
         |)
         |SELECT id_a, id_b,
         |  round(len(list_intersect(x.ss, y.ss))::DOUBLE
         |        / (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))), 6) AS jaccard
         |FROM cand JOIN sigs x ON x.doc_id = id_a JOIN sigs y ON y.doc_id = id_b
         |WHERE len(list_intersect(x.ss, y.ss))::DOUBLE
         |      / (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) >= $threshold
         |ORDER BY id_a, id_b""".stripMargin

  /** Cross-corpus near-dedup: MinHash-LSH pairs between a NEW corpus slice
    * and a REFERENCE corpus slice of the same frame (the "dedupe this crawl
    * against what we already trained on" operator). Identical signature/band
    * machinery to [[minhashNearDupPairs]], but the candidate join is
    * BIPARTITE — new-side bands against ref-side bands — so the pair space
    * is |new|×|ref| bucketed, never |corpus|² ; at 100 TB the reference side
    * is typically the smaller (curated) corpus and its banded frame shuffles
    * once on the compact (band, hash) key.
    */
  def minhashCrossCorpusPairs(df: DataFrame, idCol: String, textCol: String,
      isRef: Column, threshold: Double = 0.7, shingleK: Int = 3): DataFrame = {
    val shSet = udf((s: String) => minhashShingleSet(s, shingleK))
    val sets = df.select(col(idCol).as("id"), isRef.as("is_ref"), shSet(col(textCol)).as("ss"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigOf = udf((ss: Seq[Long]) => signatureOfSet(ss))
    val sigs = sets.select(col("id"), col("is_ref"), sigOf(col("ss")).as("sig"))
    val bandHash = udf((sig: Seq[Long], band: Int) => {
      var h = 0xcbf29ce484222325L
      var i = band * RowsPerBand
      val end = i + RowsPerBand
      while (i < end) { h ^= sig(i); h *= 0x100000001b3L; i += 1 }
      h
    })
    val banded = sigs
      .select(col("id"), col("is_ref"), col("sig"),
        explode(array((0 until NumBands).map(lit): _*)).as("band"))
      .select(col("id"), col("is_ref"), col("band"), bandHash(col("sig"), col("band")).as("bh"))
    val cand = banded.filter(!col("is_ref")).as("l")
      .join(banded.filter(col("is_ref")).as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh"))
      .select(col("l.id").as("id_new"), col("r.id").as("id_ref"))
      .distinct()
    verifiedPairs(cand, sets.select(col("id"), col("ss")), threshold,
      "id_new", "id_ref")
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over word unigrams (Charikar 2002). */
  def simhash64(text: Column): Column =
    udf((s: String) => {
      if (s == null) 0L
      else {
        val acc = new Array[Int](64)
        s.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
          val h = TextAnalysis.fnv1a64(tok)
          var i = 0
          while (i < 64) { if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1; i += 1 }
        }
        var out = 0L
        var i = 0
        while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
        out
      }
    }).apply(text)

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming: pigeonhole on
    * (maxHamming+1) chunks of the 64-bit signature — a pair within Hamming
    * maxHamming differs in at most maxHamming chunks, so it SHARES at least
    * one exact chunk (guaranteed recall for any maxHamming ≤ 15), and the
    * self-join key is (chunk_idx, chunk_value). Smaller maxHamming ⇒ wider
    * chunks ⇒ sharper buckets; maxHamming is capped at 15 (4-bit chunks)
    * because beyond that bucket selectivity collapses toward O(n²).
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0,15] (got $maxHamming): chunks of 64/(maxHamming+1) bits must stay selective")
    val sim = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    hammingBandPairs(sim, 64, maxHamming)
  }

  /** SimHash over word unigrams using the SQL-expressible polynomial token
    * hash (TextAnalysis.polyHash) — `bits`-bit signature as a pure column
    * expression (codegen, no UDF). Bit j weight = Σ_tokens ±1 by bit j of the
    * token hash; sign > 0 sets the bit. The identical computation is emitted
    * for DuckDB by [[polySimhashDuckSql]], making simhash pair queries
    * oracle-checkable end-to-end.
    */
  def polySimhash(text: Column, bits: Int = 24): Column =
    // compiled loop rather than HOF columns: the per-char lambda
    // interpretation of transform/aggregate is ~20× slower on wide corpora;
    // the arithmetic below is integer-exact and identical to the DuckDB
    // generator, so oracle hash-matches are unaffected
    udf((s: String) => {
      if (s == null) 0L
      else {
        val acc = new Array[Long](bits)
        s.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { t =>
          var h = 7L
          var i = 0
          while (i < t.length) { h = (h * 31 + t.charAt(i).toInt) % 1000000007L; i += 1 }
          var j = 0
          while (j < bits) { if (((h >> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1; j += 1 }
        }
        var out = 0L
        var j = 0
        while (j < bits) { if (acc(j) > 0) out |= (1L << j); j += 1 }
        out
      }
    }).apply(text)

  /** DuckDB replay of [[TextAnalysis.fnv1a64]] over one token expression:
    * seed-prepended char-code fold with the 64-bit wrap-around multiply done
    * in HUGEINT (ASCII ⇒ ord ≡ Java char code).
    */
  def fnv64DuckSql(tokExpr: String): String =
    // lambda vars carry a __fnv prefix so callers can nest this inside their
    // own list_transform lambdas without variable capture (DuckDB lambda
    // scoping shadows outer variables by name)
    s"list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), " +
      s"list_transform(range(1, len($tokExpr) + 1), __fnvi -> CAST(ord(substr($tokExpr, __fnvi, 1)) AS UBIGINT))), " +
      "(__fnva, __fnvc) -> CAST((CAST(xor(__fnva, __fnvc) AS HUGEINT) * 1099511628211) % 18446744073709551616 AS UBIGINT))"

  /** DuckDB equivalent of [[simhash64]] given a column `hs` holding the
    * token FNV hash list (UBIGINT[]): 64 per-bit majority votes summed into
    * the signature. Empty lists yield 0 on both sides (list_sum(NULL-safe)).
    */
  def simhash64FromHashesDuckSql(hsCol: String): String =
    (0 until 64).map { j =>
      val p = BigInt(1) << j
      s"(CASE WHEN list_sum(list_transform($hsCol, h -> CASE WHEN (h // CAST($p AS UBIGINT)) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN CAST($p AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)"
    }.mkString("(", " + ", ")")

  /** DuckDB equivalent of [[polySimhash]] over `textExpr`. */
  def polySimhashDuckSql(textExpr: String, bits: Int = 24): String = {
    val toks = s"list_filter(string_split_regex(lower($textExpr), '\\s+'), t -> t <> '')"
    val hashes = s"list_transform($toks, t -> ${TextAnalysis.polyHashDuckSql("t")})"
    (0 until bits).map { j =>
      val p = 1L << j
      s"(CASE WHEN list_sum(list_transform($hashes, h -> CASE WHEN (h // $p) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN $p ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** DuckDB replay of the ENTIRE [[minhashNearDupPairs]] pipeline: the 128
    * seeded permutation constants are embedded as literals, the 61-bit
    * Mersenne-prime mulmod runs in HUGEINT, band keys are the same FNV fold
    * over 8-signature slices, and candidates come from the identical banded
    * self-join — so the deliberately-probabilistic RECALL is reproduced
    * exactly (the output is a deterministic function of the seeds), followed
    * by the exact hashed-set Jaccard verify.
    */
  def minhashPairsDuckSql(threshold: Double, shingleK: Int = 3): String =
    minhashDuckCtes(shingleK) +
      s""", cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
         |)
         |SELECT id_a, id_b,
         |  round(len(list_intersect(x.ss, y.ss))::DOUBLE
         |        / (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))), 6) AS jaccard
         |FROM cand JOIN sigs x ON x.doc_id = id_a JOIN sigs y ON y.doc_id = id_b
         |WHERE len(list_intersect(x.ss, y.ss))::DOUBLE
         |      / (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) >= $threshold
         |ORDER BY id_a, id_b""".stripMargin

  /** DuckDB replay of [[minhashCrossCorpusPairs]]: the same seeded CTEs, but
    * candidates come from the BIPARTITE band join — new side (rows matching
    * `newPred`) × reference side (rows matching `refPred`).
    */
  def minhashBipartiteDuckSql(threshold: Double, shingleK: Int,
      newPred: String, refPred: String): String =
    minhashDuckCtes(shingleK) +
      s""", cand AS (
         |  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_ref
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh
         |  WHERE (a.doc_id ${newPred}) AND (b.doc_id ${refPred})
         |)
         |SELECT id_new, id_ref,
         |  round(len(list_intersect(x.ss, y.ss))::DOUBLE
         |        / (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))), 6) AS jaccard
         |FROM cand JOIN sigs x ON x.doc_id = id_new JOIN sigs y ON y.doc_id = id_ref
         |WHERE len(list_intersect(x.ss, y.ss))::DOUBLE
         |      / (len(x.ss) + len(y.ss) - len(list_intersect(x.ss, y.ss))) >= $threshold
         |ORDER BY id_new, id_ref""".stripMargin

  /** Shared CTE prefix (toks → hashed shingle sets → 128-perm signatures →
    * band keys) for the minhash oracle generators.
    */
  private[pipeline] def minhashDuckCtes(shingleK: Int): String =
    minhashSigCtes(shingleK) +
      s""", bands AS (
         |  SELECT doc_id, b,
         |    list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
         |      sig[8 * b + 1 : 8 * b + 8]),
         |      (acc, s) -> CAST((CAST(xor(acc, s) AS HUGEINT) * 1099511628211)
         |                       % 18446744073709551616 AS UBIGINT)) AS bh
         |  FROM sigs, range(0, $NumBands) t(b)
         |)""".stripMargin

  /** The sig-table prefix of [[minhashDuckCtes]] (toks → hashed shingle
    * sets → 128-perm signatures), reusable by callers that band the
    * signatures with their OWN (bands × rows) geometry (e.g. the LSH band
    * planner).
    */
  private[pipeline] def minhashSigCtes(shingleK: Int): String = {
    val P = MersennePrime
    val sigExprs = perms.map { case (a, b) =>
      s"(CASE WHEN len(xs) = 0 THEN CAST(9223372036854775807 AS UBIGINT) ELSE " +
        s"list_min(list_transform(xs, x -> CAST((CAST($a AS HUGEINT) * x + $b) % $P AS UBIGINT))) END)"
    }.mkString("[", ",\n      ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(ts) = 0 THEN CAST([] AS UBIGINT[])
       |         WHEN len(ts) < $shingleK THEN [${fnv64DuckSql("array_to_string(ts, ' ')")}]
       |         ELSE list_transform(range(1, len(ts) - ${shingleK - 2}),
       |                i -> ${fnv64DuckSql(s"array_to_string(ts[i:i+${shingleK - 1}], ' ')")})
       |    END) AS ss
       |  FROM toks
       |), xsets AS (
       |  SELECT doc_id, ss,
       |         list_transform(ss, h -> (h % 9223372036854775808) % $P) AS xs
       |  FROM sh
       |), sigs AS (
       |  SELECT doc_id, ss, $sigExprs AS sig FROM xsets
       |)""".stripMargin
  }

  /** Measured LSH band-plan comparison: for each candidate (bands b ×
    * rows r) geometry over the 128-perm signature, the THEORETICAL
    * similarity threshold τ ≈ (1/b)^(1/r) beside the MEASURED distinct
    * candidate-pair count that banding would emit on THIS corpus — the
    * parameter-planning pass a dedup pipeline runs before committing a
    * threshold (theory says where the S-curve sits; the measured count
    * says what the plan costs downstream). Signatures are computed once
    * and persisted; each plan is one banded self-join (b explode rows per
    * doc, never all-pairs) — the identical shape production banding uses,
    * so the planner's cost model IS the production plan's.
    */
  def lshPlan(df: DataFrame, idCol: String, textCol: String,
      plans: Seq[(Int, Int)], shingleK: Int = 3): DataFrame = {
    require(plans.nonEmpty &&
      plans.forall { case (b, r) => b > 0 && r > 0 && b * r <= NumPerms },
      s"each plan needs b·r ≤ $NumPerms")
    val spark = df.sparkSession
    import spark.implicits._
    val shSet = udf((s: String) => minhashShingleSet(s, shingleK))
    val sigOf = udf((ss: Seq[Long]) => signatureOfSet(ss))
    // persisted: every plan branch scans the SAME signature table (the
    // expensive tokenize+hash pass runs once, not once per plan); caller
    // (or Verify's clearCache) releases it after the action
    val sigs = df.select(col(idCol).as("id"),
        sigOf(shSet(col(textCol))).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE job for every plan: union the per-plan bandings tagged by plan
    // index, self-join keyed by (plan, band, hash), count per plan — not a
    // count() action per plan (4× the fixed job/shuffle overhead otherwise)
    val banded = plans.zipWithIndex.map { case ((b, r), i) =>
      val bandHash = udf((sig: Seq[Long], band: Int) => {
        var h = 0xcbf29ce484222325L
        var j = band * r
        val end = j + r
        while (j < end) { h ^= sig(j); h *= 0x100000001b3L; j += 1 }
        h
      })
      sigs
        .select(col("id"), col("sig"),
          explode(array((0 until b).map(lit): _*)).as("band"))
        .select(lit(i).as("pi"), col("id"), col("band"),
          bandHash(col("sig"), col("band")).as("bh"))
    }.reduce(_.unionByName(_))
    val counts = banded.as("x").join(banded.as("y"),
        col("x.pi") === col("y.pi") && col("x.band") === col("y.band") &&
          col("x.bh") === col("y.bh") && col("x.id") < col("y.id"))
      .select(col("x.pi").as("pi"), col("x.id").as("ia"), col("y.id").as("ib"))
      .distinct()
      .groupBy("pi").agg(count(lit(1)).as("cand_pairs"))
    val meta = plans.zipWithIndex.map { case ((b, r), i) =>
      val thr = BigDecimal(math.pow(1.0 / b, 1.0 / r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i, b.toLong, r.toLong, thr)
    }.toDF("pi", "b", "r", "est_threshold")
    meta.join(counts, Seq("pi"), "left")
      .select(col("b"), col("r"), col("est_threshold"),
        coalesce(col("cand_pairs"), lit(0L)).as("cand_pairs"))
      .orderBy("b", "r")
  }

  /** DuckDB replay of [[lshPlan]]: the shared sig CTEs, then one banding
    * CTE per plan with that plan's (b × r) slice geometry. The τ literal is
    * pre-rounded in Scala and injected into BOTH engines, so no cross-libm
    * pow() is compared.
    */
  def lshPlanDuckSql(plans: Seq[(Int, Int)], shingleK: Int = 3): String = {
    val per = plans.zipWithIndex.map { case ((b, r), i) =>
      val thr = BigDecimal(math.pow(1.0 / b, 1.0 / r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString
      s""", bands$i AS (
         |  SELECT doc_id, b,
         |    list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
         |      sig[$r * b + 1 : $r * b + $r]),
         |      (acc, s) -> CAST((CAST(xor(acc, s) AS HUGEINT) * 1099511628211)
         |                       % 18446744073709551616 AS UBIGINT)) AS bh
         |  FROM sigs, range(0, $b) t(b)
         |), plan$i AS (
         |  SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r,
         |         CAST($thr AS DOUBLE) AS est_threshold,
         |         (SELECT count(*) FROM (
         |            SELECT DISTINCT a.doc_id AS ia, bb.doc_id AS ib
         |            FROM bands$i a JOIN bands$i bb
         |              ON a.b = bb.b AND a.bh = bb.bh
         |             AND a.doc_id < bb.doc_id))::BIGINT AS cand_pairs
         |)""".stripMargin
    }
    minhashSigCtes(shingleK) + per.mkString +
      "\nSELECT * FROM (" +
      plans.indices.map(i => s"SELECT * FROM plan$i").mkString(" UNION ALL ") +
      ") ORDER BY b, r"
  }

  /** Pigeonhole-banded Hamming-≤maxHamming self-join over a (id, sh) frame:
    * (maxHamming+1) chunks of the `bits`-wide signature guarantee any
    * qualifying pair shares an exact chunk. Exact Hamming verify after.
    */
  private def hammingBandPairs(sim: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    val numChunks = maxHamming + 1
    val baseW = bits / numChunks
    val extra = bits % numChunks
    val bounds = (0 until numChunks).scanLeft(0)((acc, i) =>
      acc + baseW + (if (i < extra) 1 else 0))
    val chunked = sim.select(col("id"), col("sh"),
        explode(array((0 until numChunks).map { i =>
          val start = bounds(i)
          val w = bounds(i + 1) - start
          val mask = if (w == 64) -1L else (1L << w) - 1
          struct(lit(i).as("ci"),
            shiftrightunsigned(col("sh"), start).bitwiseAND(lit(mask)).as("cv"))
        }: _*)).as("c"))
      .select(col("id"), col("sh"), col("c.ci").as("ci"), col("c.cv").as("cv"))
    chunked.as("l").join(chunked.as("r"),
        col("l.ci") === col("r.ci") && col("l.cv") === col("r.cv") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .distinct()
      // built-in bit_count keeps the hot verify step inside codegen (a Scala
      // UDF here would break the whole-stage pipeline on every candidate)
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Oracle-checkable SimHash near-dup pairs: polySimhash signatures, banded
    * candidate join, exact Hamming verify.
    */
  def simhashPolyPairs(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 24, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15, s"maxHamming in [0,15], got $maxHamming")
    val sim = df.select(col(idCol).as("id"), polySimhash(col(textCol), bits).as("sh"))
    hammingBandPairs(sim, bits, maxHamming)
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Character n-gram set (as stable hashes). */
  def charNgrams(text: Column, n: Int = 3): Column =
    udf((s: String) => {
      if (s == null || s.length < n) Array.empty[Long]
      else {
        val norm = s.toLowerCase.replaceAll("\\s+", " ")
        val set = scala.collection.mutable.HashSet.empty[Long]
        var i = 0
        while (i + n <= norm.length) { set += TextAnalysis.fnv1a64(norm.substring(i, i + n)); i += 1 }
        set.toArray.sorted
      }
    }).apply(text)

  /** Distinct word-k-gram shingles hashed to int64 (FNV-1a). Hashing keeps
    * the inverted index, the join keys and the verify sets 8 bytes per
    * shingle instead of a ~25-byte string; at 64 bits a corpus needs ~2^32
    * distinct shingles before a collision is even likely, and a collision
    * only perturbs one set's cardinality by 1.
    */
  private[pipeline] def shingleHashSet(shingleK: Int) = udf((s: String) => {
    if (s == null) Array.empty[Long]
    else {
      val toks = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < shingleK) Array.empty[Long]
      else {
        val set = scala.collection.mutable.HashSet.empty[Long]
        toks.sliding(shingleK).foreach(w => set += TextAnalysis.fnv1a64(w.mkString(" ")))
        // ascending, so the verify step can merge-count instead of building
        // a hash set per candidate pair
        set.toArray.sorted
      }
    }
  })

  /** Exact-Jaccard verify of candidate pairs against the hashed-set table
    * (sets MUST hold ascending arrays — every producer in this file sorts).
    *
    * Small corpora (≤ ~200k docs): the sets collapse to ONE broadcast
    * id→array map and candidates stream through mapPartitions. A
    * broadcast-JOIN verify would instead copy both arrays into every
    * candidate row before the UDF sees them — on a dense-candidate corpus
    * (5M candidates × 2×2 KB sets) that is ~20 GB of row materialization
    * for data the executor already holds once in the broadcast. Past the
    * gate the plan falls back to the shuffle join, the right shape there
    * because huge corpora are candidate-sparse per document.
    *
    * Empty sets verify to jaccard 0 (vacuous documents never pair — the
    * minhash pipelines' convention, unreachable from the shingle/ngram
    * pipelines whose candidates always share a gram).
    */
  private def verifiedPairs(cand: DataFrame, sets: DataFrame,
      threshold: Double, outA: String, outB: String): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    val idIsLong = sets.schema("id").dataType ==
      org.apache.spark.sql.types.LongType
    // gate on Catalyst's size-in-bytes estimate, not a row count: per-doc
    // set size is unbounded (∝ document length), so 200k of LONG documents
    // could be gigabytes of driver/executor heap; the byte estimate is also
    // free (plan stats) where the count() was an extra job
    val bcBytesCap = BigInt(spark.conf
      .getOption("spark.graft.dedup.broadcastBytes").map(_.toLong)
      .getOrElse(64L << 20))
    val setsBytes = sets.queryExecution.optimizedPlan.stats.sizeInBytes
    if (idIsLong && setsBytes <= bcBytesCap) {
      val m = sets.select(col("id"), col("ss")).as[(Long, Array[Long])]
        .collect().toMap
      val bc = spark.sparkContext.broadcast(m)
      cand.select(col(outA).cast("long"), col(outB).cast("long"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          val mm = bc.value
          it.flatMap { case (x, y) =>
            val sa = mm.getOrElse(x, Array.empty[Long])
            val sb = mm.getOrElse(y, Array.empty[Long])
            val j = if (sa.isEmpty || sb.isEmpty) 0.0 else mergeJaccard(sa, sb)
            if (j >= threshold) Some((x, y, j)) else None
          }
        }.toDF(outA, outB, "jaccard")
    } else {
      val a = sets.select(col("id").as(outA), col("ss").as("ss_a"))
      val b = sets.select(col("id").as(outB), col("ss").as("ss_b"))
      val jac = udf((p: Array[Long], q: Array[Long]) =>
        if (p.isEmpty || q.isEmpty) 0.0 else mergeJaccard(p, q))
      cand.join(a, outA).join(b, outB)
        .withColumn("jaccard", jac(col("ss_a"), col("ss_b")))
        .filter(col("jaccard") >= threshold)
        .select(outA, outB, "jaccard")
    }
  }

  /** Exact Jaccard over two ASCENDING hash arrays: single merge pass, no
    * per-pair allocation — the verify step runs once per candidate, so this
    * is the hot loop of both shingle pipelines.
    */
  private def mergeJaccard(a: Array[Long], b: Array[Long]): Double = {
    val inter = mergeInter(a, b)
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** |A∩B| of two ASCENDING hash arrays by a single merge pass. */
  private def mergeInter(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Set-CONTAINMENT near-dup pairs: directed C(A→B) = |A∩B| / |A| ≥ t —
    * the asymmetric metric that catches a document (mostly) CONTAINED in a
    * larger one (quotes, boilerplate-wrapped copies, expanded pages), which
    * every symmetric Jaccard pipeline is structurally blind to
    * (J(A,B) ≤ |A|/|B| → a small doc inside a big one never crosses a
    * Jaccard threshold).
    *
    * Prefix filter under containment semantics (Chaudhuri et al., ICDE'06):
    * order A's shingles by ascending global df (ties by hash); C ≥ t forces
    * |A∩B| ≥ ⌈t·|A|⌉, so if B misses all of A's first |A| − ⌈t|A|⌉ + 1
    * shingles, B covers at most ⌈t|A|⌉ − 1 of A — recall is GUARANTEED.
    * Only the probe (contained) side is prefix-trimmed; the build side
    * indexes every shingle, because containment admits no length filter on
    * B. Candidates verify by exact merge-count containment.
    *
    * Scale shape: shuffles carry (long, long) keys; the candidate join is
    * prefix(≈(1−t)·|S| rows/doc, biased to RARE shingles) × full inverted
    * index (|S| rows/doc) — linear in corpus unless the true containment
    * pair count isn't. At t = 0.9 the probe prefix is ~10% of each set.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleK: Int = 4): DataFrame = {
    require(threshold > 0, "threshold must be > 0 for prefix-filter recall")
    val sets = df.select(col(idCol).as("id"),
        shingleHashSet(shingleK)(col(textCol)).as("ss"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inv = sets.select(col("id"), size(col("ss")).as("n_sh"),
      explode(col("ss")).as("s"))
    val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val ordered = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("s"))
    val prefix = inv.join(dfreq, "s")
      .withColumn("rn", row_number().over(ordered))
      .filter(col("rn") <= col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1)
      .select(col("id").as("id_a"), col("s"))
    val all = inv.select(col("id").as("id_b"), col("s"))
    val cand = prefix.join(all, "s")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val contUdf = udf((p: Array[Long], q: Array[Long]) =>
      if (p == null || p.isEmpty || q == null || q.isEmpty) 0.0
      else mergeInter(p, q).toDouble / p.length)
    cand
      .join(sets.select(col("id").as("id_a"), col("ss").as("ss_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("ss").as("ss_b")), "id_b")
      .withColumn("containment", contUdf(col("ss_a"), col("ss_b")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** Exact word-k-gram Jaccard pairs with GUARANTEED recall for any
    * threshold > 0, via PREFIX FILTERING (Chaudhuri et al., ICDE'06 /
    * Bayardo et al., WWW'07): order every document's shingles by ascending
    * global document frequency (ties by hash) and index only the first
    * `|S| - ceil(t·|S|) + 1` of them. Any pair with Jaccard ≥ t must share a
    * prefix shingle (J ≥ t ⟹ |A∩B| ≥ t·|A|; if B misses all of A's prefix it
    * can cover at most |A| - prefixLen(A) = ceil(t·|A|) - 1 of A), so recall
    * is exact, while a stop-phrase shingle shared by f documents sorts LAST
    * in the frequency order and almost never lands in a prefix — the Σf²
    * blow-up of a plain shared-shingle join on a skewed corpus disappears.
    * Candidates are verified with exact set Jaccard over the int64-hashed
    * sets. Deterministic and SQL-expressible, so DuckDB can oracle-check the
    * output (the oracle needs no prefix logic: the final pair set is
    * identical to the plain shared-shingle plan's).
    */
  def shingleJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleK: Int = 4): DataFrame = {
    // the hashed sets feed three consumers (inverted index + both verify
    // joins); caching computes the tokenize/hash UDF once per row instead of
    // three times. MEMORY_AND_DISK: sets are ~8 bytes/shingle, a fraction of
    // the input text, and spill cleanly at corpus scale.
    val sets = df.select(col(idCol).as("id"), shingleHashSet(shingleK)(col(textCol)).as("ss"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = shingleJaccardCandidates(sets, threshold)
    verifiedPairs(cand, sets, threshold, "id_a", "id_b")
  }

  /** Prefix-filtered candidate pairs over an (id, ss: array<long>) frame —
    * exposed for the skew ScaleSpec test. Shuffles carry (long, long) keys
    * only: df count on the shingle hash, one window on id, self-join on the
    * prefix shingle hash. The join also applies PPJoin's LENGTH filter:
    * J ≥ t ⟹ |A∩B| ≥ t·max(|A|,|B|) and |A∩B| ≤ min(|A|,|B|), so
    * min ≥ t·max — a pair of very different set sizes can never qualify.
    * On corpora where rare-shingle collisions are still dense (e.g. char
    * grams over same-language text) this is the filter that keeps the
    * candidate count near the true pair count.
    */
  private[graft] def shingleJaccardCandidates(sets: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be > 0 for prefix-filter recall to hold")
    // set size rides along with the explode — no second window pass for it
    val inv = sets.select(col("id"), size(col("ss")).as("n_sh"), explode(col("ss")).as("s"))
    val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val ordered = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("s"))
    val prefix = inv.join(dfreq, "s")
      .withColumn("rn", row_number().over(ordered))
      .filter(col("rn") <= col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1)
      .select(col("id"), col("n_sh"), col("rn"), col("s"))
    // PPJoin positional filter (sound): J ≥ t ⟺ |A∩B| ≥ ⌈t/(1+t)·(|A|+|B|)⌉,
    // and a match on A's i-th / B's j-th ordered token bounds the overlap by
    // 1 + min(|A|−i, |B|−j). For the FIRST common token in the global order
    // that bound holds with |A∩B| on the left, so a qualifying pair always
    // keeps at least one matching row (the 1e-9 guards fp ceil round-up)
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("l.n_sh") + col("r.n_sh")) - lit(1e-9))
    prefix.as("l").join(prefix.as("r"),
        col("l.s") === col("r.s") && col("l.id") < col("r.id") &&
        least(col("l.n_sh"), col("r.n_sh")) >=
          ceil(lit(threshold) * greatest(col("l.n_sh"), col("r.n_sh"))) &&
        lit(1) + least(col("l.n_sh") - col("l.rn"), col("r.n_sh") - col("r.rn")) >= alpha)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  // --------------------------------------- partition-based candidates

  /** Geometric size ladder B(0)=1, B(k+1)=⌊B(k)/t⌋+1 — integer boundaries,
    * so group assignment has no floating-point edge cases. Key property
    * (used in the recall proof below): nb ≤ na/t ⟹ group(nb) ≤ group(na)+1,
    * because nb ≤ na/t < B(g+1)/t < B(g+2) whenever na < B(g+1).
    */
  private def sizeLadder(t: Double): Array[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer(1L)
    while (buf.last < (1L << 40)) buf += (buf.last / t).toLong + 1
    buf.toArray
  }

  /** Candidate pairs for set-Jaccard ≥ t via PARTITION-BASED pigeonholing
    * (Deng et al., VLDB'15): split each document's hashed gram set into P
    * buckets by `gram mod P`; a pair can qualify only if some bucket's
    * content is IDENTICAL on both sides, so the join key is the bucket's
    * content hash rather than a single shared gram. This is the high-
    * threshold complement to [[shingleJaccardCandidates]]: prefix filtering
    * degenerates to ~all-pairs on corpora where every document shares its
    * rare grams (e.g. char n-grams over one vocabulary), while an identical-
    * bucket match stays rare unless the pair really is a near-duplicate.
    *
    * RECALL PROOF. For J(A,B) ≥ t with |A| ≤ |B|: |AΔB| = u−i and i ≥ t·u
    * give |AΔB| ≤ (1−t)/(1+t)·(|A|+|B|). Documents are grouped on the
    * integer ladder g(n) = max{k : B(k) ≤ n}; each doc is indexed in its
    * own group and as a guest in g−1. Since |B| ≤ |A|/t forces
    * g(B) ≤ g(A)+1, the pair always co-occurs in group g = g(A) with at
    * least one home copy. Every size in group g's join is < B(g+2), so
    * |AΔB| < (1−t)/(1+t)·2·B(g+2) ≤ P(g) − 1 (P has +2 slack to absorb the
    * float product). With fewer than P differing grams across P buckets,
    * some bucket holds none of them — identical content, equal content
    * hash — so the pair survives the join. Hash collisions only ever ADD
    * candidates; the exact verify removes them.
    *
    * Scale shape: ~0.5·|S| index rows per document ((home+guest) × P sigs,
    * P ≈ 0.26·|S| at t=0.9), a self-join on the compact
    * (group, bucket, contentHash) key, and the same length filter as the
    * prefix path. No term is quadratic in corpus size unless the TRUE
    * near-dup pair count is.
    */
  private[graft] def partitionBucketCandidates(sets: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0.5 && threshold < 1.0,
      "partition candidates need 0.5 < t < 1 (pigeonhole width explodes below)")
    val ladder = sizeLadder(threshold)
    val c = (1 - threshold) / (1 + threshold)
    def groupOf(n: Int): Int = {
      var lo = 0; var hi = ladder.length - 1
      while (lo < hi) { // last k with B(k) <= n
        val mid = (lo + hi + 1) >>> 1
        if (ladder(mid) <= n) lo = mid else hi = mid - 1
      }
      lo
    }
    def pFor(grp: Int): Int =
      (math.floor(c * 2 * ladder(math.min(grp + 2, ladder.length - 1))) + 2)
        .toInt
    // per (doc, group): one FNV content hash per bucket; empty buckets keep
    // the FNV basis, so "both docs lack bucket b" is itself an identical
    // bucket — required, since the pigeonhole witness may be empty-empty
    val sigs = udf((ss: Seq[Long], grp: Int) => {
      val p = pFor(grp)
      val sig = Array.fill(p)(0xcbf29ce484222325L)
      ss.foreach { s => // ss ascending ⇒ per-bucket fold order deterministic
        val b = (((s % p) + p) % p).toInt
        var h = sig(b)
        var i = 0
        var v = s
        while (i < 8) { h ^= (v & 0xff); h *= 0x100000001b3L; v >>>= 8; i += 1 }
        sig(b) = h
      }
      sig.zipWithIndex.map { case (h, b) => (b, h) }
    })
    val grpOf = udf((n: Int) => groupOf(n))
    val base = sets.filter(size(col("ss")) > 0)
      .select(col("id"), size(col("ss")).as("n_sh"), col("ss"))
      .withColumn("g", grpOf(col("n_sh")))
    val homes = base.select(col("id"), col("n_sh"), col("ss"),
      col("g").as("grp"), lit(true).as("home"))
    val guests = base.filter(col("g") > 0).select(col("id"), col("n_sh"),
      col("ss"), (col("g") - 1).as("grp"), lit(false).as("home"))
    val idx = homes.unionByName(guests)
      .select(col("id"), col("n_sh"), col("grp"), col("home"),
        explode(sigs(col("ss"), col("grp"))).as("bs"))
      .select(col("id"), col("n_sh"), col("grp"), col("home"),
        col("bs._1").as("b"), col("bs._2").as("bh"))
    // home∨home or home∨guest meet every qualifying pair (see proof);
    // guest∧guest rows would only duplicate the home∧home match in g−1
    idx.as("l").join(idx.as("r"),
        col("l.grp") === col("r.grp") && col("l.b") === col("r.b") &&
        col("l.bh") === col("r.bh") && col("l.id") < col("r.id") &&
        (col("l.home") || col("r.home")) &&
        least(col("l.n_sh"), col("r.n_sh")) >=
          ceil(lit(threshold) * greatest(col("l.n_sh"), col("r.n_sh"))))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Threshold-adaptive candidate stage: partition-based pigeonholing once
    * t is high enough for its bucket width to be selective, df-ordered
    * prefix filtering below. Both have exact recall; the output pair set is
    * identical either way.
    */
  private def candidatesFor(sets: DataFrame, threshold: Double): DataFrame =
    if (threshold >= 0.6) partitionBucketCandidates(sets, threshold)
    else shingleJaccardCandidates(sets, threshold)

  /** Character-n-gram Jaccard pairs with GUARANTEED recall: candidates from
    * the threshold-adaptive exact stage ([[partitionBucketCandidates]] at
    * high t — prefix filtering collapses to ~all-pairs on char grams over a
    * shared vocabulary — else [[shingleJaccardCandidates]]); exact
    * set-Jaccard verify on candidates. Documents shorter than n characters
    * have an empty gram set and never pair.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, n: Int = 3): DataFrame = {
    require(threshold > 0, "threshold must be > 0 for candidate recall to hold")
    val grams = df.select(col(idCol).as("id"), charNgrams(col(textCol), n).as("ss"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = candidatesFor(grams, threshold)
    // candidates always share a gram, so both sets are non-empty here and
    // the empty/empty convention difference vs word shingles cannot surface
    verifiedPairs(cand, grams, threshold, "id_a", "id_b")
  }

  /** EXACT shared-substring pairs: documents sharing any verbatim substring
    * of ≥ `minLen` characters, with the count of distinct shared
    * `minLen`-grams per pair (the contamination / boilerplate-detection
    * operator of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"). Two documents share a substring of length ≥ L iff
    * they share an aligned L-gram, so the all-positions L-gram equi-join is
    * exact — no hashing, no probabilistic recall.
    *
    * Plan: filter → explode positions (`sequence`) → `substr` → per-doc
    * distinct → self-join on the raw gram → count. Every step is a codegen
    * built-in; the join shuffles on the L-byte gram key. At 100 TB the
    * documented production variant fingerprints first — robust winnowing
    * (window w = L − gram + 1) guarantees any ≥L-char match shares a
    * winnowed fingerprint, shrinking the exploded volume by ~w× before an
    * identical exact verify; the all-positions form here IS the verify
    * kernel of that plan.
    */
  def sharedSubstringPairs(df: DataFrame, idCol: String, textCol: String,
      minLen: Int): DataFrame = {
    // Round-10 note: a two-phase variant (xxhash64(gram) candidate
    // self-join + exact-gram verify restricted to candidate docs — the
    // §2.3/§3.2 shape) was implemented and measured at sf0.1: 5.90 →
    // 6.58 s min-of-3, a regression — at this scale the cost is the
    // all-positions explode+distinct (CPU), not the join key width, and
    // the extra verify pass never pays for itself. Reverted; the cheap
    // scale path for this contract is [[winnowedSubstringPairs]], which
    // already ships the candidate-then-verify plan (~25× cheaper).
    val grams = df.filter(length(col(textCol)) >= minLen)
      .select(col(idCol).as("id"),
        col(textCol).as("t"),
        explode(sequence(lit(1), length(col(textCol)) - lit(minLen - 1))).as("i"))
      .select(col("id"), col("t").substr(col("i"), lit(minLen)).as("gram"))
      .distinct()
    grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("id_a", "id_b")
  }

  /** The 100 TB path for [[sharedSubstringPairs]] — IDENTICAL output,
    * ~(minLen−gram)× less exploded volume. Robust winnowing (Schleimer,
    * Wilkerson & Aiken, SIGMOD'03): hash every `gram`-char window
    * (polynomial mod 1e9+7), keep the MINIMUM hash of every sliding window
    * of w = minLen − gram + 1 consecutive gram hashes. Any two documents
    * sharing a verbatim run of ≥ minLen chars share a full hash window, and
    * the window's minimum VALUE is equal on both sides — so the fingerprint
    * equi-join has guaranteed recall. Candidates are then verified exactly
    * (distinct shared minLen-gram count, same join as the all-positions
    * plan but restricted to candidate pairs), which also clears the rare
    * polynomial-hash collision. Fingerprinting is one O(n·gram) compiled
    * pass per document (monotonic-deque sliding min), emitting ~n/w
    * distinct fingerprints instead of n grams.
    *
    * Gram-size rule: recall is guaranteed for ANY gram < minLen, but
    * SELECTIVITY is the gram's job — on a small-vocabulary corpus an
    * 8-char gram recurs across most documents and its window minima become
    * corpus-wide shared fingerprints, exploding the candidate pair set
    * quadratically (measured: 277 s vs 7 s for the all-positions plan at
    * sf0.1). Default gram = 3/4·minLen keeps fingerprints as-rare-as
    * near-full-length runs while still winnowing ~4× of the volume.
    */
  def winnowedSubstringPairs(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, gram: Int = -1): DataFrame = {
    val g = if (gram > 0) gram else math.max(2, minLen * 3 / 4)
    require(g >= 2 && g < minLen, "need 2 <= gram < minLen")
    val w = minLen - g + 1
    val fpUdf = udf((s: String) => {
      if (s == null || s.length < minLen) Array.empty[Long]
      else {
        val n = s.length - g + 1
        val hs = new Array[Long](n)
        var i = 0
        while (i < n) {
          // full-width 64-bit polynomial, NOT mod 1e9+7: at 100× corpus
          // scale the 10⁹ hash space produced ~N²/10⁹ birthday-collision
          // candidate pairs (measured super-linear verify growth on the
          // rung ladder); 2⁶⁴ pushes the same term below one pair. The
          // oracle is the n² shared-gram definition, so fingerprint VALUES
          // are free to change — recall, not hashing, is the contract.
          var h = 7L
          var j = i
          while (j < i + g) { h = h * 31 + s.charAt(j); j += 1 }
          hs(i) = h
          i += 1
        }
        val deque = new java.util.ArrayDeque[Int]()
        val out = scala.collection.mutable.HashSet.empty[Long]
        var k = 0
        while (k < n) {
          while (!deque.isEmpty && hs(deque.peekLast()) >= hs(k)) deque.pollLast()
          deque.addLast(k)
          if (deque.peekFirst() <= k - w) deque.pollFirst()
          if (k >= w - 1) out += hs(deque.peekFirst())
          k += 1
        }
        out.toArray.sorted
      }
    })
    val eligible = df.filter(length(col(textCol)) >= minLen)
    // size the fingerprint self-join exchange ∝ corpus chars (the round-7
    // INIT_PARTS lever in the plan; ReuseExchange shares the one shuffle
    // between both self-join sides) — small corpora keep the default plan
    val chars = eligible.agg(coalesce(sum(length(col(textCol))), lit(0L)))
      .head().getLong(0)
    val n = Autosize.parts(df, chars, Autosize.CharsPerPart)
    val fps = Autosize.keyed(
      eligible.select(col(idCol).as("id"), explode(fpUdf(col(textCol))).as("fp")),
      n, col("fp"))
    val cand = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the exact verify only needs grams of documents that appear in a
    // candidate pair — semi-join the corpus down FIRST, so verify cost
    // follows the candidate volume, never the corpus volume
    val candIds = cand.select(col("id_a").as("id"))
      .union(cand.select(col("id_b").as("id"))).distinct()
    val grams = df.filter(length(col(textCol)) >= minLen)
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .join(candIds, Seq("id"), "left_semi")
      .select(col("id"), col("t"),
        explode(sequence(lit(1), length(col("t")) - lit(minLen - 1))).as("i"))
      .select(col("id"), col("t").substr(col("i"), lit(minLen)).as("gram"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cand.join(grams.as("ga"), col("id_a") === col("ga.id"))
      .join(grams.as("gb"),
        col("id_b") === col("gb.id") && col("ga.gram") === col("gb.gram"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("id_a", "id_b")
  }

  /** DuckDB replay of [[sharedSubstringPairs]] over `textExpr` (so callers
    * can inject query-side text transforms identically on both engines).
    * Also the oracle of [[winnowedSubstringPairs]], whose output is
    * identical by the winnowing recall guarantee + exact verify.
    */
  def sharedSubstringDuckSql(textExpr: String, minLen: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id, $textExpr AS t FROM documents
       |), g AS (
       |  SELECT DISTINCT doc_id AS id, substr(t, i, $minLen) AS gram
       |  FROM (SELECT doc_id, t, unnest(range(1, length(t) - ${minLen - 2})) AS i
       |        FROM d WHERE length(t) >= $minLen)
       |)
       |SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
       |FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ===================================== edit-distance verified blocking

  /** Blocking + edit-distance verification — the classic entity-resolution
    * two-phase shape (Christen, TKDE'12 survey): candidates are pairs
    * sharing a `prefixLen`-char blocking key (one string-key shuffle, never
    * all-pairs), then each candidate is verified with full Levenshtein and
    * scored sim = 1 − ed/max(|a|,|b|). Complements the set-similarity
    * dedup family with the character-level metric tools like onion/cc_net
    * use for template detection.
    *
    * Levenshtein is codegen'd in Spark (built-in expression) and exact in
    * both engines; lengths/distances are integers, the one division is the
    * score. Scale shape: the blocking join keys on the prefix, the O(n·m)
    * verify runs only inside blocks — the standard 100 TB blocking plan.
    * Caveat (inherent to blocking ER): work is quadratic WITHIN a block, so
    * a skewed key (a boilerplate prefix shared by millions of docs) blows
    * up; production keys must be selective (longer prefixes, or a minhash
    * band as the block key — both drop-in here), and a block-size cap with
    * overflow routed to the set-similarity path is the standard guard.
    */
  def editVerifiedPairs(df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 32): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(textCol).as("ta"),
      substring(col(textCol), 1, prefixLen).as("k"))
    val b = df.select(col(idCol).as("id_b"), col(textCol).as("tb"),
      substring(col(textCol), 1, prefixLen).as("k"))
    a.join(b, "k").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("ed"),
        round(lit(1.0) - levenshtein(col("ta"), col("tb")).cast("double") /
          greatest(length(col("ta")), length(col("tb"))).cast("double"), 6)
          .as("sim"))
      .orderBy("id_a", "id_b")
  }

  /** BLEU-2 over blocking candidate pairs (Papineni ACL'02): clipped
    * unigram/bigram precision of the higher-id document against the
    * lower-id reference, brevity penalty exp(1 − |ref|/|cand|) when the
    * candidate is shorter — the MT-grade overlap score beside Levenshtein
    * ([[editVerifiedPairs]]) and set Jaccard, used in pipelines to grade
    * paraphrase/near-dup pairs by n-gram fidelity.
    *
    * Clipped matches Σ min(cntᵣ(g), cnt_c(g)) and all totals are exact
    * integers (totals are token arithmetic — |c| and |c|−1 — never a gram
    * materialization); p₁/p₂/BP/BLEU are fixed trees over them. Scale
    * shape: one (id, n, gram) count table, gram-keyed joins restricted to
    * blocked pairs, never all-pairs. Same blocking-skew caveat as
    * [[editVerifiedPairs]]: pair volume is quadratic within a block.
    */
  def bleuPairs(df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 32): DataFrame = {
    val toksC = filter(split(lower(col("t")), "\\s+"), x => x =!= "")
    val base = df.select(col(idCol).as("id"), col(textCol).as("t"),
        substring(col(textCol), 1, prefixLen).as("k"))
      .withColumn("ts", toksC).withColumn("len", size(col("ts")))
    val pairs = base.select(col("id").as("id_a"), col("k"))
      .join(base.select(col("id").as("id_b"), col("k")), "k")
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    def grams(n: Int): Column =
      when(col("len") >= n, transform(sequence(lit(0), col("len") - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("ts"), i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    val gcnt = base.select(col("id"), explode(array(
        struct(lit(1).as("n"), grams(1).as("g")),
        struct(lit(2).as("n"), grams(2).as("g")))).as("x"))
      .select(col("id"), col("x.n").as("n"), explode(col("x.g")).as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as("c"))
    val ga = gcnt.select(col("id").as("id_a"), col("n"), col("g"), col("c").as("ca"))
    val gb = gcnt.select(col("id").as("idb2"), col("n").as("nb"),
      col("g").as("gb2"), col("c").as("cb"))
    val matched = pairs.join(ga, "id_a")
      .join(gb, col("id_b") === col("idb2") && col("n") === col("nb") &&
        col("g") === col("gb2"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(when(col("n") === 1, least(col("ca"), col("cb")))
          .otherwise(0L)).as("m1"),
        sum(when(col("n") === 2, least(col("ca"), col("cb")))
          .otherwise(0L)).as("m2"))
    val lens = base.select(col("id"), col("len").cast("long").as("len"))
    val out = pairs
      .join(matched, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("m1", "m2"))
      .join(lens.select(col("id").as("id_a"), col("len").as("la")), "id_a")
      .join(lens.select(col("id").as("id_b"), col("len").as("lb")), "id_b")
      .filter(col("lb") >= 2 && col("la") >= 2)
      .withColumn("p1", col("m1").cast("double") / col("lb").cast("double"))
      .withColumn("p2",
        col("m2").cast("double") / (col("lb") - 1).cast("double"))
      .withColumn("bp", when(col("lb") >= col("la"), lit(1.0))
        .otherwise(exp(lit(1.0) -
          col("la").cast("double") / col("lb").cast("double"))))
    out.select(col("id_a"), col("id_b"), col("m1"), col("m2"),
        round(col("p1"), 6).as("p1"), round(col("p2"), 6).as("p2"),
        round(when(col("m1") > 0 && col("m2") > 0,
          col("bp") * exp((log(col("p1")) + log(col("p2"))) / 2))
          .otherwise(0.0), 6).as("bleu2"))
      .orderBy("id_a", "id_b")
  }

  /** DuckDB replay of [[bleuPairs]]: identical gram counts, identical
    * clipped-min matches, identical p/BP/BLEU trees.
    */
  def bleuPairsDuckSql(prefixLen: Int = 32): String =
    s"""WITH base AS (
       |  SELECT doc_id AS id, substring(text, 1, $prefixLen) AS k,
       |         list_filter(string_split_regex(lower(text), '\\s+'),
       |                     t -> t <> '') AS ts
       |  FROM documents
       |), bl AS (
       |  SELECT id, k, ts, len(ts) AS l FROM base
       |), pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM bl a JOIN bl b ON a.k = b.k AND a.id < b.id
       |), g AS (
       |  SELECT id, n,
       |         unnest(CASE WHEN l >= n
       |           THEN list_transform(range(0, l - n + 1),
       |                i -> array_to_string(list_slice(ts, i + 1, i + n), ' '))
       |           ELSE [] END) AS g
       |  FROM bl, (VALUES (1), (2)) t(n)
       |), gc AS (
       |  SELECT id, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3
       |), matched AS (
       |  SELECT p.id_a, p.id_b,
       |         sum(CASE WHEN ga.n = 1 THEN least(ga.c, gb.c) ELSE 0 END) AS m1,
       |         sum(CASE WHEN ga.n = 2 THEN least(ga.c, gb.c) ELSE 0 END) AS m2
       |  FROM pairs p
       |  JOIN gc ga ON ga.id = p.id_a
       |  JOIN gc gb ON gb.id = p.id_b AND gb.n = ga.n AND gb.g = ga.g
       |  GROUP BY 1, 2
       |), lens AS (
       |  SELECT id, CAST(l AS BIGINT) AS l FROM bl
       |), o AS (
       |  SELECT p.id_a, p.id_b,
       |         coalesce(m.m1, 0) AS m1, coalesce(m.m2, 0) AS m2,
       |         la.l AS la, lb.l AS lb
       |  FROM pairs p
       |  LEFT JOIN matched m ON m.id_a = p.id_a AND m.id_b = p.id_b
       |  JOIN lens la ON la.id = p.id_a
       |  JOIN lens lb ON lb.id = p.id_b
       |  WHERE lb.l >= 2 AND la.l >= 2
       |), f AS (
       |  SELECT id_a, id_b, m1, m2,
       |         CAST(m1 AS DOUBLE) / CAST(lb AS DOUBLE) AS p1,
       |         CAST(m2 AS DOUBLE) / CAST(lb - 1 AS DOUBLE) AS p2,
       |         CASE WHEN lb >= la THEN 1.0
       |              ELSE exp(1.0 - CAST(la AS DOUBLE) / CAST(lb AS DOUBLE))
       |         END AS bp
       |  FROM o
       |)
       |SELECT id_a, id_b, CAST(m1 AS BIGINT) AS m1, CAST(m2 AS BIGINT) AS m2,
       |       round(p1, 6) AS p1, round(p2, 6) AS p2,
       |       round(CASE WHEN m1 > 0 AND m2 > 0
       |                  THEN bp * exp((ln(p1) + ln(p2)) / 2)
       |                  ELSE 0.0 END, 6) AS bleu2
       |FROM f ORDER BY 1, 2""".stripMargin

  /** DuckDB replay of [[editVerifiedPairs]]. */
  def editVerifiedDuckSql(prefixLen: Int = 32): String =
    s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS ed,
       |       round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
       |             / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE),
       |             6) AS sim
       |FROM documents a JOIN documents b
       |  ON substring(a.text, 1, $prefixLen) = substring(b.text, 1, $prefixLen)
       | AND a.doc_id < b.doc_id
       |ORDER BY 1, 2""".stripMargin
}
