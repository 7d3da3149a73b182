package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-governance operators for a large-scale training-data pipeline:
  * benchmark decontamination, repetition-quality signals, BM25 retrieval,
  * PII detection/redaction, and reproducible stratified sampling.
  *
  * Every operator here is deterministic and has an exact DuckDB-SQL replay
  * (the *DuckSql generators below), so the driver's correctness gate can
  * hash-match them end-to-end. Plan shapes are chosen for the 100 TB case:
  * the only shuffles are on compact keys ((id, token) or an 8-byte shingle
  * hash), eval/benchmark sides are broadcast, and per-document array work is
  * linear in document length.
  */
object Corpus {

  private def toks(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  private val toksDuck =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"""

  // ===================================================== text normalization

  /** Unicode NFC canonical composition (java.text.Normalizer — the exact
    * operator a crawl-cleaning pipeline runs first; combining sequences like
    * `e`+U+0301 become the composed code point). A UDF by necessity: Spark
    * has no native NFC expression. Per-row, allocation-light, and
    * embarrassingly parallel — no shuffle, no state, safe at any corpus
    * size.
    */
  val nfcUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** Crawl-text cleanup: NFC-compose, strip C0 controls (tab/CR/LF
    * included) and zero-width space, collapse space runs, trim. Mirrors
    * [[normalizeTextDuckSql]] character-for-character so the two engines
    * hash-match on the cleaned string.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfcUdf(text), "[\\x00-\\x1f\\u200B]", ""),
      " +", " "))

  /** DuckDB replay of [[normalizeText]] over a text expression. */
  def normalizeTextDuckSql(expr: String): String =
    s"trim(regexp_replace(regexp_replace(nfc_normalize($expr), " +
      s"'[\\x00-\\x1f\\x{200B}]', '', 'g'), ' +', ' ', 'g'))"

  // ===================================================== decontamination

  /** Per-document benchmark contamination report: for each training document
    * sharing at least one word k-gram with the eval corpus, the number of
    * distinct shared k-grams and the number of distinct eval documents hit.
    *
    * Plan: both sides hash their k-grams to int64 (FNV-1a — 8-byte join
    * keys); the eval side (benchmark suites are small by construction) is
    * broadcast, so the training corpus streams map-side with no shuffle
    * until the final per-document aggregate on (id, hash).
    */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 3): DataFrame = {
    val grams = Dedup.shingleHashSet(k)
    val evalIdx = eval
      .select(col(idCol).as("eval_id"), explode(grams(col(textCol))).as("s"))
    val trainIdx = train
      .select(col(idCol).as("id"), explode(grams(col(textCol))).as("s"))
    trainIdx.join(broadcast(evalIdx), "s")
      .groupBy(col("id"))
      .agg(countDistinct(col("s")).as("n_overlap"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** The decontaminated corpus: training rows with NO k-gram overlap. */
  def decontaminatedCorpus(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 3): DataFrame = {
    val flagged = decontaminate(train, eval, idCol, textCol, k)
      .select(col("id").as(idCol))
    train.join(broadcast(flagged), Seq(idCol), "left_anti")
  }

  /** DuckDB replay of [[decontaminate]] over `documents` split by the two
    * doc_id predicates (train side / eval side).
    */
  def decontaminateDuckSql(trainPred: String, evalPred: String, k: Int): String = {
    val g = Dedup.fnv64DuckSql(s"array_to_string(ts[i:i+${k - 1}], ' ')")
    s"""WITH tk AS (
       |  SELECT doc_id, $toksDuck AS ts FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(ts) < $k THEN CAST([] AS UBIGINT[])
       |              ELSE list_distinct(list_transform(range(1, len(ts) - ${k - 2}), i -> $g))
       |         END AS ss
       |  FROM tk
       |), ev AS (
       |  SELECT doc_id AS eval_id, unnest(ss) AS s FROM sh WHERE $evalPred
       |), tr AS (
       |  SELECT doc_id AS id, unnest(ss) AS s FROM sh WHERE $trainPred
       |)
       |SELECT tr.id, count(DISTINCT tr.s) AS n_overlap,
       |       count(DISTINCT ev.eval_id) AS n_eval_docs
       |FROM tr JOIN ev ON tr.s = ev.s
       |GROUP BY tr.id ORDER BY tr.id""".stripMargin
  }

  // ================================================= repetition signals

  /** Gopher-style repetition-quality signals per document: token count,
    * distinct-token ratio, most-frequent-token fraction, and the fraction of
    * word 3-gram occurrences that are repeats. High top-token / dup-gram
    * fractions flag boilerplate and degenerate machine text.
    *
    * Plan: one (id, token) shuffle with map-side combine for the token
    * histogram (the aggregate state per document is its distinct-token set —
    * bounded by vocabulary, not document length); the 3-gram stats are pure
    * per-row array expressions (no shuffle). Zero-token documents survive
    * with all-zero ratios via the left join from the base table.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val k = 3
    val ts = toks(col(textCol))
    val grams = when(size(ts) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ts) - k),
        i => array_join(slice(ts, i + 1, lit(k)), " ")))
    val base = df.select(col(idCol).as("id"),
      size(grams).as("n_grams"),
      size(array_distinct(grams)).as("nd_grams"))
    val hist = df.select(col(idCol).as("id"), explode(ts).as("t"))
      .groupBy(col("id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("nd_tokens"),
        max(col("c")).as("top_c"))
    base.join(hist, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("nd_tokens") / col("n_tokens"), lit(0.0)), 6).as("distinct_ratio"),
        round(coalesce(col("top_c") / col("n_tokens"), lit(0.0)), 6).as("top_token_frac"),
        round(when(col("n_grams") > 0,
          lit(1.0) - col("nd_grams") / col("n_grams")).otherwise(lit(0.0)), 6)
          .as("dup_gram_frac"))
  }

  def repetitionDuckSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id AS id, $toksDuck AS ts FROM documents
       |), gr AS (
       |  SELECT id,
       |         CASE WHEN len(ts) < 3 THEN CAST([] AS VARCHAR[])
       |              ELSE list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' '))
       |         END AS gs
       |  FROM tk
       |), t AS (
       |  SELECT id, unnest(ts) AS t FROM tk
       |), ht AS (
       |  SELECT id, t, count(*) AS c FROM t GROUP BY 1, 2
       |), hist AS (
       |  SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS nd_tokens,
       |         max(c) AS top_c
       |  FROM ht GROUP BY 1
       |)
       |SELECT gr.id,
       |       coalesce(hist.n_tokens, 0) AS n_tokens,
       |       round(coalesce(nd_tokens / CAST(n_tokens AS DOUBLE), 0.0), 6) AS distinct_ratio,
       |       round(coalesce(top_c / CAST(n_tokens AS DOUBLE), 0.0), 6) AS top_token_frac,
       |       round(CASE WHEN len(gs) > 0
       |                  THEN 1.0 - len(list_distinct(gs)) / CAST(len(gs) AS DOUBLE)
       |                  ELSE 0.0 END, 6) AS dup_gram_frac
       |FROM gr LEFT JOIN hist ON gr.id = hist.id
       |ORDER BY gr.id""".stripMargin

  // ============================================================== BM25

  /** BM25 top-k retrieval (Robertson/Spärck Jones; k1=1.2, b=0.75) for a
    * bag-of-terms query. idf = ln(1 + (N − df + ½)/(df + ½)).
    *
    * Plan: one (id, dl, term) aggregate over the exploded+filtered token
    * stream (the filter prunes to query terms BEFORE the shuffle, so the
    * shuffle carries only matching postings); document frequencies and the
    * corpus stats are broadcast scalars; the top-k is a TakeOrdered, never a
    * global sort. Per-document term contributions are summed in sorted term
    * order via an explicit fold so the float addition order is pinned —
    * byte-identical across engines and across Spark retries.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withDl = df.select(col(idCol).as("id"), toks(col(textCol)).as("ts"))
      .select(col("id"), col("ts"), size(col("ts")).cast("double").as("dl"))
    val tf = withDl.select(col("id"), col("dl"), explode(col("ts")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col("id"), col("dl"), col("t")).agg(count(lit(1)).cast("double").as("tf"))
    val stats = withDl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dft = tf.groupBy(col("t")).agg(count(lit(1)).cast("double").as("dft"))
    val scored = tf.join(broadcast(dft), "t").crossJoin(broadcast(stats))
      .withColumn("w",
        log(lit(1.0) + (col("n_docs") - col("dft") + 0.5) / (col("dft") + 0.5)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("t"), col("w")))).as("ws"))
      .select(col("id"), size(col("ws")).as("n_terms"),
        aggregate(col("ws"), lit(0.0), (acc, x) => acc + x.getField("w")).as("score"))
    scored.orderBy(col("score").desc, col("id")).limit(topK)
      .select(col("id"), col("n_terms"), round(col("score"), 6).as("score"))
  }

  /** DuckDB replay of [[bm25TopK]]: identical expression tree, identical
    * fold order (list_reduce over the term-sorted contribution list).
    */
  def bm25DuckSql(terms: Seq[String], topK: Int, k1: Double = 1.2, b: Double = 0.75): String = {
    val inList = terms.sorted.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (
       |  SELECT doc_id AS id, $toksDuck AS ts FROM documents
       |), dl AS (
       |  SELECT id, ts, CAST(len(ts) AS DOUBLE) AS dl FROM tk
       |), tf AS (
       |  SELECT id, dl, t, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT id, dl, unnest(ts) AS t FROM dl)
       |  WHERE t IN ($inList)
       |  GROUP BY 1, 2, 3
       |), stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
       |), dft AS (
       |  SELECT t, CAST(count(*) AS DOUBLE) AS dft FROM tf GROUP BY 1
       |), contrib AS (
       |  SELECT id,
       |         ln(1.0 + (n_docs - dft + 0.5) / (dft + 0.5)) *
       |           (tf * ${k1 + 1.0}) /
       |           (tf + $k1 * (${1.0 - b} + $b * dl / avgdl)) AS w,
       |         t
       |  FROM tf JOIN dft USING (t), stats
       |), scored AS (
       |  SELECT id, count(*) AS n_terms,
       |         list_reduce(list_prepend(0.0, list(w ORDER BY t)), (a, x) -> a + x) AS score
       |  FROM contrib GROUP BY id
       |)
       |SELECT id, n_terms, round(score, 6) AS score
       |FROM scored ORDER BY score DESC, id LIMIT $topK""".stripMargin
  }

  // =============================================================== PII

  // patterns restricted to syntax with identical semantics in Java regex and
  // RE2 (no backrefs, no lookaround): literal classes, +, {m,n}
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  /** PII scan + redaction: counts of email / IPv4 / phone matches per
    * document and the redacted text (emails, then IPs, then phones replaced
    * with type tags — a fixed order, so overlapping matches resolve
    * identically everywhere). Pure regexp column expressions: codegen'd,
    * no shuffle, linear scan.
    */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    df.select(col(idCol).as("id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_email"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ip"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phone"),
      red.as("redacted"))
  }

  /** DuckDB replay of [[piiScan]] over the text expression `e`. DuckDB
    * single-quoted literals pass backslashes through verbatim, so only
    * quotes need escaping.
    */
  def piiDuckSql(e: String): String = {
    def q(re: String) = re.replace("'", "''")
    s"""SELECT doc_id AS id,
       |  CAST(len(regexp_extract_all($e, '${q(EmailRe)}')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all($e, '${q(Ipv4Re)}')) AS BIGINT) AS n_ip,
       |  CAST(len(regexp_extract_all($e, '${q(PhoneRe)}')) AS BIGINT) AS n_phone,
       |  regexp_replace(regexp_replace(regexp_replace($e,
       |    '${q(EmailRe)}', '<EMAIL>', 'g'), '${q(Ipv4Re)}', '<IP>', 'g'),
       |    '${q(PhoneRe)}', '<PHONE>', 'g') AS redacted
       |FROM documents ORDER BY id""".stripMargin
  }

  // ======================================== reproducible stratified sample

  /** Deterministic stratified sampling: a row is kept iff
    * polyHash(salt ‖ id) mod 10000 < rate(stratum)·10000. The decision is a
    * pure function of (salt, id) — reruns, retries, and re-partitioning all
    * keep the same rows, and downsampling rates can be tuned per stratum
    * (language, source, quality band) without a shuffle: the filter is a
    * codegen'd scan predicate.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double, salt: String): DataFrame = {
    val h = pmod(TextAnalysis.polyHash(
      concat(lit(salt), col(idCol).cast("string"))), lit(10000L))
    val cut = rates.toSeq.sortBy(_._1).foldRight(lit((defaultRate * 10000).toLong)) {
      case ((k, r), els) => when(col(stratumCol) === k, lit((r * 10000).toLong)).otherwise(els)
    }
    df.filter(h < cut)
  }

  /** DuckDB WHERE clause matching [[stratifiedSample]]. */
  def stratifiedSampleDuckSql(idExpr: String, stratumExpr: String,
      rates: Map[String, Double], defaultRate: Double, salt: String): String = {
    val h = TextAnalysis.polyHashDuckSql(s"('$salt' || CAST($idExpr AS VARCHAR))")
    val branches = rates.toSeq.sortBy(_._1)
      .map { case (k, r) => s"WHEN $stratumExpr = '$k' THEN ${(r * 10000).toLong}" }
      .mkString(" ")
    s"($h % 10000) < (CASE $branches ELSE ${(defaultRate * 10000).toLong} END)"
  }

  // ==================================================== inverted index

  /** Search-index construction: per term, its document frequency, corpus
    * frequency, and the postings head (first `postingsCap` (doc_id, tf)
    * entries by doc_id, CSV-encoded so any engine can hash-compare). Top
    * `topTerms` terms by (df desc, term).
    *
    * Plan: per-(term, doc) tf pre-aggregate (map-side combinable), then one
    * shuffle on term. At corpus scale a full postings list is not a row (a
    * stopword's list IS the corpus) — production writes postings sharded by
    * (term, doc-id range); the head cap here bounds the row while keeping
    * the build dataflow identical.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      topTerms: Int = 100, postingsCap: Int = 20): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        array_join(transform(
          slice(array_sort(collect_list(struct(col("doc_id"), col("tf")))), 1, postingsCap),
          x => concat_ws(":", x.getField("doc_id"), x.getField("tf"))), ",").as("postings"))
      .orderBy(col("df").desc, col("term"))
      .limit(topTerms)
  }

  /** DuckDB replay of [[invertedIndex]] (same tokenizer, cap, ordering). */
  def invertedIndexDuckSql(topTerms: Int = 100, postingsCap: Int = 20): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($toksDuck) AS term FROM documents
       |), tf AS (
       |  SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
       |), ranked AS (
       |  SELECT term, doc_id, tf,
       |         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM tf
       |), agg AS (
       |  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
       |  FROM tf GROUP BY 1
       |), posts AS (
       |  SELECT term, string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
       |  FROM ranked WHERE rn <= $postingsCap GROUP BY 1
       |)
       |SELECT a.term, a.df, a.cf, p.postings
       |FROM agg a JOIN posts p USING (term)
       |ORDER BY df DESC, term LIMIT $topTerms""".stripMargin

  // ============================================= corpus-level line dedup

  /** C4/RefinedWeb-style exact line dedup: across the WHOLE corpus, every
    * occurrence of a line except the globally-first one (by (doc_id, pos))
    * is removed — the stage that strips boilerplate ("subscribe to our
    * newsletter…") repeated across millions of pages. Input is the exploded
    * line table (doc_id, pos, line); output is the surviving lines.
    *
    * Plan shape: one shuffle on `line` for the map-side-combinable
    * min-occurrence aggregate, then the keeper join back is co-partitioned
    * on the same key (no extra exchange); nothing is broadcast, so the
    * line-frequency skew of real crawls (one boilerplate line in 10⁸ docs)
    * lands on AQE's skew-join split rather than a driver OOM.
    *
    * `pos` must be < 2²⁰ per document (occurrences are packed as
    * doc_id·2²⁰ + pos so the aggregate is a plain integer min — replayable
    * in any engine without struct-ordering semantics).
    */
  def lineDedup(lines: DataFrame): DataFrame = {
    val keep = lines
      .select(col("line").as("k_line"),
        (col("doc_id") * lit(1L << 20) + col("pos")).as("occ"))
      .groupBy("k_line").agg(min(col("occ")).as("keep"))
    lines.join(keep,
        col("line") === col("k_line") &&
        col("doc_id") * lit(1L << 20) + col("pos") === col("keep"))
      .select(col("doc_id"), col("pos"), col("line"))
  }

  /** Reassemble per-doc text from surviving lines: lines back in `pos`
    * order joined with a space, plus the kept-line count. One shuffle on
    * doc_id; the sort is per-group inside `array_sort` (no global sort).
    */
  def reassemble(survivors: DataFrame): DataFrame =
    survivors.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), " ").as("text_clean"))

  // ======================================= DSIR importance reweighting

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed-n-gram importance
    * scores for raw-pool documents against a small curated target set. Each
    * document's word unigrams+bigrams hash into `buckets` feature buckets;
    * bucket distributions are estimated for target and raw with add-one
    * smoothing, and a raw document scores Σ_b c_b(doc)·ln(p̂_t(b)/p̂_r(b)) —
    * the log-likelihood ratio under the two hashed n-gram models. The top
    * scorers are the raw documents that look most like the target domain.
    *
    * Plan: one (id, is_target, bucket) exploded-feature pass feeds BOTH
    * distribution estimates and the per-doc bucket counts (map-side
    * combinable aggregates on an int bucket key); the 2·`buckets`-row
    * weight table and the scalar totals are broadcast, so scoring adds no
    * shuffle beyond the per-doc aggregate. The per-doc float sum folds in
    * bucket order (the BM25 trick) so the score is byte-identical across
    * engines and retries. Top-k is a TakeOrdered, never a global sort.
    */
  def dsirTopK(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 512, topK: Int = 100): DataFrame = {
    val ts = toks(col(textCol))
    val bi = when(size(ts) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ts) - 2),
        i => array_join(slice(ts, i + 1, lit(2)), " ")))
    // ONE tokenize+explode pass of the corpus feeds both the bucket
    // distributions and the scoring aggregate (it is consumed twice below) —
    // persisted so the second consumer re-reads hashed (id, is_t, b) triples
    // instead of re-tokenizing 100 TB of text
    val fb = df.select(col(idCol).as("id"), targetPred.as("is_t"),
        explode(concat(ts, bi)).as("f"))
      .select(col("id"), col("is_t"),
        pmod(TextAnalysis.polyHash(col("f")), lit(buckets.toLong)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dist = fb.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
    val tot = dist.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val w = dist.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + buckets).cast("double")) -
         log((col("cr") + 1).cast("double") / (col("nr") + buckets).cast("double"))).as("w"))
    fb.filter(!col("is_t"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(w), "b")
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_feats"),
        sort_array(collect_list(struct(col("b"), (col("c") * col("w")).as("x")))).as("xs"))
      .select(col("id"), col("n_feats"),
        aggregate(col("xs"), lit(0.0), (acc, x) => acc + x.getField("x")).as("score"))
      .orderBy(col("score").desc, col("id")).limit(topK)
      .select(col("id"), col("n_feats"), round(col("score"), 6).as("score"))
  }

  /** DuckDB replay of [[dsirTopK]]: identical feature set, hash, smoothing,
    * and bucket-ordered fold.
    */
  def dsirDuckSql(targetPredSql: String, buckets: Int = 512, topK: Int = 100): String = {
    val h = TextAnalysis.polyHashDuckSql("f")
    s"""WITH tk AS (
       |  SELECT doc_id AS id, ($targetPredSql) AS is_t, $toksDuck AS ts FROM documents
       |), ft AS (
       |  SELECT id, is_t, unnest(ts || CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
       |    ELSE list_transform(range(1, len(ts)), i -> array_to_string(ts[i:i+1], ' ')) END) AS f
       |  FROM tk
       |), fb AS (
       |  SELECT id, is_t, $h % $buckets AS b FROM ft
       |), dist AS (
       |  SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
       |         sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS cr
       |  FROM fb GROUP BY 1
       |), tot AS (
       |  SELECT sum(ct) AS nt, sum(cr) AS nr FROM dist
       |), w AS (
       |  SELECT b, ln((ct + 1) / CAST(nt + $buckets AS DOUBLE)) -
       |            ln((cr + 1) / CAST(nr + $buckets AS DOUBLE)) AS w
       |  FROM dist, tot
       |), pd AS (
       |  SELECT id, b, count(*) AS c FROM fb WHERE NOT is_t GROUP BY 1, 2
       |), sc AS (
       |  SELECT id, CAST(sum(c) AS BIGINT) AS n_feats,
       |         list_reduce(list_prepend(0.0, list(c * w ORDER BY b)), (a, x) -> a + x) AS score
       |  FROM pd JOIN w USING (b) GROUP BY 1
       |)
       |SELECT id, n_feats, round(score, 6) AS score
       |FROM sc ORDER BY score DESC, id LIMIT $topK""".stripMargin
  }

  // ============================================ repeated-span removal

  /** Per-position word-k-gram FNV hashes (NOT deduped — position matters
    * here, unlike [[Dedup.shingleHashSet]]): hashes(p) covers tokens
    * p..p+k−1.
    */
  private def posGramHashes(k: Int) = udf((ts: Seq[String]) =>
    if (ts == null || ts.length < k) Array.empty[Long]
    else ts.iterator.sliding(k).withPartial(false)
      .map(w => TextAnalysis.fnv1a64(w.mkString(" "))).toArray)

  /** ExactSubstr-style corpus-level repeated-span removal (the pass of Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"): a token is cut iff it lies inside a word k-gram whose exact
    * text occurs elsewhere in the corpus (or earlier in the same document),
    * except that the globally-first occurrence of each gram — ordered by
    * (doc_id, pos) — is always kept. Any verbatim duplicated passage of
    * ≥ k tokens is a union of duplicated k-grams, so every non-first copy
    * of such a passage is removed in full while the first survives.
    *
    * Plan shape: the only data-sized shuffles are (1) the 8-byte gram-hash
    * key for the count/min-occurrence aggregate (map-side combinable), with
    * the marker join back co-partitioned on that same key, and (2) doc_id
    * for removed-position dedup, the kept-token anti join, and reassembly —
    * which all share one partitioning. Nothing is broadcast or collected;
    * gram-frequency skew (one license header in 10⁸ docs) is a skewed
    * aggregate key, which AQE splits. `pos` must be < 2²⁰ per document
    * (occurrences pack as doc_id·2²⁰ + pos, as in [[lineDedup]]); FNV-64
    * gram collisions can over-remove, the standard trade of hashed
    * ExactSubstr at corpus scale.
    *
    * Output: (doc_id, n_tokens, n_removed, text_clean), one row per input
    * document — fully-removed and sub-k documents keep an empty / verbatim
    * text_clean respectively.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), toks(col(textCol)).as("ts"))
    val occ = col("doc_id") * lit(1L << 20) + col("pos")
    val grams = docs.select(col("doc_id"),
      posexplode(posGramHashes(k)(col("ts"))).as(Seq("pos", "s")))
    val keep = grams.groupBy("s")
      .agg(count(lit(1)).as("cnt"), min(occ).as("keep"))
    val removed = grams.join(keep, "s")
      .filter(col("cnt") >= 2 && occ =!= col("keep"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("rp"))
      .distinct()
    // tokens and removed share the `docs` lineage — alias both sides so the
    // doc_id equality binds one attribute per side, not trivially true
    val tokens = docs.select(col("doc_id"), posexplode(col("ts")).as(Seq("tp", "tok")))
      .alias("t")
    val kept = tokens.join(removed.alias("r"),
      col("t.doc_id") === col("r.doc_id") && col("t.tp") === col("r.rp"), "left_anti")
    docs.select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"))
      .join(kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("tp"), col("tok")))),
            x => x.getField("tok")), " ").as("text_clean")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** DuckDB replay of [[spanDedup]] over the text expression `textExpr`:
    * same tokenizer, same FNV gram hash, same packed-min keeper, same
    * coverage expansion and pos-ordered reassembly.
    */
  def spanDedupDuckSql(textExpr: String, k: Int = 5): String = {
    val fnv = Dedup.fnv64DuckSql(s"array_to_string(ts[i:i+${k - 1}], ' ')")
    s"""WITH tk AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower($textExpr), '\\s+'), t -> t <> '') AS ts
       |  FROM documents
       |), g0 AS (
       |  SELECT doc_id, ts, unnest(range(1, len(ts) - ${k - 2})) AS i FROM tk
       |), gr AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, $fnv AS s FROM g0
       |), kp AS (
       |  SELECT s, count(*) AS cnt, min(doc_id * 1048576 + pos) AS keep
       |  FROM gr GROUP BY 1
       |), rm AS (
       |  SELECT DISTINCT doc_id, rp FROM (
       |    SELECT gr.doc_id, gr.pos + unnest(range($k)) AS rp
       |    FROM gr JOIN kp USING (s)
       |    WHERE cnt >= 2 AND gr.doc_id * 1048576 + gr.pos <> kp.keep)
       |), tok AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS tp, ts[i] AS t
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM tk)
       |), ka AS (
       |  SELECT tok.doc_id, count(*) AS n_kept,
       |         string_agg(t, ' ' ORDER BY tp) AS text_clean
       |  FROM tok LEFT JOIN rm ON tok.doc_id = rm.doc_id AND tok.tp = rm.rp
       |  WHERE rm.doc_id IS NULL GROUP BY 1
       |)
       |SELECT tk.doc_id, CAST(len(tk.ts) AS BIGINT) AS n_tokens,
       |       CAST(len(tk.ts) AS BIGINT) - coalesce(ka.n_kept, 0) AS n_removed,
       |       coalesce(ka.text_clean, '') AS text_clean
       |FROM tk LEFT JOIN ka ON tk.doc_id = ka.doc_id
       |ORDER BY tk.doc_id""".stripMargin
  }

  // ============================================ Bloom-filter decontamination

  /** Bloom geometry: m = 2^16 bits packed into 1024 longs, 4 probe positions
    * sliced from the 64-bit FNV gram hash (shifts 0/13/26/39, low 16 bits).
    * At benchmark-suite sizes (≤ ~100k distinct k-grams) the false-positive
    * rate is ≤ (1-e^{-4n/m})^4 ≈ 1% at n=16k; the filter itself is 8 KiB.
    */
  private val BloomProbes = 4
  private def bloomPos(s: Column, i: Int): Column =
    shiftrightunsigned(s, 13 * i).bitwiseAND(lit(0xFFFFL))

  /** Bloom-filter benchmark decontamination — the constant-memory scale
    * sibling of [[decontaminate]]. The exact-join variant ships every eval
    * k-gram hash into a broadcast join; this one folds the eval side into a
    * fixed 8 KiB bitset (1024 longs via `bit_or`), so the train-side
    * membership test is a broadcast join against 1024 rows regardless of
    * benchmark size — at 100 TB the per-executor cost is O(train grams) with
    * no shuffle on the eval side at all. No false negatives (every true
    * overlap is flagged); false positives are bounded by the bitset load and
    * are deterministic given the hash slicing, so the result is exactly
    * reproducible and oracle-checkable.
    *
    * Output: one row per train document with ≥1 k-gram, (id, n_grams,
    * n_flagged) where n_flagged counts distinct k-grams whose 4 Bloom
    * positions are all set.
    */
  def bloomDecontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 3): DataFrame = {
    val grams = Dedup.shingleHashSet(k)
    val bloom = eval
      .select(explode(grams(col(textCol))).as("s")).distinct()
      .select(explode(array((0 until BloomProbes).map(i => bloomPos(col("s"), i)): _*)).as("p"))
      .groupBy(shiftrightunsigned(col("p"), 6).as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT)))").as("bits"))
    train
      .select(col(idCol).as("id"), explode(grams(col(textCol))).as("s"))
      .select(col("id"), col("s"),
        explode(array((0 until BloomProbes).map(i => bloomPos(col("s"), i)): _*)).as("p"))
      .withColumn("w", shiftrightunsigned(col("p"), 6))
      .join(broadcast(bloom), Seq("w"), "left")
      // sign extension is irrelevant under & 1, so plain shiftright is fine
      .withColumn("hit", expr("coalesce(shiftright(bits, CAST(p & 63 AS INT)) & 1, 0L)"))
      .groupBy(col("id"), col("s"))
      .agg(sum(col("hit")).as("nhit"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nhit") === BloomProbes, 1L).otherwise(0L)).as("n_flagged"))
  }

  /** DuckDB replay of [[bloomDecontaminate]] over `documents` split by the
    * two doc_id predicates: same FNV gram hashes, same position slicing,
    * same 1024-word `bit_or` bitset, same 4-of-4 membership rule.
    */
  def bloomDecontaminateDuckSql(trainPred: String, evalPred: String, k: Int): String = {
    val g = Dedup.fnv64DuckSql(s"array_to_string(ts[i:i+${k - 1}], ' ')")
    val probes = (0 until BloomProbes)
      .map(i => s"(s >> ${13 * i}) & 65535").mkString("[", ", ", "]")
    s"""WITH tk AS (
       |  SELECT doc_id, $toksDuck AS ts FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(ts) < $k THEN CAST([] AS UBIGINT[])
       |              ELSE list_distinct(list_transform(range(1, len(ts) - ${k - 2}), i -> $g))
       |         END AS ss
       |  FROM tk
       |), ev AS (
       |  SELECT DISTINCT unnest(ss) AS s FROM sh WHERE $evalPred
       |), pp AS (
       |  SELECT unnest($probes) AS p FROM ev
       |), bloom AS (
       |  SELECT p >> 6 AS w, bit_or(1::UBIGINT << CAST(p & 63 AS INT)) AS bits
       |  FROM pp GROUP BY 1
       |), tr AS (
       |  SELECT doc_id AS id, unnest(ss) AS s FROM sh WHERE $trainPred
       |), pr AS (
       |  SELECT id, s, unnest($probes) AS p FROM tr
       |), ht AS (
       |  SELECT id, s,
       |         sum(coalesce(CAST((bits >> CAST(p & 63 AS INT)) & 1 AS BIGINT), 0)) AS nhit
       |  FROM pr LEFT JOIN bloom ON (p >> 6) = bloom.w GROUP BY 1, 2
       |)
       |SELECT id, count(*) AS n_grams,
       |       CAST(sum(CASE WHEN nhit = $BloomProbes THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
       |FROM ht GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ======================================================= blocklist filtering

  /** Banned-term scan: per document, the total occurrence count of any
    * blocklist term and the banned-token fraction. The blocklist rides into
    * the plan as an array literal (at production size, a broadcast join on
    * token works identically) — a pure per-row array filter, no shuffle.
    * Output: documents with ≥1 banned occurrence.
    */
  def bannedTermScan(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val banned = array(terms.map(t => lit(t.toLowerCase)): _*)
    df.select(col(idCol).as("id"), toks(col(textCol)).as("ts"))
      .select(col("id"), size(col("ts")).cast("long").as("n_tokens"),
        size(filter(col("ts"), t => array_contains(banned, t))).cast("long").as("n_banned"))
      .filter(col("n_banned") > 0)
      .withColumn("banned_frac",
        round(col("n_banned") / greatest(col("n_tokens"), lit(1L)), 6))
  }

  /** DuckDB replay of [[bannedTermScan]]. */
  def bannedTermScanDuckSql(terms: Seq[String]): String = {
    val list = terms.map(t => s"'${t.toLowerCase.replace("'", "''")}'").mkString("[", ", ", "]")
    s"""WITH tk AS (
       |  SELECT doc_id AS id, $toksDuck AS ts FROM documents
       |), sc AS (
       |  SELECT id, CAST(len(ts) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(ts, t -> list_contains($list, t))) AS BIGINT) AS n_banned
       |  FROM tk
       |)
       |SELECT id, n_tokens, n_banned,
       |       round(n_banned / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS banned_frac
       |FROM sc WHERE n_banned > 0 ORDER BY id""".stripMargin
  }

  // ======================================================= mojibake repair

  /** The most common UTF-8-read-as-CP1252 double-encodings (the top of
    * ftfy's table — Speer, "fixes text for you", the standard web-scrape
    * cleaning step): each entry is (mojibake sequence, intended char).
    * Written as \\u escapes so the source survives any editor/charset.
    */
  val MojibakeMap: Seq[(String, String)] = Seq(
    "\u00C3\u00A9" -> "\u00E9", // A-tilde copyright  -> e-acute
    "\u00C3\u00A8" -> "\u00E8", // A-tilde diaeresis  -> e-grave
    "\u00C3\u00A7" -> "\u00E7", // A-tilde section    -> c-cedilla
    "\u00C3\u00B6" -> "\u00F6", // A-tilde pilcrow    -> o-umlaut
    "\u00C3\u00BC" -> "\u00FC", // A-tilde 1/4        -> u-umlaut
    "\u00C3\u00B1" -> "\u00F1", // A-tilde plus-minus -> n-tilde
    "\u00E2\u20AC\u2122" -> "\u2019", // a-circumflex euro tm -> right single quote
    "\u00E2\u20AC\u0153" -> "\u201C") // a-circumflex euro oe -> left double quote

  /** Repair the [[MojibakeMap]] double-encodings in a string column —
    * a chain of codegen'd `replace` expressions, no UDF. The three-char
    * (curly-quote) sequences and the two-char (accent) sequences never
    * overlap (prefixes â vs Ã), so application order is immaterial.
    */
  def repairMojibake(text: Column): Column =
    MojibakeMap.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  /** Encoding-damage scan + repair over a corpus: per document, the number
    * of mojibake sequences repaired (counted per pattern as the length
    * drop under deletion, exact integers), lengths before/after, and the
    * md5 of the repaired text. Pure per-row string expressions — an
    * embarrassingly-parallel scan at 100 TB, no shuffle, no UDF. Only
    * damaged documents are emitted.
    */
  def fixMojibake(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nMoji = MojibakeMap.map { case (bad, _) =>
      // length drop is a multiple of the pattern length, so the double
      // division is exact
      ((length(t) - length(replace(t, lit(bad)))) / lit(bad.length)).cast("long")
    }.reduce(_ + _)
    val fixed = repairMojibake(t)
    df.select(col(idCol).as("id"), nMoji.as("n_moji"),
        length(t).cast("long").as("n_before"),
        length(fixed).cast("long").as("n_after"),
        md5(to_binary(fixed, lit("utf-8"))).as("h"))
      .filter(col("n_moji") > 0)
  }

  /** Render a (BMP) string as a DuckDB expression via chr() codepoints —
    * keeps the oracle SQL ASCII-only regardless of transport encoding.
    */
  def duckChr(s: String): String =
    s.map(c => s"chr(${c.toInt})").mkString(" || ")

  /** DuckDB replay of [[fixMojibake]] over a prepared relation `rel`
    * with columns (doc_id, t).
    */
  def mojibakeDuckSql(rel: String): String = {
    val fixed = MojibakeMap.foldLeft("t") { case (e, (bad, good)) =>
      s"replace($e, ${duckChr(bad)}, ${duckChr(good)})"
    }
    val counts = MojibakeMap.map { case (bad, _) =>
      s"(length(t) - length(replace(t, ${duckChr(bad)}, ''))) // ${bad.length}"
    }.mkString(" + ")
    s"""SELECT doc_id AS id, CAST($counts AS BIGINT) AS n_moji,
       |       length(t)::BIGINT AS n_before,
       |       length($fixed)::BIGINT AS n_after,
       |       md5($fixed) AS h
       |FROM $rel WHERE $counts > 0 ORDER BY id""".stripMargin
  }

  // ===================================================== sliding-window chunking

  /** RAG/retrieval-prep chunking: split each document into token windows of
    * `chunkSize` tokens advancing by `stride` (overlap = chunkSize − stride).
    * Chunk i covers token positions [i·stride, i·stride + chunkSize); the
    * last window may be short. Pure per-row array expressions — the chunk
    * fan-out is a generator inside the scan projection, so at 100 TB this is
    * an embarrassingly-parallel single pass with no shuffle; the output is
    * written partitioned as read.
    *
    * Output: (id, chunk_id, n_tokens, chunk_text), empty documents dropped.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      "chunkSize must be >= stride > 0 (windows must cover every token)")
    df.select(col(idCol).as("id"), toks(col(textCol)).as("ts"))
      .filter(size(col("ts")) > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0L), floor((size(col("ts")) - 1) / lit(stride)))))
      .withColumn("chunk",
        slice(col("ts"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)))
      .select(col("id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** DuckDB replay of [[chunkDocs]]: same tokenizer, same window arithmetic
    * (integer floor-div on the last-chunk index, clamped list slice).
    */
  def chunkDocsDuckSql(chunkSize: Int = 64, stride: Int = 48): String =
    s"""WITH tk AS (
       |  SELECT doc_id AS id, $toksDuck AS ts FROM documents
       |), nz AS (
       |  SELECT id, ts, len(ts) AS l FROM tk WHERE len(ts) > 0
       |), ch AS (
       |  SELECT id, ts, unnest(range(0, ((l - 1) // $stride) + 1)) AS chunk_id FROM nz
       |)
       |SELECT id, chunk_id,
       |       CAST(len(ts[chunk_id * $stride + 1 : chunk_id * $stride + $chunkSize]) AS BIGINT) AS n_tokens,
       |       array_to_string(ts[chunk_id * $stride + 1 : chunk_id * $stride + $chunkSize], ' ') AS chunk_text
       |FROM ch ORDER BY id, chunk_id""".stripMargin

  // ============================================================ TF-IDF

  /** Per-document top-k TF-IDF terms (smooth idf = ln((N+1)/(df+1)) + 1 —
    * the scikit-learn smoothing, always positive). Keyword extraction /
    * feature selection over the corpus; the per-doc complement of
    * [[bm25TopK]] (which ranks documents for one query).
    *
    * Plan: one (id, term) aggregate for tf, one (term) aggregate for df,
    * then a term-keyed join and a per-doc window top-k. The df table is
    * vocabulary-sized: joined by key, NOT broadcast, so the plan holds when
    * the vocabulary outgrows any single executor (at 100 TB natural-language
    * vocab is 10⁷–10⁸ rows — broadcastable only after heavy pruning); the
    * corpus-size scalar IS broadcast. Ranking on the ROUNDED score (both
    * engines rank the same 6-decimal value, so rank order is reproducible).
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topPerDoc: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol).as("id"), explode(toks(col(textCol))).as("t"))
      .groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("t")).agg(count(lit(1)).as("dft"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dft, "t").crossJoin(broadcast(nDocs))
      .withColumn("score", round(
        col("tf").cast("double") *
          (log((col("n_docs").cast("double") + lit(1.0)) /
               (col("dft").cast("double") + lit(1.0))) + lit(1.0)), 6))
    val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("t"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topPerDoc)
      .select(col("id"), col("rank"), col("t").as("term"), col("score"))
  }

  /** DuckDB replay of [[tfidfTopTerms]]: identical expression tree and the
    * same rank-on-rounded-score rule.
    */
  def tfidfDuckSql(topPerDoc: Int = 3): String =
    s"""WITH tk AS (
       |  SELECT doc_id AS id, $toksDuck AS ts FROM documents
       |), tf AS (
       |  SELECT id, t, count(*) AS tf
       |  FROM (SELECT id, unnest(ts) AS t FROM tk) GROUP BY 1, 2
       |), dft AS (
       |  SELECT t, count(*) AS dft FROM tf GROUP BY 1
       |), nd AS (
       |  SELECT count(*) AS n_docs FROM tk
       |), scored AS (
       |  SELECT id, t,
       |         round(CAST(tf AS DOUBLE) *
       |               (ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(dft AS DOUBLE) + 1.0)) + 1.0),
       |               6) AS score
       |  FROM tf JOIN dft USING (t), nd
       |), ranked AS (
       |  SELECT id, t, score,
       |         CAST(row_number() OVER (PARTITION BY id ORDER BY score DESC, t) AS BIGINT) AS rank
       |  FROM scored
       |)
       |SELECT id, rank, t AS term, score
       |FROM ranked WHERE rank <= $topPerDoc ORDER BY id, rank""".stripMargin

  // ====================================================== collocations

  /** PMI-scored bigram collocations over the corpus (Church & Hanks 1990):
    * pmi(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) ) with p from corpus counts
    * (bigram mass B, unigram mass T), reported for bigrams seen ≥ `minCount`
    * times. The standard phrase-mining pass a tokenizer-training pipeline
    * runs before merging multi-word units.
    *
    * Plan: the bigram fan-out is a generator in the scan projection (no
    * shuffle); one (w1,w2) aggregate + one (w) aggregate; unigram counts are
    * joined back by key twice — vocabulary-sized, so key-joined rather than
    * broadcast (same scale reasoning as [[tfidfTopTerms]]); the two scalar
    * masses broadcast. Top-k is a TakeOrdered, never a global sort. All
    * inputs to the double math are exact integers < 2⁵³, so the pmi doubles
    * are bit-reproducible.
    */
  def collocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5, topK: Int = 20): DataFrame = {
    val tk = df.select(toks(col(textCol)).as("ts"))
    val bg = tk.filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val ug = tk.select(explode(col("ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cx"))
    val bgc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cxy"))
    val totals = ug.agg(sum(col("cx")).as("t_total"))
      .crossJoin(bgc.agg(sum(col("cxy")).as("b_total")))
    val scored = bgc.filter(col("cxy") >= minCount)
      .join(ug.select(col("w").as("w1"), col("cx").as("c1")), "w1")
      .join(ug.select(col("w").as("w2"), col("cx").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(log(
        (col("cxy").cast("double") * col("t_total") * col("t_total")) /
          (col("b_total").cast("double") * col("c1") * col("c2"))), 6))
    scored.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(topK)
      .select(col("w1"), col("w2"), col("cxy"), col("pmi"))
  }

  /** DuckDB replay of [[collocations]]: same generator, same count CTEs,
    * same left-associated double products inside the ln.
    */
  def collocationsDuckSql(minCount: Long = 5, topK: Int = 20): String =
    s"""WITH tk AS (
       |  SELECT $toksDuck AS ts FROM documents
       |), bg AS (
       |  SELECT unnest(list_transform(range(1, len(ts)),
       |                i -> {'w1': ts[i], 'w2': ts[i + 1]})) AS p
       |  FROM tk WHERE len(ts) >= 2
       |), bgc AS (
       |  SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cxy FROM bg GROUP BY 1, 2
       |), ug AS (
       |  SELECT w, count(*) AS cx FROM (SELECT unnest(ts) AS w FROM tk) GROUP BY 1
       |), tot AS (
       |  SELECT CAST((SELECT sum(cx) FROM ug) AS BIGINT) AS t_total,
       |         CAST((SELECT sum(cxy) FROM bgc) AS BIGINT) AS b_total
       |)
       |SELECT w1, w2, cxy,
       |       round(ln((CAST(cxy AS DOUBLE) * t_total * t_total) /
       |                (CAST(b_total AS DOUBLE) * c1.cx * c2.cx)), 6) AS pmi
       |FROM bgc JOIN ug c1 ON bgc.w1 = c1.w JOIN ug c2 ON bgc.w2 = c2.w, tot
       |WHERE cxy >= $minCount
       |ORDER BY pmi DESC, w1, w2 LIMIT $topK""".stripMargin

  // ==================================== percentile quality gating

  /** Per-stratum percentile length gate: drop every document below the
    * `minPct` percent-rank of token count WITHIN its stratum (language,
    * source, …) — the relative-threshold cousin of an absolute length
    * filter, robust to strata with different natural document lengths.
    * Emits a per-stratum summary (docs, kept, the realized minimum kept
    * length).
    *
    * Plan: one shuffle on the stratum key serves the percent_rank window
    * AND the summary aggregate. percent_rank = (rank−1)/(n−1) is an exact
    * integer ratio in both engines; the window orders by (n_tokens, id) so
    * the rank — and therefore the kept set — is totally determined.
    */
  def lengthPercentileGate(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, minPct: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("id"), col(stratumCol).as("stratum"),
      size(toks(col(textCol))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("n_tokens"), col("id"))
    base.withColumn("pr", percent_rank().over(w))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pr") >= minPct, 1L).otherwise(0L)).as("n_kept"),
        min(when(col("pr") >= minPct, col("n_tokens"))).as("min_tokens_kept"))
      .orderBy(col("stratum"))
  }

  /** DuckDB replay of [[lengthPercentileGate]]. */
  def lengthPercentileGateDuckSql(minPct: Double = 0.2): String =
    s"""WITH b AS (
       |  SELECT doc_id AS id, lang AS stratum,
       |         CAST(len($toksDuck) AS BIGINT) AS n_tokens
       |  FROM documents
       |), p AS (
       |  SELECT *, percent_rank() OVER (PARTITION BY stratum ORDER BY n_tokens, id) AS pr
       |  FROM b
       |)
       |SELECT stratum, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN pr >= $minPct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       min(CASE WHEN pr >= $minPct THEN n_tokens END) AS min_tokens_kept
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ========================================== content-defined chunking

  /** Content-defined chunking + chunk-level dedup stats (the FastCDC/rsync
    * family, minus the min/max-size clamps, which would make boundary
    * selection sequential): a chunk boundary is CUT BEFORE every position
    * whose k-char gram hashes to 0 mod `divisor` — boundaries move with the
    * content, so an insertion early in a document only reshuffles chunks
    * near the edit and shared passages still produce identical chunks.
    * Reports the `topK` most-shared chunks (by distinct docs, then
    * occurrences) — the dedup-storage savings signal.
    *
    * Plan: boundary scan + chunk fan-out are per-row array expressions in
    * the scan projection (no shuffle, O(len·k) per row); ONE aggregate on
    * the chunk hash (map-side combined); TakeOrdered top-k. Chunk texts
    * never cross the shuffle — only (hash, id) pairs do.
    */
  /** Per-document CDC chunk (hash, len) pairs — boundary scan + chunk
    * hashing as ONE compiled loop (same math as the former
    * higher-order-function expression pipeline, which paid multi-second
    * whole-stage-codegen compilation for the per-position polyhash
    * lambda): positions are 1-based like the SQL it replaced; a boundary
    * is cut BEFORE every position whose k-gram polyhash ≡ 0 (mod divisor);
    * chunk hash = the same seed-7 mod-1e9+7 polyhash — chunk TEXT never
    * materializes, only (hash, len) pairs leave the loop.
    */
  private def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int, divisor: Int): DataFrame = {
    val chunkHashes = udf { (t: String) =>
      val s = if (t == null) "" else t
      // hash per CODEPOINT, not UTF-16 code unit: the DuckDB oracle (and the
      // retired HOF path) hash characters via split/ascii, so a surrogate
      // pair (emoji etc.) must contribute one term, not two
      val cps = s.codePoints().toArray
      val n = cps.length
      val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i <= n - k) {
        var acc = 7L; var j = 0
        while (j < k) { acc = (acc * 31 + cps(i + j).toLong) % 1000000007L; j += 1 }
        if (acc % divisor == 0) bounds += (i + 1)
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var idx = 0
      while (idx <= bounds.length) {
        val start = if (idx == 0) 1 else bounds(idx - 1)
        val end = if (idx == bounds.length) n else bounds(idx) - 1
        if (end >= start) {
          var acc = 7L; var p = start - 1
          while (p < end) { acc = (acc * 31 + cps(p).toLong) % 1000000007L; p += 1 }
          out += ((acc, (end - start + 1).toLong))
        }
        idx += 1
      }
      out.toSeq
    }
    df.select(col(idCol).as("id"), explode(chunkHashes(col(textCol))).as("ch"))
      .select(col("id"), col("ch._1").as("chunk_hash"), col("ch._2").as("chunk_len"))
  }

  def cdcChunkStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, divisor: Int = 64, topK: Int = 20): DataFrame = {
    cdcChunks(df, idCol, textCol, k, divisor)
      .groupBy(col("chunk_hash"))
      .agg(max(col("chunk_len")).as("chunk_len"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("id")).as("n_docs"))
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("chunk_hash"))
      .limit(topK)
      .select(col("chunk_hash"), col("chunk_len"), col("n_occ"), col("n_docs"))
  }

  /** DuckDB replay of [[cdcChunkStats]]: same boundary rule, same
    * cut-before-anchor chunk spans, same hash/aggregate/tie-break.
    */
  def cdcChunkStatsDuckSql(k: Int = 8, divisor: Int = 64, topK: Int = 20): String = {
    def ph(e: String) = TextAnalysis.polyHashDuckSql(e)
    s"""WITH bs AS (
       |  SELECT doc_id AS id, text,
       |         CASE WHEN length(text) >= $k THEN
       |           list_filter(range(1, length(text) - ${k - 1} + 1),
       |                       __p -> ${ph(s"substr(text, __p, $k)")} % $divisor = 0)
       |         ELSE [] END AS b
       |  FROM documents
       |), ch AS (
       |  SELECT id, unnest(list_filter(
       |    list_transform(range(1, len(b) + 2),
       |      j -> substr(text,
       |                  CASE WHEN j = 1 THEN 1 ELSE b[j - 1] END,
       |                  (CASE WHEN j = len(b) + 1 THEN length(text) ELSE b[j] - 1 END)
       |                    - (CASE WHEN j = 1 THEN 1 ELSE b[j - 1] END) + 1)),
       |    c -> c <> '')) AS chunk
       |  FROM bs
       |)
       |SELECT ${ph("chunk")} AS chunk_hash,
       |       CAST(max(length(chunk)) AS BIGINT) AS chunk_len,
       |       count(*) AS n_occ,
       |       count(DISTINCT id) AS n_docs
       |FROM ch GROUP BY 1
       |ORDER BY n_docs DESC, n_occ DESC, chunk_hash LIMIT $topK""".stripMargin
  }

  /** Dedup-storage savings from content-defined chunks: bytes stored as-is
    * vs bytes stored once per distinct chunk — the number a CDC-backed
    * store (rsync, backup dedup, CAS blob store) reports. Same chunk
    * pipeline as [[cdcChunkStats]], one map-side-combined aggregate on the
    * chunk hash, then a scalar fold; the ratio is one IEEE division of
    * exact integers.
    */
  def cdcSavings(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, divisor: Int = 64): DataFrame =
    cdcChunks(df, idCol, textCol, k, divisor)
      .groupBy(col("chunk_hash"))
      .agg(max(col("chunk_len")).as("len"), count(lit(1)).as("occ"))
      .agg(count(lit(1)).as("n_unique_chunks"),
        sum(col("len") * col("occ")).as("total_bytes"),
        sum(col("len")).as("unique_bytes"))
      .withColumn("dedup_ratio",
        round(col("unique_bytes").cast("double") / col("total_bytes"), 6))

  /** DuckDB replay of [[cdcSavings]] — same chain as the chunk stats with
    * a savings tail. */
  def cdcSavingsDuckSql(k: Int = 8, divisor: Int = 64): String = {
    def ph(e: String) = TextAnalysis.polyHashDuckSql(e)
    s"""WITH bs AS (
       |  SELECT doc_id AS id, text,
       |         CASE WHEN length(text) >= $k THEN
       |           list_filter(range(1, length(text) - ${k - 1} + 1),
       |                       __p -> ${ph(s"substr(text, __p, $k)")} % $divisor = 0)
       |         ELSE [] END AS b
       |  FROM documents
       |), ch AS (
       |  SELECT id, unnest(list_filter(
       |    list_transform(range(1, len(b) + 2),
       |      j -> substr(text,
       |                  CASE WHEN j = 1 THEN 1 ELSE b[j - 1] END,
       |                  (CASE WHEN j = len(b) + 1 THEN length(text) ELSE b[j] - 1 END)
       |                    - (CASE WHEN j = 1 THEN 1 ELSE b[j - 1] END) + 1)),
       |    c -> c <> '')) AS chunk
       |  FROM bs
       |), g AS (
       |  SELECT ${ph("chunk")} AS h, max(length(chunk)) AS len, count(*) AS occ
       |  FROM ch GROUP BY 1
       |)
       |SELECT count(*) AS n_unique_chunks,
       |       CAST(sum(len * occ) AS BIGINT) AS total_bytes,
       |       CAST(sum(len) AS BIGINT) AS unique_bytes,
       |       round(CAST(sum(len) AS DOUBLE) / sum(len * occ), 6) AS dedup_ratio
       |FROM g""".stripMargin
  }

  // ============================================================ WordPiece
  /** Greedy longest-match-first WordPiece segmentation (the BERT-family
    * tokenizer; Wu et al. 2016) — the third tokenizer class beside the
    * BPE pair (tx_bpe_merges learns, tx_bpe_encode applies) and regex
    * tokens (tx_tokens). Word-initial pieces match bare, continuations
    * carry the `##` marker; a position with NO match collapses the whole
    * word to `[UNK]` (standard semantics). The match tables are sorted by
    * (length desc, string) once, so segmentation is a deterministic pure
    * function of the vocabulary — which is exactly what lets the DuckDB
    * oracle replay it as a generated longest-first CASE inside a
    * recursive CTE over the (tiny) DISTINCT-word set.
    */
  val WordpieceHeads: Seq[String] =
    Seq("sc", "ta", "val", "win", "cus", "qu", "st", "sp", "fil", "vec",
      "ha", "da", "ba") ++ ('a' to 'z').map(_.toString)
  val WordpieceConts: Seq[String] =
    Seq("##an", "##ble", "##ue", "##dow", "##tomer", "##ery", "##ream",
      "##ark", "##ter", "##tor", "##ort", "##sh", "##ta", "##tch") ++
      ('a' to 'z').map(c => s"##$c")

  private lazy val WpHeadsSorted = WordpieceHeads.sortBy(t => (-t.length, t)).toArray
  private lazy val WpContsSorted =
    WordpieceConts.map(_.stripPrefix("##")).sortBy(t => (-t.length, t)).toArray

  /** Segment one word with the default vocabulary (tables pre-sorted once —
    * this runs per word occurrence).
    */
  def wordpiece(word: String): Seq[String] =
    wordpieceWith(word, WpHeadsSorted, WpContsSorted)

  /** Custom-vocabulary variant; `heads`/`conts` arrive UNSORTED, the
    * longest-first order is imposed here (ties broken lexicographically —
    * irrelevant for distinct fixed-length strings but keeps the contract
    * total).
    */
  def wordpiece(word: String, heads: Seq[String], conts: Seq[String]): Seq[String] =
    wordpieceWith(word,
      heads.sortBy(t => (-t.length, t)).toArray,
      conts.map(_.stripPrefix("##")).sortBy(t => (-t.length, t)).toArray)

  private def wordpieceWith(word: String, hs: Array[String],
      cs: Array[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val table = if (pos == 0) hs else cs
      var i = 0
      var hit: String = null
      while (i < table.length && hit == null) {
        if (word.startsWith(table(i), pos)) hit = table(i)
        i += 1
      }
      if (hit == null) return Seq("[UNK]")
      out += (if (pos == 0) hit else "##" + hit)
      pos += hit.length
    }
    out.toSeq
  }

  /** Oracle: greedy replay per DISTINCT word (the corpus vocabulary is
    * tiny even at 100 TB relative to occurrences — the same word-level
    * memoization a production tokenizer service performs), then token
    * counts weighted by word occurrence.
    */
  def wordpieceDuckSql(topK: Int): String = {
    val hs = WordpieceHeads.sortBy(t => (-t.length, t))
    val cs = WordpieceConts.map(_.stripPrefix("##")).sortBy(t => (-t.length, t))
    def caseOf(entries: Seq[String], pre: String) =
      "CASE " + entries.map(e =>
        s"WHEN substr(w, pos, ${e.length}) = '$e' THEN '$pre$e'").mkString(" ") + " END"
    s"""WITH RECURSIVE allw AS (
       |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
       |), occ AS (
       |  SELECT w, count(*) AS cnt FROM allw WHERE w <> '' GROUP BY 1
       |), seg(w, pos, tok) AS (
       |  SELECT w, 1, CAST(NULL AS VARCHAR) FROM occ
       |  UNION ALL
       |  SELECT w,
       |         pos + length(CASE WHEN substr(tokm, 1, 2) = '##'
       |                           THEN substr(tokm, 3) ELSE tokm END),
       |         tokm
       |  FROM (
       |    SELECT w, pos,
       |           CASE WHEN pos = 1 THEN ${caseOf(hs, "")}
       |                ELSE ${caseOf(cs, "##")} END AS tokm
       |    FROM seg WHERE pos <= length(w)
       |  ) WHERE tokm IS NOT NULL
       |), comp AS (
       |  SELECT w FROM seg GROUP BY w HAVING max(pos) = length(w) + 1
       |), tokcounts AS (
       |  SELECT s.tok AS token, sum(o.cnt) AS n
       |  FROM seg s JOIN comp c ON c.w = s.w JOIN occ o ON o.w = s.w
       |  WHERE s.tok IS NOT NULL GROUP BY 1
       |  UNION ALL
       |  SELECT '[UNK]' AS token, sum(o.cnt) AS n
       |  FROM occ o LEFT JOIN comp c ON c.w = o.w
       |  WHERE c.w IS NULL GROUP BY 1
       |)
       |SELECT token, CAST(sum(n) AS BIGINT) AS n
       |FROM tokcounts GROUP BY 1
       |ORDER BY n DESC, token LIMIT $topK""".stripMargin
  }

  // ====================================================== diversity metrics

  /** Corpus-level template mining: the top-`topK` word `n`-grams by
    * DOCUMENT frequency (each document votes once per distinct gram) with
    * their corpus share — the "which boilerplate headers / license blocks /
    * nav bars recur across the corpus" readout that C4-style cleaning
    * starts from; pair-level substring dedup finds who shares text, this
    * finds WHAT text is shared.
    *
    * All integers (df, corpus doc count) plus one share division; top-K by
    * (df DESC, gram) is a TakeOrdered. Scale shape: grams generate in the
    * scan projection, per-doc distinct collapses before the exchange, one
    * map-side-combinable gram count.
    */
  def templates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, topK: Int = 20): DataFrame = {
    val base = df.select(col(idCol).as("id"), toks(col(textCol)).as("ts"))
      .withColumn("len", size(col("ts")))
    val total = df.agg(count(lit(1)).as("n_docs"))
    base.filter(col("len") >= n)
      .select(col("id"), explode(array_distinct(
        transform(sequence(lit(0), col("len") - n),
          i => concat_ws(" ", (0 until n).map(j =>
            element_at(col("ts"), i + j + 1)): _*)))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("g")).limit(topK)
      .crossJoin(total)
      .select(col("g").as("gram"), col("df"),
        round(col("df").cast("double") / col("n_docs").cast("double"), 6)
          .as("share"))
      .orderBy(col("df").desc, col("gram"))
  }

  /** DuckDB replay of [[templates]] over `textExpr`. */
  def templatesDuckSql(textExpr: String, n: Int = 8, topK: Int = 20): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower($textExpr), '\\s+'),
       |                     t -> t <> '') AS ts
       |  FROM documents
       |), t AS (
       |  SELECT count(*) AS n_docs FROM d
       |), g AS (
       |  SELECT doc_id, unnest(list_distinct(
       |           list_transform(range(0, len(ts) - $n + 1),
       |             i -> array_to_string(list_slice(ts, i + 1, i + $n), ' ')))) AS g
       |  FROM d WHERE len(ts) >= $n
       |), f AS (
       |  SELECT g, count(*) AS df FROM g GROUP BY 1
       |  ORDER BY df DESC, g LIMIT $topK
       |)
       |SELECT f.g AS gram, f.df,
       |       round(CAST(f.df AS DOUBLE) / CAST(t.n_docs AS DOUBLE), 6) AS share
       |FROM f CROSS JOIN t
       |ORDER BY df DESC, gram""".stripMargin

  /** Per-group distribution divergence vs the whole corpus: KL(P‖Q),
    * Jensen-Shannon, and cross-entropy H(P,Q) of each group's unigram
    * distribution P against the corpus-wide distribution Q — the standard
    * domain-shift / mixture-drift readout when curating a multi-source
    * training corpus (a source whose KL spikes is distributionally alien;
    * JS is its symmetric bounded sibling).
    *
    * Exactness: all counts are integers; p and q are single divisions of
    * those integers; every ln term is then folded in ONE ordered running
    * window per group (partition by group, order by word), so both engines
    * add the identical doubles in the identical sequence — the zipfFit
    * summation discipline. KL is always finite because Q's support is a
    * superset of every P's (Q is the corpus).
    *
    * Scale shape: (group, word) and word aggregates are map-side
    * combinable; the groups×vocab expansion joins a |groups|-row table
    * against the vocab (broadcast-sized left side); the serialized step is
    * the per-group vocab fold — vocab-bounded, not corpus-bounded, and
    * parallel across groups.
    */
  def divergence(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gw = df.select(col(groupCol).as("g"), explode(toks(col(textCol))).as("w"))
      .groupBy("g", "w").agg(count(lit(1)).as("pn"))
    val cw = gw.groupBy("w").agg(sum("pn").as("qn"))
    val gt = gw.groupBy("g").agg(sum("pn").as("pt"))
    val ct = cw.agg(sum("qn").as("qt"))
    val p = col("pn").cast("double") / col("pt").cast("double")
    val q = col("qn").cast("double") / col("qt").cast("double")
    val wo = Window.partitionBy("g").orderBy("w")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("g")
    val terms = gt.crossJoin(cw).join(gw, Seq("g", "w"), "left")
      .na.fill(0L, Seq("pn")).crossJoin(ct)
      .withColumn("p", p).withColumn("q", q)
      .withColumn("klt",
        when(col("pn") > 0, col("p") * log(col("p") / col("q"))).otherwise(0.0))
      .withColumn("jpt",
        when(col("pn") > 0,
          col("p") * log(col("p") / ((col("p") + col("q")) / 2))).otherwise(0.0))
      .withColumn("jqt", col("q") * log(col("q") / ((col("p") + col("q")) / 2)))
      .withColumn("cet",
        when(col("pn") > 0, -(col("p") * log(col("q")))).otherwise(0.0))
    terms
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("w")))
      .withColumn("nw", count(lit(1)).over(all))
      .withColumn("types", sum(when(col("pn") > 0, 1L).otherwise(0L)).over(wo))
      .withColumn("skl", sum("klt").over(wo))
      .withColumn("sjp", sum("jpt").over(wo))
      .withColumn("sjq", sum("jqt").over(wo))
      .withColumn("sce", sum("cet").over(wo))
      .filter(col("rn") === col("nw"))
      .select(col("g").as("grp"),
        col("types").cast("long").as("types"),
        col("pt").cast("long").as("tokens"),
        round(col("skl"), 6).as("kl"),
        round((col("sjp") + col("sjq")) / 2, 6).as("js"),
        round(col("sce"), 6).as("ce"))
      .orderBy("grp")
  }

  /** DuckDB replay of [[divergence]]: identical integer counts, identical
    * p/q division trees, identical per-group ordered running-window fold.
    */
  def divergenceDuckSql(groupCol: String): String =
    s"""WITH tk AS (
       |  SELECT $groupCol AS g, unnest($toksDuck) AS w FROM documents
       |), gw AS (
       |  SELECT g, w, count(*) AS pn FROM tk GROUP BY 1, 2
       |), cw AS (
       |  SELECT w, sum(pn) AS qn FROM gw GROUP BY 1
       |), gt AS (
       |  SELECT g, sum(pn) AS pt FROM gw GROUP BY 1
       |), ct AS (
       |  SELECT sum(qn) AS qt FROM cw
       |), fl AS (
       |  SELECT gt.g, gt.pt, cw.w, cw.qn, coalesce(gw.pn, 0) AS pn, ct.qt
       |  FROM gt CROSS JOIN cw CROSS JOIN ct
       |  LEFT JOIN gw ON gw.g = gt.g AND gw.w = cw.w
       |), pq AS (
       |  SELECT g, w, pn, pt,
       |         CAST(pn AS DOUBLE) / CAST(pt AS DOUBLE) AS p,
       |         CAST(qn AS DOUBLE) / CAST(qt AS DOUBLE) AS q
       |  FROM fl
       |), terms AS (
       |  SELECT g, w, pn, pt,
       |         CASE WHEN pn > 0 THEN p * ln(p / q) ELSE 0.0 END AS klt,
       |         CASE WHEN pn > 0 THEN p * ln(p / ((p + q) / 2))
       |              ELSE 0.0 END AS jpt,
       |         q * ln(q / ((p + q) / 2)) AS jqt,
       |         CASE WHEN pn > 0 THEN -(p * ln(q)) ELSE 0.0 END AS cet
       |  FROM pq
       |), run AS (
       |  SELECT g, pt,
       |         row_number() OVER (PARTITION BY g ORDER BY w) AS rn,
       |         count(*) OVER (PARTITION BY g) AS nw,
       |         sum(CASE WHEN pn > 0 THEN 1 ELSE 0 END) OVER wo AS types,
       |         sum(klt) OVER wo AS skl, sum(jpt) OVER wo AS sjp,
       |         sum(jqt) OVER wo AS sjq, sum(cet) OVER wo AS sce
       |  FROM terms
       |  WINDOW wo AS (PARTITION BY g ORDER BY w
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT g AS grp, CAST(types AS BIGINT) AS types,
       |       CAST(pt AS BIGINT) AS tokens,
       |       round(skl, 6) AS kl, round((sjp + sjq) / 2, 6) AS js,
       |       round(sce, 6) AS ce
       |FROM run WHERE rn = nw ORDER BY grp""".stripMargin

  /** Distinct-n lexical diversity per source (Li et al. NAACL'16 — the
    * standard generation-diversity readout, and a data-curation signal:
    * a template-spam source shows collapsed distinct-2/3): for n = 1..3,
    * unique n-grams / total n-grams over within-document windows.
    *
    * Plan: the n-gram fan-out is a generator in the scan projection (no
    * pre-shuffle), one (source, n, gram) aggregate then one (source, n)
    * count — both map-side combinable; nothing is collected or broadcast,
    * so the two-level distinct holds at corpus scale. Exact integers; the
    * single ratio division is the only float op.
    */
  def distinctN(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val base = df.select(col(srcCol).as("source"), toks(col(textCol)).as("ts"))
      .withColumn("len", size(col("ts")))
    def grams(n: Int): Column =
      when(col("len") >= n, transform(sequence(lit(0), col("len") - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("ts"), i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    // totals need no gram materialization at all: per doc there are
    // max(len − n + 1, 0) n-grams, so the total is token-count arithmetic
    // (one tiny per-source aggregate instead of shuffling every gram)
    val totals = base.groupBy("source")
      .agg(sum(greatest(col("len"), lit(0))).as("t1"),
        sum(greatest(col("len") - 1, lit(0))).as("t2"),
        sum(greatest(col("len") - 2, lit(0))).as("t3"))
      .select(col("source"), explode(array((1 to 3).map(n =>
        struct(lit(n).as("n"), col(s"t$n").cast("long").as("total"))): _*)).as("x"))
      .select(col("source"), col("x.n").as("n"), col("x.total").as("total"))
    // the distinct path shuffles each gram once, with map-side partial
    // dedup collapsing repeats before the exchange (no Expand: keeping
    // count(*) out of this aggregate halves the shuffled volume)
    val uniq = base.select(col("source"),
        explode(array((1 to 3).map(n =>
          struct(lit(n).as("n"), grams(n).as("g"))): _*)).as("ng"))
      .select(col("source"), col("ng.n").as("n"), explode(col("ng.g")).as("g"))
      .distinct()
      .groupBy(col("source"), col("n")).agg(count(lit(1)).as("uniq"))
    totals.join(uniq, Seq("source", "n"))
      .select(col("source"), col("n").cast("long").as("n"),
        col("total"), col("uniq"),
        round(col("uniq") / col("total"), 6).as("ratio"))
      .orderBy("source", "n")
  }

  /** DuckDB replay of [[distinctN]]: same tokenizer, same slice windows. */
  def distinctNDuckSql: String =
    s"""WITH tk AS (
       |  SELECT source, $toksDuck AS ts FROM documents
       |), g AS (
       |  SELECT source, n,
       |         unnest(CASE WHEN len(ts) >= n
       |           THEN list_transform(range(0, len(ts) - n + 1),
       |                i -> array_to_string(list_slice(ts, i + 1, i + n), ' '))
       |           ELSE [] END) AS g
       |  FROM tk, (VALUES (1), (2), (3)) t(n)
       |)
       |SELECT source, CAST(n AS BIGINT) AS n,
       |       count(*) AS total, count(DISTINCT g) AS uniq,
       |       round(count(DISTINCT g) / count(*), 6) AS ratio
       |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Zipf rank-frequency fit over the top-`topN` corpus words: OLS of
    * ln(freq) on ln(rank) — slope ≈ −1 is Zipf's law; a corpus whose slope
    * collapses toward 0 is template/boilerplate-heavy (a curation smell).
    * Returns one row: n_words, slope, intercept (ln C), r².
    *
    * Every OLS moment is accumulated in ONE ordered running window over the
    * rank-sorted top-N (both engines fold those ≤ topN doubles in the
    * identical sequential order, so the sums — and hence the closed-form
    * slope/intercept/r² trees — are bit-reproducible; a plain aggregate
    * would be partial-aggregation-order-dependent). The corpus-sized work
    * is the word count + TakeOrdered top-N; the window runs on topN rows.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byFreq = Window.orderBy(col("f").desc, col("w"))
    val run = Window.orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val num = col("rank") * col("sxy") - col("sx") * col("sy")
    val denx = col("rank") * col("sxx") - col("sx") * col("sx")
    val deny = col("rank") * col("syy") - col("sy") * col("sy")
    BoundedWindow(
      df.select(explode(toks(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("w")).limit(topN),
      topN.toLong, s"Zipf OLS fold (top-$topN word ranks by construction)")
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .withColumn("x", log(col("rank").cast("double")))
      .withColumn("y", log(col("f").cast("double")))
      .withColumn("sx", sum("x").over(run))
      .withColumn("sy", sum("y").over(run))
      .withColumn("sxx", sum(col("x") * col("x")).over(run))
      .withColumn("sxy", sum(col("x") * col("y")).over(run))
      .withColumn("syy", sum(col("y") * col("y")).over(run))
      .withColumn("mxr", max("rank").over(all))
      .filter(col("rank") === col("mxr"))
      .select(col("rank").as("n_words"),
        round(num / denx, 6).as("slope"),
        round((col("sy") - (num / denx) * col("sx")) / col("rank"), 6)
          .as("intercept"),
        round((num * num) / (denx * deny), 6).as("r2"))
  }

  /** DuckDB replay of [[zipfFit]]: identical running window, identical
    * closed-form trees (num/denx inlined in the intercept exactly as the
    * Column expression duplicates it).
    */
  def zipfDuckSql(topN: Int): String =
    s"""WITH tk AS (
       |  SELECT $toksDuck AS ts FROM documents
       |), freq AS (
       |  SELECT w, count(*) AS f
       |  FROM (SELECT unnest(ts) AS w FROM tk) GROUP BY 1
       |  ORDER BY f DESC, w LIMIT $topN
       |), r AS (
       |  SELECT f, CAST(row_number() OVER (ORDER BY f DESC, w) AS BIGINT) AS rank
       |  FROM freq
       |), xy AS (
       |  SELECT rank, ln(rank::DOUBLE) AS x, ln(f::DOUBLE) AS y FROM r
       |), run AS (
       |  SELECT rank,
       |         sum(x) OVER wo AS sx, sum(y) OVER wo AS sy,
       |         sum(x * x) OVER wo AS sxx, sum(x * y) OVER wo AS sxy,
       |         sum(y * y) OVER wo AS syy
       |  FROM xy
       |  WINDOW wo AS (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT rank AS n_words,
       |       round((rank * sxy - sx * sy) / (rank * sxx - sx * sx), 6) AS slope,
       |       round((sy - ((rank * sxy - sx * sy) / (rank * sxx - sx * sx)) * sx)
       |             / rank, 6) AS intercept,
       |       round(((rank * sxy - sx * sy) * (rank * sxy - sx * sy))
       |             / ((rank * sxx - sx * sx) * (rank * syy - sy * sy)), 6) AS r2
       |FROM run WHERE rank = (SELECT max(rank) FROM run)""".stripMargin

  // ===================================================== HTML text extraction

  /** Boilerplate-aware text extraction from raw HTML — the first transform
    * of every web-crawl training-data pipeline (CCNet/trafilatura shape):
    * drop script/style blocks, strip tags, decode entities, collapse
    * whitespace, and emit the link-density signal a boilerplate classifier
    * thresholds on (nav/footer chrome is link-dense, body prose is not).
    * The page is CONSTRUCTED deterministically from the document row (the
    * corpus is plain text; the synthetic wrapper adds a title, a tracking
    * script, a style block, a nav bar, and a link-bearing footer) so the
    * oracle replays construction + extraction verbatim.
    *
    * Everything is codegen'd string built-ins — regexp_replace chains,
    * `aggregate` over `regexp_extract_all` for anchor-text chars — per-row
    * and shuffle-free: the 100 TB plan is a pure map. Output per doc:
    * n_links, anchor chars, extracted length, link density, and the first
    * 60 extracted chars (the value-equality probe).
    */
  def htmlExtract(df: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>"), col(sourceCol), lit(" #"),
      col(idCol).cast("string"),
      lit("</title><script type=\"text/javascript\">var t=\""), col(langCol),
      lit("\";track(t);</script><style>.nav a{color:#00f}</style></head><body>"),
      lit("<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/"),
      col(langCol), lit("\">"), upper(col(langCol)),
      lit("</a></div><h1>"), col(sourceCol), lit("</h1><p>"), col(textCol),
      lit("</p><div class=\"footer\"><a href=\"/tos\">Terms &amp; " +
        "Conditions</a> &copy; 2026</div></body></html>"))
    val noScript = regexp_replace(html, "<script[^>]*>[\\s\\S]*?</script>", " ")
    val noStyle = regexp_replace(noScript, "<style[^>]*>[\\s\\S]*?</style>", " ")
    val anchors = regexp_extract_all(noStyle,
      lit("<a [^>]*>([^<]*)</a>"), lit(1))
    // explicit whitespace class, NOT \s: Java-regex \s includes \x0B
    // (vertical tab) while DuckDB's RE2 \s excludes it — the two engines
    // agree by construction only with the class spelled out identically
    val body = trim(regexp_replace(
      replace(replace(regexp_replace(noStyle, "<[^>]*>", " "),
        lit("&amp;"), lit("&")), lit("&copy;"), lit("(c)")),
      "[ \\t\\n\\r\\f\\x0B]+", " "))
    df.select(col(idCol).as("doc_id"),
        ((length(noStyle) - length(replace(noStyle, lit("<a "), lit("")))) /
          lit(3)).cast("long").as("n_links"),
        aggregate(anchors, lit(0L), (acc, x) => acc + length(x))
          .as("anchor_chars"),
        length(body).as("extracted_len"),
        body.as("b"))
      .select(col("doc_id"), col("n_links"), col("anchor_chars"),
        col("extracted_len"),
        round(col("anchor_chars").cast("double") /
          col("extracted_len").cast("double"), 6).as("link_density"),
        substring(col("b"), 1, 60).as("head"))
      .orderBy("doc_id")
  }

  /** DuckDB replay of [[htmlExtract]]: identical construction literal,
    * identical regex chain (RE2 supports the same `[\s\S]*?` lazy blocks),
    * `'g'`-flagged replaces for Spark's replace-all semantics.
    */
  def htmlExtractDuckSql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>' || source || ' #' || doc_id::VARCHAR ||
      |    '</title><script type="text/javascript">var t="' || lang ||
      |    '";track(t);</script><style>.nav a{color:#00f}</style></head><body>' ||
      |    '<div class="nav"><a href="/">Home</a> <a href="/' || lang || '">' ||
      |    upper(lang) || '</a></div><h1>' || source || '</h1><p>' || text ||
      |    '</p><div class="footer"><a href="/tos">Terms &amp; Conditions</a>' ||
      |    ' &copy; 2026</div></body></html>' AS html
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, regexp_replace(regexp_replace(html,
      |    '<script[^>]*>[\s\S]*?</script>', ' ', 'g'),
      |    '<style[^>]*>[\s\S]*?</style>', ' ', 'g') AS ns
      |  FROM h
      |), b AS (
      |  SELECT doc_id, ns,
      |    trim(regexp_replace(replace(replace(
      |      regexp_replace(ns, '<[^>]*>', ' ', 'g'),
      |      '&amp;', '&'), '&copy;', '(c)'), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS body,
      |    CAST(coalesce(list_sum(list_transform(
      |      regexp_extract_all(ns, '<a [^>]*>([^<]*)</a>', 1),
      |      x -> length(x))), 0) AS BIGINT) AS anchor_chars
      |  FROM s
      |)
      |SELECT doc_id,
      |  CAST((length(ns) - length(replace(ns, '<a ', ''))) / 3 AS BIGINT)
      |    AS n_links,
      |  anchor_chars,
      |  length(body) AS extracted_len,
      |  round(anchor_chars::DOUBLE / length(body)::DOUBLE, 6) AS link_density,
      |  substr(body, 1, 60) AS head
      |FROM b ORDER BY doc_id""".stripMargin
}
