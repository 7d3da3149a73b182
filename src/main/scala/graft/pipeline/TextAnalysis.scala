package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline.
  * All pure column expressions or scalar UDFs — fully codegen/pushdown
  * friendly, no shuffles, no state; linear scans that scale to any data size.
  */
object TextAnalysis {

  // -------------------------------------------------------------- counting

  /** Whitespace token count as a pure column expression (codegen'd). */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish sub-word token count: alpha runs, digit runs, and individual
    * punctuation each count as one token — a cheap deterministic proxy for a
    * byte-pair tokenizer's token count.
    */
  private val bpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column = {
    val re = bpeTokenRe
    udf((s: String) => if (s == null) 0 else re.r.findAllIn(s).length).apply(text)
  }

  // -------------------------------------------------------------- quality

  private val stopwords = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are", "from")

  /** Stable ordering of the stopword vocabulary — for oracle SQL generation. */
  val stopwordList: Seq[String] = stopwords.toSeq.sorted

  /** Quality-scoring feature columns: length, token count, mean word length,
    * punctuation ratio, digit ratio, stopword ratio, uppercase ratio.
    * Returned as a struct so callers can `select(textQuality($"text").as("q"))`
    * then prune fields — Catalyst prunes unused struct fields at the scan.
    */
  def textQuality(text: Column): Column = {
    val n = length(text).cast("double")
    val nPunct = (n - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
    val nDigit = (n - length(regexp_replace(text, "[0-9]", ""))).cast("double")
    val nUpper = (n - length(regexp_replace(text, "[A-Z]", ""))).cast("double")
    val toks = tokenCountWs(text).cast("double")
    val stopUdf = udf((s: String) => {
      if (s == null || s.isEmpty) 0.0
      else {
        val ws = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (ws.isEmpty) 0.0 else ws.count(stopwords.contains).toDouble / ws.length
      }
    })
    struct(
      n.as("n_chars"),
      toks.as("n_tokens"),
      when(toks > 0, n / toks).otherwise(lit(0.0)).as("mean_token_len"),
      when(n > 0, nPunct / n).otherwise(lit(0.0)).as("punct_ratio"),
      when(n > 0, nDigit / n).otherwise(lit(0.0)).as("digit_ratio"),
      when(n > 0, nUpper / n).otherwise(lit(0.0)).as("upper_ratio"),
      stopUdf(text).as("stopword_ratio"))
  }

  /** The Gopher rule stopword list, in the paper's order (Rae et al. 2021,
    * App. A1.1): a doc must contain at least two of these to pass.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule signals (Rae et al. 2021, "Scaling Language Models",
    * App. A1.1) — the published heuristic filter set most large text-corpus
    * pipelines start from. Pure column expressions over one whitespace
    * tokenization (array reused across all five rules, no UDF):
    *   - word count in [50, 100000]
    *   - mean word length in [3, 10]
    *   - symbol-to-word ratio ('#' and '...' occurrences per word) <= 0.1
    *   - >= 80% of words contain an alphabetic character
    *   - >= 2 of the 8 Gopher stopwords present
    * Returns a struct of the signals plus the combined `pass` flag; ratio
    * fields are raw doubles (callers round for display/oracle).
    */
  def gopherRules(text: Column): Column = {
    val toks = filter(split(trim(text), "\\s+"), t => length(t) > 0)
    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
    val meanLen = when(nWords > 0, sumLen.cast("double") / nWords.cast("double"))
      .otherwise(lit(0.0))
    val nHash = (length(text) - length(replace(text, lit("#"), lit("")))).cast("long")
    val nEllipsis = ((length(text) - length(replace(text, lit("..."), lit("")))) / 3)
      .cast("long")
    val symRatio = when(nWords > 0,
        (nHash + nEllipsis).cast("double") / nWords.cast("double"))
      .otherwise(lit(0.0))
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val alphaFrac = when(nWords > 0,
        alphaWords.cast("double") / nWords.cast("double"))
      .otherwise(lit(0.0))
    val lowerToks = transform(toks, t => lower(t))
    val stopHits = gopherStopwords
      .map(w => array_contains(lowerToks, w).cast("long")).reduce(_ + _)
    val pass = nWords >= 50 && nWords <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symRatio <= 0.1 && alphaFrac >= 0.8 && stopHits >= 2
    struct(
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"),
      alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"),
      pass.cast("long").as("pass"))
  }

  /** DuckDB replay of [[gopherRules]] over `documents`: identical
    * tokenization (regex whitespace split, empties dropped), identical
    * integer counts, identical double divisions, ratios rounded to 6 like
    * the driver query's output projection.
    */
  def gopherRulesDuckSql(table: String, idCol: String, textCol: String): String = {
    val stops = gopherStopwords
      .map(w => s"list_contains(lt, '$w')::BIGINT").mkString(" + ")
    s"""WITH tk AS (
       |  SELECT $idCol,
       |         list_filter(string_split_regex(trim($textCol), '\\s+'),
       |                     __t -> length(__t) > 0) AS toks,
       |         (length($textCol) - length(replace($textCol, '#', '')))::BIGINT AS nh,
       |         ((length($textCol) - length(replace($textCol, '...', ''))) // 3)::BIGINT AS ne
       |  FROM $table
       |), m AS (
       |  SELECT $idCol,
       |         len(toks)::BIGINT AS n_words,
       |         coalesce(list_sum(list_transform(toks, __t -> length(__t)::BIGINT)), 0)::BIGINT AS sl,
       |         nh, ne,
       |         len(list_filter(toks, __t -> regexp_matches(__t, '[A-Za-z]')))::BIGINT AS aw,
       |         list_transform(toks, __t -> lower(__t)) AS lt
       |  FROM tk
       |), r AS (
       |  SELECT $idCol, n_words,
       |         CASE WHEN n_words > 0 THEN sl::DOUBLE / n_words::DOUBLE ELSE 0.0 END AS mean_word_len,
       |         CASE WHEN n_words > 0 THEN (nh + ne)::DOUBLE / n_words::DOUBLE ELSE 0.0 END AS symbol_ratio,
       |         CASE WHEN n_words > 0 THEN aw::DOUBLE / n_words::DOUBLE ELSE 0.0 END AS alpha_frac,
       |         ($stops)::BIGINT AS stop_hits
       |  FROM m
       |)
       |SELECT $idCol, n_words, round(mean_word_len, 6) AS mean_word_len,
       |       round(symbol_ratio, 6) AS symbol_ratio,
       |       round(alpha_frac, 6) AS alpha_frac, stop_hits,
       |       (n_words >= 50 AND n_words <= 100000
       |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |        AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
       |        AND stop_hits >= 2)::BIGINT AS pass
       |FROM r ORDER BY $idCol""".stripMargin
  }

  /** Corpus-level RAKE keyphrases (Rose et al. 2010): candidate phrases =
    * maximal runs of non-stopword tokens (punctuation and the stopword
    * vocabulary both act as phrase breaks), word score = deg/freq with
    * deg(w) = Σ phrase length over w's occurrences, phrase score = Σ of its
    * words' scores. This is the corpus aggregate (top-k across all docs) —
    * two explodes + two hash aggregates + one vocab-keyed join, nothing
    * broadcast, so the phrase/word tables scale with the corpus.
    *
    * The phrase segmentation is ONE regex pipeline (punct→break,
    * \b-stopword→break, split) built from [[stopwordList]], so the DuckDB
    * replay runs the character-identical pattern.
    */
  def rakeKeyphrases(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val ph = df.select(explode(rakePhraseArrays(col(textCol))).as("p"))
      .persist()
    val words = ph.select(explode(col("p")).as("w"), size(col("p")).as("l"))
    val ws = words.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("l")).as("deg"))
      .select(col("w"),
        round(col("deg").cast("double") / col("freq").cast("double"), 6).as("wscore"))
    val dp = ph.select(array_join(col("p"), " ").as("phrase"), col("p")).distinct()
    val occ = ph.groupBy(array_join(col("p"), " ").as("phrase"))
      .agg(count(lit(1)).as("n_occ"))
    val sc = dp.select(col("phrase"), explode(col("p")).as("w"))
      .join(ws, "w")
      .groupBy("phrase").agg(round(sum(col("wscore")), 6).as("score"))
    sc.join(occ, "phrase")
      .select(col("phrase"), col("n_occ"), col("score"))
      .orderBy(col("score").desc, col("phrase")).limit(k)
  }

  private val stopBreakRe: String =
    stopwordList.mkString("\\b(", "|", ")\\b")

  /** array<array<string>>: the RAKE candidate phrases of one text. */
  private def rakePhraseArrays(text: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]+", "|"), stopBreakRe, "|")
    filter(
      transform(split(cleaned, "\\|"),
        p => filter(split(trim(p), "\\s+"), w => length(w) > 0)),
      p => size(p) > 0)
  }

  /** DuckDB replay of [[rakeKeyphrases]] over `documents.text`. */
  def rakeDuckSql(k: Int): String =
    s"""WITH ph AS (
       |  SELECT unnest(list_filter(list_transform(
       |           string_split(regexp_replace(regexp_replace(lower(text),
       |             '[^a-z0-9\\s]+', '|', 'g'), '$stopBreakRe', '|', 'g'), '|'),
       |           __p -> list_filter(string_split_regex(trim(__p), '\\s+'),
       |                              __w -> length(__w) > 0)),
       |         __p -> len(__p) > 0)) AS p
       |  FROM documents
       |), words AS (SELECT unnest(p) AS w, len(p) AS l FROM ph),
       |ws AS (
       |  SELECT w, round(sum(l)::DOUBLE / count(*)::DOUBLE, 6) AS wscore
       |  FROM words GROUP BY 1
       |), dp AS (SELECT DISTINCT array_to_string(p, ' ') AS phrase, p FROM ph),
       |occ AS (
       |  SELECT array_to_string(p, ' ') AS phrase, count(*) AS n_occ
       |  FROM ph GROUP BY 1
       |), pw AS (SELECT phrase, unnest(p) AS w FROM dp),
       |sc AS (
       |  SELECT phrase, round(sum(wscore), 6) AS score
       |  FROM pw JOIN ws USING (w) GROUP BY 1
       |)
       |SELECT s.phrase, o.n_occ, s.score
       |FROM sc s JOIN occ o USING (phrase)
       |ORDER BY score DESC, phrase LIMIT $k""".stripMargin

  // ------------------------------------------------------------ language id

  /** Tiny per-language marker vocabularies (top function words). A document
    * votes for the language with the highest marker hit-rate; CJK characters
    * short-circuit to zh/ja/ko by script. Deterministic n-gram/stopword
    * heuristic — no model download, linear scan.
    */
  private val markers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"),
    "fr" -> Set("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "en", "que", "una", "por"),
    "it" -> Set("il", "la", "e", "di", "che", "per", "una", "sono", "con", "non"),
    "pt" -> Set("o", "a", "os", "as", "e", "de", "que", "em", "uma", "para"))

  def languageId(text: Column): Column =
    udf((s: String) => {
      if (s == null || s.isEmpty) "und"
      else {
        val cjk = s.codePoints().limit(400).filter(cp =>
          (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF) ||
          (cp >= 0xAC00 && cp <= 0xD7AF)).count()
        if (cjk > 0) {
          if (s.codePoints().anyMatch(cp => cp >= 0x3040 && cp <= 0x30FF)) "ja"
          else if (s.codePoints().anyMatch(cp => cp >= 0xAC00 && cp <= 0xD7AF)) "ko"
          else "zh"
        } else {
          val ws = s.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
          if (ws.isEmpty) "und"
          else {
            val scores = markers.view.mapValues(m => ws.count(m.contains)).toMap
            val (best, score) = scores.maxBy { case (lang, c) => (c, lang) }
            if (score == 0) "und" else best
          }
        }
      }
    }).apply(text)

  // ---------------------------------------------------------- fingerprints

  /** 64-bit FNV-1a — stable across JVMs/runs (no String.hashCode). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Whole-document fingerprint: FNV-1a over whitespace-normalized,
    * lowercased text — equal fingerprints ⟺ equal normalized text
    * (modulo 2^-64 collisions).
    */
  def docFingerprint(text: Column): Column =
    udf((s: String) =>
      if (s == null) 0L
      else fnv1a64(s.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" "))
    ).apply(text)

  // ------------------------------------------- oracle-expressible variants
  //
  // These variants use ONLY constructs with exact DuckDB-SQL equivalents
  // (polynomial char hash mod 1e9+7, list folds, marker-vocabulary voting),
  // so the driver's DuckDB correctness gate can hash-match them end-to-end.
  // Each has a companion *DuckSql generator emitting the matching SQL — keep
  // the pairs in sync. Pure column expressions: codegen, no UDFs.

  /** Polynomial char hash: fold (acc*31 + code(char)) % 1_000_000_007, seed 7.
    * ASCII-safe (Spark `ascii` and DuckDB `ord` agree on single-byte chars).
    */
  def polyHash(strCol: Column): Column = {
    val codes = transform(
      filter(split(strCol, ""), c => c =!= ""),
      c => ascii(c).cast("long"))
    aggregate(codes, lit(7L), (acc, c) => (acc * 31 + c) % 1000000007L)
  }

  /** DuckDB equivalent of [[polyHash]] over the SQL expression `e`. */
  def polyHashDuckSql(e: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(range(1, length($e) + 1), i -> CAST(ord(substr($e, i, 1)) AS BIGINT))), " +
      "(a, c) -> (a * 31 + c) % 1000000007)"

  /** Whole-document fingerprint over whitespace-normalized lowercase text —
    * the oracle-checkable analog of [[docFingerprint]].
    */
  def polyFingerprint(text: Column): Column =
    polyHash(array_join(filter(split(lower(text), "\\s+"), t => t =!= ""), " "))

  def polyFingerprintDuckSql(textExpr: String): String =
    polyHashDuckSql(
      s"array_to_string(list_filter(string_split_regex(lower($textExpr), '\\s+'), t -> t <> ''), ' ')")

  /** Language-ID as a pure column expression: marker-vocabulary voting with
    * the same argmax-by-(count, lang) tie rule as [[languageId]], minus the
    * CJK script short-circuit (script detection needs codepoints; documents
    * in this pipeline stage are ASCII — route CJK via [[languageId]]).
    */
  def languageIdExpr(text: Column): Column = {
    val toks = filter(split(lower(text), "[^a-z]+"), t => t =!= "")
    val langsDesc = markers.keys.toSeq.sorted.reverse // pt, it, fr, es, en, de
    val counts: Map[String, Column] = langsDesc.map { l =>
      l -> size(filter(toks, t => t.isin(markers(l).toSeq: _*)))
    }.toMap
    val total = counts.values.reduce(_ + _)
    // maxBy((count, lang)): scan langs in descending name order, first one
    // whose count >= all others wins (ties fall to the later alphabet name)
    val picked = langsDesc.init.foldRight(lit(langsDesc.last)) { (l, els) =>
      val cond = langsDesc.filterNot(_ == l).map(o => counts(l) >= counts(o)).reduce(_ && _)
      when(cond, lit(l)).otherwise(els)
    }
    when(total === 0, lit("und")).otherwise(picked)
  }

  /** DuckDB equivalent of [[languageIdExpr]] over `textExpr`. */
  def languageIdDuckSql(textExpr: String): String = {
    val toks = s"list_filter(string_split_regex(lower($textExpr), '[^a-z]+'), t -> t <> '')"
    val langsDesc = markers.keys.toSeq.sorted.reverse
    def cnt(l: String): String = {
      val in = markers(l).toSeq.sorted.map(w => s"'$w'").mkString(", ")
      s"len(list_filter($toks, t -> t IN ($in)))"
    }
    val total = langsDesc.map(cnt).mkString(" + ")
    val branches = langsDesc.init.map { l =>
      val cond = langsDesc.filterNot(_ == l).map(o => s"${cnt(l)} >= ${cnt(o)}").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN ($total) = 0 THEN 'und' $branches ELSE '${langsDesc.last}' END"
  }

  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * k-gram rolling hashes, window-min selection. Robust local fingerprints
    * for near-dup / overlap detection; returns array<long>.
    */
  def winnowingFingerprints(text: Column, k: Int = 8, window: Int = 4): Column =
    udf((s: String) => {
      if (s == null || s.length < k) Array.empty[Long]
      else {
        val norm = s.toLowerCase.replaceAll("\\s+", " ")
        val hashes = new Array[Long](norm.length - k + 1)
        var i = 0
        while (i + k <= norm.length) { hashes(i) = fnv1a64(norm.substring(i, i + k)); i += 1 }
        val out = scala.collection.mutable.LinkedHashSet.empty[Long]
        var w = 0
        while (w + window <= hashes.length) {
          var m = hashes(w); var j = 1
          while (j < window) { if (hashes(w + j) < m) m = hashes(w + j); j += 1 }
          out += m
          w += 1
        }
        out.toArray
      }
    }).apply(text)

  /** Shannon-entropy quality signals per document: character entropy and
    * whitespace-token entropy (both in nats), plus the distinct counts.
    * Low character entropy flags degenerate/repeated text; token entropy
    * near log(n_tokens) flags no-repetition (likely random) bags of words.
    *
    * Both sums run over the DISTINCT symbols in ascending order so the
    * floating-point accumulation order is fixed and the DuckDB replay can
    * reproduce it; a compiled per-row loop, no shuffle — the same
    * scale-shape as [[textQuality]]. ASCII corpus assumption: entropy is
    * computed over UTF-16 code units, which coincide with code points for
    * the BMP (the oracle splits per character).
    */
  def entropySignals(text: Column): Column = {
    val f = udf((s: String) => {
      def entropy[T: Ordering](xs: Seq[T]): (Double, Int) = {
        if (xs.isEmpty) (0.0, 0)
        else {
          val n = xs.length.toDouble
          val counts = xs.groupBy(identity).map { case (k, v) => (k, v.size) }
            .toSeq.sortBy(_._1)
          var h = 0.0
          counts.foreach { case (_, k) =>
            val p = k / n
            h += p * math.log(p)
          }
          (BigDecimal(-h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            counts.length)
        }
      }
      val t = if (s == null) "" else s
      val (ce, cd) = entropy(t.toSeq)
      val (te, td) = entropy(t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      (ce, cd, te, td)
    })
    f(text).cast("struct<char_entropy:double,n_distinct_chars:int," +
      "token_entropy:double,n_distinct_tokens:int>")
  }

  /** DuckDB fragment replaying [[entropySignals]] for the text expression
    * `e`: per-symbol histograms via list ops, summed over the sorted
    * distinct-symbol list (same accumulation order as the Scala loop, same
    * `-round(Σ p·ln p, 6)` finish). Yields 4 select-list items.
    */
  def entropySignalsDuckSql(e: String): String = {
    def ent(listExpr: String, alias: String, dAlias: String): String =
      s"""CASE WHEN len($listExpr) = 0 THEN 0.0 ELSE
         |  round(-list_sum(list_transform(list_sort(list_distinct($listExpr)),
         |    __c -> (len(list_filter($listExpr, __x -> __x = __c)) / CAST(len($listExpr) AS DOUBLE))
         |           * ln(len(list_filter($listExpr, __x -> __x = __c)) / CAST(len($listExpr) AS DOUBLE)))), 6)
         |END AS $alias,
         |CAST(len(list_distinct($listExpr)) AS INT) AS $dAlias""".stripMargin
    val chars = s"string_split(coalesce($e, ''), '')"
    val toks = s"list_filter(string_split_regex(lower(coalesce($e, '')), '\\s+'), __t -> __t <> '')"
    ent(chars, "char_entropy", "n_distinct_chars") + ",\n" +
      ent(toks, "token_entropy", "n_distinct_tokens")
  }
}
