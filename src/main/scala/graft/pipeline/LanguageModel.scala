package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed n-gram language-model scoring — the CCNet-style "perplexity
  * filter" of a training-data pipeline: train token statistics on a trusted
  * corpus slice, score every candidate document by its average negative
  * log-likelihood, keep the fluent tail. (Smoothed counts stand in for the
  * usual KenLM model; the plan shape is the point.)
  *
  * Plan shape (the part that must survive 100 TB): unigram/bigram counts
  * are map-side-combined `groupBy` aggregations on word keys; scoring joins
  * the candidate corpus's exploded bigrams to the two count tables with
  * plain sort-merge equi-joins (the model tables shard on the same word
  * keys — no broadcast of a potentially huge model); the single-row vocab
  * scalar is the only broadcast. Everything before the joins is codegen
  * built-ins (`split`/`slice`/`zip_with`), no UDFs.
  */
object LanguageModel {

  private def toks(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Adjacent-token pairs of a token array as (w1, w2) structs. */
  private def bigramsOf(ts: Column): Column =
    zip_with(slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))

  /** Add-one-smoothed bigram NLL scoring: p(w2|w1) = (c(w1 w2) + 1) /
    * (c(w1) + V) with counts from `train` and V = train vocabulary size.
    * One row per `score` document with ≥ 1 bigram: the bigram count, how
    * many bigrams the model has seen (`n_known` — the coverage signal), and
    * the average NLL rounded to 4 decimals (sub-ULP summation-order noise
    * sits ~8 orders of magnitude below the rounding grid).
    */
  def bigramScore(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tr = train.select(toks(col(textCol)).as("ts"))
    val sc = score.select(col(idCol).as("id"), toks(col(textCol)).as("ts"))

    val uni = tr.select(explode(col("ts")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = tr.filter(size(col("ts")) >= 2)
      .select(explode(bigramsOf(col("ts"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))

    sc.filter(size(col("ts")) >= 2)
      .select(col("id"), explode(bigramsOf(col("ts"))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("cb")).as("n_known"),
        round(avg(log((coalesce(col("cu"), lit(0L)) + col("v")).cast("double")
          / (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double"))), 4)
          .as("avg_nll"))
      .orderBy("id")
  }

  /** Interpolated Kneser–Ney bigram scoring — the smoothing a production
    * perplexity filter actually ships (KenLM's default family; Kneser &
    * Ney 1995, Chen & Goodman 1998 eq. 4.25), beside [[bigramScore]]'s
    * add-one baseline:
    *
    *   P(w|u) = max(c(uw) − D, 0)/c(u) + D·N₁₊(u·)/c(u) · Pc(w)   (seen u)
    *   P(w|u) = Pc(w)                                            (unseen u)
    *   Pc(w)  = (N₁₊(·w) + 1) / (B + V + 1)
    *
    * with discount D = 0.75 (exactly representable in binary — the float
    * tree is engine-portable), B = distinct bigram types, V = vocabulary
    * size. The continuation distribution carries one add-one pseudo-count
    * so unseen words keep positive mass (the leftover 1/(B+V+1) is the
    * OOV share). All model tables derive from ONE bigram count aggregate:
    * c(u) and N₁₊(u·) are a groupBy(w1) over it, N₁₊(·w) a groupBy(w2),
    * B and V single-row broadcast scalars — same sort-merge join shape as
    * [[bigramScore]], no broadcast of the model itself. Per-doc output:
    * (id, n_bigrams, n_known, avg_nll rounded to 4 — identical
    * parenthesization to the DuckDB replay, summation noise ≪ grid).
    */
  def knBigramScore(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tr = train.select(toks(col(textCol)).as("ts"))
    val sc = score.select(col(idCol).as("id"), toks(col(textCol)).as("ts"))

    val bi = tr.filter(size(col("ts")) >= 2)
      .select(explode(bigramsOf(col("ts"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val ctx = bi.groupBy("w1")
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1f"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("n1w"))
    val scal = bi.agg(count(lit(1)).as("bb")).crossJoin(
      tr.select(explode(col("ts")).as("w"))
        .agg(count_distinct(col("w")).as("v")))

    val pc = (coalesce(col("n1w"), lit(0L)) + lit(1L)).cast("double") /
      (col("bb") + col("v") + lit(1L)).cast("double")
    val p = when(col("cu").isNotNull,
      greatest(coalesce(col("cb"), lit(0L)).cast("double") - lit(0.75), lit(0.0))
        / col("cu").cast("double") +
        ((lit(0.75) * col("n1f").cast("double")) / col("cu").cast("double")) * pc)
      .otherwise(pc)

    sc.filter(size(col("ts")) >= 2)
      .select(col("id"), explode(bigramsOf(col("ts"))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(scal))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("cb")).as("n_known"),
        round(avg(-log(p)), 4).as("avg_nll"))
      .orderBy("id")
  }

  /** DuckDB replay of [[knBigramScore]] — identical count tables, identical
    * parenthesization of the probability tree.
    */
  def knBigramScoreDuckSql(trainPred: String, scorePred: String): String = {
    val ts = """list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"""
    s"""WITH d AS (
       |  SELECT doc_id, $ts AS ts FROM documents
       |), bc AS (
       |  SELECT w1, w2, count(*) AS cb FROM (
       |    SELECT ts[i] AS w1, ts[i + 1] AS w2
       |    FROM (SELECT ts, unnest(range(1, len(ts))) AS i
       |          FROM d WHERE ($trainPred) AND len(ts) >= 2)
       |  ) GROUP BY 1, 2
       |), ctx AS (
       |  SELECT w1, CAST(sum(cb) AS BIGINT) AS cu, count(*) AS n1f
       |  FROM bc GROUP BY 1
       |), cont AS (
       |  SELECT w2, count(*) AS n1w FROM bc GROUP BY 1
       |), scal AS (
       |  SELECT (SELECT count(*) FROM bc) AS bb,
       |         (SELECT count(DISTINCT w1)
       |          FROM (SELECT unnest(ts) AS w1 FROM d WHERE $trainPred)) AS v
       |), scb AS (
       |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
       |        FROM d WHERE ($scorePred) AND len(ts) >= 2)
       |)
       |SELECT doc_id AS id, count(*) AS n_bigrams, count(b.cb) AS n_known,
       |  round(avg(-ln(
       |    CASE WHEN c.cu IS NOT NULL THEN
       |      greatest(coalesce(b.cb, 0)::DOUBLE - 0.75, 0.0) / c.cu::DOUBLE
       |        + ((0.75 * c.n1f::DOUBLE) / c.cu::DOUBLE)
       |          * ((coalesce(n.n1w, 0) + 1)::DOUBLE / (s.bb + s.v + 1)::DOUBLE)
       |    ELSE (coalesce(n.n1w, 0) + 1)::DOUBLE / (s.bb + s.v + 1)::DOUBLE
       |    END)), 4) AS avg_nll
       |FROM scb q
       |LEFT JOIN bc b ON q.w1 = b.w1 AND q.w2 = b.w2
       |LEFT JOIN ctx c ON q.w1 = c.w1
       |LEFT JOIN cont n ON q.w2 = n.w2
       |CROSS JOIN scal s
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of [[bigramScore]] with the train/score split expressed
    * as predicates over the `documents` table.
    */
  def bigramScoreDuckSql(trainPred: String, scorePred: String): String = {
    val ts = """list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"""
    s"""WITH d AS (
       |  SELECT doc_id, $ts AS ts FROM documents
       |), uc AS (
       |  SELECT w1, count(*) AS cu
       |  FROM (SELECT unnest(ts) AS w1 FROM d WHERE $trainPred) GROUP BY w1
       |), vv AS (
       |  SELECT count(*) AS v FROM uc
       |), bc AS (
       |  SELECT w1, w2, count(*) AS cb FROM (
       |    SELECT ts[i] AS w1, ts[i + 1] AS w2
       |    FROM (SELECT ts, unnest(range(1, len(ts))) AS i
       |          FROM d WHERE ($trainPred) AND len(ts) >= 2)
       |  ) GROUP BY 1, 2
       |), scb AS (
       |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
       |        FROM d WHERE ($scorePred) AND len(ts) >= 2)
       |)
       |SELECT doc_id AS id, count(*) AS n_bigrams, count(b.cb) AS n_known,
       |  round(avg(ln((coalesce(u.cu, 0) + v.v)::DOUBLE / (coalesce(b.cb, 0) + 1))), 4) AS avg_nll
       |FROM scb s
       |LEFT JOIN bc b ON s.w1 = b.w1 AND s.w2 = b.w2
       |LEFT JOIN uc u ON s.w1 = u.w1
       |CROSS JOIN vv v
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
