package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes — the classic "quality classifier"
  * stage of a training-data pipeline (fastText-style: train on a labeled
  * slice, score the whole corpus, keep/route by predicted class).
  *
  * Plan shape at 100 TB: training is two map-side-combinable `groupBy`
  * counts (per (label, word) and per label); scoring joins the corpus's
  * exploded tokens to the (label, word) log-weight table with a sort-merge
  * equi-join on the word key — the model stays SHARDED on words, nothing
  * large is broadcast (the per-label constant table is a handful of rows).
  * Per-document per-label scores reduce in one aggregate; argmax is a
  * window over ≤ |labels| rows per doc. Everything outside the joins is
  * codegen built-ins.
  *
  * score(d, l) = log P(l) − n_toks(d)·log(n_l + V) + Σ_w c(d,w)·log(c(l,w)+1)
  * (add-one smoothing; only (l,w) pairs seen in training contribute to the
  * sum because log(0+1) = 0 — that is what keeps the model table sparse).
  */
object Classify {

  private def toks(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Train on `train` (cols id, label, text), predict for `score` (cols id,
    * label, text — label kept for the accuracy flag). Returns one row per
    * scored doc: (id, label, predicted, correct, margin) where margin is
    * the rounded score gap to the runner-up (0.0 when only one label
    * scored). Scores are rounded to 6 decimals BEFORE the argmax so the
    * ranking is reproducible across engines; ties break on label order.
    */
  def naiveBayes(train: DataFrame, score: DataFrame): DataFrame = {
    val tr = train.select(col("label"), toks(col("text")).as("ts"))
    val sc = score.select(col("id"), col("label"), toks(col("text")).as("ts"))

    // model: per-(label, word) counts, per-label token totals + doc priors,
    // vocab size — all tiny relative to the corpus, all one-pass aggregates
    val lw = tr.select(col("label"), explode(col("ts")).as("w"))
      .groupBy("label", "w").agg(count(lit(1)).as("clw"))
    val lab = tr.groupBy("label")
      .agg(count(lit(1)).as("n_docs"), sum(size(col("ts"))).as("n_toks"))
    val nTrain = tr.count().toDouble
    val vocab = lw.select(col("w")).distinct().count()

    // per-label constants: log prior and the per-token OOV/denominator term
    val labC = lab.select(col("label").as("l"),
      (log(col("n_docs").cast("double")) - math.log(nTrain)).as("logprior"),
      log((col("n_toks") + lit(vocab)).cast("double")).as("logdenom"))

    // per-doc token multiset (c(d,w)) and total length
    val dw = sc.select(col("id"), explode(col("ts")).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("cdw"))
    val dlen = sc.select(col("id"), col("label"), size(col("ts")).as("len"))

    // known-word contribution per (doc, label): the sparse sort-merge join
    val contrib = dw.join(lw, Seq("w"))
      .groupBy(col("id"), col("label").as("l"))
      .agg(sum(col("cdw").cast("double") * log(col("clw").cast("double") + 1.0)).as("s_known"))

    // dense (doc × label) frame so labels with zero known words still score
    val scored = dlen.crossJoin(broadcast(labC))
      .join(contrib, Seq("id", "l"), "left")
      .select(col("id"), col("label"), col("l"),
        round(col("logprior") - col("len").cast("double") * col("logdenom")
          + coalesce(col("s_known"), lit(0.0)), 6).as("sc"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("sc").desc, col("l"))
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col("sc"), 1).over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("label"), col("l").as("predicted"),
        (col("l") === col("label")).as("correct"),
        round(col("sc") - coalesce(col("nxt"), col("sc")), 6).as("margin"))
      .orderBy("id")
  }

  /** DuckDB replay of [[naiveBayes]] with train/score as predicates over
    * `documents` (id=doc_id, label=lang).
    */
  def naiveBayesDuckSql(trainPred: String, scorePred: String): String = {
    val ts = """list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"""
    s"""WITH d AS (
       |  SELECT doc_id AS id, lang AS label, $ts AS ts FROM documents
       |), tr AS (SELECT * FROM d WHERE $trainPred),
       |sc AS (SELECT * FROM d WHERE $scorePred),
       |lw AS (
       |  SELECT label, w, count(*) AS clw
       |  FROM (SELECT label, unnest(ts) AS w FROM tr) GROUP BY 1, 2
       |), lab AS (
       |  SELECT label, count(*) AS n_docs, sum(len(ts)) AS n_toks FROM tr GROUP BY 1
       |), consts AS (
       |  SELECT label AS l,
       |         ln(n_docs::DOUBLE) - ln((SELECT count(*) FROM tr)::DOUBLE) AS logprior,
       |         ln((n_toks + (SELECT count(DISTINCT w) FROM lw))::DOUBLE) AS logdenom
       |  FROM lab
       |), dw AS (
       |  SELECT id, w, count(*) AS cdw
       |  FROM (SELECT id, unnest(ts) AS w FROM sc) GROUP BY 1, 2
       |), dlen AS (SELECT id, label, len(ts) AS len FROM sc),
       |contrib AS (
       |  SELECT dw.id, lw.label AS l, sum(dw.cdw::DOUBLE * ln(lw.clw::DOUBLE + 1.0)) AS s_known
       |  FROM dw JOIN lw ON dw.w = lw.w GROUP BY 1, 2
       |), scored AS (
       |  SELECT dlen.id, dlen.label, c.l,
       |         round(c.logprior - dlen.len::DOUBLE * c.logdenom
       |               + coalesce(ct.s_known, 0.0), 6) AS sc
       |  FROM dlen CROSS JOIN consts c
       |  LEFT JOIN contrib ct ON ct.id = dlen.id AND ct.l = c.l
       |), ranked AS (
       |  SELECT id, label, l, sc,
       |         row_number() OVER (PARTITION BY id ORDER BY sc DESC, l) AS rn,
       |         lead(sc, 1) OVER (PARTITION BY id ORDER BY sc DESC, l) AS nxt
       |  FROM scored
       |)
       |SELECT id, label, l AS predicted, l = label AS correct,
       |       round(sc - coalesce(nxt, sc), 6) AS margin
       |FROM ranked WHERE rn = 1 ORDER BY id""".stripMargin
  }
}
