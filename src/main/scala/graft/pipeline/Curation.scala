package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation chain — the composition the individual
  * operators exist for: quality gate → exact dedup → per-language corpus
  * stats. One declarative plan: the quality/language expressions fuse into
  * the scan's codegen stage, dedup is one md5-key window shuffle, the final
  * agg is map-side-combined — three stages regardless of corpus size.
  */
object Curation {

  /** Gate documents on quality (min tokens, max punctuation ratio), keep one
    * survivor per identical text (min id), return per-language doc and token
    * counts. Thresholds mirror common pretraining-corpus filters.
    */
  def curationStats(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Double = 5.0, maxPunctRatio: Double = 0.1): DataFrame = {
    val gated = docs
      .withColumn("__q", TextAnalysis.textQuality(col(textCol)))
      .withColumn("__lang", TextAnalysis.languageIdExpr(col(textCol)))
      .filter(col("__q")("n_tokens") >= minTokens &&
        col("__q")("punct_ratio") <= maxPunctRatio)
    Dedup.exactDedup(gated, idCol, textCol)
      .groupBy(col("__lang").as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__q")("n_tokens")).cast("long").as("sum_tokens"))
  }
}
