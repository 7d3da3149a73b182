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
    // only the two gate features are computed pre-filter (not the full
    // quality struct), and the language-ID marker vote — the widest
    // expression in the chain — runs on SURVIVORS only: order the cheap
    // selective work first, exactly as you would at corpus scale
    val n = length(col(textCol)).cast("double")
    val nPunct = (n - length(regexp_replace(col(textCol), "[\\p{Punct}]", ""))).cast("double")
    val punctRatio = when(n > 0, nPunct / n).otherwise(lit(0.0))
    val gated = docs
      .withColumn("__ntok", TextAnalysis.tokenCountWs(col(textCol)).cast("double"))
      .filter(col("__ntok") >= minTokens && punctRatio <= maxPunctRatio)
    // compiled-UDF language id, not the Column-expression variant: as a
    // groupBy KEY the giant marker-vote expression tree gets cloned into
    // partial/final aggregation and exchange hashing and blows up planning
    // + codegen time; the UDF is opaque to Catalyst and equivalent on latin
    // text (Round2Spec pins expr ≡ udf)
    Dedup.exactDedup(gated, idCol, textCol)
      .withColumn("__lang", TextAnalysis.languageId(col(textCol)))
      .groupBy(col("__lang").as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).cast("long").as("sum_tokens"))
  }
}
