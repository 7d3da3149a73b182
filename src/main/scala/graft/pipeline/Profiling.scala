package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality audit a pipeline runs before trusting
  * a new drop: per column, row/null/distinct counts, the heaviest value's
  * frequency, and the skew factor that decides whether downstream
  * joins/aggregates on that column need salting.
  *
  * Plan shape (the part that matters at 100 TB): the naive approach runs
  * one `countDistinct` per column in a single aggregate, which Catalyst
  * expands into one EXPAND branch per column — C semi-passes over the
  * data. Here the columns UNPIVOT inside the scan projection (each row
  * emits C (column, value) structs — no shuffle), then ONE
  * map-side-combined aggregate on (column, value) reduces each partition
  * to its distinct values before the exchange, and a second tiny aggregate
  * on `column` folds the per-value counts into the profile. Total: one
  * data-sized projection + one exchange bounded by Σ per-column distincts.
  *
  * Values compare as strings (Java's double/decimal formatting is
  * injective per distinct value, so distinct counts are unaffected);
  * `skew` = max_freq / (n_nonnull / n_distinct), the hot-key multiplier
  * over a uniform spread — an exact-integer ratio rounded to 4.
  */
object Profiling {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*)).as("cv"))
      .select(col("cv.column").as("column"), col("cv.v").as("v"))
    val perValue = stacked.groupBy(col("column"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    perValue.groupBy(col("column"))
      .agg(sum(col("cnt")).as("n"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_distinct"),
        max(when(col("v").isNotNull, col("cnt")).otherwise(0L)).as("max_freq"))
      .withColumn("skew",
        when(col("n") > col("n_null"),
          round(col("max_freq").cast("double") * col("n_distinct")
            / (col("n") - col("n_null")), 4)))   // NULL for an all-null column
      .orderBy(col("column"))
  }

  /** Join-consistent sampling predicate: keep a row iff the scrambled hash
    * of its JOIN KEY lands under `ppm` parts-per-million. Sampling every
    * table of a star schema with the same key and salt keeps exactly the
    * matching rows — referential integrity survives the sample (independent
    * row sampling at rate p orphans ≈ (1−p) of each parent's children,
    * poisoning any join-based analysis of the sample). Membership is a
    * pure function of the key: reproducible across runs, cluster layouts,
    * and tables.
    */
  def consistentSampleKeep(keyCol: org.apache.spark.sql.Column, salt: String,
      ppm: Int): org.apache.spark.sql.Column =
    pmod(pmod(TextAnalysis.polyHash(concat(lit(salt), keyCol.cast("string")))
      * lit(2654435761L), lit(1000000007L)), lit(1000000L)) < ppm

  /** DuckDB SQL for the same predicate over expression `e`. */
  def consistentSampleKeepDuckSql(e: String, salt: String, ppm: Int): String =
    s"(((${TextAnalysis.polyHashDuckSql(s"('$salt' || CAST($e AS VARCHAR))")}" +
      s" * 2654435761) % 1000000007) % 1000000) < $ppm"

  /** DuckDB replay of [[columnProfile]] over table `table` for `cols` —
    * one UNION ALL arm per column, same string-cast distinct semantics.
    */
  def columnProfileDuckSql(table: String, cols: Seq[String]): String =
    cols.sorted.map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT CAST($c AS VARCHAR)) AS BIGINT) AS n_distinct,
         |  CAST((SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM $table
         |        WHERE $c IS NOT NULL GROUP BY CAST($c AS VARCHAR))) AS BIGINT) AS max_freq,
         |  CASE WHEN count($c) = 0 THEN NULL ELSE
         |    round(CAST((SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM $table
         |          WHERE $c IS NOT NULL GROUP BY CAST($c AS VARCHAR)))
         |        * count(DISTINCT CAST($c AS VARCHAR)) AS DOUBLE) / count($c), 4)
         |  END AS skew
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
}
