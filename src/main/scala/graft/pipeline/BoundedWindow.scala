package graft.pipeline

import org.apache.spark.sql.DataFrame

/** The deliberately-unpartitioned-window contract, as code instead of
  * lore. Spark logs `WindowExec: No Partition Defined … single partition`
  * for every global window; each such site in this repo is bounded-input
  * BY CONSTRUCTION (KMV 2k-row merges, hour-level offset tables, top-N
  * Zipf ranks, eval-set NDCG folds, day-level survival folds), but 119
  * identical warnings per sweep teach readers to ignore warnings. Routing
  * every site through [[apply]] (a) names the invariant at the use site
  * and (b) ENFORCES it whenever `spark.graft.assertBoundedWindows=true`
  * (set by the test session) — a runtime count guard in tests, a free
  * pass-through in production sweeps where the extra action would cost.
  */
object BoundedWindow {
  def apply(df: DataFrame, maxRows: Long, what: String): DataFrame = {
    if (df.sparkSession.conf
        .get("spark.graft.assertBoundedWindows", "false").toBoolean) {
      val n = df.count()
      require(n <= maxRows,
        s"boundedWindow($what): $n rows exceed the documented bound " +
          s"$maxRows — the single-partition window here is no longer safe")
    }
    df
  }
}
