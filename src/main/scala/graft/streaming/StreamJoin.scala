package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream event-time interval join — attribution over two live
  * streams (e.g. every purchase joined to the same user's clicks in the
  * preceding `horizon`). Built on Spark's watermarked stream-stream join:
  * the event-time range condition plus both watermarks bound the state the
  * join keeps per side (rows older than watermark + horizon are evicted),
  * so state is proportional to the traffic inside the horizon window, never
  * the stream history — the property that lets a 100 TB/day click×purchase
  * attribution run on a fixed-size cluster. Inner join in append mode:
  * each matched pair is emitted exactly once.
  *
  * Batch equivalence: the emitted pairs for any fully-watermark-closed
  * region equal the batch inner join with the same range predicate
  * (pinned by StreamJoinSpec) — streaming's oracle is batch Spark.
  */
object StreamJoin {

  /** `left` must carry (key, `ltsCol`: timestamp, ...), `right` (key,
    * `rtsCol`: timestamp, ...). Emits left×right pairs with equal `key`
    * and `rts` in (lts - horizon, lts]; column names must be disjoint
    * apart from `key`.
    */
  def intervalJoin(left: DataFrame, ltsCol: String,
      right: DataFrame, rtsCol: String, key: String,
      horizon: String = "30 minutes", watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(ltsCol, watermark)
    val r = right.withWatermark(rtsCol, watermark)
    l.join(r,
      l(key) === r(key) &&
        col(rtsCol) <= col(ltsCol) &&
        col(rtsCol) > col(ltsCol) - expr(s"INTERVAL $horizon"))
      .drop(r(key))
  }

  /** Stream–static enrichment: a live stream joined to a slowly-changing
    * dimension table, then a watermarked per-window/per-dimension rollup —
    * the canonical "attach the user's segment, aggregate by segment" shape.
    * The static side is broadcast to every microbatch (re-resolved per
    * batch, so a dimension refresh is picked up without restarting the
    * query); the stream side never shuffles before the windowed aggregate.
    * State is bounded by the watermark exactly as in a plain windowed agg —
    * the stream-static join itself is STATELESS.
    */
  def enrichAndRollup(stream: DataFrame, dim: DataFrame, key: String,
      tsCol: String, dimCol: String, window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .join(broadcast(dim), key)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(dimCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
