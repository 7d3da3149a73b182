package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the streaming sibling of
  * [[graft.pipeline.Events.sessionize]], built on Spark's native
  * `session_window` (dynamic-gap session aggregation in the state store):
  * sessions extend while events arrive within `gap` of the session end and
  * FINALIZE (emit, evict state) once the watermark passes — so state is
  * bounded by the number of OPEN sessions in the horizon, never the event
  * count, which is what lets a 100 TB/day clickstream sessionize on a
  * fixed-size cluster. Append output mode: each session is emitted exactly
  * once, closed.
  */
object StreamSessions {

  /** `stream` must carry (userCol: any, tsCol: timestamp, value: double).
    * Emits one row per CLOSED session: user, window start/end, event count,
    * value sum.
    */
  def sessionStream(stream: DataFrame, userCol: String, tsCol: String,
      gap: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col(userCol),
        col("session_window.start").as("t_start"),
        col("session_window.end").as("t_end"),
        col("n_events"), col("sum_value"))
}
