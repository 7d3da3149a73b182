package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.pipeline.{CountMin, Events}

/** Streaming sketches — the streaming siblings of the batch HLL
  * ([[graft.pipeline.Events.hllEstimate]]) and Count-Min
  * ([[graft.pipeline.CountMin]]) operators. Both sketches are commutative
  * idempotent/additive aggregates, so they run as plain windowed streaming
  * aggregations in APPEND mode: state per window is the fixed sketch size
  * (≤ groups·2^P registers for HLL, ≤ d·w cells for CMS) — never the event
  * count — and each window's rows are emitted exactly once when the
  * watermark closes it. That fixed-state property is precisely why sketches
  * are the streaming answer to distinct-counts and frequencies at 100 TB/day.
  */
object StreamSketch {

  /** Per-(window, group) HLL register maxima over a stream carrying
    * (`tsCol`: timestamp, g: any, h: long hash). Emits (t_start, g, reg, m)
    * rows at window close; feed them to [[Events.hllFinalize]] (grouped by
    * window) for the estimates — the split keeps the streaming state a pure
    * max-aggregate while the harmonic-sum finalization stays a trivial
    * batch step over ≤ 2^P rows per (window, group).
    */
  def hllRegisterStream(stream: DataFrame, tsCol: String,
      windowDur: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur),
        col("g"), Events.hllRegCol.as("reg"))
      .agg(max(Events.hllRankCol).as("m"))
      .select(col("window.start").as("t_start"), col("g"), col("reg"), col("m"))

  case class KmvRow(g: String, h: Long)
  case class KmvSketchState(ver: Long, mins: List[Long])
  case class KmvEmit(g: String, ver: Long, n_kept: Long, hk: Long)

  /** Streaming KMV / bottom-k Theta distinct sketch — the custom-state
    * sibling of the batch [[Events.kmvDistinct]]: per group the state is
    * EXACTLY the k smallest distinct hashes (k longs — the textbook
    * bounded-state sketch, independent of stream length). Bottom-k merge
    * is a semilattice (commutative, associative, idempotent), so the
    * final streamed sketch equals the batch bottom-k REGARDLESS of
    * micro-batch boundaries or arrival order — the gate compares against
    * the batch oracle verbatim. Emits the running (ver, n_kept, hk) per
    * group per batch; the latest ver per group is the final sketch.
    * NoTimeout: bounded AvailableNow replays (the StreamDedup lesson);
    * production queries would evict idle groups with a timeout.
    */
  def kmvStream(rows: Dataset[KmvRow], k: Int): Dataset[KmvEmit] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.g)
      .flatMapGroupsWithState[KmvSketchState, KmvEmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[KmvRow], state) =>
          val prev = state.getOption
          val mins = (prev.map(_.mins).getOrElse(Nil).iterator ++ it.map(_.h))
            .toArray.distinct.sorted.take(k).toList
          val ver = prev.map(_.ver).getOrElse(0L) + 1L
          state.update(KmvSketchState(ver, mins))
          Iterator.single(KmvEmit(g, ver, mins.length.toLong,
            if (mins.isEmpty) 0L else mins.last))
      }
  }

  /** Per-window Count-Min cells over a stream carrying (`tsCol`: timestamp,
    * `keyCol`: long < 2³¹). Emits (t_start, r, b, cnt) at window close —
    * the same cells [[CountMin.sketch]] builds in batch, so estimates use
    * [[CountMin.estimate]] unchanged on each closed window.
    */
  def cmsCellStream(stream: DataFrame, tsCol: String, keyCol: String,
      windowDur: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(array((0 until CountMin.Depth).map(r =>
        struct(lit(r).as("r"), CountMin.bucket(col(keyCol), r).as("b"))): _*)).as("rb"))
      .groupBy(window(col(tsCol), windowDur), col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("t_start"), col("r"), col("b"), col("cnt"))
}
