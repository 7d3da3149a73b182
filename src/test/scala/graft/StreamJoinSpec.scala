package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

/** Stream–stream interval join: pairs match across microbatches, the range
  * condition is strict on the horizon edge, and the emitted set equals the
  * batch join with the same predicate — streaming's oracle is batch Spark.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval join equals the batch join; matches span microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val cdf = clicks.toDF.toDF("user_id", "cts", "page")
    val bdf = buys.toDF.toDF("user_id", "bts", "amount")
    val out = StreamJoin.intervalJoin(bdf, "bts", cdf, "cts", "user_id",
      horizon = "30 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append()).start()

    // user 1: clicks at 00:00 and 00:20, purchase at 00:25 → both match;
    // click at 00:25-30:00 exactly on the horizon edge must NOT rematch a
    // later purchase (strict >). user 2: click AFTER its purchase → no pair.
    // The 00:20 click arrives in a LATER batch than the purchase — the
    // state store must still pair them.
    val cRows = Seq(
      (1L, ts("2026-01-01 00:00:00"), "a"),
      (1L, ts("2026-01-01 00:20:00"), "b"),
      (2L, ts("2026-01-01 00:40:00"), "c"))
    val bRows = Seq(
      (1L, ts("2026-01-01 00:25:00"), 9.5),
      (2L, ts("2026-01-01 00:30:00"), 3.0),
      (1L, ts("2026-01-01 00:30:00"), 1.0)) // 00:00 click exactly 30 min before → excluded
    try {
      clicks.addData(cRows.head)
      buys.addData(bRows.head, bRows(2))
      q.processAllAvailable()
      clicks.addData(cRows(1), cRows(2))
      buys.addData(bRows(1))
      q.processAllAvailable()
      // advance both watermarks far past every event so all pairs are final
      clicks.addData((99L, ts("2026-01-01 06:00:00"), "z"))
      buys.addData((99L, ts("2026-01-01 06:00:00"), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("ij_out")
        .filter(col("user_id") < 99)
        .select("user_id", "bts", "amount", "cts", "page")
        .as[(Long, Timestamp, Double, Timestamp, String)].collect().toSet
      val batch = bRows.toDF("user_id", "bts", "amount")
        .join(cRows.toDF("user_id", "cts", "page"), Seq("user_id"))
        .filter(col("cts") <= col("bts") &&
          col("cts") > col("bts") - expr("INTERVAL 30 minutes"))
        .select("user_id", "bts", "amount", "cts", "page")
        .as[(Long, Timestamp, Double, Timestamp, String)].collect().toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // the horizon edge is strict and the wrong-order pair is absent
      assert(!streamed.exists { case (u, b, _, c, _) =>
        u == 1L && b == ts("2026-01-01 00:30:00") && c == ts("2026-01-01 00:00:00") })
      assert(!streamed.exists(_._1 == 2L))
      // the cross-batch pair (purchase in batch 1, click in batch 2) exists
      assert(streamed.contains((1L, ts("2026-01-01 00:25:00"), 9.5,
        ts("2026-01-01 00:20:00"), "b")))
    } finally q.stop()
  }

  test("stream-static enrichment rollup equals the batch join+aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, Double)]
    val edf = events.toDF.toDF("user_id", "ets", "value")
    val dim = Seq((1L, "gold"), (2L, "silver"), (3L, "gold"))
      .toDF("user_id", "segment")
    val out = StreamJoin.enrichAndRollup(edf, dim, "user_id", "ets", "segment",
      window = "1 hour", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Complete()).start()

    val rows = Seq(
      (1L, ts("2026-01-01 00:05:00"), 1.0),
      (2L, ts("2026-01-01 00:10:00"), 2.0),
      (3L, ts("2026-01-01 00:55:00"), 4.0),  // same window+segment as user 1
      (1L, ts("2026-01-01 01:05:00"), 8.0),  // next window
      (4L, ts("2026-01-01 00:20:00"), 16.0)) // no dimension row → dropped
    try {
      events.addData(rows.take(2): _*)
      q.processAllAvailable()
      events.addData(rows.drop(2): _*)   // late-window + cross-batch merge
      q.processAllAvailable()

      val got = spark.table("enrich_out")
        .select(col("window.start").cast("long").as("ws"), col("segment"),
          col("n"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      val batch = rows.toDF("user_id", "ets", "value")
        .join(dim, "user_id")
        .groupBy(window(col("ets"), "1 hour"), col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .select(col("window.start").cast("long").as("ws"), col("segment"),
          col("n"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got == batch, s"got=$got batch=$batch")
      // gold window 0 merged across microbatches: users 1+3 → n=2, 5.0
      assert(got.exists { case (_, s, n, v) => s == "gold" && n == 2L && v == 5.0 })
      // the un-enriched user is absent everywhere
      assert(batch.toSeq.map(_._3).sum == 4)
    } finally q.stop()
  }
}
