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
}
