package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamSessions

/** Streaming sessionization: sessions split on the gap, merge across
  * microbatches, and emit exactly once after the watermark passes.
  */
class StreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window stream: gap split, cross-batch merge, watermark finalize") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val df = ms.toDF.toDF("user_id", "ts", "value")
    val out = StreamSessions.sessionStream(df, "user_id", "ts", gap = "10 seconds",
      watermark = "5 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 events 01..05 (one session, extended across rows)
      ms.addData((1L, ts("2026-01-01 00:00:01"), 1.0), (1L, ts("2026-01-01 00:00:05"), 2.0))
      q.processAllAvailable()
      // batch 2: same session extended (05 + 10s gap ⊇ 09), plus a far
      // event that advances the watermark only at batch end
      ms.addData((1L, ts("2026-01-01 00:00:09"), 4.0), (9L, ts("2026-01-01 01:00:00"), 0.0))
      q.processAllAvailable()
      // batch 3: watermark (00:59:55) closes user 1's session
      ms.addData((9L, ts("2026-01-01 02:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "t_start", "t_end", "n_events", "sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().filter(_._1 == 1L)
      assert(rows.length == 1, s"expected one closed session, got ${rows.toSeq}")
      val (_, start, end, n, sum) = rows.head
      assert(start == ts("2026-01-01 00:00:01"))
      assert(end == ts("2026-01-01 00:00:19"))   // last event 00:00:09 + 10 s gap
      assert(n == 3L)
      assert(sum == 7.0)
    } finally q.stop()
  }

  test("events past the gap open a second session") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val df = ms.toDF.toDF("user_id", "ts", "value")
    val out = StreamSessions.sessionStream(df, "user_id", "ts", gap = "10 seconds",
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out2")
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((1L, ts("2026-01-01 00:00:01"), 1.0), (1L, ts("2026-01-01 00:05:00"), 2.0))
      q.processAllAvailable()
      ms.addData((9L, ts("2026-01-01 01:00:00"), 0.0))
      q.processAllAvailable()
      ms.addData((9L, ts("2026-01-01 02:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out2").where("user_id = 1")
        .select("n_events").as[Long].collect().toSeq
      assert(rows.sorted == Seq(1L, 1L))
    } finally q.stop()
  }
}
