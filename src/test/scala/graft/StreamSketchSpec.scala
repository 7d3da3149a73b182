package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.pipeline.{CountMin, Events}
import graft.streaming.StreamSketch

/** Streaming sketches: the state-store register/cell rows a closed window
  * emits must equal the batch sketch over that window's events — streaming's
  * oracle is batch Spark, itself driver-hash-matched (ev_hll / ev_cms).
  */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed HLL register stream equals the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Long)]
    val df = ms.toDF.toDF("ts", "g", "h")
    val out = StreamSketch.hllRegisterStream(df, "ts",
      windowDur = "1 minute", watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Append()).start()
    // window [00:00, 00:01): groups a and b, hashes spread over registers —
    // duplicates across microbatches must collapse (idempotent max)
    val w1 = (1L to 40L).map(i => (ts("2026-01-01 00:00:05"), "a", i * 0x9E3779B97F4A7C15L)) ++
      (1L to 15L).map(i => (ts("2026-01-01 00:00:30"), "b", i * 0xC2B2AE3D27D4EB4FL))
    try {
      ms.addData(w1.take(20): _*)
      q.processAllAvailable()
      ms.addData(w1.drop(20): _*)      // incl. re-sends of the same hashes
      ms.addData(w1.take(10): _*)
      q.processAllAvailable()
      // advance watermark past 00:01 + 10s to close the window
      ms.addData((ts("2026-01-01 00:02:00"), "z", 1L))
      q.processAllAvailable()
      val streamed = spark.table("hll_out")
        .filter(col("t_start") === ts("2026-01-01 00:00:00"))
        .select("g", "reg", "m").as[(String, Long, Long)].collect().toSet
      val batch = w1.toDF("ts", "g", "h")
        .select(col("g"), Events.hllRegCol.as("reg"), Events.hllRankCol.as("rank"))
        .groupBy("g", "reg").agg(max(col("rank")).as("m"))
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch)
      // and the finalized estimates match the batch estimator end-to-end
      val streamedEst = Events.hllFinalize(
          spark.table("hll_out").filter(col("t_start") === ts("2026-01-01 00:00:00"))
            .select("g", "reg", "m"),
          Seq("a", "b").toDF("g"))
        .select("g", "est").as[(String, Double)].collect().toMap
      val batchEst = Events.hllEstimate(w1.toDF("ts", "g", "h").select("g", "h"))
        .select("g", "est").as[(String, Double)].collect().toMap
      assert(streamedEst == batchEst)
    } finally q.stop()
  }

  test("windowed CMS cell stream equals the batch sketch, estimates exact") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val df = ms.toDF.toDF("ts", "user_id")
    val out = StreamSketch.cmsCellStream(df, "ts", "user_id",
      windowDur = "1 minute", watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Append()).start()
    val w1 = (1L to 30L).flatMap(k => Seq.fill((k % 5 + 1).toInt)((ts("2026-01-01 00:00:10"), k)))
    try {
      ms.addData(w1.take(40): _*)
      q.processAllAvailable()
      ms.addData(w1.drop(40): _*)
      q.processAllAvailable()
      ms.addData((ts("2026-01-01 00:02:00"), 999L))
      q.processAllAvailable()
      val streamed = spark.table("cms_out")
        .filter(col("t_start") === ts("2026-01-01 00:00:00"))
        .select("r", "b", "cnt").as[(Int, Long, Long)].collect().toSet
      val batchDf = w1.toDF("ts", "user_id")
      val batch = CountMin.sketch(batchDf, "user_id")
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch)
      // estimates off the streamed cells: never below exact
      val est = CountMin.estimate(batchDf.select("user_id").distinct(), "user_id",
          spark.table("cms_out").filter(col("t_start") === ts("2026-01-01 00:00:00"))
            .select("r", "b", "cnt"))
        .as[(Long, Long)].collect().toMap
      val exact = batchDf.groupBy("user_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      exact.foreach { case (k, n) => assert(est(k) >= n) }
    } finally q.stop()
  }
}
