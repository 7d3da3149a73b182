package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamDedup

/** Streaming dedup: exact (watermarked dropDuplicates on the md5 hash) and
  * stateful near-dup suppression (flatMapGroupsWithState over simhash bands).
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedupStream keeps one row per distinct text across microbatches") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val docs = Seq(
      (1L, "alpha beta gamma", "2026-01-01 00:00:01"),
      (2L, "alpha beta gamma", "2026-01-01 00:00:02"),  // exact dup of 1
      (3L, "delta epsilon zeta", "2026-01-01 00:00:03"),
      (4L, "delta epsilon zeta", "2026-01-01 00:00:04"), // exact dup of 3
      (5L, "unique text here", "2026-01-01 00:00:05"))
      .toDF("doc_id", "text", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    docs.write.parquet(srcDir)
    val stream = spark.readStream.schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val deduped = StreamDedup.exactDedupStream(stream, "ts", "text")
    val q = deduped.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    awaitAndStop(q, 60000); assertFewEpochs(ckpt)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 3)
    assert(out.select("text").distinct().count() == 3)
  }

  test("simhashDedupStream suppresses near-duplicates within maxHamming") {
    val dir = Files.createTempDirectory("graft-sdedup2").toString
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("today", "tonight")),          // near-dup of 1
      (3L, "completely different content about spark catalyst optimizer rules"),
      (4L, base))                                       // exact dup of 1 (hamming 0)
      .toDF("doc_id", "text")
    docs.write.parquet(srcDir)
    val stream = spark.readStream.schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val banded = StreamDedup.bandedDocs(stream, "doc_id", "text", maxHamming = 10)
    // idleTimeoutMs = 0 ⇒ NoTimeout — with a processing-time timeout an
    // AvailableNow replay never terminates (empty timeout batches forever)
    val admitted = StreamDedup.simhashDedupStream(banded, maxHamming = 10,
      idleTimeoutMs = 0)
    val q = admitted.toDF.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    awaitAndStop(q, 120000); assertFewEpochs(ckpt)
    // global survivors: admitted in ALL (maxHamming+1) bands
    val survivors = spark.read.parquet(outDir)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") === 11)
      .select("id").as[Long].collect().toSet
    assert(survivors.contains(3L), s"distinct doc suppressed: $survivors")
    assert(survivors.contains(1L), s"first-seen doc suppressed: $survivors")
    assert(!survivors.contains(4L), "exact dup must be suppressed in every band")
    assert(!survivors.contains(2L), s"near dup (1-word change) should be suppressed: $survivors")
  }

  test("watchdog bounds a ProcessingTimeTimeout query under AvailableNow") {
    // Regression pin for the round-6 suite hang: a flatMapGroupsWithState
    // with ProcessingTimeTimeout replayed via AvailableNow spins empty
    // timeout micro-batches forever. awaitAndStop must FAIL within its
    // watchdog instead of hanging the suite.
    val dir = Files.createTempDirectory("graft-sdedup-wd").toString
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Seq((1L, "watchdog probe text")).toDF("doc_id", "text").write.parquet(srcDir)
    val stream = spark.readStream.schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val banded = StreamDedup.bandedDocs(stream, "doc_id", "text", maxHamming = 2)
    // deliberately keep the ProcessingTimeTimeout default — the pathology
    val q = StreamDedup.simhashDedupStream(banded, maxHamming = 2,
        idleTimeoutMs = 3600 * 1000L)
      .toDF.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      awaitAndStop(q, 8000)
    }
    assert(e.getMessage.contains("watchdog"), s"unexpected failure: ${e.getMessage}")
    assert(!q.isActive, "watchdog path must leave the query stopped")
  }
}
