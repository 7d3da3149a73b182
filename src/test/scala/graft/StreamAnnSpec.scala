package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.pipeline.Similarity
import graft.streaming.StreamAnn

/** Differential gate for streaming ANN enrichment: the streamed per-window
  * top-k must equal the batch [[Similarity.ivfKnnJoin]] over the same
  * (window-restricted) query set — the same streamed-equals-batch contract
  * every other streaming sibling carries (batch side is oracle-matched via
  * sim_knn_join, so streamed = batch = oracle transitively).
  */
class StreamAnnSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // a plain function value: the UDF closure must not capture the spec
  // instance (scalatest's Engine is not serializable)
  private val vec: Int => Array[Float] = (seed: Int) =>
    Array.tabulate(6)(d => (((seed * 31 + d * 17) % 13) - 6).toFloat / 6f)

  test("streamed ANN enrichment equals the batch IVF kNN join per window") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = (0L until 40L).map(i => (i, vec(i.toInt)))
      .toDF("vec_id", "embedding")

    val events = MemoryStream[(Long, Timestamp)]
    val streamQ = events.toDF.toDF("vec_id", "qts")
      .withColumn("embedding", udf(vec).apply(col("vec_id").cast("int")))
    val out = StreamAnn.annEnrichStream(streamQ, corpus, "vec_id", "embedding",
      "qts", k = 3, nlist = 8, nprobe = 2,
      windowDuration = "1 hour", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ann_out")
      .outputMode(OutputMode.Complete()).start()

    // two windows, queries split across microbatches (cross-batch windows
    // must still aggregate); qid 100 is absent from the corpus (no
    // self-exclusion row), qid 7 is present (self excluded)
    val w1 = Seq((7L, ts("2026-01-01 00:05:00")), (14L, ts("2026-01-01 00:20:00")))
    val w2 = Seq((21L, ts("2026-01-01 01:10:00")), (100L, ts("2026-01-01 01:30:00")))
    try {
      events.addData(w1: _*)
      q.processAllAvailable()
      events.addData(w2: _*)
      q.processAllAvailable()

      val got = spark.table("ann_out")
        .select(col("window.start").cast("long").as("ws"), col("qid"),
          col("rank"), col("nid"), col("cosine"))
        .as[(Long, Long, Long, Long, Double)].collect().toSet

      def batchFor(qs: Seq[(Long, Timestamp)], wStart: String): Set[(Long, Long, Long, Long, Double)] = {
        val queries = qs.map { case (id, _) => (id, vec(id.toInt)) }
          .toDF("vec_id", "embedding")
        Similarity.ivfKnnJoin(corpus, queries, "vec_id", "embedding",
            k = 3, nlist = 8, nprobe = 2)
          .select(lit(ts(wStart).getTime / 1000).as("ws"), col("qid"),
            col("rank"), col("nid"), col("cosine"))
          .as[(Long, Long, Long, Long, Double)].collect().toSet
      }
      val want = batchFor(w1, "2026-01-01 00:00:00") ++
        batchFor(w2, "2026-01-01 01:00:00")
      assert(got == want, s"got=$got want=$want")
      // sanity: the out-of-corpus query still gets k neighbors
      assert(got.count(_._2 == 100L) == 3)
    } finally q.stop()
  }
}
