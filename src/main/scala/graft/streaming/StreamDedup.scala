package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.Dedup

/** Streaming deduplication for a document ingest pipeline (SURVEY §2.10
  * extension; the batch operators live in [[graft.pipeline.Dedup]]).
  *
  *  - exactDedupStream: drop duplicate texts within the watermark horizon —
  *    Spark's own dropDuplicates state store keyed by the md5 BINARY hash
  *    (16 bytes of state per distinct doc, never the text itself), the
  *    standard unbounded-stream shape: state is evicted once the watermark
  *    passes, so memory is bounded by the horizon's distinct count.
  *  - simhashDedupStream: stateful NEAR-duplicate suppression via
  *    flatMapGroupsWithState — documents are keyed by their simhash band
  *    (the same pigeonhole key the batch banding self-join uses, so any
  *    candidate pair shares a group) and each group keeps the signatures
  *    seen in the horizon; a new doc within `maxHamming` of any kept
  *    signature is suppressed. Processing-time timeout evicts idle bands.
  */
object StreamDedup {

  /** Exact streaming dedup: one surviving row per distinct text within the
    * watermark horizon. Works on any stream carrying (tsCol, textCol).
    */
  def exactDedupStream(stream: DataFrame, tsCol: String, textCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__text_hash", unhex(md5(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("__text_hash")
      .drop("__text_hash")

  /** State per simhash band: signatures (with their chunk value) already
    * admitted in this band. Bounded by the band's horizon cardinality.
    */
  case class BandState(sigs: List[Long])

  case class BandedDoc(band: Long, id: Long, sig: Long)
  case class Admitted(id: Long, sig: Long)

  /** Streaming near-dup suppression: a doc is admitted iff no already-seen
    * doc within Hamming `maxHamming` exists. Deterministic per group-batch
    * (docs are processed in id order inside each microbatch). Emits admitted
    * (id, sig) pairs; duplicates are silently dropped — the streaming analog
    * of the batch [[Dedup.simhashNearDupPairs]] candidate logic with the
    * SAME pigeonhole guarantee: a pair within maxHamming shares at least one
    * of the (maxHamming+1) chunks, i.e. at least one group.
    *
    * NOTE admission is per-band; a doc admitted in one band but suppressed
    * in another yields band-level disagreement — callers wanting global
    * survivor semantics aggregate the per-band admissions by id (a doc
    * survives iff admitted in ALL its bands), which is a plain grouped
    * count downstream.
    */
  def simhashDedupStream(docs: Dataset[BandedDoc], maxHamming: Int,
      idleTimeoutMs: Long = 3600 * 1000L): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    // idleTimeoutMs <= 0 ⇒ NoTimeout: state lives for the query's lifetime.
    // This is the mode for BOUNDED replays (AvailableNow) — a registered
    // processing-time timeout keeps the engine spinning empty timeout
    // batches forever, so an AvailableNow query would never terminate
    // (observed: ~3000 empty epochs). Continuous production queries keep
    // the timeout for state eviction.
    val timeout = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.groupByKey(_.band)
      .flatMapGroupsWithState[BandState, Admitted](
        OutputMode.Append(), timeout) {
        (_: Long, rows: Iterator[BandedDoc], state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var sigs = state.getOption.map(_.sigs).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
            rows.toSeq.sortBy(_.id).foreach { d =>
              val dup = sigs.exists(s => java.lang.Long.bitCount(s ^ d.sig) <= maxHamming)
              if (!dup) {
                sigs = d.sig :: sigs
                out += Admitted(d.id, d.sig)
              }
            }
            state.update(BandState(sigs))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }

  /** Global survivors from the per-band admissions [[simhashDedupStream]]
    * emits: a doc survives iff admitted in ALL (maxHamming+1) of its bands.
    * Batch helper over the sink the stream wrote (a grouped count — no
    * state, runs on any engine reading the admissions).
    */
  def globalSurvivors(admitted: DataFrame, maxHamming: Int): DataFrame =
    admitted.groupBy("id")
      .agg(count(lit(1)).as("__bands"))
      .filter(col("__bands") === (maxHamming + 1))
      .select("id")

  /** Band a (id, text) stream for [[simhashDedupStream]]: 64-bit simhash,
    * (maxHamming+1) pigeonhole chunks, one BandedDoc per chunk with the
    * chunk index folded into the band key.
    */
  def bandedDocs(stream: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): Dataset[BandedDoc] = {
    import stream.sparkSession.implicits._
    // maxHamming >= 1 keeps chunk widths <= 32 bits, leaving the top byte of
    // the band key free for the chunk index (no collision)
    require(maxHamming >= 1 && maxHamming <= 15, s"maxHamming in [1,15], got $maxHamming")
    val numChunks = maxHamming + 1
    val baseW = 64 / numChunks
    val extra = 64 % numChunks
    val bounds = (0 until numChunks).scanLeft(0)((acc, i) =>
      acc + baseW + (if (i < extra) 1 else 0))
    val sig = stream.select(col(idCol).cast("long").as("id"),
      Dedup.simhash64(col(textCol)).as("sig"))
    sig.select(col("id"), col("sig"),
        explode(array((0 until numChunks).map { i =>
          val start = bounds(i)
          val w = bounds(i + 1) - start
          val mask = if (w == 64) -1L else (1L << w) - 1
          // band key = chunk index in the top bits, chunk value below
          shiftrightunsigned(col("sig"), start).bitwiseAND(lit(mask))
            .bitwiseOR(lit(i.toLong << 56)).as("band")
        }: _*)).as("band"))
      .select(col("band"), col("id"), col("sig").as("sig"))
      .as[BandedDoc]
  }
}
