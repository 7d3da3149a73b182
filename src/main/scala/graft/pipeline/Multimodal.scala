package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs, processed in batch-shaped partition passes.
  *
  * IMAGE decode is REAL when `spark.graft.mm.codec=bmp` (pure-JVM
  * uncompressed-BMP codec, [[ImageCodec]] — exercised by the
  * mm_decode_bmp oracle gate) or `=png` (pure-JVM 8-bit truecolor PNG:
  * zlib inflate + all five row unfilters, cross-checked against
  * javax.imageio in Round8Spec and gated by mm_decode_png); the default
  * remains the deterministic FNV stub, and the audio/video kernels stay
  * stubbed (no PCM/video codecs in this container) — everything
  * Spark-side is real either way: schemas, partition sizing, batch
  * iteration, output shapes. Swap the stubs for richer codecs
  * (javax.imageio / ffmpeg pipe) without touching the dataflow.
  */
object Multimodal {

  /** Canonical multimodal schema: media carried as bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),        // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** STUB decode: deterministic pseudo-pixels from the byte content (FNV
    * chain) shaped (h, w) — stands in for a real image decode. Keeps output
    * size bounded and reproducible for tests.
    */
  private def fakeDecode(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
    val out = new Array[Float](w * h)
    var state = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { state ^= bytes(i); state *= 0x100000001b3L; i += 1 }
    i = 0
    while (i < out.length) {
      state ^= i; state *= 0x100000001b3L
      out(i) = ((state >>> 40).toInt & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Decode + resize to (w×h) feature vectors, one batch-shaped partition
    * pass (the Scala analog of a Pandas mapInPandas batch UDF: per-partition
    * iterator, amortized setup, bounded memory per batch).
    *
    * The decoder is SELECTED BY CONFIG (`spark.graft.mm.codec`, read once
    * at plan build): `stub` (default) keeps the deterministic FNV fake;
    * `bmp` decodes REAL uncompressed 24/32-bit BMP bytes via the pure-JVM
    * [[ImageCodec]] — native luma pixels box-meaned to the requested
    * (w, h) — so byte-different encodings of the same pixels (row order,
    * padding) decode identically, which the FNV stub cannot do; `png`
    * does the same through the pure-JVM PNG path (zlib inflate + row
    * unfilters). Wrong-format bytes under a real codec fail loudly; a
    * silent stub fallback would fake a decode. The quartet's dataflow is
    * codec-agnostic either way.
    */
  def decodeAndFeaturize(df: DataFrame, w: Int = 32, h: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val codec = spark.conf.get("spark.graft.mm.codec", "stub")
    require(codec == "stub" || codec == "bmp" || codec == "png",
      s"spark.graft.mm.codec must be stub|bmp|png, got $codec")
    df.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would init a stateful codec once here
        it.map { case (id, bytes) =>
          val px =
            if (bytes == null) new Array[Float](w * h)
            else if (codec == "bmp" || codec == "png") {
              val (sw, sh, luma) =
                if (codec == "bmp") ImageCodec.decodeBmpLuma(bytes)
                else ImageCodec.decodePngLuma(bytes)
              ImageCodec.boxMean(sw, sh, luma, w, h)
            } else fakeDecode(bytes, w, h)
          (id, px, w, h)
        }
      }
      .toDF("media_id", "pixels", "width", "height")
  }

  /** Box-filter downsample of decoded pixel grids: each destination pixel
    * is the mean of its (srcW/dstW)×(srcH/dstH) source block — the resize
    * member of the decode / feature-extract / resize / frame-sample
    * quartet. Runs per partition over the (media_id, pixels) batches the
    * decode step emits (same mapPartitions shape, so a real resampler
    * slots in without touching the dataflow). Requires integral scale
    * factors; block means of ≤1020/255 level quarters are exact in float,
    * so the oracle recovers the source-level block sums losslessly.
    */
  def boxResize(df: DataFrame, srcW: Int, srcH: Int, dstW: Int, dstH: Int): DataFrame = {
    require(srcW % dstW == 0 && srcH % dstH == 0,
      s"box resize needs integral factors: ${srcW}x$srcH -> ${dstW}x$dstH")
    val fx = srcW / dstW; val fy = srcH / dstH
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("pixels")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        it.map { case (id, px) =>
          val out = new Array[Float](dstW * dstH)
          var ry = 0
          while (ry < dstH) {
            var rx = 0
            while (rx < dstW) {
              var sum = 0.0f
              var dy = 0
              while (dy < fy) {
                var dx = 0
                while (dx < fx) {
                  sum += px((ry * fy + dy) * srcW + (rx * fx + dx))
                  dx += 1
                }
                dy += 1
              }
              out(ry * dstW + rx) = sum / (fx * fy)
              rx += 1
            }
            ry += 1
          }
          (id, out.toSeq, dstW, dstH)
        }
      }
      .toDF("media_id", "pixels", "width", "height")
  }

  /** Frame sampling for video-kind rows: emits `n` evenly spaced pseudo
    * frames per media row (explode shape identical to a real frame sampler).
    */
  def sampleFrames(df: DataFrame, n: Int = 4, w: Int = 16, h: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (0 until n).map { f =>
          val seed = if (bytes == null) Array[Byte](f.toByte)
            else bytes :+ f.toByte
          (id, f, fakeDecode(seed, w, h))
        }
      }
      .toDF("media_id", "frame_idx", "pixels")
  }

  /** Waveform windowing for audio-kind rows: decode to a pseudo-sample
    * stream, split into `windows` fixed-size windows, emit per-window
    * amplitude stats — the 1→N explode + window-stat shape of a real audio
    * feature extractor (VAD, loudness normalization), with the stub decode
    * replayable by the DuckDB oracle. Swap `fakeDecode` for a PCM decode
    * without touching the dataflow.
    */
  def sampleWaveform(df: DataFrame, windows: Int = 8, samplesPerWindow: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("kind") === "audio")
      .select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val samples = if (bytes == null) new Array[Float](windows * samplesPerWindow)
          else fakeDecode(bytes, samplesPerWindow, windows)
        (0 until windows).map { wi =>
          var sum = 0.0
          var peak = Float.MinValue
          var i = wi * samplesPerWindow
          val end = i + samplesPerWindow
          while (i < end) {
            sum += samples(i)
            if (samples(i) > peak) peak = samples(i)
            i += 1
          }
          (id, wi, sum, peak.toDouble)
        }
      }
      .toDF("media_id", "window_idx", "sample_sum", "peak")
  }

  /** Energy-threshold voice-activity segmentation over the windowed
    * waveform — the silence-removal pass an ASR-corpus pipeline runs before
    * transcription: a window is ACTIVE when its mean amplitude exceeds
    * `threshold`, and maximal runs of active windows merge into segments
    * (gaps-and-islands: island = window_idx − row_number over the active
    * windows, both per-media). Per-media windows are a constant (`windows`),
    * so every partitioned window here is bounded-input by construction.
    * Amplitudes are byte/255 floats widened to double, so the 32-term sums
    * are EXACT (≤29 significant bits) and the threshold compare is
    * order-free — replayable by the oracle. Swap the stub decode for PCM +
    * a spectral VAD score without touching the dataflow.
    */
  def vadSegments(df: DataFrame, windows: Int = 8, samplesPerWindow: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wv = sampleWaveform(df, windows, samplesPerWindow)
    val perMedia = Window.partitionBy("media_id").orderBy("window_idx")
    val segs = wv
      .filter(col("sample_sum") / lit(samplesPerWindow) > lit(threshold))
      .withColumn("island", col("window_idx") - row_number().over(perMedia))
      .groupBy(col("media_id"), col("island"))
      .agg(min("window_idx").as("seg_start"), max("window_idx").as("seg_end"),
        count(lit(1)).as("n_windows"),
        round(sum("sample_sum"), 4).as("energy"))
    val perSeg = Window.partitionBy("media_id").orderBy("seg_start")
    segs.withColumn("seg_idx", row_number().over(perSeg).cast("long"))
      .select(col("media_id"), col("seg_idx"),
        col("seg_start").cast("long").as("seg_start"),
        col("seg_end").cast("long").as("seg_end"),
        col("n_windows"), col("energy"))
  }

  /** Per-sample waveform points (media_id, window_idx, sample_idx, px) —
    * the un-aggregated sibling of [[sampleWaveform]], feeding peak-picking
    * pipelines like [[constellationMatches]].
    */
  def samplePoints(df: DataFrame, windows: Int = 8,
      samplesPerWindow: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("kind") === "audio")
      .select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val s = if (bytes == null) new Array[Float](windows * samplesPerWindow)
          else fakeDecode(bytes, samplesPerWindow, windows)
        s.indices.map(i =>
          (id, i / samplesPerWindow, i % samplesPerWindow, s(i).toDouble))
      }
      .toDF("media_id", "window_idx", "sample_idx", "px")
  }

  /** Shazam-style constellation fingerprint matching (Wang ISMIR'03): one
    * peak per window (argmax sample, ties to the smaller index), anchor
    * peaks paired with peaks up to `maxDt` windows ahead into (pa, pb, dt)
    * hashes, then a banded join ON THE HASH — never an all-pairs audio
    * comparison — and per candidate pair the modal window offset (true
    * matches align at one offset; chance collisions scatter). Pairs with
    * ≥ `minMatch` matching hashes survive.
    *
    * Scale shape: peak-picking is a per-(media, window) argmax; the match
    * join is keyed on the 3-component hash exactly like an inverted index
    * (the posting-list join of audio search); the offset histogram is one
    * aggregate on the matched pairs. With a REAL PCM decode + FFT the
    * peaks become spectral maxima — the dataflow is unchanged (the stub
    * decoder makes only byte-identical audio align, like mm_phash).
    */
  def constellationMatches(df: DataFrame, windows: Int = 8,
      samplesPerWindow: Int = 32, maxDt: Int = 3, minMatch: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = samplePoints(df, windows, samplesPerWindow)
    val wpk = Window.partitionBy("media_id", "window_idx")
      .orderBy(col("px").desc, col("sample_idx"))
    val peaks = pts.withColumn("rn", row_number().over(wpk))
      .filter(col("rn") === 1)
      .select(col("media_id"), col("window_idx").as("w"), col("sample_idx").as("p"))
    val hashes = peaks.as("a").join(peaks.as("b"),
        col("a.media_id") === col("b.media_id")
          && col("b.w") > col("a.w") && col("b.w") <= col("a.w") + maxDt)
      .select(col("a.media_id").as("mid"), col("a.p").as("pa"),
        col("b.p").as("pb"), (col("b.w") - col("a.w")).as("dt"),
        col("a.w").as("wa"))
    val matched = hashes.as("x").join(hashes.as("y"),
        col("x.pa") === col("y.pa") && col("x.pb") === col("y.pb")
          && col("x.dt") === col("y.dt") && col("x.mid") < col("y.mid"))
      .select(col("x.mid").as("id_a"), col("y.mid").as("id_b"),
        (col("x.wa") - col("y.wa")).as("off"))
    val byOff = matched.groupBy("id_a", "id_b", "off")
      .agg(count(lit(1)).as("n"))
    val wBest = Window.partitionBy("id_a", "id_b")
      .orderBy(col("n").desc, col("off"))
    byOff
      .withColumn("rn", row_number().over(wBest))
      .withColumn("n_match", sum("n").over(Window.partitionBy("id_a", "id_b")))
      .filter(col("rn") === 1 && col("n_match") >= minMatch)
      .select(col("id_a"), col("id_b"), col("n_match"),
        col("off").cast("long").as("best_offset"))
      .orderBy("id_a", "id_b")
  }

  /** Perceptual-hash signature per image row: decode to an 8×8 pixel grid,
    * bit j = pixel j above the image mean — the mean-threshold aHash
    * variant of pHash. Under `spark.graft.mm.codec=bmp` the decode is REAL
    * (ImageCodec luma + box-mean to 8×8), so byte-different encodings of
    * the same pixels collide and visually-similar images map to nearby
    * signatures (Round8Spec pins the collision); under the default FNV
    * stub only byte-identical media collide (FNV avalanches).
    * The mean is exact in both engines: 64 pixel values are floats cast to
    * double (24-bit mantissas, ≤ 8 bits of exponent spread), so the sum
    * needs < 40 mantissa bits — no rounding in any summation order.
    */
  def phash64(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    decodeAndFeaturize(df.filter(col("kind") === "image"), 8, 8)
      .select(col("media_id"), col("pixels")).as[(Long, Seq[Float])]
      .map { case (id, px) =>
        var sum = 0.0
        px.foreach(v => sum += v.toDouble)
        val mean = sum / px.length
        var sig = 0L
        var j = 0
        while (j < px.length) { if (px(j) > mean) sig |= (1L << j); j += 1 }
        (id, sig)
      }.toDF("media_id", "sig")
  }

  /** Image near-dup pairs by pHash Hamming distance ≤ `maxHamming`:
    * pigeonhole banding ((maxHamming+1) chunks — any qualifying pair shares
    * at least one chunk, total recall) + codegen `bit_count(a ^ b)` verify.
    * The banded self-join keys are (chunk_idx, chunk_value) — selective at
    * any corpus size, same scale shape as the simhash text path
    * (Dedup.scala pigeonhole banding).
    */
  def phashNearDupPairs(df: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = phash64(df)
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    val exploded = sigs.select(col("media_id"), col("sig"),
      explode(array((0 until chunks).map(c =>
        struct(lit(c).as("c"), shiftrightunsigned(col("sig"), c * bits)
          .bitwiseAND(lit((1L << bits) - 1)).as("v"))): _*)).as("ch"))
      .select(col("media_id"), col("sig"), col("ch.c").as("c"), col("ch.v").as("v"))
    exploded.as("l").join(exploded.as("r"),
        col("l.c") === col("r.c") && col("l.v") === col("r.v") &&
        col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("id_a"), col("r.media_id").as("id_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Scene segmentation over sampled video frames: a cut opens a new scene
    * wherever the per-frame feature (pixel sum, the stub stand-in for a real
    * frame histogram/embedding) jumps by more than `threshold` vs the
    * previous frame — the standard shot-boundary detector shape. Emits one
    * row per (video, scene) with frame extent.
    *
    * Plan: frame features come out of the decode batch pass; the cut rule is
    * a lag window and the scene id a running sum over the SAME
    * (media_id, frame_idx) window — one shuffle on media_id serves both
    * window passes and the final per-scene aggregate. Frames of one video
    * are never split across partitions, so this scales per-video, not
    * per-corpus. Features are rounded to 4 decimals BEFORE the diff so the
    * cut decisions compare identical doubles in both engines.
    */
  def sceneSegments(frames: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feat = frames.select(col("media_id"),
      col("frame_idx").cast("long").as("frame_idx"),
      round(aggregate(col("pixels"), lit(0.0d), (a, v) => a + v.cast("double")), 4)
        .as("feat"))
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val cuts = feat
      .withColumn("prev", lag(col("feat"), 1).over(w))
      .withColumn("is_cut",
        when(col("prev").isNotNull && abs(col("feat") - col("prev")) > threshold, 1L)
          .otherwise(0L))
      .withColumn("scene_id",
        sum(col("is_cut")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cuts.groupBy(col("media_id"), col("scene_id"))
      .agg(count(lit(1)).as("n_frames"),
        min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"))
  }

  /** Video-level near-duplicate pairs: Jaccard over each video's SET of
    * per-frame features — re-encoded/re-uploaded copies of a video decode
    * to the same frame features, so their sets coincide while unrelated
    * videos share features only by chance. Candidates come from the
    * identical-feature inverted join (the corpus line-dedup shape: join on
    * the feature value, never all-pairs), then the exact Jaccard verifies —
    * shared / (|A| + |B| − shared) from three exact integers. At scale the
    * feature join's fan-out is bounded by how many videos share a frame —
    * the same hot-key profile as line dedup, and AQE's skew split applies.
    */
  def videoNearDupPairs(frames: DataFrame, threshold: Double): DataFrame = {
    val feats = frames.select(col("media_id"),
        round(aggregate(col("pixels"), lit(0.0d), (a, v) => a + v.cast("double")), 4)
          .as("feat"))
      .distinct().persist()
    val sizes = feats.groupBy(col("media_id")).agg(count(lit(1)).as("n"))
    val shared = feats.as("a").join(feats.as("b"),
        col("a.feat") === col("b.feat") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("media_id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("media_id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"), col("jaccard"))
  }

  /** Synthesize a deterministic media table from any source table (for tests
    * and benchmarks — the container has no real media files). `seedOf`
    * remaps the byte-content seed so callers can inject exact-duplicate
    * media under distinct ids (the dedup fixtures).
    */
  def syntheticMedia(spark: SparkSession, n: Int,
      seedOf: Long => Long = identity): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val s = seedOf(i)
      // full 31-bit content space: LCG mod the Mersenne prime 2^31-1, then
      // SQUARED mod p before the byte fold (a linear form folds seed deltas
      // that are ≡0 mod 256 to identical contents; squaring makes the
      // j-interaction nonlinear — measured 99 997 distinct contents per
      // 100k seeds vs the old (s*31+j*7)%251 form's 251, which made every
      // growth family above ~250 rows measure collision artifacts, not the
      // operator). Every op stays < 2^62, so DuckDB BIGINT replays exactly.
      val bytes = Array.tabulate[Byte](64) { j =>
        val x = (s * 1103515245L + j * 12345L) % 2147483647L
        (x * x % 2147483647L % 256L).toByte
      }
      (i, kind, bytes)
    }.toDF("media_id", "kind", "bytes")
      .withColumn("meta", struct(
        lit(640).as("width"), lit(480).as("height"), lit(3).as("channels"),
        lit(16000).as("sample_rate"), lit(1000L).as("duration_ms"), lit("fake").as("format")))
  }
}
