package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),          // near dup
    (4L, "completely different content about spark engines"),
    (5L, "")).toDF("doc_id", "text")

  test("exact dedup keeps min id per text") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    assert(out.count() == 4)
    assert(out.filter(col("text").startsWith("the quick brown fox jumps"))
      .select("doc_id").as[Long].head() == 1L)
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    assert(groups.filter(col("n_dups") === 2).count() == 1)
  }

  test("minhash finds exact and near dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash signature of identical docs is identical") {
    val sigs = docs.filter(col("doc_id") <= 2)
      .select(Dedup.minhashSignature(col("text")))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("simhash near-dup pairs include the exact pair with hamming 0") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 10)
      .as[(Long, Long, Int)].collect()
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.exists(_._3 == 0))
  }

  test("ngram jaccard of exact dups is 1.0") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("cosine + brute-force top-k ordering") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Array(1.0, 0.0, 0.0), 2)
      .select("id").as[Long].collect()
    assert(top.toSeq == Seq(0L, 1L))
  }

  test("SRP bucket is deterministic and groups identical vectors") {
    val vecs = Seq(
      (0L, Array.fill(8)(0.5f)),
      (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding")
    val buckets = vecs.select(col("vec_id"),
        Similarity.srpBucket(col("embedding"), 8, 16).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(buckets(0L) == buckets(1L))
    assert(buckets(0L) != buckets(2L)) // opposite vector flips every plane sign
  }

  test("cosine near-dup pairs via SRP buckets") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        threshold = 0.99, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("PQ encode + ADC: codebook members reconstruct exactly, ADC is the LUT sum") {
    // m=2 subspaces of dim 2, codebook = subvectors of ids 0 and 1
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(vecs, "vec_id", "embedding", m = 2, codeK = 2)
    val codes = Similarity.pqCodes(vecs, "vec_id", "embedding", cb, m = 2, subDim = 2)
      .as[(Long, Int, Int)].collect().map { case (id, mi, c) => ((id, mi), c) }.toMap
    assert(codes == Map((0L, 0) -> 0, (0L, 1) -> 0, (1L, 0) -> 1, (1L, 1) -> 1,
      (2L, 0) -> 0, (2L, 1) -> 1, (3L, 0) -> 1, (3L, 1) -> 0))
    // ADC vs query = vec 0: its own codes give 0; ids 2/3 flip one subspace
    // (LUT entry = squared L2 of the two unit axes = 2); id 1 flips both
    val adc = Similarity.pqAdcTopK(vecs, "vec_id", "embedding",
        Array(1.0, 0.0, 0.0, 1.0), kTop = 4, m = 2, codeK = 2)
      .as[(Long, Double)].collect().toSeq
    assert(adc == Seq((0L, 0.0), (2L, 2.0), (3L, 2.0), (1L, 4.0)))
  }

  test("token counting: whitespace vs BPE-ish") {
    val df = Seq(("hello world, 42 times!")).toDF("text")
    val ws = df.select(TextAnalysis.tokenCountWs(col("text"))).as[Int].head()
    val bpe = df.select(TextAnalysis.tokenCountBpe(col("text"))).as[Int].head()
    assert(ws == 4)
    // hello | world | , | 42 | times | !
    assert(bpe == 6)
  }

  test("text quality features") {
    val q = Seq(("The cat and the dog. 123!")).toDF("text")
      .select(TextAnalysis.textQuality(col("text")).as("q"))
      .select("q.n_chars", "q.stopword_ratio", "q.digit_ratio").head()
    assert(q.getDouble(0) == 25.0)
    assert(q.getDouble(1) > 0.3) // "The","and","the" of 6 tokens
    assert(math.abs(q.getDouble(2) - 3.0 / 25) < 1e-9)
  }

  test("language id picks marker language; CJK short-circuits") {
    val df = Seq(
      ("en", "the cat and the dog is on the table"),
      ("de", "der hund und die katze ist nicht mit ein"),
      ("fr", "le chat est dans la maison pour que une"),
      ("zh", "这是一个中文句子")).toDF("expected", "text")
    val got = df.select(col("expected"), TextAnalysis.languageId(col("text")))
      .as[(String, String)].collect()
    got.foreach { case (exp, act) => assert(exp == act, s"expected $exp got $act") }
  }

  test("doc fingerprint is whitespace-normalization invariant") {
    val df = Seq(("hello   world"), ("hello world"), ("hello worlds")).toDF("text")
    val fps = df.select(TextAnalysis.docFingerprint(col("text"))).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("winnowing fingerprints overlap for shared content") {
    val a = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val b = "PREFIX the quick brown fox jumps over the lazy dog and keeps running far away"
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
    val fps = df.select(TextAnalysis.winnowingFingerprints(col("text")))
      .as[Seq[Long]].collect()
    val inter = fps(0).toSet.intersect(fps(1).toSet)
    assert(inter.size >= fps(0).size / 2)
  }

  test("multimodal decode plumbing: deterministic shapes and values") {
    val media = Multimodal.syntheticMedia(spark, 9)
    val out = Multimodal.decodeAndFeaturize(media, 8, 8)
    assert(out.count() == 9)
    val px = out.orderBy("media_id").select("pixels").as[Seq[Float]].head()
    assert(px.length == 64)
    // re-run → identical (deterministic fake decode)
    val px2 = Multimodal.decodeAndFeaturize(media, 8, 8)
      .orderBy("media_id").select("pixels").as[Seq[Float]].head()
    assert(px == px2)
    val frames = Multimodal.sampleFrames(media, n = 3, 4, 4)
    assert(frames.count() == 9) // 3 videos × 3 frames
  }

  test("ivfKnnJoin finds exact duplicates at rank 1 and keeps ranks dense/ordered") {
    // two tight clusters around orthogonal axes + an exact duplicate pair
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val v = new Array[Float](4); v(axis) = 1.0f; v((axis + 1) % 4) = jitter; v
    }
    val rows = (0 until 20).map { i =>
      val axis = if (i % 2 == 0) 0 else 2
      (i.toLong, vec(axis, 0.01f * (i / 2)))
    } :+ (100L, vec(0, 0.03f)) // exact duplicate of id 6's vector
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.ivfKnnJoin(df, df.filter(col("vec_id") === 6 || col("vec_id") === 7),
        "vec_id", "embedding", k = 3, nlist = 4, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(6L, 7L))
    for ((q, ns) <- byQ) {
      val sorted = ns.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.size.toLong)) // dense ranks
      assert(sorted.map(_._4).reverse.sorted.reverse == sorted.map(_._4)) // cosine desc
      assert(!sorted.exists(_._3 == q)) // no self
    }
    // id 100 duplicates id 6's vector exactly → rank-1 neighbor, cosine 1.0
    assert(byQ(6L).find(_._2 == 1L).get._3 == 100L)
    assert(byQ(6L).find(_._2 == 1L).get._4 == 1.0)
  }

  test("sceneSegments cuts exactly where the frame feature jumps past the threshold") {
    // hand-built single-pixel frames: feature == the pixel value
    val frames = Seq(
      (0L, 0, Seq(1.0f)), (0L, 1, Seq(1.2f)), (0L, 2, Seq(9.0f)), // cut at 2
      (0L, 3, Seq(9.1f)), (0L, 4, Seq(1.0f)),                     // cut at 4
      (1L, 0, Seq(5.0f)), (1L, 1, Seq(5.0f)))                     // no cuts
      .toDF("media_id", "frame_idx", "pixels")
    val out = Multimodal.sceneSegments(frames, threshold = 5.0)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (0L, 0L, 2L, 0L, 1L),                            // scene 0: frames 0-1
      (0L, 1L, 2L, 2L, 3L),                            // scene 1: frames 2-3
      (0L, 2L, 1L, 4L, 4L),                            // scene 2: frame 4
      (1L, 0L, 2L, 0L, 1L)))
  }

  test("sceneSegments partitions every sampled frame into contiguous scenes") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, n = 12)
    val scenes = Multimodal.sceneSegments(frames, threshold = 5.5)
      .as[(Long, Long, Long, Long, Long)].collect()
    val videos = scenes.groupBy(_._1)
    assert(videos.keySet == (0 until 30).filter(_ % 3 == 2).map(_.toLong).toSet)
    for ((_, ss) <- videos) {
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._3).sum == 12)                       // all frames covered
      assert(sorted.head._4 == 0 && sorted.last._5 == 11)      // full extent
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 + 1 == b._4 && b._2 == a._2 + 1)         // contiguous, dense ids
        case _ =>
      }
      sorted.foreach(s => assert(s._5 - s._4 + 1 == s._3))     // extent == count
    }
  }

  test("videoNearDupPairs: set Jaccard over frame features, closed form") {
    // media 1 frames sum to {1,2,3,4}; media 2 to {3,4,5,6}; media 3 == 1
    val frames = (
      Seq(1L -> 1f, 1L -> 2f, 1L -> 3f, 1L -> 4f,
        2L -> 3f, 2L -> 4f, 2L -> 5f, 2L -> 6f,
        3L -> 1f, 3L -> 2f, 3L -> 3f, 3L -> 4f)
      ).zipWithIndex.map { case ((m, v), i) => (m, i, Seq(v)) }
      .toDF("media_id", "frame_idx", "pixels")
    val out = graft.pipeline.Multimodal.videoNearDupPairs(frames, 0.3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 0.333333),   // 2 shared of 6 distinct
      (1L, 3L, 4L, 1.0),
      (2L, 3L, 2L, 0.333333)))
  }

  test("columnProfile: nulls, distincts, heavy hitter, and skew are closed-form exact") {
    val df = Seq(
      (Some(1L), "x"), (Some(1L), "x"), (Some(1L), "x"), (Some(2L), "x"),
      (None: Option[Long], "x"))
      .toDF("a", "b")
    val out = graft.pipeline.Profiling.columnProfile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // a: n=5, 1 null, 2 distinct, heavy=3, skew = 3 / (4/2) = 1.5
    // b: n=5, 0 null, 1 distinct, heavy=5, skew = 5 / (5/1) = 1.0
    assert(out == Seq(
      ("a", 5L, 1L, 2L, 3L, 1.5),
      ("b", 5L, 0L, 1L, 5L, 1.0)))
  }
}
