package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Packing

/** Sequence packing / corpus mixing / domain caps: each checked against a
  * driver-side brute-force reimplementation (the oracle gate then
  * hash-matches the same operators against DuckDB at sf0.01).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  // 12 docs over 3 sources, token counts 1..8 plus an empty doc
  private val docs = mkDocs(
    (0L, "a", "w1 w2 w3 w4 w5"), (1L, "a", "w1 w2"), (2L, "a", "w1 w2 w3"),
    (3L, "b", "w1 w2 w3 w4 w5 w6 w7 w8"), (4L, "b", "w1"), (5L, "b", ""),
    (6L, "c", "w1 w2 w3 w4"), (7L, "c", "w1 w2 w3 w4 w5 w6"),
    (8L, "a", "w1 w2 w3 w4 w5 w6 w7"), (9L, "b", "w1 w2 w3"),
    (10L, "c", "w1 w2"), (11L, "c", "w1 w2 w3 w4 w5"))

  private def ntok(s: String): Long =
    if (s.trim.isEmpty) 0L else s.trim.split("\\s+").length.toLong

  test("packPlacements matches brute-force concat-and-chunk per shard") {
    val cap = 4L
    val shards = 3
    val out = Packing.packPlacements(docs, "doc_id", "text", cap, shards)
      .as[(Long, Int, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

    // brute force: deal to shards, sort by (scramble, id), running sum
    val rows = docs.as[(Long, String, String)].collect()
      .map { case (id, _, t) => (id, (id % shards).toInt,
        (id * 2654435761L) % 1000003L, ntok(t)) }
    for (sh <- 0 until shards) {
      var cum = 0L
      for ((id, _, _, n) <- rows.filter(_._2 == sh).sortBy(r => (r._3, r._1))) {
        val start = cum; cum += n
        val (gShard, gSeq, gOff, gN, gSplit) = out(id)
        assert(gShard == sh && gN == n, s"doc $id shard/ntok")
        assert(gSeq == start / cap, s"doc $id seq")
        assert(gOff == start % cap, s"doc $id offset")
        val expSplit = n > 0 && (cum - 1) / cap != start / cap
        assert(gSplit == expSplit, s"doc $id split")
      }
    }
    // shard-level conservation: the final cumsum covers every token exactly
    // once — placements tile [0, total) with no gap and no overlap
    val byShard = out.values.groupBy(_._1)
    for ((sh, ps) <- byShard) {
      val spans = ps.map(p => (p._2 * cap + p._3, p._2 * cap + p._3 + p._4))
        .toSeq.sortBy(_._1)
      assert(spans.head._1 == 0L, s"shard $sh starts at 0")
      for (Seq((_, e), (s2, _)) <- spans.sliding(2))
        assert(e == s2, s"shard $sh contiguous")
    }
  }

  test("packPlacements is invariant to input partitioning") {
    val a = Packing.packPlacements(docs.repartition(7), "doc_id", "text", 4L, 3)
      .collect().toSeq
    val b = Packing.packPlacements(docs.coalesce(1), "doc_id", "text", 4L, 3)
      .collect().toSeq
    assert(a == b)
  }

  test("packBinsNextFit matches brute-force next-fit per shard") {
    val cap = 6L
    val shards = 3
    val out = Packing.packBinsNextFit(docs, "doc_id", "text", cap, shards)
      .as[(Long, Int, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val rows = docs.as[(Long, String, String)].collect()
      .map { case (id, _, t) => (id, (id % shards).toInt,
        (id * 2654435761L) % 1000003L, ntok(t)) }
    for (sh <- 0 until shards) {
      var bin = 0L; var fill = 0L
      for ((id, _, _, n) <- rows.filter(_._2 == sh).sortBy(r => (r._3, r._1))) {
        if (fill > 0 && fill + n > cap) { bin += 1; fill = 0 }
        assert(out(id) == ((sh, bin, fill, n, n > cap)), s"doc $id")
        fill += n
      }
    }
    // no-split invariant: every bin fills to <= cap, except a bin holding
    // an oversize doc (which may also carry zero-token docs that landed
    // before it — they occupy no budget)
    val byBin = out.toSeq.groupBy { case (_, (sh, bin, _, _, _)) => (sh, bin) }
    for (((sh, bin), ds) <- byBin) {
      val fills = ds.map(_._2._4).sum
      val oversize = ds.exists(_._2._5)
      val nonOversizeTokens = ds.filter(!_._2._5).map(_._2._4).sum
      assert(fills <= cap || (oversize && nonOversizeTokens == 0),
        s"bin ($sh,$bin): fills=$fills oversize=$oversize")
    }
  }

  test("packBinsNextFit is invariant to input partitioning") {
    val a = Packing.packBinsNextFit(docs.repartition(7), "doc_id", "text", 6L, 3)
      .collect().toSeq
    val b = Packing.packBinsNextFit(docs.coalesce(1), "doc_id", "text", 6L, 3)
      .collect().toSeq
    assert(a == b)
  }

  test("mixReport: integer targets, ppm cuts, and kept stats match brute force") {
    val weights = Map("a" -> 3L, "b" -> 1L, "c" -> 2L)
    val budget = 20L
    val out = Packing.mixReport(docs, "doc_id", "text", "source", weights,
        budget, "t:")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

    val rows = docs.as[(Long, String, String)].collect()
      .map { case (id, src, t) => (id, src, ntok(t)) }
    val sumW = weights.values.sum
    def mixKey(s: String): Long = {
      val h = s.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      h * 2654435761L % 1000000007L % 1000000L
    }
    for ((src, w) <- weights) {
      val avail = rows.filter(_._2 == src).map(_._3).sum
      val target = w * budget / sumW
      val cut = math.min(1000000L, target * 1000000L / avail)
      val kept = rows.filter(r => r._2 == src &&
        mixKey("t:" + r._1.toString) < cut)
      assert(out(src) == ((avail, target, cut, kept.length.toLong,
        kept.map(_._3).sum)), s"source $src")
    }
    // mixCorpus returns exactly the rows the report counted
    val keptRows = Packing.mixCorpus(docs, "doc_id", "text", "source",
      weights, budget, "t:")
    assert(keptRows.count() == out.values.map(_._4).sum)
    assert(keptRows.columns.toSeq == docs.columns.toSeq)
  }

  test("mixReport keeps a row for a source whose cut keeps nothing") {
    val weights = Map("a" -> 0L, "b" -> 1L, "c" -> 1L)
    val out = Packing.mixReport(docs, "doc_id", "text", "source", weights,
        20L, "t:")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(out("a") == 0L)
    assert(out.keySet == Set("a", "b", "c"))
  }

  test("plan shapes: packing shuffles once on shard; mix cut join broadcasts") {
    val pack = Packing.packPlacements(docs, "doc_id", "text", 4L, 3)
    val packPlan = pack.queryExecution.executedPlan.toString()
    // the running sum must partition by shard — no global-order window
    assert(packPlan.contains("hashpartitioning(shard"),
      s"pack window not sharded:\n$packPlan")
    val mix = Packing.mixReport(docs, "doc_id", "text", "source",
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L), 20L, "t:")
    val mixPlan = mix.queryExecution.executedPlan.toString()
    // the per-source cut table is tiny and must reach the corpus as a
    // broadcast, not a shuffle join
    assert(mixPlan.contains("BroadcastHashJoin"),
      s"mix cut join is not broadcast:\n$mixPlan")
  }

  test("domainCapped keeps the top-N by tokens per domain, ties by id") {
    val capped = Packing.domainCapped(docs, "doc_id", "text", "source", 2)
      .select("doc_id").as[Long].collect().toSet
    // a: tokens (0→5, 1→2, 2→3, 8→7) → keep 8, 0
    // b: (3→8, 4→1, 5→0, 9→3) → keep 3, 9
    // c: (6→4, 7→6, 10→2, 11→5) → keep 7, 11
    assert(capped == Set(8L, 0L, 3L, 9L, 7L, 11L))

    val rep = Packing.domainCapReport(docs, "doc_id", "text", "source", 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rep("a") == ((4L, 2L, 12L, 5L)))
    assert(rep("b") == ((4L, 2L, 11L, 3L)))
    assert(rep("c") == ((4L, 2L, 11L, 5L)))
  }

  test("shardAssign is a total permutation: every doc once, contiguous pos per shard") {
    val docs = (1L to 300L).map(i => (i, "s", ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "source", "text")
    val out = Packing.shardAssign(docs, "doc_id", "text",
      numShards = 8, salt = "t:")
      .as[(Long, Int, Long, Long)].collect()
    assert(out.map(_._1).toSet == (1L to 300L).toSet)     // all docs, exactly once
    assert(out.length == 300)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps == (0L until rows.length).toSeq)          // contiguous 0..n-1
    }
    // shards are used and roughly balanced (scrambled hash, not id ranges)
    val sizes = out.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size == 8 && sizes.values.min > 10)
  }

  test("shardAssign is invariant to input partitioning") {
    val docs = (1L to 120L).map(i => (i, "s", "a b c"))
      .toDF("doc_id", "source", "text")
    val a = Packing.shardAssign(docs, "doc_id", "text", 4, "t:")
      .as[(Long, Int, Long, Long)].collect().toSeq
    val b = Packing.shardAssign(docs.repartition(13), "doc_id", "text", 4, "t:")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(a == b)
    // a different salt draws a different permutation
    val c = Packing.shardAssign(docs, "doc_id", "text", 4, "u:")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(a != c)
  }
}
