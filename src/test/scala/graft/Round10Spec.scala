package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Graphs

/** Round-10 optimization pins: the iterative graph loops (katz, hits,
  * kcorePeel, labelPropagation, sssp, bfs/bfsPerSource, brandesBetweenness,
  * hashWalks) now run the SCC/MST materializedBare + freeCheckpoint
  * discipline — constant-size per-round plans instead of an unrolled
  * lineage (37k–86k plan lines before), and superseded generations freed
  * instead of leaking to query end. These tests pin the two new properties
  * the oracle can't see: no block-store leak beyond the result-referenced
  * frames, and a bounded plan for a representative loop's result.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // a directed graph with both directions present (the kcore/lpa contract)
  private def symEdges = {
    val raw = (0 until 300).map(i => (i.toLong % 30, (i * 7L + 1) % 30))
      .filter { case (a, b) => a != b }
    (raw ++ raw.map(_.swap)).toDF("src", "dst")
  }

  test("iterative loops free superseded generations (no block-store leak)") {
    val sc = spark.sparkContext
    def persisted = sc.getPersistentRDDs.size
    val seeds = Seq(1L, 2L).toDF("node")

    def leakOf(label: String, allowed: Int)(run: => Long): Unit = {
      val before = persisted
      assert(run > 0, s"$label produced no rows")
      val leaked = persisted - before
      assert(leaked <= allowed,
        s"$label leaked $leaked persisted frames (allowed $allowed) — " +
          "superseded loop generations are no longer freed?")
    }
    // allowed = the result-referenced checkpoints that legitimately stay
    // resident until the caller drops the frame (final acc / final a+h /
    // final e / final labels / every frontier level)
    leakOf("katz", 1)(Graphs.katz(symEdges, iters = 3, k = 10).count())
    leakOf("hits", 2)(Graphs.hits(symEdges, iters = 2, k = 10).count())
    leakOf("kcorePeel", 1)(Graphs.kcorePeel(symEdges, k = 2, rounds = 3).count())
    leakOf("labelPropagation", 1)(
      Graphs.labelPropagation(symEdges, rounds = 3).count())
    leakOf("sssp", 1)(
      Graphs.sssp(symEdges.withColumn("w", lit(1L)), seeds, rounds = 3).count())
    // frontier loops keep one checkpoint per level (the result unions all
    // of them) plus the seed level; maxHop = 3 ⇒ ≤ 4
    leakOf("bfs", 4)(Graphs.bfs(symEdges, seeds, maxHop = 3).count())
    leakOf("bfsPerSource", 4)(
      Graphs.bfsPerSource(symEdges, seeds, maxHop = 3).count())
    // brandes keeps one delta per backward level (+ the deepest seed delta)
    leakOf("brandesBetweenness", 4)(
      Graphs.brandesBetweenness(symEdges, seeds, maxHop = 3, k = 10).count())
    leakOf("hashWalks", 5)(Graphs.hashWalks(symEdges, seeds, steps = 4).count())
  }

  test("loop results read from constant-size plans (lineage truncated)") {
    // the returned frame's analyzed plan must be a readout over
    // checkpointed RDDs, not the unrolled per-round join tree: its string
    // form stays small at any round count and contains no parquet scan
    val k5 = Graphs.katz(symEdges, iters = 5, k = 10)
    val planLines = k5.queryExecution.optimizedPlan.treeString.linesIterator.size
    assert(planLines < 60,
      s"katz(iters=5) result plan is $planLines lines — lineage unrolled again?")
    assert(k5.count() == 10)
  }
}
