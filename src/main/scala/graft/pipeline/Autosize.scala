package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}

/** Operator-entry shuffle sizing for HEAVY expansion joins — the round-7
  * ladder lever (`SPARK_GRAFT_INIT_PARTS=256`) encoded in the plans
  * instead of an env knob someone has to know.
  *
  * The measured rule (BENCH_scale.json notes): one-shot super-linear
  * shuffles — triangle wedges, fingerprint/gram explosions — spill and
  * hang at the session's fixed partition count once input passes ~10× of
  * sf0.1 (256 partitions fixed gr_triangles/gr_bfs/gr_walks/
  * dd_substr_winnow/dd_edit_pairs at the 30×/100× rungs), while ITERATIVE
  * fixpoints (scc, pagerank, mst) REGRESS under the same raise (256
  * near-empty partitions re-checkpointed per step, gr_pagerank 6.7→41 s).
  * So: the expansion operators below size their own exchange ∝ measured
  * input rows with the session default as the floor, and the fixpoint
  * operators never call this.
  *
  * Mechanism: an explicit `repartition(n, joinKeys)` IS the exchange the
  * join would insert anyway — same shuffle, pinned width — so when n
  * exceeds the floor nothing extra moves; when the input is small (every
  * sf0.001/sf0.01 gate run) n stays at the floor and the plan — and every
  * gate hash — is byte-identical to the unsized one. On a cluster the
  * session default (executor-count-scaled) remains the floor and the same
  * per-input scaling applies.
  */
private[pipeline] object Autosize {
  /** ~256 partitions at the sf0.1 ladder's 30×-rung edge count (~36M). */
  val EdgesPerPart = 140_000L
  /** ~256 partitions at the 30×-rung corpus char count (~45M). */
  val CharsPerPart = 175_000L
  /** Local-mode guard; a real cluster's floor is the executor count. */
  val Cap = 1024

  def parts(df: DataFrame, rows: Long, rowsPerPart: Long): Int = {
    val floor = df.sparkSession.sessionState.conf.numShufflePartitions
    math.max(floor.toLong, math.min(Cap.toLong, rows / rowsPerPart)).toInt
  }

  /** Pin `df`'s next exchange on `keys` to `n` partitions iff `n` exceeds
    * the session floor (identity otherwise — small inputs keep their
    * plans, and their gate hashes, untouched).
    */
  def keyed(df: DataFrame, n: Int, keys: Column*): DataFrame =
    if (n > df.sparkSession.sessionState.conf.numShufflePartitions)
      df.repartition(n, keys: _*)
    else df
}
