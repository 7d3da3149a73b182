package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence assembly operators: concat-and-chunk sequence packing,
  * weighted corpus mixing against a token budget, and per-domain document
  * caps — the last-mile steps between a curated corpus and a tokenized
  * training shard.
  *
  * All three are deterministic (multiplicative-scramble pseudo-shuffle and
  * integer-only budget arithmetic — no IEEE rounding in any decision) and
  * have exact DuckDB replays, so the driver's correctness gate hash-matches
  * them end-to-end.
  *
  * Scale shapes: packing is ONE shuffle to hash shards plus an in-shard
  * running sum (each shard sorts independently — no global sort, no driver
  * state); mixing is two passes with the per-source aggregate broadcast
  * back (sources number in the thousands at most); the domain cap is one
  * window over the domain key. All decisions derive from the row's own
  * columns, so every operator re-runs reproducibly on any cluster layout.
  */
object Packing {

  /** Whitespace token count — same semantics as
    * [[TextAnalysis.tokenCountWs]] (and its proven DuckDB replay in the
    * tx_quality oracle).
    */
  private def ntokCol(textCol: String) =
    when(length(trim(col(textCol))) === 0, lit(0L))
      .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))

  private val ntokDuck =
    """len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''))"""

  // ================================================== sequence packing

  /** Concat-and-chunk packing placements: documents are dealt to
    * `numShards` shards by id, pseudo-shuffled within each shard by a
    * Knuth multiplicative scramble (deterministic — a re-run places every
    * token identically), then concatenated and cut into fixed
    * `capacity`-token training sequences. Emits one row per document:
    * which shard/sequence it lands in, its token offset inside that
    * sequence, and whether it straddles a sequence boundary.
    *
    * This is GPT-style packing (no padding, documents split at sequence
    * boundaries). The plan is one hash shuffle + per-shard window running
    * sum; shards are independent, so at 100 TB each executor packs its
    * shards without coordination and the output is still byte-stable.
    */
  def packPlacements(df: DataFrame, idCol: String, textCol: String,
      capacity: Long, numShards: Int): DataFrame = {
    require(capacity > 0 && numShards > 0)
    val base = df.select(
      col(idCol),
      pmod(col(idCol), lit(numShards.toLong)).cast("int").as("shard"),
      // Knuth multiplicative hash mod a prime — a deterministic shuffle
      // order that decorrelates doc id from position (ties broken by id)
      pmod(col(idCol) * lit(2654435761L), lit(1000003L)).as("rnd"),
      ntokCol(textCol).as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy(col("rnd"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(
        col(idCol), col("shard"),
        expr(s"(cum - n_tokens) div $capacity").as("seq"),
        pmod(col("cum") - col("n_tokens"), lit(capacity)).as("tok_offset"),
        col("n_tokens"),
        // zero-token docs sit AT a boundary; they never straddle one (and
        // `(cum-1) div c` would floor-vs-truncate differently across
        // engines when cum = 0, so don't evaluate it for them)
        when(col("n_tokens") === 0L, lit(false))
          .otherwise(expr(
            s"((cum - 1) div $capacity) != ((cum - n_tokens) div $capacity)"))
          .as("split"))
      .orderBy(col(idCol))
  }

  /** DuckDB replay of [[packPlacements]] over `documents`. */
  def packDuckSql(capacity: Long, numShards: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(doc_id % $numShards AS INTEGER) AS shard,
       |         (doc_id * 2654435761) % 1000003 AS rnd,
       |         CAST($ntokDuck AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT *, sum(n_tokens) OVER (
       |           PARTITION BY shard ORDER BY rnd, doc_id
       |           ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t
       |)
       |SELECT doc_id, shard,
       |       CAST((cum - n_tokens) // $capacity AS BIGINT) AS seq,
       |       CAST((cum - n_tokens) % $capacity AS BIGINT) AS tok_offset,
       |       n_tokens,
       |       CASE WHEN n_tokens = 0 THEN FALSE
       |            ELSE ((cum - 1) // $capacity) <> ((cum - n_tokens) // $capacity)
       |       END AS split
       |FROM c ORDER BY doc_id""".stripMargin

  /** Next-fit BIN packing placements — the no-split variant (SFT-style:
    * documents are never cut; a document that would overflow the open bin
    * closes it and starts the next one; a document longer than `capacity`
    * sits alone in an oversize bin). Same shard deal and pseudo-shuffle
    * order as [[packPlacements]].
    *
    * Next-fit's running (bin, fill) state is inherently sequential, so the
    * plan is the scalable sequential-scan shape: ONE hash shuffle to
    * shards, an external sort within partitions, then a single linear pass
    * whose state resets at each shard boundary — no window, no driver
    * state, byte-stable on any cluster layout. Emits one row per document:
    * (doc_id, shard, bin, bin_offset, n_tokens, oversize).
    */
  def packBinsNextFit(df: DataFrame, idCol: String, textCol: String,
      capacity: Long, numShards: Int): DataFrame = {
    require(capacity > 0 && numShards > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
      pmod(col(idCol), lit(numShards.toLong)).cast("int").as("shard"),
      pmod(col(idCol) * lit(2654435761L), lit(1000003L)).as("rnd"),
      ntokCol(textCol).as("n_tokens"))
    base.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("rnd"), col("id"))
      .as[(Long, Int, Long, Long)]
      .mapPartitions { it =>
        // a partition holds whole shards (hash-partitioned on shard), in
        // (shard, rnd, id) order; state resets at each shard boundary
        var shard = -1
        var bin = 0L
        var fill = 0L
        it.map { case (id, sh, _, n) =>
          if (sh != shard) { shard = sh; bin = 0L; fill = 0L }
          if (fill > 0 && fill + n > capacity) { bin += 1; fill = 0L }
          val offset = fill
          fill += n
          (id, sh, bin, offset, n, n > capacity)
        }
      }
      .toDF("doc_id", "shard", "bin", "bin_offset", "n_tokens", "oversize")
      .orderBy(col("doc_id"))
  }

  /** DuckDB replay of [[packBinsNextFit]] over `documents`: the sequential
    * fold becomes a recursive CTE stepping row-rank by row-rank within each
    * shard (depth = max docs per shard).
    */
  def packBinsDuckSql(capacity: Long, numShards: Int): String =
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id,
       |         CAST(doc_id % $numShards AS INTEGER) AS shard,
       |         (doc_id * 2654435761) % 1000003 AS rnd,
       |         CAST($ntokDuck AS BIGINT) AS n_tokens
       |  FROM documents
       |), o AS (
       |  SELECT *, row_number() OVER (
       |           PARTITION BY shard ORDER BY rnd, doc_id) AS rn
       |  FROM t
       |), s AS (
       |  SELECT doc_id, shard, rn, n_tokens,
       |         CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS bin_offset,
       |         n_tokens AS fill
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.doc_id, o.shard, o.rn, o.n_tokens,
       |         CASE WHEN s.fill > 0 AND s.fill + o.n_tokens > $capacity
       |              THEN s.bin + 1 ELSE s.bin END,
       |         CASE WHEN s.fill > 0 AND s.fill + o.n_tokens > $capacity
       |              THEN 0 ELSE s.fill END,
       |         CASE WHEN s.fill > 0 AND s.fill + o.n_tokens > $capacity
       |              THEN o.n_tokens ELSE s.fill + o.n_tokens END
       |  FROM s JOIN o ON o.shard = s.shard AND o.rn = s.rn + 1
       |)
       |SELECT doc_id, shard, bin, bin_offset, n_tokens,
       |       n_tokens > $capacity AS oversize
       |FROM s ORDER BY doc_id""".stripMargin

  // ==================================================== corpus mixing

  /** Weighted corpus mixing: given integer mixture weights per source and a
    * total token budget, compute each source's token target
    * (`budget · w/ΣW`), derive a deterministic per-source sampling cut, and
    * report per source what the mix keeps. Selection hashes the salted doc
    * id (same scramble as [[Corpus.stratifiedSample]]), so membership is a
    * pure function of the row — reproducible across runs and cluster
    * layouts, and a different `salt` draws an independent mix.
    *
    * All budget arithmetic is integer (`div`, parts-per-million cut) — the
    * decision thresholds carry no floating-point rounding on either engine.
    *
    * Output: source, avail_tokens, target_tokens, cut_ppm, kept_docs,
    * kept_tokens (sources whose cut keeps nothing still get a row).
    */
  def mixReport(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, weights: Map[String, Long], tokenBudget: Long,
      salt: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0))
    val sumW = weights.values.sum
    val wcol = weights.toSeq.sortBy(_._1).foldRight(lit(0L)) {
      case ((k, wt), els) => when(col(sourceCol) === k, lit(wt)).otherwise(els)
    }
    val base = df.select(col(idCol), col(sourceCol).as("source"),
      ntokCol(textCol).as("n_tokens"), wcol.as("wt"))
    val avail = base.groupBy("source")
      .agg(sum("n_tokens").as("avail_tokens"), max("wt").as("wt"))
      .withColumn("target_tokens", expr(s"(wt * $tokenBudget) div $sumW"))
      .withColumn("cut_ppm",
        when(col("avail_tokens") === 0L, lit(0L))
          .otherwise(least(lit(1000000L),
            expr("(target_tokens * 1000000) div avail_tokens"))))
    val keyed = mixKey(idCol, salt)
    val kept = base.join(broadcast(avail.select("source", "cut_ppm")), "source")
      .filter(keyed < col("cut_ppm"))
      .groupBy("source")
      .agg(count(lit(1)).as("kept_docs"), sum("n_tokens").as("kept_tokens"))
    avail.select("source", "avail_tokens", "target_tokens", "cut_ppm")
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("avail_tokens"), col("target_tokens"),
        col("cut_ppm"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** The mixed corpus itself (rows the mix keeps). */
  def mixCorpus(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, weights: Map[String, Long], tokenBudget: Long,
      salt: String): DataFrame = {
    val rep = mixReport(df, idCol, textCol, sourceCol, weights, tokenBudget,
      salt).select(col("source").as(sourceCol), col("cut_ppm"))
    df.join(broadcast(rep), sourceCol).filter(mixKey(idCol, salt) < col("cut_ppm"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Selection key in [0, 1e6): the salted-id polyHash is multiplicatively
    * scrambled before the final modulus — salted ids share a long prefix, so
    * raw polyHash values sit in a narrow band and a bare `% 1e6` would be
    * heavily biased (observed: a 146k-wide band ⇒ whole sources kept
    * nothing). The scramble spreads the band across the full range; the
    * product stays under 2^63 (polyHash < 1e9+7).
    */
  private def mixKey(idCol: String, salt: String) =
    pmod(pmod(TextAnalysis.polyHash(
        concat(lit(salt), col(idCol).cast("string"))) * lit(2654435761L),
      lit(1000000007L)), lit(1000000L))

  /** DuckDB replay of [[mixReport]] over `documents`. */
  def mixDuckSql(weights: Map[String, Long], tokenBudget: Long,
      salt: String): String = {
    val sumW = weights.values.sum
    val branches = weights.toSeq.sortBy(_._1)
      .map { case (k, wt) => s"WHEN source = '$k' THEN $wt" }.mkString(" ")
    val h = s"((${TextAnalysis.polyHashDuckSql(
      s"('$salt' || CAST(doc_id AS VARCHAR))")} * 2654435761) % 1000000007)"
    s"""WITH t AS (
       |  SELECT doc_id, source, CAST($ntokDuck AS BIGINT) AS n_tokens,
       |         CAST(CASE $branches ELSE 0 END AS BIGINT) AS wt
       |  FROM documents
       |), a AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail_tokens,
       |         max(wt) AS wt
       |  FROM t GROUP BY source
       |), a2 AS (
       |  SELECT source, avail_tokens,
       |         (wt * $tokenBudget) // $sumW AS target_tokens,
       |         CASE WHEN avail_tokens = 0 THEN 0
       |              ELSE least(1000000,
       |                   (((wt * $tokenBudget) // $sumW) * 1000000) // avail_tokens)
       |         END AS cut_ppm
       |  FROM a
       |), k AS (
       |  SELECT t.source, count(*)::BIGINT AS kept_docs,
       |         CAST(sum(t.n_tokens) AS BIGINT) AS kept_tokens
       |  FROM t JOIN a2 USING (source)
       |  WHERE ($h % 1000000) < a2.cut_ppm
       |  GROUP BY t.source
       |)
       |SELECT a2.source, a2.avail_tokens,
       |       CAST(a2.target_tokens AS BIGINT) AS target_tokens,
       |       CAST(a2.cut_ppm AS BIGINT) AS cut_ppm,
       |       COALESCE(k.kept_docs, 0) AS kept_docs,
       |       COALESCE(k.kept_tokens, 0) AS kept_tokens
       |FROM a2 LEFT JOIN k USING (source) ORDER BY source""".stripMargin
  }

  // ============================================ weighted reservoir sample

  /** Weighted sampling without replacement, A-ES (Efraimidis–Spirakis,
    * IPL 97(5) 2006): each document draws a deterministic pseudo-uniform
    * u ∈ (0,1] from its salted-id hash and competes with key
    * ln(u)/w — the k largest keys are a weighted reservoir sample with
    * inclusion probability ∝ w (here w = whitespace token count: the
    * quality-weighted corpus subsample every training-data pipeline draws).
    *
    * Determinism: u is an exact rational from the scrambled polyHash
    * (the tx_mix discipline), ln is the one transcendental (bit-stable
    * across engines on these inputs, the zipfFit/KL experience), and the
    * division by an exact integer weight is a single IEEE op — so the
    * sample is REPLAYABLE, not a seed-dependent RNG artifact. Plan shape:
    * one scan + TakeOrdered(k) — no global sort, no shuffle beyond the
    * top-k combine.
    */
  def weightedSample(df: DataFrame, idCol: String, textCol: String,
      k: Int, salt: String): DataFrame = {
    val w = ntokCol(textCol)
    val u = (mixKey1e9(idCol, salt) + lit(1L)).cast("double") / lit(1000000008.0)
    df.select(col(idCol).as("id"), w.as("n_tokens"),
        (log(u) / w.cast("double")).as("key"))
      .filter(col("n_tokens") > 0)
      .orderBy(col("key").desc, col("id"))
      .limit(k)
      .select(col("id"), col("n_tokens"), round(col("key"), 9).as("key_r"))
  }

  /** DuckDB replay of [[weightedSample]] over `documents`. */
  def weightedSampleDuckSql(k: Int, salt: String): String = {
    val h = s"((${TextAnalysis.polyHashDuckSql(
      s"('$salt' || CAST(doc_id AS VARCHAR))")} * 2654435761) % 1000000007)"
    s"""WITH t AS (
       |  SELECT doc_id AS id, CAST($ntokDuck AS BIGINT) AS n_tokens,
       |         ln(CAST($h + 1 AS DOUBLE) / 1000000008.0)
       |           / CAST($ntokDuck AS BIGINT) AS key
       |  FROM documents
       |)
       |SELECT id, n_tokens, round(key, 9) AS key_r
       |FROM t WHERE n_tokens > 0
       |ORDER BY key DESC, id LIMIT $k""".stripMargin
  }

  /** Stratified variant: an independent A-ES reservoir of `perStratum`
    * documents per source — the per-domain balanced subsample. One window
    * per stratum (bounded by the stratum's size, partitioned — never a
    * global sort).
    */
  def stratifiedSample(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, perStratum: Int, salt: String): DataFrame = {
    val w = ntokCol(textCol)
    val u = (mixKey1e9(idCol, salt) + lit(1L)).cast("double") / lit(1000000008.0)
    val keyed = df.select(col(sourceCol).as("source"), col(idCol).as("id"),
        w.as("n_tokens"), (log(u) / w.cast("double")).as("key"))
      .filter(col("n_tokens") > 0)
    val rw = Window.partitionBy(col("source"))
      .orderBy(col("key").desc, col("id"))
    keyed.withColumn("rk", row_number().over(rw).cast("long"))
      .filter(col("rk") <= perStratum)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_tokens")).as("sampled_tokens"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("source"))
  }

  /** DuckDB replay of [[stratifiedSample]] over `documents`. */
  def stratifiedSampleDuckSql(perStratum: Int, salt: String): String = {
    val h = s"((${TextAnalysis.polyHashDuckSql(
      s"('$salt' || CAST(doc_id AS VARCHAR))")} * 2654435761) % 1000000007)"
    s"""WITH t AS (
       |  SELECT source, doc_id AS id, CAST($ntokDuck AS BIGINT) AS n_tokens,
       |         ln(CAST($h + 1 AS DOUBLE) / 1000000008.0)
       |           / CAST($ntokDuck AS BIGINT) AS key
       |  FROM documents
       |), r AS (
       |  SELECT source, id, n_tokens,
       |         row_number() OVER (PARTITION BY source ORDER BY key DESC, id)
       |           AS rk
       |  FROM t WHERE n_tokens > 0
       |)
       |SELECT source, count(*)::BIGINT AS n_sampled,
       |       CAST(sum(n_tokens) AS BIGINT) AS sampled_tokens,
       |       min(id) AS min_id, max(id) AS max_id
       |FROM r WHERE rk <= $perStratum
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The tx_mix scramble lifted to its own helper: scrambled polyHash of
    * the salted id in [0, 1e9+7) — the shared deterministic-uniform
    * source for mixing and sampling.
    */
  private def mixKey1e9(idCol: String, salt: String) =
    pmod(TextAnalysis.polyHash(
        concat(lit(salt), col(idCol).cast("string"))) * lit(2654435761L),
      lit(1000000007L))

  // ==================================================== per-domain cap

  /** Per-domain document cap: keep at most `maxPerDomain` documents per
    * domain, preferring more tokens (web-corpus curation's defense against
    * a single domain dominating the mix). Ties break on id, so the kept
    * set is deterministic. One window over the domain key — scales to any
    * corpus where a single domain's documents fit an executor's spill
    * budget.
    */
  def domainCapped(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, maxPerDomain: Int): DataFrame = {
    require(maxPerDomain > 0)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(ntokCol(textCol).desc, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerDomain)
      .drop("__rk")
  }

  /** Per-domain cap report: totals, kept, and the kept set's token mass
    * plus its smallest kept document (the effective per-domain floor).
    */
  def domainCapReport(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, maxPerDomain: Int): DataFrame = {
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("n_tokens").desc, col(idCol))
    df.select(col(domainCol).as("domain"), col(idCol),
        ntokCol(textCol).as("n_tokens"))
      .withColumn("rk", row_number().over(w))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("rk") <= maxPerDomain, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= maxPerDomain, col("n_tokens")).otherwise(0L))
          .as("kept_tokens"),
        min(when(col("rk") <= maxPerDomain, col("n_tokens")))
          .as("min_kept_tokens"))
      .orderBy(col("domain"))
  }

  /** DuckDB replay of [[domainCapReport]] over `documents` with
    * `source` as the domain.
    */
  def domainCapDuckSql(maxPerDomain: Int): String =
    s"""WITH t AS (
       |  SELECT source AS domain, doc_id,
       |         CAST($ntokDuck AS BIGINT) AS n_tokens
       |  FROM documents
       |), r AS (
       |  SELECT *, row_number() OVER (
       |           PARTITION BY domain ORDER BY n_tokens DESC, doc_id) AS rk
       |  FROM t
       |)
       |SELECT domain, count(*)::BIGINT AS n_total,
       |       CAST(sum(CASE WHEN rk <= $maxPerDomain THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN rk <= $maxPerDomain THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       |       CAST(min(CASE WHEN rk <= $maxPerDomain THEN n_tokens END) AS BIGINT) AS min_kept_tokens
       |FROM r GROUP BY domain ORDER BY domain""".stripMargin

  // ============================================ global shuffle + sharding

  /** Deterministic global shuffle into `numShards` training shards — the
    * step between a curated corpus and the files a data loader streams.
    * Training wants documents in a reproducible pseudo-random order with no
    * source/time clustering; a cluster must produce that order WITHOUT a
    * global sort.
    *
    * Every row gets a scrambled 64-bit-safe key from its salted id (same
    * multiplicative scramble as the mixing/sampling operators, so a
    * different `salt` draws an independent permutation). shard = key mod
    * numShards; pos = rank of the key within the shard. That is exactly
    * one hash exchange on `shard` plus a per-shard sort — each shard
    * orders independently in its own partition (at scale:
    * `repartition(numShards, shard)` + `sortWithinPartitions` streaming
    * straight into per-shard files; no stage ever holds a global order).
    *
    * Output is the full assignment (id, shard, pos, n_tokens) — the
    * manifest a loader uses to seek. Tie order inside a shard is
    * (key, id): ids are unique so the permutation is total and both
    * engines agree.
    */
  def shardAssign(df: DataFrame, idCol: String, textCol: String,
      numShards: Int, salt: String): DataFrame = {
    require(numShards >= 1)
    val key = pmod(TextAnalysis.polyHash(
        concat(lit(salt), col(idCol).cast("string"))) * lit(2654435761L),
      lit(1000000007L))
    val w = Window.partitionBy(col("shard")).orderBy(col("k"), col(idCol))
    df.select(col(idCol), ntokCol(textCol).as("n_tokens"), key.as("k"))
      .withColumn("shard", pmod(col("k"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(col(idCol), col("shard"), col("pos"), col("n_tokens"))
      .orderBy(col("shard"), col("pos"))
  }

  /** DuckDB replay of [[shardAssign]] over `documents`. */
  def shardAssignDuckSql(numShards: Int, salt: String): String = {
    val h = s"((${TextAnalysis.polyHashDuckSql(
      s"('$salt' || CAST(doc_id AS VARCHAR))")} * 2654435761) % 1000000007)"
    s"""WITH t AS (
       |  SELECT doc_id, CAST($ntokDuck AS BIGINT) AS n_tokens, $h AS k
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, n_tokens, k, CAST(k % $numShards AS INTEGER) AS shard
       |  FROM t
       |)
       |SELECT doc_id, shard,
       |       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
       |            - 1 AS BIGINT) AS pos,
       |       n_tokens
       |FROM s ORDER BY shard, pos""".stripMargin
  }
}
