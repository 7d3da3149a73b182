package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge table — the web-graph quality signal a
  * crawl-curation pipeline feeds into document weighting (rank-weighted
  * sampling of a 100 TB crawl is the canonical use).
  *
  * Plan shape per iteration: contributions = edges ⋈ ranks on src (both
  * sides sharded on the SAME node key — sort-merge equi-join, nothing
  * broadcast), one `groupBy(dst).sum` (map-side combinable), then a left
  * join back to the node list for dangling/unreferenced nodes. k iterations
  * = k shuffles of the rank table (edge table partitioning is reusable);
  * state per round is one (node, rank) row per node, never the edge list.
  *
  * Determinism for the oracle: every iteration's rank is rounded to 12
  * decimals on both engines, so summation-order noise (~1e-16 relative)
  * never survives a round — the chained-CTE DuckDB replay is bit-identical.
  */
object PageRank {

  /** `edges` must have long columns (src, dst); the graph is used as given
    * (callers wanting symmetric flow pass both directions). Returns one row
    * per node with its rank after `iters` damped rounds.
    */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit((1.0 - damping) / n) + lit(damping) * coalesce(col("s"), lit(0.0)), 12)
            .as("rank"))
    }
    ranks
  }

  /** Personalized PageRank: the teleport distribution is uniform over the
    * `seeds` set instead of all nodes — rank mass keeps flowing back to the
    * seeds, so the result scores proximity TO the seed community (the
    * recommendation / related-entities primitive; Haveliwala 2002's
    * topic-sensitive PageRank with a one-hot topic set).
    *
    * Same per-iteration plan as [[pageRank]] (edge⋈rank sort-merge join,
    * map-side-combinable sum, left join to the teleport table); the teleport
    * vector is a (node, t) DataFrame built once — node-keyed, never
    * broadcast, so any seed-set size scales. Dangling mass is dropped, the
    * standard bounded-round treatment (the oracle replays identically).
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
    val ns = sd.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val tele = nodes.join(sd.withColumn("t", lit(1.0 / ns)), Seq("node"), "left")
      .select(col("node"), coalesce(col("t"), lit(0.0)).as("t")).persist()
    var ranks = tele.select(col("node"), col("t").as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = tele.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) * col("t")
            + lit(damping) * coalesce(col("s"), lit(0.0)), 12).as("rank"))
    }
    ranks
  }

  /** DuckDB replay of [[personalizedPageRank]] on the trade graph with
    * nation-0 customers as the seed set.
    */
  def pprDuckSql(iters: Int, damping: Double, topK: Int): String = {
    def step(prev: String, out: String) =
      s"""$out AS (
         |  SELECT tele.node,
         |         round(${1.0 - damping}::DOUBLE * tele.t + ${damping}::DOUBLE * coalesce(c.s, 0), 12) AS rank
         |  FROM tele LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / d.deg) AS s
         |    FROM e JOIN $prev r ON e.src = r.node JOIN deg d ON e.src = d.src
         |    GROUP BY 1) c ON c.node = tele.node
         |)""".stripMargin
    val chain = (1 to iters).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), e AS (
       |  SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw
       |), nodes AS (SELECT DISTINCT src AS node FROM e),
       |sd AS (SELECT DISTINCT c_custkey * 2 AS node FROM customer WHERE c_nationkey = 0),
       |sn AS (SELECT count(*) AS n FROM sd),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |tele AS (
       |  SELECT nodes.node,
       |         CASE WHEN sd.node IS NULL THEN 0.0::DOUBLE ELSE 1::DOUBLE / sn.n END AS t
       |  FROM nodes CROSS JOIN sn LEFT JOIN sd ON sd.node = nodes.node
       |),
       |r0 AS (SELECT node, t AS rank FROM tele),
       |$chain
       |SELECT node, rank FROM r$iters
       |WHERE rank > 0 ORDER BY rank DESC, node LIMIT $topK""".stripMargin
  }

  /** DuckDB replay: the customer↔supplier trade graph (distinct
    * (custkey, suppkey) pairs from lineitem⋈orders, both directions, node
    * ids disambiguated by parity) through `iters` chained rank CTEs.
    */
  def pageRankDuckSql(iters: Int, damping: Double, topK: Int): String = {
    def step(prev: String, out: String) =
      s"""$out AS (
         |  SELECT nodes.node,
         |         round(${1.0 - damping}::DOUBLE / nn.n + ${damping}::DOUBLE * coalesce(c.s, 0), 12) AS rank
         |  FROM nodes CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / d.deg) AS s
         |    FROM e JOIN $prev r ON e.src = r.node JOIN deg d ON e.src = d.src
         |    GROUP BY 1) c ON c.node = nodes.node
         |)""".stripMargin
    val chain = (1 to iters).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH eraw AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), e AS (
       |  SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw
       |), nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |r0 AS (SELECT node, 1::DOUBLE / nn.n AS rank FROM nodes CROSS JOIN nn),
       |$chain
       |SELECT node, rank FROM r$iters ORDER BY rank DESC, node LIMIT $topK""".stripMargin
  }
}
