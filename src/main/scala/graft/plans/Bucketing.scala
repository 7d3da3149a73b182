package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the storage-layout lever for repeated
  * fact-to-fact joins at cluster scale.
  *
  * A 100 TB `lineitem ⋈ orders` on the order key shuffles BOTH sides every
  * time it runs. Writing each table bucketed (`bucketBy(n, key)` +
  * `sortBy(key)`) pays that shuffle ONCE at write time; every subsequent
  * join on the bucket key reads co-located buckets and sort-merges them
  * with ZERO Exchange on either side (bucket pruning and the sorted-scan
  * merge come free). This is the flat-file analog of the reference keeping
  * geometries pre-organized under an R-tree so queries never re-sort
  * (reference: server-plugin/src/main/java/org/neo4j/gis/spatial/rtree/
  * RTreeIndex.java — pay at insert, win at query); here the "index" is the
  * hash-bucketed, key-sorted file layout that Catalyst's
  * `FileSourceScanExec` reports as `Bucketed: true` and exploits by
  * dropping both shuffle AND sort from the join plan.
  *
  * Sizing rule at scale: buckets ≈ total-size / target-partition-size
  * (128–512 MB); both sides MUST use the same bucket count and key for the
  * co-located read (Spark joins bucketed tables shuffle-free only when the
  * counts match).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external table (path-backed
    * so the session's in-memory catalog owns only metadata; data lives at
    * `path`). Overwrites both the table entry and the files.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // repartition on the bucket key with numPartitions == buckets: Spark's
    // bucket id uses the same Murmur3 hash as HashPartitioning, so every
    // task holds exactly one bucket and writes exactly ONE file per bucket.
    // One file per bucket is what lets the scan report a per-bucket sort
    // order, which in turn lets the join elide its Sorts (with multiple
    // files per bucket only the shuffle is elided, not the sort).
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .option("path", path).mode("overwrite").format("parquet")
      .saveAsTable(table)
  }

  /** The demonstration query: `lineitem ⋈ orders` on the order key over
    * bucketed layouts, aggregated per order priority. Item counts and
    * quantity sums only (quantities are integral, so the double sums are
    * order-independent and oracle-exact).
    *
    * The physical plan this produces — asserted by BucketingSpec — is
    * scan(Bucketed) → SortMergeJoin ← scan(Bucketed) with no Exchange on
    * either join input (and no Sort either, once the single-file-per-bucket
    * ordering contract is asserted via
    * `spark.sql.legacy.bucketedTableScan.outputOrdering`); the only
    * exchange in the whole query is the final tiny per-priority aggregate.
    * At 100 TB that is the difference between re-shuffling two fact tables
    * per run and reading them in place.
    */
  def colocatedPriorityVolume(spark: SparkSession, dir: String,
      buckets: Int = 8): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_bucketed")
    base.toFile.deleteOnExit()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    writeBucketed(li, "graft_li_b", s"$base/lineitem_b", buckets, "l_orderkey")
    writeBucketed(ord, "graft_ord_b", s"$base/orders_b", buckets, "o_orderkey")
    // deleteOnExit is non-recursive: register children after the parent so
    // the LIFO deletion order removes files before their directories
    def reg(f: java.io.File): Unit = { f.deleteOnExit(); Option(f.listFiles).foreach(_.foreach(reg)) }
    Option(base.toFile.listFiles).foreach(_.foreach(reg))
    spark.table("graft_li_b")
      .join(spark.table("graft_ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  def colocatedPriorityVolumeDuckSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      |       sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}
