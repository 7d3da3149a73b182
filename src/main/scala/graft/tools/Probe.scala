package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc measurement scratchpad for the optimization rounds: timed
  * sub-plan probes that don't belong in the query registry. Body changes
  * per experiment; keep results in OPTIMIZATION notes, not here.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val s = spark
    def edges0() = {
      val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      val or = s.read.parquet(s"$sfDir/orders.parquet")
      val eraw = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      eraw.union(eraw.select(col("dst").as("src"), col("src").as("dst")))
    }
    t("edge derivation count")(println(edges0().count()))
    t("edge derivation count again")(println(edges0().count()))
    val seeds = s.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_custkey") % 500 === 1).select((col("c_custkey") * 2).as("node"))
    t("bfsPerSource maxHop3 count")(
      println(graft.pipeline.Graphs.bfsPerSource(edges0(), seeds, 3).count()))
    t("bfsPerSource again")(
      println(graft.pipeline.Graphs.bfsPerSource(edges0(), seeds, 3).count()))
    spark.stop()
  }
}
