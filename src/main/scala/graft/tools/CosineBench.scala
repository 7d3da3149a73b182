package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** A/B microbenchmark for the cosine hot scalar: the zip_with+aggregate
  * higher-order composition vs the fused [[graft.functions.CosineSimExpr]]
  * codegen loop, on the same deterministic frame — run on an idle host:
  *
  *   sbt "runMain graft.tools.CosineBench [rows] [dim]"
  *
  * Prints min-of-3 wall-clock per variant plus the checksum equality of
  * both scores (they must be bit-identical).
  */
object CosineBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .appName("cosine-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic float vectors from the row id — no data files needed
    val df = spark.range(rows).select(col("id"),
        expr(s"transform(sequence(1, $dim), j -> CAST(pmod(id * j + j, 97) + 1 AS FLOAT))")
          .as("vec"))
      .persist()
    df.count() // materialize outside the timed region

    val q = Array.tabulate(dim)(j => ((j * 13) % 89 + 1).toDouble)
    val qlit = array(q.map(lit): _*)
    val asD = (c: org.apache.spark.sql.Column) => transform(c, _.cast("double"))

    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
      val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
      dot / (na * nb)
    }

    def time(label: String, score: DataFrame => DataFrame): Double = {
      var best = Double.MaxValue
      var sum = 0.0
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        sum = score(df).collect()(0).getDouble(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-10s $best%8.3f s   checksum=$sum%.9f")
      best
    }

    val tH = time("hof", d => d.select(sum(hof(asD(col("vec")), qlit)).as("s")))
    val tE = time("expr", d => d.select(sum(Similarity.cosine(asD(col("vec")), qlit)).as("s")))
    // the expression reads float elements in place — no casted array copy
    val tEf = time("expr-f32", d => d.select(sum(Similarity.cosine(col("vec"), qlit)).as("s")))
    println(f"speedup expr vs hof: ${tH / tE}%.2fx; in-place f32: ${tH / tEf}%.2fx")
    spark.stop()
  }
}
