package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - Brute-force cosine top-k: one scan + TakeOrdered — the exact baseline.
  *    Dot product/norms are pure higher-order-function column expressions
  *    (`zip_with` + `aggregate`) so they stay in codegen, no UDF.
  *  - SRP (signed-random-projection) LSH buckets: the scale path — a 100 TB
  *    corpus is bucketed once (cheap column op, deterministic seeded planes),
  *    and a query probes only its own bucket(s), turning top-k into a
  *    partition-pruned scan. Recall is tunable via bits/tables.
  *  - Near-dup pairs by cosine ≥ τ: SRP-bucket self-join + exact verify.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns — pure HOF columns,
    * left-to-right accumulation (deterministic).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact brute-force top-k by cosine vs one query vector.
    * orderBy+limit plans as TakeOrderedAndProject: per-partition top-k heaps,
    * only k rows per partition reach the driver — no global sort shuffle.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val qlit = array(query.map(lit): _*)
    df.select(col(idCol).as("id"),
        cosine(asDouble(col(vecCol)), qlit).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  // ------------------------------------------------------------------ SRP

  /** Deterministic random hyperplanes (seed 42), dim × bits. */
  private def planes(dim: Int, bits: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(42)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** SRP signature: `bits`-bit bucket id from hyperplane signs. */
  def srpBucket(vecCol: Column, dim: Int, bits: Int = 16): Column =
    udf((v: Seq[Float]) => {
      if (v == null) 0L
      else {
        val ps = planesCache.getOrElseUpdate((dim, bits), planes(dim, bits))
        var sig = 0L
        var b = 0
        while (b < bits) {
          var dot = 0.0
          val p = ps(b)
          var i = 0
          val n = math.min(v.length, dim)
          while (i < n) { dot += p(i) * v(i); i += 1 }
          if (dot >= 0) sig |= (1L << b)
          b += 1
        }
        sig
      }
    }).apply(vecCol)

  private val planesCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Array[Double]]]

  /** ANN top-k: probe the query's SRP bucket plus all buckets within
    * `probeHamming` bit flips (multi-probe), exact cosine re-rank inside.
    * At scale the table is written partitioned by `bucket`, so the probe is
    * partition pruning, not a scan.
    */
  def srpTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, dim: Int, bits: Int = 12,
      probeHamming: Int = 1): DataFrame = {
    val ps = planesCache.getOrElseUpdate((dim, bits), planes(dim, bits))
    var qsig = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += ps(b)(i) * query(i); i += 1 }
      if (dot >= 0) qsig |= (1L << b)
      b += 1
    }
    val probes = scala.collection.mutable.ArrayBuffer(qsig)
    if (probeHamming >= 1) (0 until bits).foreach(i => probes += (qsig ^ (1L << i)))
    if (probeHamming >= 2)
      for (i <- 0 until bits; j <- (i + 1) until bits) probes += (qsig ^ (1L << i) ^ (1L << j))

    val bucketed = df.withColumn("bucket", srpBucket(col(vecCol), dim, bits))
    val qlit = array(query.map(lit): _*)
    bucketed.filter(col("bucket").isin(probes.toSeq: _*))
      .select(col(idCol).as("id"), cosine(asDouble(col(vecCol)), qlit).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** All pairs with cosine ≥ threshold — SRP-bucket self-join (candidates
    * share a bucket in at least one of `tables` independent hashings) +
    * exact cosine verification.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bits: Int = 8, tables: Int = 4): DataFrame = {
    val withBuckets = (0 until tables).foldLeft(
      df.select(col(idCol).as("id"), col(vecCol).as("vec"))) { (d, t) =>
      // table t uses bit-range offset via distinct plane sets: reuse one
      // plane matrix of bits*tables planes, slice per table
      d.withColumn(s"b$t", srpBucketTable(col("vec"), dim, bits, t))
    }
    val exploded = withBuckets.select(col("id"), col("vec"),
      explode(array((0 until tables).map(t => struct(lit(t).as("t"), col(s"b$t").as("b"))): _*)).as("tb"))
      .select(col("id"), col("vec"), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = exploded.as("l").join(exploded.as("r"),
        col("l.t") === col("r.t") && col("l.b") === col("r.b") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.vec").as("v_a"), col("r.vec").as("v_b"))
      .distinct()
    cand.withColumn("cosine", cosine(asDouble(col("v_a")), asDouble(col("v_b"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  private def srpBucketTable(vecCol: Column, dim: Int, bits: Int, table: Int): Column =
    udf((v: Seq[Float]) => {
      if (v == null) 0L
      else {
        val all = planesCache.getOrElseUpdate((dim, bits * 8), planes(dim, bits * 8))
        var sig = 0L
        var b = 0
        while (b < bits) {
          var dot = 0.0
          val p = all(table * bits + b)
          var i = 0
          val n = math.min(v.length, dim)
          while (i < n) { dot += p(i) * v(i); i += 1 }
          if (dot >= 0) sig |= (1L << b)
          b += 1
        }
        sig
      }
    }).apply(vecCol)
}
