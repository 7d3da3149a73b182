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

    // dd_edit_pairs decomposition (k=4, q=12 — the query's parameters)
    val k = 4; val q = 12; val W = 2 * k; val OFF = 1024
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text").as("t"),
        length(col("text")).as("len")).persist()
    t("docs count")(println(docs.count()))
    val withGrams = docs.filter(col("len") >= q)
      .select(col("id"), col("len"),
        explode(expr(s"transform(sequence(1, length(t) - ${q - 1}), " +
          s"i -> struct(i AS p, substring(t, i, $q) AS g))")).as("x"))
      .select(col("id"), col("len"), col("x.p").as("p"), col("x.g").as("g"))
    t("withGrams explode count")(println(withGrams.count()))
    val probe = withGrams.select(col("id"), col("len"), xxhash64(col("g")).as("g"),
      ((col("p") + OFF) / W).cast("long").as("band"))
    val index = withGrams.select(col("id"), col("len"), xxhash64(col("g")).as("g"),
      explode(array_distinct(array(
        ((col("p") + (OFF - k)) / W).cast("long"),
        ((col("p") + (OFF + k)) / W).cast("long")))).as("band"))
    val gramCand = probe.as("l").join(index.as("r"),
        col("l.g") === col("r.g") && col("l.band") === col("r.band") &&
        col("l.id") =!= col("r.id") &&
        abs(col("l.len") - col("r.len")) <= k)
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"),
        greatest(col("l.len"), col("r.len")).as("ml"))
      .groupBy("id_a", "id_b", "ml").agg(count(lit(1)).as("c"))
      .filter(col("c") >= greatest(lit(1L),
        col("ml") - lit(q - 1) - lit(k * q)))
      .select(col("id_a"), col("id_b"))
    val rawJoin = probe.as("l").join(index.as("r"),
        col("l.g") === col("r.g") && col("l.band") === col("r.band") &&
        col("l.id") =!= col("r.id") &&
        abs(col("l.len") - col("r.len")) <= k)
    t("raw gram join row count")(println(rawJoin.count()))
    t("gramCand join+count+filter")(println(gramCand.count()))
    t("gramCand again")(println(gramCand.count()))

    val shortLen = q * (k + 1)
    val shorts = docs.filter(col("len") < shortLen && col("len") > k)
    t("shorts count")(println(shorts.count()))
    val segIdx = shorts.select(col("id"), col("len"),
        explode(expr(s"transform(sequence(0, $k), j -> " +
          s"substring(t, 1 + j * len DIV ${k + 1}, " +
          s"(j + 1) * len DIV ${k + 1} - j * len DIV ${k + 1}))")).as("seg"))
      .filter(length(col("seg")) >= 1)
      .select(col("id"), col("len"), xxhash64(col("seg")).as("seg"))
    val segProbe = shorts.select(col("id").as("pid"), col("len").as("plen"),
        explode(expr(s"flatten(transform(" +
          s"sequence(greatest(1, (len - $k) DIV ${k + 1}), " +
          s"(len + $k) DIV ${k + 1} + 1), " +
          s"L -> transform(sequence(1, len - L + 1), " +
          s"i -> substring(t, i, L))))")).as("seg"))
      .select(col("pid"), col("plen"), xxhash64(col("seg")).as("seg"))
      .distinct()
    val shortCand = segIdx.as("l").join(segProbe.as("r"),
        col("l.seg") === col("r.seg") && col("l.id") =!= col("r.pid") &&
        abs(col("l.len") - col("r.plen")) <= k)
      .select(least(col("l.id"), col("r.pid")).as("id_a"),
        greatest(col("l.id"), col("r.pid")).as("id_b"))
    t("shortCand")(println(shortCand.count()))

    val tiny = docs.filter(col("len") <= k)
    val tinyCand = tiny.as("l").join(
        docs.filter(col("len") <= 2L * k).as("r"),
        col("l.id") =!= col("r.id") &&
        abs(col("l.len") - col("r.len")) <= k)
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
    t("tinyCand")(println(tinyCand.count()))

    val cand = gramCand.union(shortCand).union(tinyCand).distinct()
    val verified = cand
      .join(docs.select(col("id").as("id_a"), col("t").as("ta")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("t").as("tb")), "id_b")
      .withColumn("dist", levenshtein(col("ta"), col("tb"), k).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= k)
      .select(col("id_a"), col("id_b"), col("dist"))
    t("full verified (end to end)")(println(verified.count()))
    spark.stop()
  }
}
