package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned layer store with a manifest commit — snapshot isolation for
  * layer rebuilds on ANY filesystem, including object stores without atomic
  * directory rename (the documented limitation of the backup-rename swap in
  * [[SpatialLayout.upsertClusteredBuckets]]; the reference inherits this
  * durability from Neo4j's transaction log, reference:
  * server-plugin/.../rtree/RTreeIndex.java keeps the tree inside the store).
  *
  * Layout: `path/v=N/` holds each immutable version's parquet (Spark's
  * `_SUCCESS` marks a completed write); `path/_MANIFEST` is a one-line text
  * file naming the current version, replaced via tmp-write + rename.
  *
  * Commit protocol and its crash windows:
  *  1. write `v=N` (never touches older versions — concurrent readers of
  *     any committed version are undisturbed; a crash here leaves the
  *     manifest on N−1 and an ignorable partial dir);
  *  2. swap the manifest (tmp + delete + rename — a crash between delete
  *     and rename leaves NO manifest, and readers fall back to the highest
  *     version dir containing `_SUCCESS`, which is the fully-written N).
  * Either way a reader always resolves to a complete version.
  *
  * Old versions stay readable by number (time travel) until [[vacuum]].
  */
object VersionedLayer {

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(path: String) = new Path(path, "_MANIFEST")

  /** All committed versions (dirs with `_SUCCESS`), ascending. */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val fs = fsOf(spark, path)
    val base = new Path(path)
    if (!fs.exists(base)) return Seq.empty
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toInt)
      .sorted
  }

  /** The manifest's version if present, else the highest completed dir. */
  def currentVersion(spark: SparkSession, path: String): Option[Int] = {
    val fs = fsOf(spark, path)
    val mf = manifestPath(path)
    if (fs.exists(mf)) {
      val in = fs.open(mf)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    } else versions(spark, path).lastOption
  }

  /** Commit `df` as the next version; returns the new version number. */
  def commit(df: DataFrame, path: String): Int = {
    val spark = df.sparkSession
    val fs = fsOf(spark, path)
    val next = currentVersion(spark, path).getOrElse(0) + 1
    df.write.mode("overwrite").parquet(s"$path/v=$next")
    val tmp = new Path(path, s"_MANIFEST.tmp$next")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(manifestPath(path), false)
    fs.rename(tmp, manifestPath(path))
    next
  }

  /** Read the current version, or a pinned one (time travel). */
  def read(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, path)).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    spark.read.parquet(s"$path/v=$v")
  }

  /** Drop all but the newest `keep` versions (never the current one). */
  def vacuum(spark: SparkSession, path: String, keep: Int): Seq[Int] = {
    val fs = fsOf(spark, path)
    val cur = currentVersion(spark, path)
    val drop = versions(spark, path).dropRight(math.max(keep, 1))
      .filterNot(cur.contains)
    drop.foreach(v => fs.delete(new Path(path, s"v=$v"), true))
    drop
  }
}
