package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout analog of the reference's spatial indexes (SURVEY §4):
  * instead of an in-graph R-tree / space-filling-curve b-tree, layers are
  * written sorted by a space-filling-curve key — `repartitionByRange` on the
  * key + `sortWithinPartitions` + parquet column min/max stats give the same
  * envelope-pruning effect, distributed (the flattened equivalent of the
  * reference's OMT-style bulk load, RTreeIndex.java:533-605).
  *
  * Curves mirror the reference's point-index presets
  * (reference: server-plugin/.../index/LayerSpaceFillingCurvePointIndex.java:66-124
  * — Hilbert/Z-order at level 12 over the layer envelope;
  * LayerGeohashPointIndex.java:101-107 — bit-interleaved geohash).
  */
object SpatialLayout {

  val DefaultLevel = 16 // bits per dimension; 2^32 cells total

  // ------------------------------------------------------------ curve math

  /** Z-order (Morton): interleave the bits of the two normalized cells. */
  def zOrder(cellX: Long, cellY: Long, level: Int): Long = {
    var z = 0L
    var i = 0
    while (i < level) {
      z |= ((cellX >> i) & 1L) << (2 * i)
      z |= ((cellY >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Hilbert index via the classic xy→d walk (quadrant rotation per level). */
  def hilbert(cellX: Long, cellY: Long, level: Int): Long = {
    var rx = 0L; var ry = 0L; var d = 0L
    var x = cellX; var y = cellY
    var s: Long = 1L << (level - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private val GeohashBase32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash (lon/lat bit interleave, base32), precision chars. */
  def geohash(lon: Double, lat: Double, precision: Int = 9): String = {
    var minLon = -180.0; var maxLon = 180.0
    var minLat = -90.0; var maxLat = 90.0
    val sb = new StringBuilder
    var bit = 0; var ch = 0
    var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (minLon + maxLon) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; minLon = mid } else { ch = ch << 1; maxLon = mid }
      } else {
        val mid = (minLat + maxLat) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; minLat = mid } else { ch = ch << 1; maxLat = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(GeohashBase32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  private def toCell(v: Double, min: Double, max: Double, level: Int): Long = {
    val n = (1L << level) - 1
    val frac = if (max > min) (v - min) / (max - min) else 0.0
    math.min(n, math.max(0L, (frac * n).toLong))
  }

  // --------------------------------------------------------------- columns

  /** Hilbert key column from x/y over a fixed envelope (the layer bbox). */
  def hilbertKey(x: Column, y: Column,
      minx: Double = -180, miny: Double = -90, maxx: Double = 180, maxy: Double = 90,
      level: Int = DefaultLevel): Column =
    udf((xv: Double, yv: Double) =>
      hilbert(toCell(xv, minx, maxx, level), toCell(yv, miny, maxy, level), level))
      .apply(x, y)

  def zOrderKey(x: Column, y: Column,
      minx: Double = -180, miny: Double = -90, maxx: Double = 180, maxy: Double = 90,
      level: Int = DefaultLevel): Column =
    udf((xv: Double, yv: Double) =>
      zOrder(toCell(xv, minx, maxx, level), toCell(yv, miny, maxy, level), level))
      .apply(x, y)

  def geohashKey(lon: Column, lat: Column, precision: Int = 9): Column =
    udf((x: Double, y: Double) => geohash(x, y, precision)).apply(lon, lat)

  /** Key column per index-type preset name (layer catalog `indexType`). */
  def keyFor(indexType: String, x: Column, y: Column): Option[Column] = indexType match {
    case "hilbert" => Some(hilbertKey(x, y))
    case "zorder"  => Some(zOrderKey(x, y))
    case "geohash" => Some(geohashKey(x, y))
    case _         => None
  }

  // ---------------------------------------------------------------- layout

  /** Write a layer clustered by its curve key: range partitioning assigns
    * contiguous curve ranges to files, the within-partition sort tightens
    * parquet row-group min/max stats on bbox/x/y, so window queries prune at
    * the scan. This is the 100 TB path: curve-contiguous files ⟺ R-tree
    * leaves.
    */
  def writeClustered(df: DataFrame, path: String,
      indexType: String = "hilbert", numPartitions: Int = 0): Unit = {
    // point layers key on x/y; general layers key on the bbox center (the
    // same centroid-keyed curve the reference uses for non-point RTree leaves)
    val (kx, ky) =
      if (df.columns.contains("x")) (col("x"), col("y"))
      else ((col("bbox")("minx") + col("bbox")("maxx")) / 2,
            (col("bbox")("miny") + col("bbox")("maxy")) / 2)
    val keyed = keyFor(indexType, kx, ky) match {
      case Some(k) => df.withColumn("__sfc", k)
      case None => df
    }
    val parts = if (numPartitions > 0) numPartitions
      else keyed.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // `__sfc` is KEPT as a stored column: it is the 1-D scan key that
    // GeoFrame.windowViaCurve turns window queries into range predicates on
    // (parquet min/max row-group stats on a sorted column ⟺ the reference's
    // curve-index b-tree range scan, LayerSpaceFillingCurvePointIndex.java:110-124).
    val out = if (keyed.columns.contains("__sfc"))
      keyed.repartitionByRange(parts, col("__sfc")).sortWithinPartitions("__sfc")
    else keyed.repartition(parts)
    out.write.mode("overwrite").parquet(path)
  }

  /** 1-D curve ranges covering a query window — the scan-pruning analog of
    * the reference's `getTilesIntersectingEnvelope` → set of range scans
    * (reference: LayerSpaceFillingCurvePointIndex.java:110-124). Walks the
    * quadtree of curve cells at a coarse level and emits [min,max] index
    * ranges whose cells intersect the window; the exact bbox/geometry filter
    * still applies after (identical post-filter to the reference's
    * FilteredIndexIterator).
    */
  def hilbertRangesForWindow(qMinx: Double, qMiny: Double, qMaxx: Double, qMaxy: Double,
      minx: Double = -180, miny: Double = -90, maxx: Double = 180, maxy: Double = 90,
      level: Int = DefaultLevel, coarse: Int = 8): Seq[(Long, Long)] = {
    val cells = scala.collection.mutable.ArrayBuffer.empty[Long]
    val n = 1L << coarse
    val shift = level - coarse
    val x0 = toCell(qMinx, minx, maxx, coarse)
    val x1 = toCell(qMaxx, minx, maxx, coarse)
    val y0 = toCell(qMiny, miny, maxy, coarse)
    val y1 = toCell(qMaxy, miny, maxy, coarse)
    var cx = x0
    while (cx <= x1 && cx < n) {
      var cy = y0
      while (cy <= y1 && cy < n) {
        cells += hilbert(cx, cy, coarse)
        cy += 1
      }
      cx += 1
    }
    // each coarse cell covers a contiguous fine-level range of size 4^shift
    val size = 1L << (2 * shift)
    val sorted = cells.toSeq.sorted
    // merge adjacent cells into ranges
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { c =>
      val lo = c * size
      val hi = lo + size - 1
      if (ranges.nonEmpty && ranges.last._2 + 1 == lo)
        ranges(ranges.length - 1) = (ranges.last._1, hi)
      else ranges += ((lo, hi))
    }
    ranges.toSeq
  }
}
