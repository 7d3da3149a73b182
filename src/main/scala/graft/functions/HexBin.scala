package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hexagonal binning: map (x, y) to the axial coordinates (q, r) of the
  * enclosing pointy-top hexagon of circumradius `size` — the standard
  * fractional-axial + cube-rounding construction (Red Blob Games' canonical
  * formulation of the hex-grid algebra).
  *
  * Pure column arithmetic (multiply / divide / floor / CASE), so the whole
  * binning stays inside whole-stage codegen and the subsequent groupBy is an
  * ordinary map-side-combinable integer-key aggregate — the hex sibling of
  * the square-cell density grid (engine/SpatialAggs), trading the square's
  * 2:1 worst-case center-distance anisotropy for equidistant neighbors
  * (why viz and density tooling prefer hex tiles).
  *
  * Every operation is deterministic IEEE double arithmetic in a fixed order
  * (rounding is explicit `floor(v + 0.5)`, never a platform `round`), so a
  * SQL oracle replaying the identical expressions is bit-exact.
  */
object HexBin {

  private def rnd(c: Column): Column = floor(c + 0.5).cast("double")

  /** Axial (q, r) of the hex containing (x, y), as a struct column with
    * long fields `q` and `r`.
    */
  def cell(x: Column, y: Column, size: Double): Column = {
    // fractional axial coords: q = (√3/3·x − y/3)/s, r = (2/3·y)/s
    val s3over3 = math.sqrt(3.0) / 3.0
    val cq = (x * s3over3 - y / 3.0) / size
    val cr = (y * (2.0 / 3.0)) / size
    // cube-round: (cq, −cq−cr, cr) → nearest integer cube point
    val cy = -cq - cr
    val rx = rnd(cq)
    val ry = rnd(cy)
    val rz = rnd(cr)
    val dx = abs(rx - cq)
    val dy = abs(ry - cy)
    val dz = abs(rz - cr)
    // reset the axis with the largest rounding error from the other two;
    // only the first branch changes q, only the third changes r
    val fixQ = dx > dy && dx > dz
    val hq = when(fixQ, -ry - rz).otherwise(rx)
    val hr = when(!fixQ && !(dy > dz), -rx - ry).otherwise(rz)
    struct(hq.cast("long").as("q"), hr.cast("long").as("r"))
  }

  /** DuckDB replay of [[cell]] over x/y expressions: identical formulas,
    * identical operation order, explicit floor(v+0.5) rounding. Emits a
    * projection fragment `..., <q> AS hq, <r> AS hr` usable inside a CTE.
    */
  def cellDuckSql(xe: String, ye: String, size: Double): (String, String) = {
    val sz = s"CAST($size AS DOUBLE)"
    val cq = s"(($xe) * (sqrt(3.0) / 3.0) - ($ye) / 3.0) / $sz"
    val cr = s"(($ye) * (2.0 / 3.0)) / $sz"
    val cy = s"(-($cq) - ($cr))"
    val rx = s"floor(($cq) + 0.5)"
    val ry = s"floor(($cy) + 0.5)"
    val rz = s"floor(($cr) + 0.5)"
    val dx = s"abs(($rx) - ($cq))"
    val dy = s"abs(($ry) - ($cy))"
    val dz = s"abs(($rz) - ($cr))"
    val fixQ = s"(($dx) > ($dy) AND ($dx) > ($dz))"
    val hq = s"CAST(CASE WHEN $fixQ THEN -($ry) - ($rz) ELSE $rx END AS BIGINT)"
    val hr = s"CAST(CASE WHEN NOT $fixQ AND NOT (($dy) > ($dz)) " +
      s"THEN -($rx) - ($ry) ELSE $rz END AS BIGINT)"
    (hq, hr)
  }
}
