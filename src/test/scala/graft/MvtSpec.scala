package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Mvt

/** Mapbox Vector Tile codec: spec'd command stream, key/value interning,
  * deterministic bytes, roundtrip.
  */
class MvtSpec extends AnyFunSuite {

  test("single point encodes the spec's MoveTo command stream") {
    val bytes = Mvt.encodeTile("t", Seq(Mvt.PointFeature(1L, 5, 7, Nil)))
    val Seq((name, feats)) = Mvt.decodeTile(bytes)
    assert(name == "t")
    assert(feats == Seq(Mvt.PointFeature(1L, 5, 7, Nil)))
    // the raw geometry ints per spec: cmd 9 = (MoveTo=1 | count=1 << 3),
    // then zigzag(5)=10, zigzag(7)=14 — locate the packed field in bytes
    assert(bytes.containsSlice(Array[Byte](9, 10, 14)))
  }

  test("attrs intern into shared key/value tables and survive roundtrip") {
    val feats = Seq(
      Mvt.PointFeature(3L, 0, 0, Seq("nk" -> 7L)),
      Mvt.PointFeature(1L, 4095, 4095, Seq("nk" -> 7L)),   // same k AND v
      Mvt.PointFeature(2L, 100, -5, Seq("nk" -> -9L)))     // negative value + coord
    val bytes = Mvt.encodeTile("customers", feats)
    val Seq((_, got)) = Mvt.decodeTile(bytes)
    // encode sorts by id; decode preserves stream order
    assert(got == feats.sortBy(_.id))
    // value table must hold exactly the two distinct values (sint-encoded)
    val again = Mvt.encodeTile("customers", feats.reverse)
    assert(java.util.Arrays.equals(bytes, again),
      "tile bytes must be a pure function of the feature SET")
  }

  test("decoder rejects non-point command streams") {
    // geometry [cmd LineTo×1] — fabricate by patching the MoveTo cmd 9→10
    val bytes = Mvt.encodeTile("t", Seq(Mvt.PointFeature(1L, 5, 7, Nil)))
    val i = bytes.indexOfSlice(Array[Byte](9, 10, 14))
    val bad = bytes.clone(); bad(i) = 10
    val e = intercept[IllegalArgumentException](Mvt.decodeTile(bad))
    assert(e.getMessage.contains("MoveTo"))
  }

  test("multi-part LINESTRING roundtrips with the cursor persisting across parts") {
    val f = Mvt.Feature(4L, 2,
      Seq(Seq((10, 10), (20, 15), (20, 40)), Seq((5, 5), (0, 0))),
      Seq("hw" -> 2L))
    val bytes = Mvt.encodeTileF("roads", Seq(f))
    val Seq((name, got)) = Mvt.decodeTileF(bytes)
    assert(name == "roads")
    assert(got == Seq(f))
    // spec §4.3.5.2 worked example shape: MoveTo×1 then LineTo×2 for the
    // first part — command ints 9 and (2 | 2<<3) = 18
    val cmds = Array[Byte](9, 20, 20, 18)
    assert(bytes.containsSlice(cmds))
  }

  test("POLYGON ring with a hole roundtrips; ClosePath does not re-emit the first vertex") {
    val exterior = Seq((0, 0), (100, 0), (100, 100), (0, 100))   // CW in screen space
    val hole = Seq((20, 20), (20, 40), (40, 40), (40, 20))       // CCW interior
    val f = Mvt.Feature(9L, 3, Seq(exterior, hole), Nil)
    val Seq((_, got)) = Mvt.decodeTileF(Mvt.encodeTileF("areas", Seq(f)))
    assert(got == Seq(f))
    // ClosePath×1 = (7 | 1<<3) = 15 must appear once per ring
    val bytes = Mvt.encodeTileF("areas", Seq(f))
    assert(bytes.count(_ == 15.toByte) >= 2)
  }

  test("mixed-geometry tile: point + line + polygon features coexist") {
    val feats = Seq(
      Mvt.Feature(1L, 1, Seq(Seq((7, 7), (9, 9))), Seq("k" -> 1L)), // 2-pt MULTIPOINT
      Mvt.Feature(2L, 2, Seq(Seq((0, 0), (4095, 4095))), Nil),
      Mvt.Feature(3L, 3, Seq(Seq((1, 1), (10, 1), (10, 10))), Seq("k" -> 1L)))
    val bytes = Mvt.encodeTileF("mix", feats)
    val Seq((_, got)) = Mvt.decodeTileF(bytes)
    assert(got == feats)
    val again = Mvt.encodeTileF("mix", feats.reverse)
    assert(java.util.Arrays.equals(bytes, again),
      "tile bytes must be a pure function of the feature SET")
  }

  test("degenerate geometries are rejected at encode time") {
    intercept[IllegalArgumentException](Mvt.encodeTileF("t",
      Seq(Mvt.Feature(1L, 2, Seq(Seq((1, 1))), Nil))))        // 1-vertex line
    intercept[IllegalArgumentException](Mvt.encodeTileF("t",
      Seq(Mvt.Feature(1L, 3, Seq(Seq((1, 1), (2, 2))), Nil)))) // 2-vertex ring
    intercept[IllegalArgumentException](Mvt.encodeTileF("t",
      Seq(Mvt.Feature(1L, 4, Seq(Seq((1, 1))), Nil))))         // unknown type
  }
}
