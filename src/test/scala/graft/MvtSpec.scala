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
}
