package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, Geometry}

import graft.geom.{GeomCodec, Orthodromic}

/** Property-based invariants for the geometry kernel — the layer everything
  * else trusts. Complements the fixture/oracle tests with randomized
  * coverage of the codec (WKB/WKT round trips must be lossless for any
  * geometry the engine can store) and the orthodromic metric (must be a
  * metric: symmetric, zero on the diagonal, bounded by half the great
  * circle — the reference's formula contract,
  * OrthodromicDistance.java:85-92). Deterministic: scalacheck generators
  * are driven by numbered seeds, so a failure names the seed that
  * reproduces it.
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      val a = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      try check(a)
      catch { case e: Throwable =>
        throw new AssertionError(s"property failed at seed $i for value: $a", e)
      }
    }

  private val lon = Gen.chooseNum(-180.0, 180.0)
  private val lat = Gen.chooseNum(-90.0, 90.0)

  private val genPoint: Gen[Geometry] =
    for (x <- lon; y <- lat) yield GeomCodec.point(x, y)

  private val genPointZ: Gen[Geometry] =
    for (x <- lon; y <- lat; z <- Gen.chooseNum(-1e4, 1e4))
      yield GeomCodec.point(x, y, z)

  private val genLine: Gen[Geometry] =
    for {
      n <- Gen.chooseNum(2, 12)
      xs <- Gen.listOfN(n, lon); ys <- Gen.listOfN(n, lat)
    } yield GeomCodec.factory.createLineString(
      xs.zip(ys).map { case (x, y) => new Coordinate(x, y) }.toArray)

  // convex-ring polygon around a center: always valid, optionally with a
  // shrunken copy as a hole
  private val genPolygon: Gen[Geometry] =
    for {
      cx <- Gen.chooseNum(-170.0, 170.0); cy <- Gen.chooseNum(-80.0, 80.0)
      r <- Gen.chooseNum(0.1, 8.0)
      n <- Gen.chooseNum(3, 10)
      withHole <- Gen.oneOf(true, false)
    } yield {
      def ring(rad: Double) = {
        val pts = (0 until n).map { i =>
          val a = 2 * math.Pi * i / n
          new Coordinate(cx + rad * math.cos(a), cy + rad * math.sin(a))
        } :+ {
          val a = 0.0
          new Coordinate(cx + rad * math.cos(a), cy + rad * math.sin(a))
        }
        GeomCodec.factory.createLinearRing(pts.toArray)
      }
      if (withHole) GeomCodec.factory.createPolygon(ring(r), Array(ring(r / 3)))
      else GeomCodec.factory.createPolygon(ring(r))
    }

  private val genMulti: Gen[Geometry] =
    for (gs <- Gen.nonEmptyListOf(Gen.oneOf(genPoint, genLine)))
      yield GeomCodec.factory.buildGeometry(java.util.Arrays.asList(gs.take(5): _*))

  private val genGeometry: Gen[Geometry] =
    Gen.oneOf(genPoint, genPointZ, genLine, genPolygon, genMulti)

  test("WKB round trip is lossless for any storable geometry (incl. z)") {
    forAll(genGeometry) { g =>
      val back = GeomCodec.fromWkb(GeomCodec.toWkb(g))
      assert(back.equalsExact(g),
        s"WKB round trip changed ${GeomCodec.toWkt(g)} -> ${GeomCodec.toWkt(back)}")
      assert(GeomCodec.hasZ(back) == GeomCodec.hasZ(g))
      assert(GeomCodec.gtypeOf(back) == GeomCodec.gtypeOf(g))
    }
  }

  test("WKT round trip preserves structure and coordinates to writer precision") {
    forAll(genGeometry) { g =>
      val back = GeomCodec.fromWkt(GeomCodec.toWkt(g))
      // WKB is the lossless storage codec; WKT is display-grade — the JTS
      // writer can drop the final ulp, so the contract is ~1e-12 degrees
      assert(back.equalsExact(g, 1e-9))
      assert(GeomCodec.gtypeOf(back) == GeomCodec.gtypeOf(g))
      assert(back.getNumGeometries == g.getNumGeometries)
    }
  }

  test("bboxOf equals the JTS envelope") {
    forAll(genGeometry) { g =>
      val (minx, miny, maxx, maxy) = GeomCodec.bboxOf(g)
      val e = g.getEnvelopeInternal
      assert(minx == e.getMinX && miny == e.getMinY &&
        maxx == e.getMaxX && maxy == e.getMaxY)
    }
  }

  test("orthodromic distance is a metric on the sphere") {
    val genPair = for (x1 <- lon; y1 <- lat; x2 <- lon; y2 <- lat) yield (x1, y1, x2, y2)
    forAll(genPair) { case (x1, y1, x2, y2) =>
      val d12 = Orthodromic.distanceKm(x1, y1, x2, y2)
      val d21 = Orthodromic.distanceKm(x2, y2, x1, y1)
      assert(math.abs(d12 - d21) < 1e-9, s"asymmetric: $d12 vs $d21")
      assert(d12 >= 0.0)
      // half the great circle, with slack for the acos clamp at antipodes
      assert(d12 <= math.Pi * 6371.0 + 1e-6)
      // self-distance: sin²+cos² can land an ulp under 1, and acos is
      // ill-conditioned at 1 — the same ~10 cm quirk the reference's
      // formula has (OrthodromicDistance.java:85-92); pin the bound
      assert(Orthodromic.distanceKm(x1, y1, x1, y1) <= 1e-3,
        s"self-distance at ($x1,$y1)")
    }
  }

  test("search window always contains the radius it was derived from") {
    val genCase = for (x <- lon; y <- Gen.chooseNum(-85.0, 85.0);
      km <- Gen.chooseNum(0.1, 2000.0)) yield (x, y, km)
    forAll(genCase) { case (x, y, km) =>
      val w = Orthodromic.searchWindow(x, y, km)
      // a point at the window's lat edge, same lon, is at least km away
      assert(Orthodromic.distanceKm(x, y, x, math.min(90, w.getMaxY)) >= km - 1e-6 ||
        w.getMaxY >= 90.0)
      assert(w.contains(x, y))
    }
  }

  test("minDistanceOutsideWindowKm lower-bounds every point outside the window") {
    // the k-NN exactness proof rides on this bound (GeoFrame.knnCandidates):
    // any stored point OUTSIDE the degree window must be at least `bound`
    // km away from the window center — including across the antimeridian
    val genCase = for {
      cx <- lon; cy <- Gen.chooseNum(-85.0, 85.0)
      half <- Gen.chooseNum(0.05, 40.0)
      px <- lon; py <- lat
    } yield (cx, cy, half, px, py)
    forAll(genCase, n = 2000) { case (cx, cy, half, px, py) =>
      val dLon = { val r = math.abs(px - cx) % 360; math.min(r, 360 - r) }
      val inside = dLon <= half && math.abs(py - cy) <= half
      if (!inside) {
        val bound = Orthodromic.minDistanceOutsideWindowKm(cx, cy, half)
        val d = Orthodromic.distanceKm(cx, cy, px, py)
        assert(d >= bound - 1e-6,
          s"point ($px,$py) outside window(($cx,$cy), half=$half) at $d km < bound $bound km")
      }
    }
  }
}
