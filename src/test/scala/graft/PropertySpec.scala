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

  /** WGS84 Vincenty inverse (ellipsoidal geodesic, the reference's
    * GeodeticCalculator math) — test-only oracle for the error bound below.
    */
  private def vincentyKm(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val a = 6378137.0; val f = 1.0 / 298.257223563; val b = (1 - f) * a
    val L = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1 - f) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1 - f) * math.tan(math.toRadians(lat2)))
    val (sinU1, cosU1) = (math.sin(u1), math.cos(u1))
    val (sinU2, cosU2) = (math.sin(u2), math.cos(u2))
    var lambda = L; var lambdaP = 2 * math.Pi; var iter = 0
    var cosSqAlpha = 0.0; var sinSigma = 0.0; var cosSigma = 0.0
    var sigma = 0.0; var cos2SigmaM = 0.0
    while (math.abs(lambda - lambdaP) > 1e-12 && iter < 200) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      sinSigma = math.sqrt(
        (cosU2 * sinL) * (cosU2 * sinL) +
        (cosU1 * sinU2 - sinU1 * cosU2 * cosL) * (cosU1 * sinU2 - sinU1 * cosU2 * cosL))
      if (sinSigma == 0) return 0.0
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0) 0 else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val c = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
      lambdaP = lambda
      lambda = L + (1 - c) * f * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      iter += 1
    }
    val uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    val bigA = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        bigB / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    b * bigA * (sigma - deltaSigma) / 1000.0
  }

  test("orthodromic length error vs WGS84 geodesic is bounded on 1000-km high-latitude lines") {
    // The summed spherical law-of-cosines (the reference's own formula,
    // OrthodromicDistance.java:85-97, R=6371) vs a true ellipsoidal
    // geodesic: the dominant error is the sphere-vs-ellipsoid radius
    // difference, worst near the poles where the ellipsoid's radius of
    // curvature (~6400 km) exceeds R. Pinned bound: < 0.6% relative error —
    // documentation of the engine's (and the reference's) tolerance, per
    // segment and summed over long high-latitude polylines.
    val rnd = new scala.util.Random(20260814)
    var maxRel = 0.0
    for (_ <- 1 to 50) {
      val lat0 = 55.0 + rnd.nextDouble() * 20.0          // 55..75°N
      val lon0 = rnd.nextDouble() * 300.0 - 150.0
      val segs = 20
      // ~1000 km east-ish polyline: ~0.9° lon per segment at 60°N plus jitter
      val pts = (0 to segs).map { i =>
        (lon0 + i * (1.0 / math.cos(math.toRadians(lat0))) * 0.45 +
          rnd.nextDouble() * 0.05,
         lat0 + i * 0.05 + rnd.nextDouble() * 0.02)
      }
      var sphere = 0.0; var geo = 0.0
      pts.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
        sphere += Orthodromic.distanceKm(x1, y1, x2, y2)
        geo += vincentyKm(x1, y1, x2, y2)
      }
      assert(geo > 500 && geo < 2000, s"fixture line length $geo km out of range")
      val rel = math.abs(sphere - geo) / geo
      maxRel = math.max(maxRel, rel)
    }
    info(f"max relative error vs Vincenty on 50 high-latitude ~1000-km lines: ${maxRel * 100}%.4f%%")
    assert(maxRel < 0.006, f"spherical length error ${maxRel * 100}%.4f%% exceeds the documented 0.6%% bound")
  }

  test("Andoyer-Lambert geodesic pins published Vincenty values") {
    // Vincenty's own published test line: Flinders Peak → Buninyong,
    // s = 54 972.271 m (Vincenty 1975, Survey Review XXIII/176; also the
    // Geoscience Australia worked example). Andoyer's first-order
    // flattening correction is sub-meter at this range.
    val fb = Orthodromic.geodesicKm(144.42486789, -37.95103342, 143.92649553, -37.65282114)
    assert(math.abs(fb - 54.972271) < 0.001, s"Flinders-Buninyong $fb km")
    // Intercontinental arc, error budget O(f²)·d ≈ tens of meters:
    // Paris → New York City against the local Vincenty oracle
    val pn = Orthodromic.geodesicKm(2.3522, 48.8566, -74.0060, 40.7128)
    val pnV = vincentyKm(2.3522, 48.8566, -74.0060, 40.7128)
    assert(math.abs(pn - pnV) < 0.05, s"Paris-NY andoyer $pn vs vincenty $pnV")
    // coincident points take the s == 0 branch exactly
    assert(Orthodromic.geodesicKm(10.5, 50.5, 10.5, 50.5) == 0.0)
    // symmetric in the endpoints
    assert(Orthodromic.geodesicKm(12, 56, 13, 57) == Orthodromic.geodesicKm(13, 57, 12, 56))
  }

  test("geodesic length closes the sphere-vs-ellipsoid gap to O(f²)") {
    // same fixture family as the spherical bound above, but the Andoyer sum
    // must track Vincenty ~100× tighter than the 0.6% spherical tolerance
    val rnd = new scala.util.Random(20260815)
    var maxRel = 0.0
    for (_ <- 1 to 20) {
      val lat0 = 55.0 + rnd.nextDouble() * 20.0
      val lon0 = rnd.nextDouble() * 300.0 - 150.0
      val pts = (0 to 20).map { i =>
        (lon0 + i * (1.0 / math.cos(math.toRadians(lat0))) * 0.45 + rnd.nextDouble() * 0.05,
         lat0 + i * 0.05 + rnd.nextDouble() * 0.02)
      }
      var andoyer = 0.0; var geo = 0.0
      pts.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
        andoyer += Orthodromic.geodesicKm(x1, y1, x2, y2)
        geo += vincentyKm(x1, y1, x2, y2)
      }
      maxRel = math.max(maxRel, math.abs(andoyer - geo) / geo)
    }
    info(f"max Andoyer-vs-Vincenty relative error: ${maxRel * 100}%.6f%%")
    assert(maxRel < 5e-5, f"Andoyer error ${maxRel * 100}%.6f%% exceeds the O(f²) budget")
  }

  test("Chamberlain-Duquette area and forward azimuth pins") {
    import graft.geom.GeomCodec
    // 1°×1° at the equator ≈ 12 391.4 km² (cross-computed with an
    // independent libm); the same box at 60°N shrinks by ~cos(60.5°)
    val eq = Orthodromic.geodesicAreaKm2(
      GeomCodec.fromWkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    assert(math.abs(eq - 12391.39990207099) < 1e-6, s"equator box $eq")
    val north = Orthodromic.geodesicAreaKm2(
      GeomCodec.fromWkt("POLYGON ((0 60, 1 60, 1 61, 0 61, 0 60))"))
    assert(math.abs(north - 6102.0496017950245) < 1e-6, s"60N box $north")
    // holes subtract; ring orientation is irrelevant (abs per ring)
    val holed = Orthodromic.geodesicAreaKm2(GeomCodec.fromWkt(
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.25 0.25, 0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25))"))
    assert(holed < eq && holed > eq * 0.7)
    // a line has no area
    assert(Orthodromic.geodesicAreaKm2(GeomCodec.fromWkt("LINESTRING (0 0, 1 1)")) == 0.0)
    // cardinal azimuths from the origin
    assert(Orthodromic.bearingDeg(0, 0, 0, 1) == 0.0)
    assert(Orthodromic.bearingDeg(0, 0, 1, 0) == 90.0)
    assert(Orthodromic.bearingDeg(0, 0, 0, -1) == 180.0)
    assert(Orthodromic.bearingDeg(0, 0, -1, 0) == 270.0)
    // great-circle bearing is NOT the rhumb constant: heading to a point
    // east at high latitude starts north of due east
    val b = Orthodromic.bearingDeg(0, 60, 30, 60)
    assert(b > 70 && b < 90, s"high-latitude eastward start bearing $b")
  }
}
