package graft.sources

import scala.collection.mutable.ArrayBuffer

import graft.osm.OsmPbf.{Pb, PbIn, zigzag, unzigzag}

/** Mapbox Vector Tile (MVT) encode/decode — the slippy-map serving format
  * (public spec: github.com/mapbox/vector-tile-spec, v2.1), built on the
  * same hand-rolled protobuf wire codec as the OSM PBF path. The reference
  * serves layers to map clients through GeoJSON/GML (GeoServerPlugin); MVT
  * is the binary tile analog a 100 TB layer actually ships — the bake is a
  * groupBy(tile) + per-tile encode, embarrassingly parallel.
  *
  * Full geometry-command coverage: POINT (multi-MoveTo), LINESTRING
  * (MoveTo + LineTo runs per part) and POLYGON (MoveTo + LineTo +
  * ClosePath per ring), with the zigzag delta cursor persisting across
  * commands and parts within a feature, exactly per spec §4.3.
  *
  * Tile addressing is the caller's: sp_mvt_bake keeps the equirectangular
  * (WMTS EPSG:4326-style) pyramid — tx = floor((lon+180)/360·2^z),
  * ty = floor((90−lat)/180·2^z) — whose half-degree-lattice quantized
  * values are small-denominator rationals, so Spark and the DuckDB oracle
  * compute IDENTICAL integers; sp_mvt_lines bakes the true slippy
  * Web-Mercator pyramid (ty from st.mercatorY, clipped at ±85.05113°).
  */
object Mvt {

  val Extent = 4096

  /** Web-Mercator latitude bound of the square slippy pyramid:
    * atan(sinh(π)) — tiles above/below are clipped, as every slippy map
    * does. */
  val MercatorMaxLat = 85.05112877980659

  case class PointFeature(id: Long, px: Int, py: Int, attrs: Seq[(String, Long)])

  /** A generic MVT feature: `geomType` 1=POINT, 2=LINESTRING, 3=POLYGON;
    * `parts` are vertex runs in tile-local integer coords — points (all
    * parts flattened into one MoveTo), line parts (≥2 vertices each), or
    * polygon rings (≥3 vertices, WITHOUT the closing duplicate — ClosePath
    * supplies it).
    */
  case class Feature(id: Long, geomType: Int, parts: Seq[Seq[(Int, Int)]],
      attrs: Seq[(String, Long)])

  private def toFeature(f: PointFeature): Feature =
    Feature(f.id, 1, Seq(Seq((f.px, f.py))), f.attrs)

  /** Point-layer facade kept verbatim for the original bake surface. */
  def encodeTile(layerName: String, features: Seq[PointFeature]): Array[Byte] =
    encodeTileF(layerName, features.map(toFeature))

  /** Encode one tile layer of arbitrary-geometry features. Features are
    * sorted by id so tile bytes are a pure function of the feature set;
    * keys/values intern in first-seen order of that sorted stream.
    */
  def encodeTileF(layerName: String, features: Seq[Feature]): Array[Byte] = {
    // LinkedHashMap interning: O(1) per lookup (indexOf would make a
    // high-cardinality tile quadratic), insertion order = emission order
    val keys = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val values = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    def keyIdx(k: String): Long = keys.getOrElseUpdate(k, keys.size.toLong)
    def valIdx(v: Long): Long = values.getOrElseUpdate(v, values.size.toLong)
    val layer = new Pb
    layer.int(15, 2L)                       // version (required, = 2)
    layer.string(1, layerName)
    val featBytes = features.sortBy(_.id).map { f =>
      val feat = new Pb
      feat.int(1, f.id)
      if (f.attrs.nonEmpty)
        feat.packed(2, f.attrs.flatMap(a => Seq(keyIdx(a._1), valIdx(a._2))))
      feat.int(3, f.geomType.toLong)
      feat.packed(4, geometryCommands(f))
      feat
    }
    featBytes.foreach(layer.msg(2, _))
    keys.keysIterator.foreach(layer.string(3, _))
    values.keysIterator.foreach { v =>
      val value = new Pb
      value.sint(6, v)                      // Value.sint_value
      layer.msg(4, value)
    }
    layer.int(5, Extent.toLong)
    val tile = new Pb
    tile.msg(3, layer)
    tile.toBytes
  }

  /** Spec §4.3 command stream: command integer (id & 7) | (count << 3) with
    * MoveTo=1, LineTo=2, ClosePath=7; coordinates are zigzag deltas from a
    * cursor that starts at (0,0) and persists across commands and parts.
    */
  private def geometryCommands(f: Feature): Seq[Long] = {
    val cmds = ArrayBuffer.empty[Long]
    var cx = 0; var cy = 0
    def emit(p: (Int, Int)): Unit = {
      cmds += zigzag((p._1 - cx).toLong); cmds += zigzag((p._2 - cy).toLong)
      cx = p._1; cy = p._2
    }
    f.geomType match {
      case 1 =>
        val pts = f.parts.flatten
        require(pts.nonEmpty, s"feature ${f.id}: empty point geometry")
        cmds += (1L | (pts.size.toLong << 3))
        pts.foreach(emit)
      case 2 =>
        f.parts.foreach { part =>
          require(part.size >= 2,
            s"feature ${f.id}: line part needs >=2 vertices, got ${part.size}")
          cmds += (1L | (1L << 3))
          emit(part.head)
          cmds += (2L | ((part.size - 1).toLong << 3))
          part.tail.foreach(emit)
        }
      case 3 =>
        f.parts.foreach { ring =>
          require(ring.size >= 3,
            s"feature ${f.id}: polygon ring needs >=3 vertices, got ${ring.size}")
          cmds += (1L | (1L << 3))
          emit(ring.head)
          cmds += (2L | ((ring.size - 1).toLong << 3))
          ring.tail.foreach(emit)
          cmds += (7L | (1L << 3))          // ClosePath ×1
        }
      case t => throw new IllegalArgumentException(s"unknown GeomType $t")
    }
    cmds.toSeq
  }

  /** Inverse of [[geometryCommands]]: replay the cursor over the command
    * stream; MoveTo opens a new part for lines/polygons, ClosePath seals a
    * ring (without re-appending its first vertex).
    */
  private def parseGeometry(geomType: Int, g: Array[Long]): Seq[Seq[(Int, Int)]] = {
    val parts = ArrayBuffer.empty[Seq[(Int, Int)]]
    var cur = ArrayBuffer.empty[(Int, Int)]
    var i = 0; var cx = 0; var cy = 0
    while (i < g.length) {
      val cmd = (g(i) & 7L).toInt
      val cnt = (g(i) >>> 3).toInt
      i += 1
      cmd match {
        case 1 =>
          if (geomType != 1 && cur.nonEmpty) { parts += cur.toSeq; cur = ArrayBuffer.empty }
          var j = 0
          while (j < cnt) {
            cx += unzigzag(g(i)).toInt; cy += unzigzag(g(i + 1)).toInt
            cur += ((cx, cy)); i += 2; j += 1
          }
        case 2 =>
          require(geomType != 1,
            "POINT geometry must contain only MoveTo commands")
          var j = 0
          while (j < cnt) {
            cx += unzigzag(g(i)).toInt; cy += unzigzag(g(i + 1)).toInt
            cur += ((cx, cy)); i += 2; j += 1
          }
        case 7 =>
          require(geomType == 3, "ClosePath is only valid in POLYGON geometry")
          parts += cur.toSeq; cur = ArrayBuffer.empty
        case c => throw new IllegalArgumentException(s"unknown command id $c")
      }
    }
    if (cur.nonEmpty) parts += cur.toSeq
    parts.toSeq
  }

  /** Decode a tile to (layerName, generic features) — every geometry type
    * the encoder emits plus string/int/sint property values.
    */
  def decodeTileF(bytes: Array[Byte]): Seq[(String, Seq[Feature])] = {
    val out = ArrayBuffer.empty[(String, Seq[Feature])]
    val t = new PbIn(bytes)
    while (t.hasNext) t.key() match {
      case (3, 2) =>
        val l = t.slice()
        var name = ""
        val keys = ArrayBuffer.empty[String]
        val values = ArrayBuffer.empty[Long]
        val rawFeatures = ArrayBuffer.empty[Array[Byte]]
        while (l.hasNext) l.key() match {
          case (1, 2) => name = new String(l.sliceBytes(), "UTF-8")
          case (2, 2) => rawFeatures += l.sliceBytes()
          case (3, 2) => keys += new String(l.sliceBytes(), "UTF-8")
          case (4, 2) =>
            val v = l.slice()
            while (v.hasNext) v.key() match {
              case (4, 0) => values += v.varint()
              case (5, 0) => values += v.varint()
              case (6, 0) => values += unzigzag(v.varint())
              case (_, wt) => v.skip(wt)
            }
          case (_, wt) => l.skip(wt)
        }
        val feats = rawFeatures.map { fb =>
          val f = new PbIn(fb)
          var id = 0L
          var geomType = 0
          var tags = Array.emptyLongArray
          var geom = Array.emptyLongArray
          while (f.hasNext) f.key() match {
            case (1, 0) => id = f.varint()
            case (2, 2) => tags = f.packedLongs()
            case (3, 0) => geomType = f.varint().toInt
            case (4, 2) => geom = f.packedLongs()
            case (_, wt) => f.skip(wt)
          }
          val attrs = tags.grouped(2).collect {
            case Array(k, v) => keys(k.toInt) -> values(v.toInt)
          }.toSeq
          Feature(id, geomType, parseGeometry(geomType, geom), attrs)
        }
        out += ((name, feats.toSeq))
      case (_, wt) => t.skip(wt)
    }
    out.toSeq
  }

  /** Point-layer facade over [[decodeTileF]] — the original roundtrip
    * surface (single-vertex point features only).
    */
  def decodeTile(bytes: Array[Byte]): Seq[(String, Seq[PointFeature])] =
    decodeTileF(bytes).map { case (name, fs) =>
      name -> fs.map { f =>
        require(f.geomType == 1 && f.parts.flatten.size == 1,
          s"feature ${f.id}: expected a single-vertex point, got type ${f.geomType}")
        val (px, py) = f.parts.flatten.head
        PointFeature(f.id, px, py, f.attrs)
      }
    }
}
