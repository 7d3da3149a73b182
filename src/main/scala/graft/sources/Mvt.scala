package graft.sources

import scala.collection.mutable.ArrayBuffer

import graft.osm.OsmPbf.{Pb, PbIn}

/** Mapbox Vector Tile (MVT) encode/decode — the slippy-map serving format
  * (public spec: github.com/mapbox/vector-tile-spec, v2.1), built on the
  * same hand-rolled protobuf wire codec as the OSM PBF path. The reference
  * serves layers to map clients through GeoJSON/GML (GeoServerPlugin); MVT
  * is the binary tile analog a 100 TB layer actually ships — the bake is a
  * groupBy(tile) + per-tile encode, embarrassingly parallel.
  *
  * Scope: point features with integer-keyed properties (the layer surface
  * the driver query exercises); the geometry command stream (MoveTo +
  * zigzag deltas) is implemented per spec, so line/polygon support is a
  * command-emitter extension, not a format change.
  *
  * Tile addressing here is the equirectangular (WMTS EPSG:4326-style)
  * pyramid: tx = floor((lon+180)/360·2^z), ty = floor((90−lat)/180·2^z),
  * with tile-local coords quantized to the 4096 extent the same way. On
  * the half-degree lattice every quantized value is a small-denominator
  * rational, so Spark and the DuckDB oracle compute IDENTICAL integers —
  * a Web-Mercator pyramid (st.mercatorY) only changes the two floor
  * formulas.
  */
object Mvt {

  val Extent = 4096

  case class PointFeature(id: Long, px: Int, py: Int, attrs: Seq[(String, Long)])

  /** Encode one tile layer. Features are sorted by id so tile bytes are a
    * pure function of the feature set; keys/values intern in first-seen
    * order of that sorted stream.
    */
  def encodeTile(layerName: String, features: Seq[PointFeature]): Array[Byte] = {
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
      feat.int(3, 1L)                       // GeomType POINT
      // MoveTo ×1: command (1 | 1<<3) = 9, then zigzag dx, dy from (0,0)
      feat.packed(4, Seq(9L,
        graft.osm.OsmPbf.zigzag(f.px.toLong), graft.osm.OsmPbf.zigzag(f.py.toLong)))
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

  /** Decode a tile back to (layerName, features). Only the subset the
    * encoder emits plus string/int/uint values — enough for roundtrip
    * verification and typical point layers.
    */
  def decodeTile(bytes: Array[Byte]): Seq[(String, Seq[PointFeature])] = {
    val out = ArrayBuffer.empty[(String, Seq[PointFeature])]
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
              case (6, 0) => values += graft.osm.OsmPbf.unzigzag(v.varint())
              case (_, wt) => v.skip(wt)
            }
          case (_, wt) => l.skip(wt)
        }
        val feats = rawFeatures.map { fb =>
          val f = new PbIn(fb)
          var id = 0L
          var tags = Array.emptyLongArray
          var geom = Array.emptyLongArray
          while (f.hasNext) f.key() match {
            case (1, 0) => id = f.varint()
            case (2, 2) => tags = f.packedLongs()
            case (4, 2) => geom = f.packedLongs()
            case (_, wt) => f.skip(wt)
          }
          require(geom.length >= 3 && geom(0) == 9L,
            s"feature $id: expected a single MoveTo command, got ${geom.toSeq}")
          val px = graft.osm.OsmPbf.unzigzag(geom(1)).toInt
          val py = graft.osm.OsmPbf.unzigzag(geom(2)).toInt
          val attrs = tags.grouped(2).collect {
            case Array(k, v) => keys(k.toInt) -> values(v.toInt)
          }.toSeq
          PointFeature(id, px, py, attrs)
        }
        out += ((name, feats.toSeq))
      case (_, wt) => t.skip(wt)
    }
    out.toSeq
  }
}
