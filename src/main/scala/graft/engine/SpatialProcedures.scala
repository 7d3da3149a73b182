package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.st
import graft.geom.{GeomCodec, GeoOutput, Orthodromic}

/** Procedure facade: one Scala method per procedure row of SURVEY §2.1, so
  * parity tests read like the reference's Cypher calls
  * (reference: server-plugin/.../procedures/SpatialProcedures.java and
  * functions/SpatialFunctions.java).
  *
  * Methods returning result sets return DataFrames; layer handles are
  * GeoFrames. Geometry inputs are WKT strings or (lon, lat) pairs — the
  * reference's coordinate polymorphism (SpatialApiBase.java:63-140) collapses
  * to these two shapes in a batch engine.
  */
class SpatialProcedures(spark: SparkSession, warehouseDir: String) {
  import spark.implicits._

  val catalog = new SpatialCatalog(spark, warehouseDir)
  graft.functions.SpatialFunctions.register(spark)

  /** Layer-type presets (reference: SpatialLayerTypePresets.java:39-73).
    * Index choice collapses to a storage-layout strategy in Spark.
    */
  val layerTypes: Map[String, (String, String)] = Map(
    "SimplePoint" -> ("point-xy", "bbox"),
    "Geohash" -> ("point-xy", "geohash"),
    "ZOrder" -> ("point-xy", "zorder"),
    "Hilbert" -> ("point-xy", "hilbert"),
    "NativePoint" -> ("point-xy", "bbox"),
    "NativePoints" -> ("point-xy", "bbox"),
    "NativeGeohash" -> ("point-xy", "geohash"),
    "NativeZOrder" -> ("point-xy", "zorder"),
    "NativeHilbert" -> ("point-xy", "hilbert"),
    "WKT" -> ("wkt", "bbox"),
    "WKB" -> ("wkb", "bbox"))

  // ------------------------------------------------------------- metadata

  /** spatial.procedures (reference: SpatialProcedures.java:210) — the
    * REGISTERED surface ([[SpatialProcedures.registry]]), not a reflection
    * dump: the reference lists its @Procedure/@UserFunction registry, and
    * the static table also records which engine entry point serves each
    * name (the migration map a reference user needs).
    */
  def procedures(): DataFrame =
    SpatialProcedures.registry.toDF("name", "kind", "entry_point")
      .orderBy("name")

  /** spatial.layers (reference: :239). */
  def layers(): DataFrame = catalog.listLayers().toDF("name")

  /** spatial.layerTypes (reference: :253). */
  def layerTypesDf(): DataFrame =
    layerTypes.toSeq.sortBy(_._1)
      .map { case (n, (enc, idx)) => (n, enc, idx) }.toDF("name", "encoder", "index")

  /** spatial.layer (reference: :546). */
  def layer(name: String): GeoFrame = catalog.getLayer(name)

  /** spatial.layerMeta equivalent: geometry type, crs, attributes. */
  def layerMeta(name: String): DataFrame = {
    val m = catalog.getLayer(name).meta.get
    Seq((m.name, GeomCodec.gtypeName(m.gtype), m.crs, m.encoder, m.indexType,
      m.attributes.mkString(","))).toDF("name", "geometryType", "crs", "encoder", "index", "attributes")
  }

  /** spatial.getFeatureAttributes (reference: :578): the meta's discovered/
    * declared attribute list (creation records the source's non-core
    * columns; setFeatureAttributes overwrites the whitelist), falling back
    * to non-core df columns for layers predating the attribute meta.
    */
  def getFeatureAttributes(name: String): Seq[String] = {
    val layer = catalog.getLayer(name)
    val metaAttrs = layer.meta.map(_.attributes).getOrElse(Nil)
    if (metaAttrs.nonEmpty) metaAttrs
    else {
      val core = Set("id", "geometry", "gtype", "bbox", "x", "y", "props", "__sfc")
      layer.df.columns.filterNot(core.contains).toSeq
    }
  }

  /** spatial.getFeatureCount (reference: :589). */
  def getFeatureCount(name: String): Long = catalog.getLayer(name).count()

  /** spatial.getLayerBoundingBox (reference: :598). */
  def getLayerBoundingBox(name: String): DataFrame = catalog.getLayer(name).boundingBox()

  // --------------------------------------------------------- layer create

  /** spatial.addPointLayer / addPointLayerXY (reference: :262,303). */
  def addPointLayerXY(name: String, source: DataFrame,
      idCol: String, xCol: String, yCol: String): GeoFrame =
    catalog.createPointLayer(name, source, idCol, xCol, yCol)

  /** spatial.addPointLayer with a WKB point-GEOMETRY column — the third
    * shape of the reference's coordinate polymorphism
    * (reference: SpatialApiBase.java:63-140: lon/lat pair | map | geometry).
    */
  def addPointLayerGeom(name: String, source: DataFrame,
      idCol: String, geomCol: String): GeoFrame = {
    val withXY = source
      .withColumn("__px", st.x(col(geomCol)))
      .withColumn("__py", st.y(col(geomCol)))
      .drop(geomCol) // consumed — not a feature attribute
    catalog.createPointLayer(name, withXY, idCol, "__px", "__py")
  }

  /** spatial.addLayer with a preset type (reference: :509). The preset picks
    * BOTH the encoder and the index/layout (SpatialLayerTypePresets.java:39-73):
    * point-xy presets take `geomCol` as an `"xCol:yCol"` encoder config (the
    * reference's `"longitude:latitude"` shape, SimplePointEncoder.java:36) and
    * build a point layer; WKT/WKB presets parse the geometry column. The
    * preset's indexType reaches the catalog so curve presets write clustered.
    */
  def addLayer(name: String, layerType: String, source: DataFrame,
      idCol: String, geomCol: String): GeoFrame = {
    val (enc, indexType) = layerTypes.getOrElse(layerType,
      throw new IllegalArgumentException(s"unknown layer type $layerType"))
    enc match {
      case "point-xy" =>
        val (xCol, yCol) = geomCol.split(":") match {
          case Array(x, y) => (x, y)
          case _ => throw new IllegalArgumentException(
            s"point layer type $layerType needs geomCol as 'xCol:yCol', got '$geomCol'")
        }
        catalog.createPointLayer(name, source, idCol, xCol, yCol, indexType)
      case _ => catalog.createWktLayer(name, source, idCol, geomCol, indexType)
    }
  }

  /** spatial.addWKTLayer (reference: :537). */
  def addWKTLayer(name: String, source: DataFrame, idCol: String, wktCol: String): GeoFrame =
    catalog.createWktLayer(name, source, idCol, wktCol)

  /** spatial.removeLayer (reference: :625). */
  def removeLayer(name: String): Unit = catalog.dropLayer(name)

  // ------------------------------------------------------------ mutations

  /** spatial.addWKT / addWKTs (reference: :735,767). */
  def addWKTs(name: String, wkts: Seq[String]): Long = {
    val existing = catalog.getLayer(name).count()
    val src = wkts.zipWithIndex
      .map { case (w, i) => ((existing + i).toString, w) }.toDF("id", "wkt")
      .withColumn("geometry", st.geomFromText(col("wkt")))
      .withColumn("gtype", st.gtype(col("geometry")))
      .withColumn("bbox", st.bboxOf(col("geometry")))
      .select("id", "geometry", "gtype", "bbox")
    catalog.appendToLayer(name, src)
    wkts.size.toLong
  }

  /** spatial.updateWKT — replace one geometry by id (reference: :747).
    * Copy-on-write: materialize the replacement row BEFORE the anti-join
    * delete rewrites the layer files, then append it.
    */
  def updateWKT(name: String, id: String, wkt: String): Unit = {
    val replacementRows = catalog.getLayer(name).df.filter(col("id") === id)
      .withColumn("geometry", st.geomFromText(lit(wkt)))
      .withColumn("gtype", st.gtype(col("geometry")))
      .withColumn("bbox", st.bboxOf(col("geometry")))
    val schema = replacementRows.schema
    val cached = replacementRows.collect()
    require(cached.nonEmpty, s"id $id not found in layer $name")
    catalog.removeFromLayer(name, Seq(id))
    catalog.appendToLayer(name,
      spark.createDataFrame(java.util.Arrays.asList(cached: _*), schema))
  }

  /** spatial.removeNodes.byId (reference: :706-718). */
  def removeNodes(name: String, ids: Seq[String]): Long =
    catalog.removeFromLayer(name, ids)

  /** spatial.setFeatureAttributes — declare the attribute whitelist on the
    * layer (reference: :613-623), returned like the reference's node echo.
    */
  def setFeatureAttributes(name: String, attributeNames: Seq[String]): Seq[String] =
    catalog.setLayerAttributes(name, attributeNames).attributes

  // ------------------------------------------------------------- searches

  /** spatial.bbox — WITHIN semantics quirk preserved (reference: :822-836). */
  def bbox(name: String, minx: Double, miny: Double, maxx: Double, maxy: Double): DataFrame =
    catalog.getLayer(name).bboxSearch(minx, miny, maxx, maxy).df

  /** spatial.cql — accepts ECQL verbatim (the reference's stored CQL
    * strings, SearchCQL.java:27-60, run unchanged through
    * [[graft.functions.Ecql]]) and falls back to Spark SQL expressions,
    * the documented superset (reference: :838-848).
    */
  def cql(name: String, expression: String): DataFrame = {
    val layer = catalog.getLayer(name)
    val top = layer.df.columns.toSet
    if (graft.functions.Ecql.parses(expression, top))
      layer.filterEcql(expression).df
    else layer.filterExpr(expression).df
  }

  /** spatial.addLayerConfig — the reference's dynamic-layer registration
    * (DynamicLayer.java:153-181): `query` starting with `{` is the stored
    * JSON graph-step form (DynamicIndexReader.java:46-113), anything else
    * is CQL (with the Spark SQL superset fallback). The config becomes a
    * named filtered view over the base layer, queryable by `viewName`.
    */
  def addLayerConfig(base: String, viewName: String, query: String): DataFrame = {
    val filtered = catalog.getLayer(base).filterDynamic(query).df
    filtered.createOrReplaceTempView(viewName)
    filtered
  }

  /** spatial.withinDistance (reference: :864-880). */
  def withinDistance(name: String, lon: Double, lat: Double, km: Double): DataFrame =
    catalog.getLayer(name).withinDistanceKm(lon, lat, km).df

  /** spatial.intersects (reference: :901-911). */
  def intersects(name: String, wkt: String): DataFrame =
    catalog.getLayer(name).intersects(wkt).df

  /** spatial.closest (reference: :850-862). */
  def closest(name: String, lon: Double, lat: Double, maxDistance: Double): DataFrame =
    catalog.getLayer(name).closestEdges(lon, lat, maxDistance).df

  // ------------------------------------------------------------ functions

  /** fn spatial.asGeometry / decodeGeometry: WKT → WKB bytes. */
  def asGeometry(wkt: String): Array[Byte] = GeomCodec.toWkb(GeomCodec.fromWkt(wkt))

  /** fn spatial.nodeAsWKT / neo4jGeometryToWkt (reference: SpatialFunctions.java:58,104). */
  def asWKT(wkb: Array[Byte]): String = GeomCodec.toWkt(GeomCodec.fromWkb(wkb))

  /** fn spatial.wktToGeoJson (reference: SpatialFunctions.java:93). */
  def wktToGeoJson(wkt: String): String = GeoOutput.toGeoJson(GeomCodec.fromWkt(wkt))

  /** spatial.decodeGeometry distance helper — orthodromic km. */
  def distanceKm(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    Orthodromic.distanceKm(lon1, lat1, lon2, lat2)

  // --------------------------------------------------------------- import

  /** spatial.importShapefileToLayer (reference: :788). */
  def importShapefile(name: String, shpPath: String): GeoFrame = {
    val layer = graft.sources.Shapefile.importShapefile(spark, shpPath)
    catalog.createLayer(name, layer.df, LayerMeta(name, 0, encoder = "wkb"))
  }

  /** spatial.importOSMToLayer (reference: OsmSpatialProcedures.java:57). */
  def importOSM(name: String, osmPath: String): GeoFrame = {
    val ways = graft.osm.OsmImport.importOsm(spark, osmPath)
    catalog.createLayer(name, ways.df, LayerMeta(name, 0, encoder = "wkb"))
  }

  /** GeoJSON ingest into a named layer (no reference procedure — the modern
    * source format beside shapefile/OSM; GeoJSONSeq reads distributed,
    * a FeatureCollection document via a whole-file explode).
    */
  def importGeoJson(name: String, path: String, idProp: String = "id",
      featureCollection: Boolean = false): GeoFrame = {
    val layer =
      if (featureCollection)
        graft.sources.GeoJsonSource.readFeatureCollection(spark, path, idProp)
      else graft.sources.GeoJsonSource.readGeoJsonSeq(spark, path, idProp)
    catalog.createLayer(name, layer, LayerMeta(name, 0, encoder = "wkb"))
  }

  // --------------------------------------------------------------- export

  /** OSM tag-filtered layer → shapefile, the cli-tools export helper
    * (reference: cli-tools/.../OSMLayerToShapefileExporter.java:31-78):
    * import, keep ways carrying `tagKey[=tagValue]`, write `outBase.shp/.dbf`.
    * Returns the exported feature count.
    */
  def exportOsmToShapefile(osmPath: String, tagKey: String, tagValue: String,
      outBase: String): Long = {
    val ways = graft.osm.OsmImport.importOsm(spark, osmPath).df
    val filtered = graft.osm.OsmImport.tagFilteredLayer(ways, tagKey, tagValue)
    graft.sources.Shapefile.exportShapefile(filtered, outBase)
    filtered.count()
  }

  /** fn spatial.asMap — see [[SpatialProcedures.asMap]]. */
  def asMap(wkb: Array[Byte]): Map[String, Any] = SpatialProcedures.asMap(wkb)
}

/** The procedure/function registry: the reference's registered surface
  * (server-plugin @Procedure annotations, SpatialProcedures.java, plus
  * osm-server-plugin's importOSM pair and the @UserFunction set,
  * SpatialFunctions.java:46-104), each mapped to the engine entry point
  * that serves it. `spatial.upgrade` and `spatial.asExternalGeometry` are
  * N/A by design (no Neo4j store to upgrade / no Neo4j geometry type) —
  * listed with entry point "n/a" so the surface map is complete.
  */
object SpatialProcedures {

  /** fn spatial.asMap — geometry as a {type, coordinate(s)} map, the
    * reference's map-shaped function output (reference:
    * SpatialFunctions.java:69-91, GeometryResult map rendering).
    */
  def asMap(wkb: Array[Byte]): Map[String, Any] = {
    val g = graft.geom.GeomCodec.fromWkb(wkb)
    def coords(geom: org.locationtech.jts.geom.Geometry): Any = geom match {
      case p: org.locationtech.jts.geom.Point => Seq(p.getX, p.getY)
      case _ => geom.getCoordinates.toSeq.map(c => Seq(c.x, c.y))
    }
    Map("type" -> g.getGeometryType, "coordinates" -> coords(g))
  }

  val registry: Seq[(String, String, String)] = Seq(
    ("spatial.procedures", "procedure", "SpatialProcedures.procedures"),
    ("spatial.layers", "procedure", "SpatialProcedures.layers"),
    ("spatial.layerTypes", "procedure", "SpatialProcedures.layerTypesDf"),
    ("spatial.layer", "procedure", "SpatialProcedures.layer"),
    ("spatial.layerMeta", "procedure", "SpatialProcedures.layerMeta"),
    ("spatial.addLayer", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addLayerWithEncoder", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addWKTLayer", "procedure", "SpatialProcedures.addWKTLayer"),
    ("spatial.addPointLayer", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addPointLayerXY", "procedure", "SpatialProcedures.addPointLayerXY"),
    ("spatial.addPointLayerGeohash", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addPointLayerZOrder", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addPointLayerHilbert", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addPointLayerWithConfig", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addNativePointLayer", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addNativePointLayerXY", "procedure", "SpatialProcedures.addPointLayerXY"),
    ("spatial.addNativePointLayerGeohash", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addNativePointLayerZOrder", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addNativePointLayerHilbert", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addNativePointLayerWithConfig", "procedure", "SpatialProcedures.addLayer"),
    ("spatial.addNode", "procedure", "SpatialCatalog.appendToLayer"),
    ("spatial.addNode.byId", "procedure", "SpatialCatalog.appendToLayer"),
    ("spatial.addNodes", "procedure", "SpatialCatalog.appendToLayer"),
    ("spatial.addNodes.byId", "procedure", "SpatialCatalog.appendToLayer"),
    ("spatial.removeNode", "procedure", "SpatialProcedures.removeNodes"),
    ("spatial.removeNode.byId", "procedure", "SpatialProcedures.removeNodes"),
    ("spatial.removeNodes", "procedure", "SpatialProcedures.removeNodes"),
    ("spatial.removeNodes.byId", "procedure", "SpatialProcedures.removeNodes"),
    ("spatial.removeLayer", "procedure", "SpatialProcedures.removeLayer"),
    ("spatial.addWKT", "procedure", "SpatialProcedures.addWKTs"),
    ("spatial.addWKTs", "procedure", "SpatialProcedures.addWKTs"),
    ("spatial.updateWKT", "procedure", "SpatialProcedures.updateWKT"),
    ("spatial.setFeatureAttributes", "procedure", "SpatialProcedures.setFeatureAttributes"),
    ("spatial.getFeatureAttributes", "procedure", "SpatialProcedures.getFeatureAttributes"),
    ("spatial.getFeatureCount", "procedure", "SpatialProcedures.getFeatureCount"),
    ("spatial.getLayerBoundingBox", "procedure", "SpatialProcedures.getLayerBoundingBox"),
    ("spatial.bbox", "procedure", "SpatialProcedures.bbox"),
    ("spatial.closest", "procedure", "SpatialProcedures.closest"),
    ("spatial.withinDistance", "procedure", "SpatialProcedures.withinDistance"),
    ("spatial.intersects", "procedure", "SpatialProcedures.intersects"),
    ("spatial.cql", "procedure", "SpatialProcedures.cql"),
    ("spatial.importShapefile", "procedure", "SpatialProcedures.importShapefile"),
    ("spatial.importShapefileToLayer", "procedure", "SpatialProcedures.importShapefile"),
    ("spatial.importOSM", "procedure", "SpatialProcedures.importOSM"),
    ("spatial.importOSMToLayer", "procedure", "SpatialProcedures.importOSM"),
    ("spatial.upgrade", "procedure", "n/a"),
    ("spatial.decodeGeometry", "function", "GeoOutput.toGeoJson"),
    ("spatial.nodeAsWKT", "function", "SpatialProcedures.asWKT"),
    ("spatial.extractAttributes", "function", "GeoFrame.extractAttributes"),
    ("spatial.asMap", "function", "SpatialProcedures.asMap"),
    ("spatial.asGeometry", "function", "SpatialProcedures.asGeometry"),
    ("spatial.wktToGeoJson", "function", "SpatialProcedures.wktToGeoJson"),
    ("spatial.neo4jGeometryToWkt", "function", "n/a"),
    ("spatial.asExternalGeometry", "function", "n/a"))
}
