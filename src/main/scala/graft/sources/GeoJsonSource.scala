package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.functions.st

/** GeoJSON ingest — the third source format beside shapefile and OSM XML.
  *
  * Two layouts, one extraction pipeline:
  *  - **GeoJSONSeq / NDJSON** (one Feature per line — RFC 8142): read as a
  *    plain text source, so splitting, distribution, and parallel parsing
  *    are all Spark's line reader — THE layout to ship at 100 TB.
  *  - **FeatureCollection** (one JSON object wrapping a features array):
  *    whole-file read + one `from_json(..., array<string>)` explode; the
  *    single-document parse is inherently one task, exactly like the OSM
  *    XML staging step (at scale, convert once to GeoJSONSeq and use the
  *    line path).
  *
  * Per feature, `get_json_object` slices the raw geometry / properties
  * subtrees (no schema inference — GeoJSON geometry nesting is ragged by
  * design, a struct schema can't hold Point and MultiPolygon at once), the
  * existing [[graft.geom.GeoOutput.fromGeoJson]] parser builds the JTS
  * geometry, and properties land as the canonical `map<string,string>`
  * props column. Output is the canonical layer schema (id, geometry,
  * gtype, bbox, props) — every downstream verb works unchanged.
  */
object GeoJsonSource {

  private def fromFeatures(features: DataFrame, idProp: String): DataFrame =
    features
      .select(get_json_object(col("feature"), "$.geometry").as("gj"),
        from_json(get_json_object(col("feature"), "$.properties"),
          MapType(StringType, StringType)).as("props"))
      .filter(col("gj").isNotNull)
      .withColumn("geometry", st.geomFromGeoJson(col("gj")))
      .withColumn("id", col("props").getItem(idProp))
      .withColumn("gtype", st.gtype(col("geometry")))
      .withColumn("bbox", st.bboxOf(col("geometry")))
      .select("id", "geometry", "gtype", "bbox", "props")

  /** Line-delimited features (GeoJSONSeq / NDJSON) — the distributed path. */
  def readGeoJsonSeq(spark: SparkSession, path: String,
      idProp: String = "id"): DataFrame =
    fromFeatures(spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value").as("feature")), idProp)

  /** A single FeatureCollection document. */
  def readFeatureCollection(spark: SparkSession, path: String,
      idProp: String = "id"): DataFrame =
    fromFeatures(spark.read.option("wholetext", "true").text(path)
      .select(explode(from_json(get_json_object(col("value"), "$.features"),
        org.apache.spark.sql.types.ArrayType(StringType))).as("feature")), idProp)

  /** Export the canonical layer schema as a GeoJSONSeq file set (inverse of
    * the readers; geometry via the GeoOutput writer, properties inlined).
    * Written distributed — one part file per partition, each line a
    * Feature.
    */
  def exportGeoJsonSeq(layer: DataFrame, path: String): Unit = {
    val geomJson = udf((wkb: Array[Byte]) =>
      if (wkb == null) null
      else graft.geom.GeoOutput.toGeoJson(graft.geom.GeomCodec.fromWkb(wkb)))
    val propsJson = to_json(coalesce(
      if (layer.columns.contains("props")) col("props")
      else map().cast(MapType(StringType, StringType)),
      map().cast(MapType(StringType, StringType))))
    layer
      .select(concat(lit("""{"type": "Feature", "geometry": """),
        geomJson(col("geometry")),
        lit(""", "properties": """), propsJson, lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
