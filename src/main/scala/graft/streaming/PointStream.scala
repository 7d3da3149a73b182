package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.st
import graft.geom.GeomCodec

/** Structured-Streaming point-layer ingest (SURVEY §2.10). The reference has
  * no streaming operators — its closest analog is the OSM importer's batched
  * serial commits (reference: OsmSpatialProcedures.java:84-131). Here the
  * point-layer ingest path is exposed as a streaming sink with the identical
  * canonical schema, plus event-time watermarking for late points and
  * windowed density aggregation as a streaming analog of the batch verbs.
  */
object PointStream {

  /** Canonicalize a stream of (id, x, y [, ts]) into layer schema — the same
    * columns the batch createPointLayer writes, so downstream batch queries
    * run unchanged on streamed layers.
    */
  def canonicalize(stream: DataFrame, idCol: String, xCol: String, yCol: String): DataFrame =
    stream
      .withColumn("id", col(idCol).cast("string"))
      .withColumn("x", col(xCol).cast("double"))
      .withColumn("y", col(yCol).cast("double"))
      .withColumn("geometry", st.makePoint(col("x"), col("y")))
      .withColumn("gtype", lit(GeomCodec.GTYPE_POINT))
      .withColumn("bbox", st.bboxStruct(col("x"), col("y"), col("x"), col("y")))

  /** Append the canonical stream into a layer directory (parquet files the
    * batch catalog can read). Checkpointed, exactly-once per microbatch.
    */
  def writeToLayer(canonical: DataFrame, layerDataDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    canonical
      .select("id", "geometry", "gtype", "bbox", "x", "y")
      .writeStream
      .format("parquet")
      .option("path", layerDataDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")
      .start()

  /** Windowed spatial density over an event-time stream: counts + centroid
    * per (time window, grid cell), with a watermark dropping late points —
    * the streaming analog of the batch density/centroid aggregates.
    */
  def windowedCellStats(canonical: DataFrame, tsCol: String,
      windowDuration: String, cellSize: Double,
      watermark: String = "10 minutes"): DataFrame =
    canonical
      .withWatermark(tsCol, watermark)
      .groupBy(
        window(col(tsCol), windowDuration),
        floor(col("x") / cellSize).as("cell_x"),
        floor(col("y") / cellSize).as("cell_y"))
      .agg(count(lit(1)).as("n"),
        avg(col("x")).as("centroid_x"),
        avg(col("y")).as("centroid_y"),
        min(col("x")).as("minx"), min(col("y")).as("miny"),
        max(col("x")).as("maxx"), max(col("y")).as("maxy"))
}
