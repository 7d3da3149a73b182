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

  /** Stream points INTO a curve-bucketed clustered layer (SpatialLayout.
    * writeClusteredBuckets layout): each microbatch runs the incremental
    * upsert, so only the bucket directories the batch's keys touch are
    * merged and rewritten — streaming INDEX MAINTENANCE, the live analog
    * of the reference's add-node-then-incremental-R-tree-insert path
    * (reference: RTreeIndex.java:242-268; layer stays query-optimal
    * between batches without a rebuild). A microbatch larger than the
    * rebuild fraction of the layer still triggers the full re-cluster,
    * exactly as in batch.
    *
    * foreachBatch (not a file sink) because the write is a MERGE into an
    * existing layout; exactly-once comes from the checkpointed batch id —
    * a replayed batch re-merges the same rows, and `dedupeIds` (on by
    * default) makes the merge idempotent by dropping batch rows whose id
    * already exists in the touched buckets.
    */
  def upsertToClusteredLayer(canonical: DataFrame, layerDataDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow(),
      dedupeIds: Boolean = true): StreamingQuery =
    canonical
      .select("id", "geometry", "gtype", "bbox", "x", "y")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        if (!new java.io.File(layerDataDir).exists()) {
          graft.plans.SpatialLayout.writeClusteredBuckets(batch, layerDataDir)
        } else {
          val rows = if (dedupeIds) {
            // scope the existence check to the bucket directories this
            // batch touches — the only place its ids could already live;
            // the rest of the layer is never read
            val buckets = graft.plans.SpatialLayout.withCurveKeys(batch, "hilbert")
              .select("__bucket").distinct().collect().map(_.getInt(0)).toSeq
            val existingIds = spark.read.parquet(layerDataDir)
              .filter(col("__bucket").isin(buckets: _*))
              .select(col("id")).distinct()
            batch.join(existingIds, Seq("id"), "left_anti")
          } else batch
          if (!rows.isEmpty)
            graft.plans.SpatialLayout.upsertClusteredBuckets(rows, layerDataDir)
        }
        ()
      }
      .start()

  /** Stream-static SPATIAL enrichment: tag each streamed point with the
    * region polygon containing it, then a watermarked windowed rollup per
    * region — the live market-share / geofence-alert shape. The region
    * table is small and static (thousands of polygons at most), so the
    * join BROADCASTS it and stays STATELESS: an envelope prefilter (pure
    * column arithmetic) guards the exact JTS containment per pair, state
    * is bounded by the watermark exactly as in a plain windowed aggregate,
    * and a region-table refresh needs no restart (re-resolved every
    * microbatch). Points in no region drop (inner semantics — geofencing;
    * use a sentinel region for "elsewhere" if needed).
    *
    * `regions` needs (region_id, geometry, bbox); the stream is the
    * canonical point schema plus an event-time column `tsCol`.
    */
  def enrichWithRegions(canonical: DataFrame, regions: DataFrame,
      tsCol: String, windowDuration: String,
      watermark: String = "10 minutes"): DataFrame = {
    val tagged = canonical.join(
      broadcast(regions.select(col("region_id"),
        col("geometry").as("__rgeom"), col("bbox").as("__rbox"))),
      col("__rbox")("minx") <= col("x") && col("x") <= col("__rbox")("maxx") &&
        col("__rbox")("miny") <= col("y") && col("y") <= col("__rbox")("maxy") &&
        st.contains(col("__rgeom"), col("geometry")))
    tagged
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col("region_id"))
      .agg(count(lit(1)).as("n"),
        avg(col("x")).as("cx"), avg(col("y")).as("cy"))
  }

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
