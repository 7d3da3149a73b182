package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one local SparkSession per suite (lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sqlc = spark

  /** Await a streaming query, then guarantee it is FULLY terminated before
    * the test returns: a query still winding down when the JVM/session
    * shuts off dies with an INTERNAL_ERROR ("SparkPlan.session() is null")
    * teardown race in the log — an ERROR line that means nothing and
    * trains readers to ignore ERROR lines. stop() is idempotent; the
    * untimed awaitTermination then blocks only until the stop lands.
    */
  def awaitAndStop(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long): Unit =
    try q.awaitTermination(timeoutMs)
    finally { q.stop(); q.awaitTermination() }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.SpatialFunctions.register(s)
    s
  }
}
