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
    try {
      // drain, then stop the IDLE query: waiting out an AvailableNow
      // self-termination is unreliable on a parquet sink (it can idle past
      // any timeout), and stop() on a BUSY query interrupts an in-flight
      // micro-batch write and logs an ERROR abort. Drain-then-stop is
      // deterministic and quiet. (Safe with NoTimeout state ops; a
      // ProcessingTimeTimeout query would hang the drain — see
      // StreamDedup's idleTimeoutMs note. timeoutMs retained for signature
      // stability; the drain itself blocks until the sink is complete.)
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
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
