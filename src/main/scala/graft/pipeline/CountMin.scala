package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency sketch a
  * 100 TB log pipeline uses where an exact `groupBy(key).count` would
  * shuffle one row per distinct key: the sketch is a fixed d×w counter grid
  * whose build is a map-side-combinable aggregate (at most d·w rows per
  * partition cross the wire, REGARDLESS of input size or key cardinality),
  * and any key's count is over-estimated by at most εN with probability
  * 1−δ (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉). Estimates are min over d rows, so
  * `est ≥ exact` always (one-sided error).
  *
  * Hashing is multiplicative with 32-bit odd constants over a 64-bit
  * product — pure integer arithmetic with NO wraparound (|key| < 2³¹
  * required, so the product stays under 2⁶³ and ANSI mode never overflows),
  * which makes the sketch bit-replayable in any engine (the DuckDB oracle
  * replays it with plain BIGINT math). Pre-hash wider keys down first.
  */
object CountMin {

  val Depth = 4
  val Width = 512

  /** Odd 32-bit multipliers / offsets (golden-ratio / xxhash-style primes). */
  val MulA: Seq[Long] = Seq(0x9E3779B9L, 0x85EBCA77L, 0xC2B2AE3DL, 0x27D4EB2FL)
  val AddB: Seq[Long] = Seq(0x165667B1L, 0x9E3779F9L, 0x7F4A7C15L, 0x2545F491L)

  /** Row-r bucket of `key`: middle bits of (key·A + B), mod Width. */
  def bucket(key: Column, r: Int): Column =
    shiftrightunsigned(key * lit(MulA(r)) + lit(AddB(r)), 20) % lit(Width.toLong)

  /** The same bucket arithmetic as DuckDB SQL over expression `k`. */
  def bucketDuckSql(k: String, r: Int): String =
    s"((($k) * ${MulA(r)} + ${AddB(r)}) // 1048576) % $Width"

  /** Build the d×w sketch from `df(keyCol)`: one (r, b, cnt) row per
    * non-empty cell. The explode is d rows per input row, but partial
    * aggregation combines them map-side — the exchange carries ≤ d·w rows
    * per upstream partition.
    */
  def sketch(df: DataFrame, keyCol: String): DataFrame =
    df.select(explode(array((0 until Depth).map(r =>
        struct(lit(r).as("r"), bucket(col(keyCol), r).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate each key in `keys(keyCol)` against a built sketch:
    * min over the d probed cells. The sketch is ≤ d·w rows — always
    * broadcast, so estimation adds NO shuffle to the probe side.
    */
  def estimate(keys: DataFrame, keyCol: String, sk: DataFrame): DataFrame =
    keys.select(col(keyCol), explode(array((0 until Depth).map(r =>
        struct(lit(r).as("r"), bucket(col(keyCol), r).as("b"))): _*)).as("rb"))
      .join(broadcast(sk),
        col("rb.r") === sk("r") && col("rb.b") === sk("b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
