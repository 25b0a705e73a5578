package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixed-point HyperLogLog — the register-based cardinality sketch
  * ([[KmvSketch]]'s sibling) with the float harmonic mean designed out
  * so it hash-gates across engines like everything else in this repo.
  *
  * The Spark-first observation: HLL needs NO custom aggregate. The
  * sketch is a RELATION — (group, bucket, r) with r the max rank seen —
  * so `groupBy(group, bucket).max(rho)` IS the sketch builder: partial
  * max combines map-side, at most m rows per group cross the shuffle,
  * and persisted registers merge with the same `max` (a commutative
  * idempotent monoid — slice-union registers are bit-identical to
  * direct registers, the artifact-algebra law the other incremental
  * surfaces gate). Contrast [[KmvSketch]], whose k-smallest-set state
  * genuinely needs a TypedImperativeAggregate.
  *
  * Exactness discipline: registers derive from [[KmvHash62]] (62-bit,
  * DuckDB-mirrored); rho is exact via the minimal binary-string length
  * (both engines' `bin`), never a float log; and the estimator is a
  * STAGED integer formula — Σ 2^−r as Σ(2^30 div 2^r) (exact:
  * power-of-two floors), the harmonic mean as one guarded int64
  * division, α and ln 2 as fixed literals, the linear-counting branch
  * through the square-and-shift [[FixedLogKernel]]. Every intermediate
  * is an int64 a second engine reproduces bit-for-bit — the estimator
  * the KMV scaladoc said floats could never cross-check.
  *
  * Standard error ≈ 1.04/√m (m = 512 → ~4.6%); the classical
  * linear-counting switch (raw ≤ 5m/2 and empty registers exist)
  * covers the small range where the raw estimator biases high.
  */
object Hll {

  val P = 9
  val M: Int = 1 << P                 // 512 registers
  val WBITS = 53                      // 62-bit hash minus the 9 bucket bits
  /** ⌊0.7213/(1 + 1.079/512) · 2^20⌋ — the standard α_m, fixed. */
  val ALPHA_FIX20 = 754747L
  /** ⌊ln 2 · 2^16⌋ */
  val LN2_FIX16 = 45426L

  /** The sketch: (groupCols..., bucket, r) with r = max over rows of
    * rho(hash). A pure set-function of the input (partitioning- and
    * order-invariant), ≤ m rows per group.
    */
  def registers(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val h = Kmv.hash62(key)
    val w = h.bitwiseAND(lit((1L << WBITS) - 1))
    // rank of the first set bit in the 53-bit window, 1-based; the
    // empty window scores WBITS + 1. length(bin(w)) is the exact
    // floor(log2 w) + 1 — no float log in the hot path's value space.
    val rho = when(w === 0L, lit(WBITS + 1).cast(LongType))
      .otherwise((lit(WBITS + 1) - length(bin(w))).cast(LongType))
    df.select((groupCols.map(col) :+ shiftright(h, WBITS).as("bucket") :+
        rho.as("r")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max("r").as("r"))
  }

  /** Register merge = per-(group, bucket) max — the idempotent monoid
    * that makes persisted registers a cross-run artifact. One shuffle
    * over register relations (m·|groups| rows, never the corpus).
    */
  def mergeRegisters(parts: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max("r").as("r"))

  /** Per-group estimate from a register relation:
    * (groupCols..., v_zeros, s_fix, est). The formula (every step a
    * mirrored int64 op, staged so nothing overflows):
    *
    *   s_fix  = Σ_present (2^30 div 2^r) + v_zeros · 2^30      (≥ 1)
    *   est1   = min(2^42, 2^60 div s_fix)                      (E_raw/α · 2^12)
    *   raw20  = (α_fix20 · est1) div 2^12                      (E_raw · 2^20)
    *   lc20   = (m · ln2_fix16 · −log2fix(v·2^21, 30, 16)) div 2^12
    *   est    = (if v_zeros > 0 ∧ raw20 ≤ 5m/2 · 2^20 then lc20 else raw20) div 2^20
    */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__present"),
        sum(expr("1073741824L div shiftleft(cast(1 as bigint), cast(r as int))"))
          .as("__sp"))
      .select((groupCols.map(col) :+
        (lit(M.toLong) - col("__present")).as("v_zeros") :+
        greatest(lit(1L),
          col("__sp") + (lit(M.toLong) - col("__present")) * lit(1L << 30))
          .as("s_fix")): _*)
      .withColumn("__est1", least(lit(1L << 42), expr(s"${1L << 60}L div s_fix")))
      .withColumn("__raw20", expr(s"(${ALPHA_FIX20}L * __est1) div 4096"))
      // log2fix clamps p ≤ 0 to p = 1; v_zeros = 0 never takes the branch
      .withColumn("__bits",
        -FixedLogExprs.log2fix(col("v_zeros") * lit(1L << 21), 30, 16))
      .withColumn("__lc20",
        expr(s"(${M.toLong}L * ${LN2_FIX16}L * __bits) div 4096"))
      .withColumn("est",
        when(col("v_zeros") > 0 && col("__raw20") <= lit((5L * M / 2) << 20),
          expr("__lc20 div 1048576"))
          .otherwise(expr("__raw20 div 1048576")))
      .select((groupCols.map(col) :+ col("v_zeros") :+ col("s_fix") :+
        col("est")): _*)
}
