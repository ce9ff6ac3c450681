package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent aggregate means/stddevs over double columns,
  * for operators whose results feed a cross-engine hash compare.
  *
  * `round(avg(<double>), dp)` is NOT reproducible across engines:
  * Spark and DuckDB sum the partials in different orders, so two
  * correctly-implemented engines legally disagree by an ulp — and an
  * ulp is enough to flip a `.xxxx5` half-boundary at the final
  * rounding (the `embed_kmeans` round-7 failure, and the third
  * rounding-boundary incident overall; see SURVEY §6).
  *
  * The fix is to keep every inter-row reduction in EXACT integer
  * arithmetic and never call an engine `round()` on an aggregate:
  *
  *  1. quantize each value map-side: `q = floor(v·10^dp + 0.5)` as
  *     BIGINT — per-row single IEEE multiply/add/floor, identical on
  *     any engine, no summation involved;
  *  2. `sum(q)` / `count(*)` — exact 64-bit integer reductions,
  *     immune to ordering;
  *  3. recover the half-up mean with integer floor arithmetic:
  *     `floor((2·Σq + n) / (2n)) / 10^dp`. The one division runs on
  *     exactly-representable integer operands (all < 2^53), so both
  *     engines produce the bit-identical IEEE quotient, floor, and
  *     final double.
  *
  * The quantization redefines the operator contract to "mean of the
  * 10^-dp-quantized values" — the bias is < 0.5·10^-dp/√n, far below
  * the emitted precision, and determinism is what a replayable
  * pipeline needs. Population stddev gets the same treatment and a
  * bonus: `n·Σq² − (Σq)²` is non-negative BY CONSTRUCTION in integer
  * arithmetic (no float cancellation below zero).
  */
object ExactAgg {

  /** 10^dp as an exactly-parsed double (math.pow is only 1-ulp
    * accurate by spec; a decimal parse is correctly rounded). */
  private def pow10(dp: Int): Double = s"1e$dp".toDouble

  /** Per-row ×10^dp BIGINT quantization (half-up): the only lossy
    * step, applied before any reduction. */
  def quantize(v: Column, dp: Int): Column =
    floor(v * lit(pow10(dp)) + lit(0.5)).cast("long")

  /** Half-up mean at `dp` decimals, exact-integer reduction.
    *
    * Denominator is `count(v)` — the NON-NULL count, matching the
    * null-skipping `avg()` these calls replace (nulls vanish from
    * both Σq and n, so a nullable input keeps mean consistent with a
    * null-skipping sum in the same row). An all-null group yields
    * NULL, like `avg()`.
    *
    * Magnitude precondition (both engines): every |v|·10^dp must fit
    * comfortably in int64 AND n·Σq² (for [[exactStd]]) must stay
    * below 2^63 — Spark sums BIGINT with silent wraparound (ANSI
    * off) while DuckDB promotes to HUGEINT, so an overflow doesn't
    * just lose exactness, it DIVERGES the engines. The final mean
    * recovery additionally needs 2·Σq + n < 2^53 for the exact IEEE
    * quotient.
    *
    * ENFORCED, not documented: each aggregate fuses a parallel DOUBLE
    * moment (immune to wraparound — relative error ~n·2^-52, orders
    * of magnitude inside the ~2% safety margin on the thresholds)
    * into the same partial-agg pass and `raise_error`s when the bound
    * is crossed, so an out-of-range corpus fails LOUDLY on the Spark
    * side instead of silently diverging from DuckDB's HUGEINT
    * promotion. Coarsen `dp` or pre-scale the column when it fires.
    */
  def exactMean(v: Column, dp: Int): Column = {
    val q = quantize(v, dp)
    // try_sum: the int64 reduction must not throw (ANSI) or wrap
    // (non-ANSI) BEFORE the guard below gets to raise the actionable
    // error — out of bounds it returns NULL, and the guard fires first
    val s = try_sum(q)
    val n = count(v)
    // |2·Σq| + n ≤ 2·Σ|q| + n — checked in doubles with margin vs 2^53
    val bound = lit(2.0) * sum(abs(q).cast("double")) + n.cast("double")
    when(bound >= lit(9.0e15), raise_error(concat(
      lit(s"ExactAgg.exactMean(dp=$dp): 2*sum|q|+n = "), bound.cast("string"),
      lit(" breaches the exact-int64 bound (9.0e15 < 2^53); coarsen dp or pre-scale"))))
      .otherwise(floor((lit(2L) * s + n) / (lit(2L) * n)) / lit(pow10(dp)))
  }

  /** Half-up population stddev at `dp` decimals, exact-integer
    * moments: std = sqrt((n·Σq² − (Σq)²)/n²) in quantized units.
    * Non-null `n` as in [[exactMean]]; the n·Σq² < 2^63 precondition
    * is ENFORCED by a fused double-moment guard ((Σq)² ≤ n·Σq² by
    * Cauchy-Schwarz, so one check covers every int64 term). */
  def exactStd(v: Column, dp: Int): Column = {
    val q = quantize(v, dp)
    // try_ forms: neither the per-row square nor the reductions may
    // throw (ANSI) or wrap (non-ANSI) before the guard fires
    val s = try_sum(q)
    val s2 = try_sum(try_multiply(q, q))
    val n = count(v)
    val qd = q.cast("double")
    val bound = n.cast("double") * sum(qd * qd)
    when(bound >= lit(9.0e18), raise_error(concat(
      lit(s"ExactAgg.exactStd(dp=$dp): n*sum(q^2) = "), bound.cast("string"),
      lit(" breaches the exact-int64 bound (9.0e18 < 2^63); coarsen dp or pre-scale"))))
      .otherwise(floor(sqrt((n * s2 - s * s) / (n * n)) + lit(0.5)) / lit(pow10(dp)))
  }

  /** DuckDB spellings of the same formulas, for oracle SQL. `v` is a
    * SQL expression for the double value. Generated here so the
    * oracle can never drift from the Spark implementation — including
    * the non-null `count(v)` denominator. */
  def quantizeSql(v: String, dp: Int): String =
    s"CAST(floor(($v) * 1e$dp + 0.5) AS BIGINT)"

  def exactMeanSql(v: String, dp: Int): String =
    s"floor((2 * sum(${quantizeSql(v, dp)}) + count($v)) / (2.0 * count($v))) / 1e$dp"

  def exactStdSql(v: String, dp: Int): String = {
    val q = quantizeSql(v, dp)
    s"floor(sqrt((count($v) * sum(($q) * ($q)) - sum($q) * sum($q)) / (1.0 * count($v) * count($v))) + 0.5) / 1e$dp"
  }
}
