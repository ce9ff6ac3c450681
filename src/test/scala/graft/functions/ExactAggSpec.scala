package graft.functions



import graft.SparkSpec

/** The ExactAgg int64 precondition is ENFORCED, not documented: Spark
  * sums BIGINT with silent wraparound (ANSI off) while DuckDB promotes
  * to HUGEINT, so past the bound the engines would DIVERGE — exactly
  * the failure mode the quantized-integer design exists to kill. The
  * fused double-moment guard must turn that silent divergence into a
  * loud error, and must never fire on in-bound data.
  */
class ExactAggSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def agg(vals: Seq[Double], c: org.apache.spark.sql.Column): Double = {
    val sess = spark
    import sess.implicits._
    vals.toDF("v").agg(c.as("x")).first().getDouble(0)
  }

  test("in-bound mean/std match the plain formulas (guard is invisible)") {
    val vals = Seq(1.2345, 2.5, -3.75, 10.0, 0.0001)
    val m = agg(vals, ExactAgg.exactMean(col("v"), 4))
    val s = agg(vals, ExactAgg.exactStd(col("v"), 4))
    // independent references: quantize by hand, reduce exactly
    val q = vals.map(v => math.floor(v * 1e4 + 0.5).toLong)
    val n = q.size
    val refM = math.floor((2.0 * q.sum + n) / (2.0 * n)) / 1e4
    val refS = math.floor(math.sqrt(
      (n.toLong * q.map(x => x * x).sum - q.sum * q.sum).toDouble / (n.toLong * n)) + 0.5) / 1e4
    assert(m == refM, s"mean $m != $refM")
    assert(s == refS, s"std $s != $refS")
  }

  test("a sum past 2^53 fails loudly instead of silently diverging") {
    // 2 values of 1e13 at dp=4 → Σ|q| = 2e17, guard 4e17 >= 9.0e15
    val ex = intercept[Exception] {
      agg(Seq(1.0e13, 1.0e13), ExactAgg.exactMean(col("v"), 4))
    }
    assert(ex.getMessage.contains("ExactAgg.exactMean"), ex.getMessage)
  }

  test("a second moment past 2^63 fails loudly (std guard)") {
    // one value of 3.1e9 at dp=0 → q² ≈ 9.6e18 overflows int64 AND
    // breaches the n·Σq² bound — the guard's error must win over any
    // engine overflow (try_ moments make the reduction non-throwing)
    val ex = intercept[Exception] {
      agg(Seq(3.1e9), ExactAgg.exactStd(col("v"), 0))
    }
    assert(ex.getMessage.contains("ExactAgg.exactStd"), ex.getMessage)
  }

  test("the guard sits under the real wraparound point (margin, not tangent)") {
    // just inside the guard: no error, and the int64 path is still exact
    val v = 4.4e15 // 2·q+n = 8.8e15 < 9.0e15, and q < 2^53 exactly representable
    val m = agg(Seq(v), ExactAgg.exactMean(col("v"), 0))
    assert(m == v, s"$m != $v")
  }
}
