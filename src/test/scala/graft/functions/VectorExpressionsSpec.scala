package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorExpressionsSpec extends SparkSpec {

  private def eval(c: org.apache.spark.sql.Column, a: Seq[Double], b: Seq[Double]): Option[Double] = {
    val df = spark.createDataFrame(Seq((a, b))).toDF("a", "b")
    val r = df.select(c.as("v")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("dot_product basics") {
    assert(eval(dotProduct(col("a"), col("b")), Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)).get == 32.0)
    assert(eval(dotProduct(col("a"), col("b")), Seq(1.0), Seq(1.0, 2.0)).isEmpty)
  }

  test("l2_distance basics") {
    assert(eval(l2Distance(col("a"), col("b")), Seq(0.0, 0.0), Seq(3.0, 4.0)).get == 5.0)
    assert(eval(l2Distance(col("a"), col("b")), Seq(1.0, 1.0), Seq(1.0, 1.0)).get == 0.0)
  }

  test("l2_sq_distance basics (the PQ/ADC kernel)") {
    assert(eval(l2SqDistance(col("a"), col("b")), Seq(0.0, 0.0), Seq(3.0, 4.0)).get == 25.0)
    assert(eval(l2SqDistance(col("a"), col("b")), Seq(1.0), Seq(1.0, 2.0)).isEmpty)
    // bit-equal to the oracle's left-associative `+` chain spelling
    val vs = Seq(0.1, -0.2, 0.3, 0.4)
    val ws = Seq(-0.5, 0.6, 0.7, -0.8)
    val manual = vs.zip(ws).map { case (x, y) => (x - y) * (x - y) }.reduce(_ + _)
    assert(eval(l2SqDistance(col("a"), col("b")), vs, ws).get == manual)
  }

  test("SQL registration resolves all vector functions") {
    val r = spark.sql(
      """SELECT dot_product(array(1d,2d), array(3d,4d)) AS d,
        |       l2_distance(array(0d,0d), array(3d,4d)) AS l,
        |       l2_sq_distance(array(0d,0d), array(3d,4d)) AS l2,
        |       cosine_similarity(array(1d,0d), array(1d,0d)) AS c""".stripMargin).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 &&
      r.getDouble(2) == 25.0 && math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }

  test("identity: cosine == dot / (|a| |b|) on real embeddings") {
    val t = tables
    val e = t.embeddings.select(col("embedding").cast("array<double>").as("v")).limit(50)
    val pairs = e.crossJoin(e.select(col("v").as("w")))
    val checked = pairs.select(
      cosineSimilarity(col("v"), col("w")).as("cos"),
      (dotProduct(col("v"), col("w")) /
        (sqrt(dotProduct(col("v"), col("v"))) * sqrt(dotProduct(col("w"), col("w"))))).as("manual"))
      .filter(abs(col("cos") - col("manual")) > 1e-10)
    assert(checked.count() == 0)
  }
}
