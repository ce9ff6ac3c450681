package graft

/** Pure-SQL surface: [[Tables.createViews]] + [[GraftExtensions]]
  * make the engine usable without touching the Scala API — the same
  * table names the DuckDB oracles use, the native codegen functions
  * resolving inside plain `spark.sql` statements.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("tables register as views and answer SQL") {
    tables.createViews()
    val n = spark.sql(
      "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
  }

  test("native functions resolve in pure SQL over the views") {
    tables.createViews()
    val row = spark.sql(
      """SELECT a.vec_id AS q, b.vec_id AS c,
        | cosine_similarity(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                   CAST(b.embedding AS ARRAY<DOUBLE>)) AS cos,
        | quantized_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                  CAST(b.embedding AS ARRAY<DOUBLE>)) AS qcos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id = 0""".stripMargin).head()
    val (cos, qcos) = (row.getDouble(2), row.getDouble(3))
    assert(cos >= -1.0 && cos <= 1.0)
    // int8 quantization stays close to full precision on real vectors
    assert(math.abs(cos - qcos) < 0.05, s"cos=$cos qcos=$qcos")
  }

  test("a flagship query is expressible in one SQL statement") {
    tables.createViews()
    val df = spark.sql(
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY 1, 2""".stripMargin)
    assert(df.count() > 0)
  }
}
