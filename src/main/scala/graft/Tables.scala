package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Loads the driver-generated parquet tables from a scale-factor dir.
  *
  * All tables come back exactly as stored except `events`, whose `ts`
  * column is parquet TIMESTAMP(NANOS) — Spark can't map that natively,
  * so it's read as a nanosecond epoch long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and normalized here to a
  * microsecond TIMESTAMP_NTZ via truncating division, which is exactly
  * how DuckDB reads the same column after CAST(ts AS TIMESTAMP) — so
  * both engines see identical values.
  */
final case class Tables(spark: SparkSession, dir: String) {

  /** IMMUTABILITY CONTRACT: `raw` serves the driver-generated input
    * tables, which are never rewritten in-place during a process
    * lifetime — the schema memo below is keyed by path alone and has
    * no invalidation. Code that writes parquet it will read back
    * (staging, tests) must use fresh per-run paths (every staging
    * helper does), never overwrite a path previously read here. */
  def raw(name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$name.parquet"
    // Memoize the inferred schema per file path: the input tables are
    // immutable, but every `spark.read.parquet` without an explicit
    // schema pays a driver-side footer read + merge at PLAN time —
    // hundreds of query constructions × several tables each made
    // schema inference a measurable per-query tax. (Metadata only;
    // every query still computes from the parquet data.)
    val schema = Tables.schemaCache.getOrElseUpdate(
      path, spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region: DataFrame = raw("region")
  def nation: DataFrame = raw("nation")
  def customer: DataFrame = raw("customer")
  def supplier: DataFrame = raw("supplier")
  def part: DataFrame = raw("part")
  def orders: DataFrame = raw("orders")
  def lineitem: DataFrame = raw("lineitem")
  def documents: DataFrame = raw("documents")
  def embeddings: DataFrame = raw("embeddings")

  /** events with `ts` as microsecond TIMESTAMP_NTZ (see class doc). */
  def events: DataFrame = {
    val df = raw("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: ns epoch exceeds double precision (2^53)
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ => df // already a timestamp type
    }
  }

  /** All table names [[createViews]] registers. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a session temp view (events with its
    * normalized `ts`), making the whole engine reachable from pure
    * SQL — `spark.sql("SELECT …")` over the same names the DuckDB
    * oracles use, with graft's native functions
    * ([[GraftExtensions]]: `cosine_similarity`, `dot_product`, …)
    * resolving in the same statements. Temp views are metadata only:
    * nothing is read or copied at registration time.
    */
  def createViews(): Unit = names.foreach { n =>
    val df = if (n == "events") events else raw(n)
    df.createOrReplaceTempView(n)
  }
}

object Tables {
  /** Inferred parquet schemas keyed by file path (immutable inputs). */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.types.StructType]
}
