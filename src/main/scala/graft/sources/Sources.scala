package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Uniform batch source/sink helpers.
  *
  * Thin, deliberately declarative wrappers over `spark.read` /
  * `df.write` so every format keeps full Catalyst pushdown (predicate
  * and column pruning reach parquet scans; csv/json get schema
  * enforcement instead of inference scans — at 100 TB an inference
  * pass is a full extra read).
  */
object Sources {

  /** Supported formats, keyed by file extension. */
  val formats: Map[String, String] = Map(
    "parquet" -> "parquet", "csv" -> "csv", "json" -> "json", "orc" -> "orc")

  private def formatOf(path: String): String = {
    // extension of the LAST path segment only: a dotted directory name
    // (".../v2.5/data") must not be mistaken for an extension
    val seg = path.replaceAll("/+$", "").split('/').last
    val ext = if (seg.contains('.')) seg.split('.').last.toLowerCase else ""
    formats.getOrElse(ext, "parquet")
  }

  /** Read `path`, inferring the format from the extension. An explicit
    * schema skips inference (csv/json would otherwise pay a full
    * pre-scan); csv assumes a header row.
    */
  def read(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val fmt = formatOf(path)
    val r0 = spark.read.format(fmt)
    val r1 = schema.fold(if (fmt == "csv" || fmt == "json") r0.option("inferSchema", "true") else r0)(r0.schema)
    val r2 = if (fmt == "csv") r1.option("header", "true") else r1
    r2.load(path)
  }

  /** Write `df` to `path` in the extension-inferred format, optionally
    * hash-partitioned by columns (directory partitioning → partition
    * pruning for downstream readers).
    */
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val fmt = formatOf(path)
    val w0 = df.write.format(fmt).mode(mode)
    val w1 = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    val w2 = if (fmt == "csv") w1.option("header", "true") else w1
    w2.save(path)
  }

  /** Write `df` as a bucketed (and optionally sort-within-bucket)
    * parquet table — bucket metadata lives in the catalog, so this is
    * `saveAsTable`, with an explicit `path` for an external table.
    *
    * This is the 100 TB fact-table layout: equi-joins and aggregations
    * keyed on the bucket columns between same-bucketed tables skip
    * their shuffle entirely (ScaleSpec pins the zero-join-exchange
    * plan), and in-bucket sort order makes the merge side of a
    * sort-merge join scan-ready.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil, path: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val w0 = df.write.format("parquet").mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val w1 = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    val w2 = path.fold(w1)(p => w1.option("path", p))
    w2.saveAsTable(table)
  }

  /** Range-partitioned, sorted-within-partition parquet layout: rows
    * land in contiguous key ranges per file, so parquet min/max footer
    * stats prune WHOLE FILES for range predicates on the sort key —
    * the sorted-layout technique that turns a 100 TB time- or
    * key-range scan into a few-file read. One range-exchange + local
    * sort at write time buys every downstream range query.
    */
  def writeRangePartitioned(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(sortCols.nonEmpty, "writeRangePartitioned needs at least one sort column")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.format("parquet").mode(mode).save(path)
  }
}
