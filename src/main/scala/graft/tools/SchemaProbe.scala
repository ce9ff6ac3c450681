package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: how does this Spark build read the driver's parquet
  * (esp. the nanosecond `events.ts` column)? Not part of the library API.
  */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("lineitem", "orders", "events")) {
      println(s"== $t")
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(df.schema.treeString)
    }
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(col("ts") / 1000 cast "long"))
    ev.select(col("event_id"), col("ts")).orderBy("event_id").show(3, false)
    spark.stop()
  }
}
