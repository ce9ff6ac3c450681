package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: time one named SparkEntry query at a given SF dir
  * (bench-style: warmup pass at sf0.001 first, then one timed run).
  * Usage: runMain graft.tools.TimeQuery <query> [sfDir] [repeat]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.builder("graft-timequery")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warmup: JIT + codegen caches
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(s"run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
