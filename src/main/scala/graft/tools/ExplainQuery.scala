package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: print the formatted physical plan of one named
  * SparkEntry query (the plan-shape feedback loop the build rules ask
  * for). Usage: runMain graft.tools.ExplainQuery <query> [sfDir]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder("graft-explain")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
