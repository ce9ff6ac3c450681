package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Scale posture: AQE on (runtime coalescing + skew-join handling),
  * shuffle partition count from the environment (32 on the local[32]
  * test rig; on a real cluster set it to ~2-3x total cores), UTC
  * everywhere so timestamp semantics are stable across engines.
  */
object GraftSession {
  def defaultParallelism: String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(Runtime.getRuntime.availableProcessors(), 4).toString)

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", defaultParallelism)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the driver's events table carries TIMESTAMP(NANOS) parquet —
      // read as long and normalize in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session sized to the test rig. */
  def local(appName: String = "graft"): SparkSession =
    builder(appName).master(s"local[$defaultParallelism]").getOrCreate()
}
