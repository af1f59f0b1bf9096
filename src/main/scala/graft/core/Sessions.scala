package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory used by tests and ad-hoc mains.
  *
  * Verify/Bench (the driver contract) build their own sessions; this factory
  * keeps the same settings so local test behavior matches driver runs:
  * UTC session time zone (oracle parity), AQE on (runtime re-plan / skew
  * handling at scale), shuffle partitions sized to the local core count
  * rather than the 200 default.
  */
object Sessions {
  def local(cores: Int = 4, appName: String = "graft-test"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
