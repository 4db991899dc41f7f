package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop plan dump: `.explain("formatted")` for selected queries —
  * the evidence PLANS.md quotes. Not part of the driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"\n======== $name ========")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
