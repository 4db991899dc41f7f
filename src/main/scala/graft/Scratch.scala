package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad for plan inspection / micro-timing. Not part of the
  * library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_CODEGEN_DEBUG=1: dump generated Java on compile failure
    // (CodeGenerator logs the formatted source at INFO when a cook fails).
    if (sys.env.get("SPARK_GRAFT_CODEGEN_DEBUG").contains("1")) {
      spark.conf.set("spark.sql.codegen.logging.maxLines", "10000")
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.INFO)
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("knn_top5", "q3_top10", "chunks_nonempty", "q1_agg")
    val time = sys.env.get("SPARK_GRAFT_TIME").contains("1")
    names.foreach { n =>
      println(s"========== $n ==========")
      if (time) {
        // best-of-2 wall time, same convention as Bench
        def once(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[time] $n: ${math.min(once(), once())}%.3f s")
      } else SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
