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
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import org.apache.spark.sql.functions._
    val docs = io.Tables.documents(spark, dir)
    docs.count()
    val sets = docs.select(col("doc_id").as("id"), col("source").as("grp"),
      sort_array(analysis.Dedup.shinglesHashes(col("text"), 5)).as("ss"))
    time("sets")(sets.write.mode("overwrite").parquet("/tmp/scratch_sets"))
    val cached = spark.read.parquet("/tmp/scratch_sets")
    val a = cached.select(col("id").as("id_a"), col("grp"), col("ss").as("sa"))
    val b = cached.select(col("id").as("id_b"), col("grp"), col("ss").as("sb"))
    val joined = a.join(b, Seq("grp")).filter(col("id_a") < col("id_b"))
      .withColumn("inter", functions.SortedArrayIntersectCount(col("sa"), col("sb")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= 0.5)
    time("pairjoin-on-materialized")(joined.count())
    val full = analysis.Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 5, 0.5)
    time("full")(full.count())
    full.explain("formatted")
    spark.stop()
  }
}
