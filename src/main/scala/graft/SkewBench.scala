package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement harness behind PLANS.md's "skew join (round 8)"
  * section: a deliberately skewed join/agg/window fixture at sf0.1,
  * measured as the PER-PARTITION ROW DISTRIBUTION of the stage that
  * carries the skew (`spark_partition_id()` histogram — the direct
  * partition-sizes-before/after evidence) plus wall time per variant.
  * Dev tool like [[Scratch]], not library surface. */
object SkewBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE's skew splitter slices a hot reduce partition by MAPPER
      // ranges — with sf0.1's ~20 MB file scanned as one map task the
      // hot partition has a single slice and physically cannot split.
      // Force many map tasks, as any real multi-file/multi-split input
      // would have.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // Fixture: half of lineitem lands on ONE key (the web-corpus "host
    // with half the crawl" shape); the rest spreads over 1000 keys.
    // Materialized as 32 parquet files: sf0.1's single-row-group file
    // scans as ONE data-bearing map task, and AQE's skew splitter
    // slices a hot reduce partition by MAPPER ranges — one mapper = one
    // unsplittable slice. Real corpus inputs are many-file.
    val factPath = java.nio.file.Files.createTempDirectory("graft-skew").toString + "/fact"
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        when(pmod(col("l_orderkey"), lit(100)) < 50, lit(1L))
          .otherwise(pmod(col("l_orderkey"), lit(1000)) + 1000L).as("skew_key"),
        col("l_quantity"))
      .repartition(32)
      .write.mode("overwrite").parquet(factPath)
    val fact = spark.read.parquet(factPath)
    val dim = spark.range(0, 2100)
      .select(col("id").as("skew_key"), (col("id") * 7).as("payload"))

    def conf(kv: (String, String)*): Unit = kv.foreach { case (k, v) => spark.conf.set(k, v) }

    def run(label: String, df: => DataFrame): Unit = {
      // rows per physical output partition of the skew-carrying stage,
      // measured on the frame's OWN query execution (so AQE's final
      // adaptive plan — skew splits included — is what gets observed;
      // Dataset.rdd would wrap a separate QueryExecution). Best-of-2
      // wall time, the Bench convention, so variant order ≠ JIT warmup.
      def once(): (Array[Long], Double) = {
        val frame = df
        val t0 = System.nanoTime()
        val parts = frame.queryExecution.toRdd
          .mapPartitions(it => Iterator(it.size.toLong))
          .collect().sorted
        (parts, (System.nanoTime() - t0) / 1e9)
      }
      val (parts, s1) = once()
      val sec = math.min(s1, once()._2)
      val (n, mx, p50) = (parts.sum, parts.last, parts(parts.length / 2))
      println(f"[skew] $label%-30s rows=$n%8d  partitions=${parts.length}%4d  " +
        f"maxPartRows=$mx%8d  p50PartRows=$p50%8d  max/p50=${mx.toDouble / math.max(p50, 1)}%7.1fx  wall=$sec%5.2fs")
      if (sys.env.contains("SKEW_DEBUG")) {
        val frame = df
        frame.queryExecution.toRdd.count()
        println(frame.queryExecution.executedPlan.toString.take(3000))
      }
    }

    // -------- join skew --------
    conf("spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join shape
    conf("spark.sql.adaptive.enabled" -> "false")
    run("join: plain shuffle, no AQE", fact.join(dim, Seq("skew_key")))

    conf("spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // keep the SMJ shape under AQE too, or it converts to broadcast
      // and measures nothing
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // the partition-id histogram adds a downstream exchange, which
      // makes OptimizeSkewedJoin conservatively skip; force it, as a
      // production job with downstream shuffles would
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      // sf0.1's hot partition is ~0.1 MB COMPRESSED — far under the
      // 256 MB production threshold; scale thresholds to the data so
      // the splitter engages the way it would on multi-GB partitions
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    run("join: AQE skew split", fact.join(dim, Seq("skew_key")))

    conf("spark.sql.adaptive.enabled" -> "false")
    run("join: salted broadcast x16",
      graft.plans.Skew.saltedBroadcastJoin(fact, dim, "skew_key", 16,
        Seq("skew_key", "l_quantity")))

    // -------- aggregation skew --------
    // Algebraic aggs (count/sum) carry ONE partial row per (mapper,
    // key): map-side combine collapses the hot key before the shuffle,
    // so no row skew survives — measured to pin the claim. The salted
    // form exists for partial state that is per-row-sized (UDAF
    // buffers), where the same two-phase shape bounds every reducer.
    run("agg: plain groupBy count", fact.groupBy(col("skew_key")).count())
    run("agg: salted count x16",
      graft.plans.Skew.saltedCount(fact, "skew_key", 16, Seq("l_quantity")))

    // -------- window skew --------
    // Windows get no partial aggregation: every hot-key row shuffles
    // into ONE task (a rank<=k filter would get the map-side
    // WindowGroupLimit rescue; summing ranks keeps the full window
    // honest). The engine's remedy is restructuring: the two-phase
    // distributed prefix sum (Chunker.withOrdinalIds, SeqPack) for
    // running totals, keyed pre-aggregation before ranking otherwise.
    run("window: full rank over hot key", {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("skew_key")).orderBy(col("l_quantity"))
      fact.withColumn("rn", row_number().over(w))
    })

    spark.stop()
  }
}
