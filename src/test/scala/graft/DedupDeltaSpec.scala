package graft

import org.apache.spark.sql.functions._

import graft.analysis.Dedup

/** Incremental (delta-vs-corpus) dedup: the persisted signature store
  * must reproduce the batch pipeline's pairs exactly, the probe must
  * prune unprobed band buckets at plan time, and an inconsistent store
  * must fail loudly. */
class DedupDeltaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private def corpus = docs.filter(col("doc_id") % 5 =!= 0)
  private def delta = docs.filter(col("doc_id") % 5 === 0)

  private def freshStore(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/sigs"
    Dedup.writeSignatureStore(corpus, "doc_id", "text", 5, 32, 8, p)
    p
  }

  test("delta pairs ≡ batch pairs restricted to delta-involving pairs") {
    val path = freshStore("dedup-delta-eq")
    val inc = Dedup.deltaDupPairs(delta, "doc_id", "text", path, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val deltaIds = delta.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val batch = Dedup.minhashJaccardPairs(docs, "doc_id", "text", 5, 32, 8, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => deltaIds(p._1) || deltaIds(p._2)).toSet
    assert(inc == batch, s"incremental ${inc.size} pairs != batch ${batch.size}")
    assert(batch.nonEmpty, "fixture has no delta-involving near-dup pairs — weak test")
  }

  test("append ≡ rebuild: store grown by append probes identically") {
    val half1 = corpus.filter(col("doc_id") % 2 === 0)
    val half2 = corpus.filter(col("doc_id") % 2 =!= 0)
    val grown = java.nio.file.Files.createTempDirectory("graft-sig-app").toString + "/sigs"
    Dedup.writeSignatureStore(half1, "doc_id", "text", 5, 32, 8, grown)
    Dedup.appendToSignatureStore(half2, "doc_id", "text", grown)
    val rebuilt = freshStore("sig-rebuild")
    def run(p: String) = Dedup.deltaDupPairs(delta, "doc_id", "text", p, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(grown) == run(rebuilt))
  }

  test("probe reads only the delta's band-bucket partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = freshStore("dedup-delta-prune")
    // one doc probes few buckets; collect the frame ITSELF so the scan
    // metrics belong to the plan that ran
    val one = delta.filter(col("doc_id") === delta.agg(min(col("doc_id"))).head().getLong(0))
    val probe = Dedup.deltaDupPairs(one, "doc_id", "text", path, 0.5)
    probe.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(probe.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("bands")))
      .getOrElse(fail("no parquet scan over the bands found"))
    assert(scan.toString.contains("PartitionFilters"), "pruning must be static (plan-time)")
    val numFiles = scan.metrics("numFiles").value
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/bands")).count(_.getName.endsWith(".parquet"))
    }
    assert(numFiles < totalFiles,
      s"expected bucket skipping: read $numFiles of $totalFiles files")
  }

  test("inconsistent or missing store fails loudly") {
    val path = freshStore("dedup-delta-guard")
    // forge a conflicting stats row (as if an append used different LSH params)
    spark.range(1).select(lit(7L).as("k"),
        lit(32L).as("num_hashes"), lit(8L).as("rows_per_band"),
        lit(64L).as("band_buckets"))
      .write.mode("append").parquet(s"$path/stats")
    val e = intercept[IllegalArgumentException] {
      Dedup.deltaDupPairs(delta, "doc_id", "text", path, 0.5)
    }
    assert(e.getMessage.contains("conflicting config"))
    val e2 = intercept[IllegalStateException] {
      Dedup.deltaDupPairs(delta, "doc_id", "text",
        java.nio.file.Files.createTempDirectory("graft-empty").toString, 0.5)
    }
    assert(e2.getMessage.contains("no stats/"))
  }

  test("dedupDelta keep/drop: corpus partner wins, else smaller delta id, else keep") {
    val path = freshStore("dedup-delta-keep")
    val out = Dedup.dedupDelta(delta, "doc_id", "text", path, 0.5)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
    assert(out.length == delta.count())
    // keep ⟺ dup_of null, and dup_of must be a real near-dup partner
    val pairs = Dedup.deltaDupPairs(delta, "doc_id", "text", path, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deltaIds = out.map(_._1).toSet
    for ((id, dupOf, keep) <- out) {
      assert(keep == dupOf.isEmpty)
      for (d <- dupOf) {
        assert(pairs(math.min(id, d) -> math.max(id, d)))
        assert(!deltaIds(d) || d < id, s"delta partner $d must be smaller than $id")
      }
    }
    assert(out.exists(!_._3), "fixture produced no drops — weak test")
  }
}
