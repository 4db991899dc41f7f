package graft

import org.apache.spark.sql.functions._

import graft.search.{Ann, Search, Sq}

/** SQ8-IVF index semantics: the probe's partition pruning (only the
  * probed clusters' code files open), the exact-rerank contract (the
  * reported sims are the float cosines, not code scores), and recall
  * against the exact scan. */
class SqSpec extends SparkSpec {
  test("SQ8-IVF probe: pruned code scan, exact rerank sims, high recall") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfsq").toString + "/index"
    Sq.buildIvfSqIndex(emb, cents, dir)
    val res = Sq.ivfSqIndexTopK(spark, dir, q, cents, 5, 20, 3)
      .select(col("vec_id"), col("sim"))
    val got = res.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // sims must be the EXACT float cosines for those ids
    val exactSims = Search.knn(emb, q, emb.count().toInt)
      .select(col("vec_id"), col("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, sim) =>
      assert(sim == exactSims(id), s"id $id: rerank sim $sim != exact ${exactSims(id)}")
    }
    // recall vs the exact top-5 (int8 at 64 dims is near-lossless)
    val exact = Search.knn(emb, q, 5).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert((got.map(_._1).toSet & exact).size >= 4,
      s"recall too low: ${got.map(_._1)} vs $exact")
    // the codes scan opens only probed clusters' partitions
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val qvec = q.head().getSeq[Number](0).map(_.doubleValue()).toSeq
    val probes = Ann.probeIds(cents, qvec, 3)
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("__cluster").isin(probes: _*))
    codes.collect()
    val codesScan = scans(codes.queryExecution.executedPlan)
      .headOption.getOrElse(fail("no parquet scan over the codes table"))
    assert(codesScan.toString.contains("PartitionFilters"),
      "probe pruning must be static (plan-time)")
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/codes")).count(_.getName.endsWith(".parquet"))
    }
    val numFiles = codesScan.metrics("numFiles").value
    assert(numFiles > 0 && numFiles < totalFiles,
      s"expected file skipping: read $numFiles of $totalFiles code files")
    // the codes scan never reads float vectors
    assert(!codesScan.schema.fieldNames.contains("embedding"),
      "query path must not read float vectors before the rerank")
  }
}
