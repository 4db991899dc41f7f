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

  test("SQ8-IVF lifecycle: append/delete/compact/retrain ≡ rebuild") {
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfsq-life").toString
    def probe(path: String) =
      Sq.ivfSqIndexTopK(spark, path, q, cents, 5, 20, 3)
        .select(col("vec_id"), col("sim"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the reference answer: one fresh full build
    Sq.buildIvfSqIndex(emb, cents, s"$tmp/full")
    val want = probe(s"$tmp/full")
    // append is invisible to the probe
    Sq.buildIvfSqIndex(emb.filter(col("vec_id") < 300), cents, s"$tmp/ap")
    Sq.appendToIvfSqIndex(emb.filter(col("vec_id") >= 300), cents, s"$tmp/ap")
    assert(probe(s"$tmp/ap") == want, "append-then-probe must ≡ rebuild")
    // delete: tombstoned ids (incl. the query's sim-1 self-hit) vanish;
    // probe ≡ a fresh build on the survivors with the same centroids
    Sq.buildIvfSqIndex(emb, cents, s"$tmp/del")
    Sq.deleteFromIvfSqIndex(
      emb.filter(col("vec_id") % 5 === 0).select(col("vec_id")), s"$tmp/del")
    Sq.buildIvfSqIndex(emb.filter(col("vec_id") % 5 =!= 0), cents, s"$tmp/surv")
    val delGot = probe(s"$tmp/del")
    assert(delGot == probe(s"$tmp/surv"), "delete must ≡ rebuild on survivors")
    assert(!delGot.map(_._1).contains(0L), "the deleted self-hit must vanish")
    // compact applies tombstones physically: probe unchanged, both
    // sides rewritten, destination starts tombstone-free
    Sq.compactIvfSqIndex(spark, s"$tmp/del", s"$tmp/cmp")
    assert(probe(s"$tmp/cmp") == delGot, "compaction must not move rows")
    assert(!graft.io.Fs.exists(spark, s"$tmp/cmp/codes.tombstones"))
    assert(spark.read.parquet(s"$tmp/cmp/vectors")
      .filter(col("vec_id") % 5 === 0).count() == 0L,
      "compaction must drop tombstoned ids from the vectors side too")
    // retrain ≡ a from-scratch build on the survivors (deterministic
    // trainer), probed with the returned fresh centroids
    val cents2 = Sq.retrainIvfSqIndex(spark, s"$tmp/del", s"$tmp/rt", 10, 2)
    val survivors = emb.filter(col("vec_id") % 5 =!= 0)
    val centsFresh = Ann.kmeansCentroids(survivors, "vec_id", "embedding", 10, 2)
    assert(cents2 == centsFresh, "retrain must learn the from-scratch centroids")
    Sq.buildIvfSqIndex(survivors, centsFresh, s"$tmp/rtFresh")
    def probe2(path: String) =
      Sq.ivfSqIndexTopK(spark, path, q, cents2, 5, 20, 3)
        .select(col("vec_id"), col("sim"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe2(s"$tmp/rt") == probe2(s"$tmp/rtFresh"),
      "retrained index must probe like a fresh build on its contents")
  }

  test("compact destination resets stale sidecars: a reused dst keeps no old order book") {
    import spark.implicits._
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-sq-sidecar").toString
    Sq.buildIvfSqIndex(emb, cents, s"$tmp/src")
    // plant a PREVIOUS generation's residue at the destination: an
    // order book with a high drained-through batch (the round-17
    // hazard — stream batch ids restart at 0, so a stale .resolutions
    // would silently close the new generation's firings in
    // openOrders), plus stale tombstones and batch markers
    Seq(("sq8", "old", "retrain", "assignment_drift", 0L, 9L, 1L, 0.5, 0.01,
        50.0, 0.0, true))
      .toDF("index_kind", "index_name", "action", "signal", "first_batch",
        "last_batch", "n_fired", "last_value", "threshold", "last_severity",
        "value_after", "resolved")
      .write.parquet(s"$tmp/dst.resolutions")
    Seq(Tuple1(0L)).toDF("vec_id").write.parquet(s"$tmp/dst/codes.tombstones")
    graft.io.Fs.createMarker(spark, s"$tmp/dst/_applied_batches", "batch-9")
    Seq(Tuple1(1)).toDF("x").write.parquet(s"$tmp/dst.oplog")
    Sq.compactIvfSqIndex(spark, s"$tmp/src", s"$tmp/dst")
    for (side <- Seq("dst.oplog", "dst.resolutions", "dst/_applied_batches",
        "dst/codes.tombstones"))
      assert(!graft.io.Fs.exists(spark, s"$tmp/$side"),
        s"compact must reset the stale $side sidecar at the destination")
    // and the compacted store still probes: row 0 was NOT deleted by
    // the stale tombstone the reset cleared
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val got = Sq.ivfSqIndexTopK(spark, s"$tmp/dst", q, cents, 5, 20, 3)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(got.contains(0L), "the fresh generation's row 0 must survive")
  }

  test("SQ8-IVF filtered probe: predicate honored, exact-count fallback widens") {
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfsq-f").toString + "/index"
    Sq.buildIvfSqIndex(emb, cents, dir)
    // with every cluster probed and a corpus-sized shortlist the
    // approximate stage is total — filtered probe ≡ exact filtered knn
    val n = emb.count().toInt
    val got = Sq.ivfSqIndexTopKFiltered(spark, dir, q, cents,
        col("vec_id") % 3 =!= 0, 5, n, 10)
      .select(col("vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Search.knn(emb.filter(col("vec_id") % 3 =!= 0), q, 5)
      .select(col("vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"filtered probe $got vs exact $want")
    // a predicate with fewer matches than k inside nprobe=1 probed
    // clusters must widen to the full index: min(k, matches) rows
    val rare = Sq.ivfSqIndexTopKFiltered(spark, dir, q, cents,
        col("vec_id").isin(7L, 13L), 5, 20, 1)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(rare == Set(7L, 13L), s"fallback must find all matches: $rare")
  }

  test("SQ8-IVF maintenance surface: drift identity at record, decay after bad appends, raw-count health, compact carries the model") {
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfsq-maint").toString
    val p = s"$tmp/idx"
    Sq.buildIvfSqIndex(emb, cents, p)
    Sq.recordIvfSqModel(spark, p, cents)
    // drift right after record is the 0 identity: baseline and current
    // are the same aggregate over the same contents
    assert(Sq.ivfSqDrift(spark, p).head().getAs[Double]("drift") == 0.0)
    // out-of-distribution (negated) appends assign badly against the
    // frozen coarse centroids -> mean assigned sim decays -> drift > 0
    Sq.appendToIvfSqIndex(
      emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")), cents, p)
    Sq.deleteFromIvfSqIndex(
      emb.filter(col("vec_id") % 5 === 0).select(col("vec_id")), p)
    val d1 = Sq.ivfSqDrift(spark, p).head().getAs[Double]("drift")
    assert(d1 > 0.0, s"negated appends must register positive drift: $d1")
    // health counts the RAW codes rows (build + appends, deletes not
    // subtracted — exactly the debt compaction clears)
    val n = emb.count()
    val nTomb = emb.filter(col("vec_id") % 5 === 0).count()
    val h = Sq.ivfSqHealth(spark, p).head()
    assert(h.getAs[Long]("n_rows") == n + 50, h.toString)
    assert(h.getAs[Long]("n_tombstones") == nTomb, h.toString)
    // compact: tombstones applied physically, model sidecars carried —
    // the drift baseline survives the rewrite (contents unchanged, so
    // the drift value is preserved up to one round-6 ulp)
    Sq.compactIvfSqIndex(spark, p, s"$tmp/idx2")
    val h2 = Sq.ivfSqHealth(spark, s"$tmp/idx2").head()
    assert(h2.getAs[Long]("n_rows") == n + 50 - nTomb, h2.toString)
    assert(h2.getAs[Long]("n_tombstones") == 0L, h2.toString)
    val d2 = Sq.ivfSqDrift(spark, s"$tmp/idx2").head().getAs[Double]("drift")
    assert(math.abs(d2 - d1) <= 1e-6, s"compact must preserve drift: $d1 -> $d2")
    // retrain re-records: the fresh generation reads drift 0 again
    Sq.retrainIvfSqIndex(spark, p, s"$tmp/idx3", 10, 2)
    assert(Sq.ivfSqDrift(spark, s"$tmp/idx3").head().getAs[Double]("drift") == 0.0)
    assert(Sq.ivfSqHealth(spark, s"$tmp/idx3").head()
      .getAs[Long]("n_tombstones") == 0L)
  }

  test("SQ8-IVF batch probe restricted to one query ≡ single probe") {
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfsq-b").toString + "/index"
    Sq.buildIvfSqIndex(emb, cents, dir)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Sq.ivfSqIndexTopKBatch(spark, dir, qs, cents, 5, 20, 3)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (-t._2, t._1)).toSeq).toMap
    (0L until 3L).foreach { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
      val single = Sq.ivfSqIndexTopK(spark, dir, q, cents, 5, 20, 3)
        .select(col("vec_id"), col("sim"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single, s"qid $qid: batch ${batch(qid)} vs $single")
    }
  }
}
