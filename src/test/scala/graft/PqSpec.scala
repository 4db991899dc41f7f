package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.search.Pq
import graft.functions.NearestCentroidL2

/** Pins for product quantization: the L2 assignment kernel, codebook
  * training determinism, code shape, and ADC scoring sanity. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("NearestCentroidL2: argmin, lowest index on ties, edge semantics") {
    val cents = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))
    val df = Seq(
      (1L, Some(Seq(Some(0.9f), Some(0.9f)))),   // nearer (1,1) → 1
      (2L, Some(Seq(Some(0.5f), Some(0.5f)))),   // exact tie → 0
      (3L, Some(Seq(Some(0.1f), None))),         // null element → NULL
      (4L, Some(Seq(Some(1.0f), Some(2.0f), Some(3.0f)))), // dim mismatch → NULL
      (5L, None: Option[Seq[Option[Float]]]))    // null array → NULL
      .toDF("id", "v")
    val out = df.select(col("id"), NearestCentroidL2(col("v"), cents).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out(1L).contains(1))
    assert(out(2L).contains(0))
    assert(out(3L).isEmpty)
    // a corrupted (wrong-dimension) vector must NOT encode as a
    // valid-looking code 0 — it is NULL, like the null-element case
    assert(out(4L).isEmpty)
    assert(out(5L).isEmpty)
  }

  // tiny deterministic corpus: two well-separated groups per half-space
  private def corpus = (0L until 12L).map { i =>
    val hi = if (i % 2 == 0) 10.0f else -10.0f
    (i, Seq(hi, hi, hi + i * 0.01f, hi,
            -hi, -hi, -hi, -hi + i * 0.01f))
  }.toDF("vec_id", "embedding")

  test("OPQ rotation: orthogonal (norms + cosines preserved), deterministic, actually moves coordinates") {
    import org.apache.spark.sql.functions._
    val vecs = Seq(
      (1L, Seq.tabulate(64)(i => (i % 7 - 3).toDouble)),
      (2L, Seq.tabulate(64)(i => math.sin(i.toDouble))),
      (3L, Seq.tabulate(64)(i => if (i == 0) 5.0 else 0.0))
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val (v1, v2) = graft.search.Pq.rotationVectors(64)
    val rot = vecs.select(col("vec_id"),
      graft.search.Pq.rotate(col("embedding"), v1, v2).as("rvec"))
    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rotated = rot.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def norm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b))
    raw.keys.foreach { id =>
      assert(math.abs(norm(rotated(id)) - norm(raw(id))) < 1e-4,
        s"norm not preserved for $id")
      // and the rotation is not a no-op
      assert(raw(id).zip(rotated(id)).exists { case (a, b) => math.abs(a - b) > 0.1 },
        s"rotation left $id in place")
    }
    assert(math.abs(cos(rotated(1L), rotated(2L)) - cos(raw(1L), raw(2L))) < 1e-5)
    // bit-determinism across invocations
    val again = vecs.select(col("vec_id"),
      graft.search.Pq.rotate(col("embedding"), v1, v2).as("rvec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == rotated)
  }

  test("train: shapes, determinism, and encode code range") {
    val cb1 = Pq.train(corpus, "vec_id", "embedding", 8, 2, 4, 2)
    val cb2 = Pq.train(corpus, "vec_id", "embedding", 8, 2, 4, 2)
    assert(cb1.m == 2 && cb1.ksub == 4 && cb1.sub == 4)
    assert(cb1 == cb2, "training must be deterministic run-to-run")
    val codes = corpus.select(Pq.encodeCol(col("embedding"), cb1).as("c"))
    // containsNull stays true: a null vector element yields a null code
    assert(codes.schema("c").dataType.asInstanceOf[ArrayType].elementType == ByteType)
    val vals = codes.collect().flatMap(_.getSeq[Byte](0))
    assert(vals.forall(c => c >= 0 && c < 4))
  }

  test("ADC shortlist + exact rerank returns the exact scan's answer") {
    val cb = Pq.train(corpus, "vec_id", "embedding", 8, 2, 4, 2)
    val q = corpus.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val exact = graft.search.Search
      .knn(corpus, q, 3, idCol = "vec_id").select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    val rr = Pq.adcTopKReranked(corpus, q, 3, 8, cb)
      .collect().map(_.getLong(0)).toSeq
    assert(rr == exact, s"rerank $rr != exact $exact")
  }

  test("IVF-PQ composition prunes then still returns the exact answer") {
    val cb = Pq.train(corpus, "vec_id", "embedding", 8, 2, 4, 2)
    val q = corpus.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val exact = graft.search.Search
      .knn(corpus, q, 3, idCol = "vec_id").select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    val got = Pq.ivfPqTopK(corpus, q, 3, nprobe = 1, numClusters = 2,
        ivfIters = 2, shortlist = 6, cb)
      .collect().map(_.getLong(0)).toSeq
    // with 2 clusters on an antipodal corpus, probing 1 cluster still
    // contains the query's whole neighborhood
    assert(got == exact, s"ivfpq $got != exact $exact")
  }

  test("materialized IVF-PQ index: code files prune, rerank stays exact") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val cents = graft.search.Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val cb = Pq.train(emb, "vec_id", "embedding", 64, 8, 64, 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString + "/index"
    Pq.buildIvfPqIndex(emb, cents, cb, dir)
    val res = Pq.ivfPqIndexTopK(spark, dir, q, cents, cb, 5,
      nprobe = 3, shortlist = 50)
    val got = res.collect().map(_.getLong(0)).toSet
    val exact = graft.search.Search.knn(emb, q, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((got & exact).size >= 4, s"recall too low: $got vs $exact")
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    // the codes scan must open only probed clusters' files (the
    // shortlist half runs eagerly inside ivfPqIndexTopK, so assert on
    // the exposed shortlist frame)
    val short = Pq.ivfPqIndexShortlist(spark, dir, q, cents, cb,
      nprobe = 3, shortlist = 50)
    short.collect()
    val codesScan = scans(short.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("index/codes")))
      .getOrElse(fail("no parquet scan over the codes table found"))
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
    // and the codes scan reads NO float vector column
    assert(!codesScan.schema.fieldNames.contains("embedding"),
      "query path must not read float vectors before the rerank")
    // the rerank reads vectors through a PUSHED id filter (row-group
    // min/max pruning on the sorted layout), not a full-table scan
    val vecScan = scans(res.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("index/vectors")))
      .getOrElse(fail("no parquet scan over the vectors table found"))
    assert(vecScan.metadata.get("PushedFilters").exists(_.contains("In(vec_id")),
      s"shortlist must push down as an In filter: ${vecScan.metadata.get("PushedFilters")}")
  }

  test("incremental IVF-PQ append ≡ rebuild, and batch index probe matches in-memory batch") {
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = graft.search.Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val cb = Pq.train(emb, "vec_id", "embedding", 64, 8, 64, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    val incDir = tmp + "/incremental"
    val fullDir = tmp + "/rebuilt"
    Pq.buildIvfPqIndex(emb.filter(col("vec_id") < 400), cents, cb, incDir)
    Pq.appendToIvfPqIndex(emb.filter(col("vec_id") >= 400), cents, cb, incDir)
    Pq.buildIvfPqIndex(emb, cents, cb, fullDir)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val inc = Pq.ivfPqIndexTopK(spark, incDir, q, cents, cb, 5, nprobe = 3, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Pq.ivfPqIndexTopK(spark, fullDir, q, cents, cb, 5, nprobe = 3, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inc == full, s"append-then-probe $inc != rebuild-then-probe $full")
    // the batch index probe (probes as a join + union-of-probes IN
    // filter) returns exactly the in-memory batch result on the
    // appended index
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaIndex = Pq.ivfPqIndexTopKBatch(spark, incDir, qs, cents, cb,
        5, nprobe = 3, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val inMem = Pq.ivfPqTopKBatch(emb, qs, 5, nprobe = 3, cents, shortlist = 50, cb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(viaIndex == inMem, "materialized batch probe must match the in-memory batch")
    // vectors-side compaction: one id-ordered rewrite (fewer files, no
    // overlapping id ranges) with identical probe results
    val compDir = tmp + "/compacted"
    Pq.compactIvfPqVectors(spark, incDir, compDir, recordsPerFile = 1000)
    def vecFiles(p: String) = {
      val d = new java.io.File(s"$p/vectors")
      d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(vecFiles(compDir) < vecFiles(incDir),
      s"compaction must merge the per-append files: ${vecFiles(compDir)} vs ${vecFiles(incDir)}")
    // codes stay where they were; probe against compacted vectors
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$incDir/codes"), new java.io.File(s"$compDir/codes"))
    val comp = Pq.ivfPqIndexTopK(spark, compDir, q, cents, cb, 5, nprobe = 3, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(comp == inc, "compaction must not change probe results")
  }

  test("IVF-PQ retrain from survivors ≡ fresh build (both models re-fit)") {
    import spark.implicits._
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-rt").toString
    val build = emb.filter(col("vec_id") < 300)
    val cents0 = graft.search.Ann.kmeansCentroids(build, "vec_id", "embedding", 8, 2)
    val cb0 = Pq.train(build, "vec_id", "embedding", 64, 8, 32, 2)
    val src = tmp + "/src"
    Pq.buildIvfPqIndex(build, cents0, cb0, src)
    Pq.appendToIvfPqIndex(emb.filter(col("vec_id") >= 300), cents0, cb0, src)
    // delete a few rows (one from the build set, one appended) —
    // retrain must train on SURVIVORS only
    Pq.deleteFromIvfPqIndex(Seq(100L, 350L).toDF("vec_id"), src)
    val dst = tmp + "/dst"
    val (cents1, cb1) = Pq.retrainIvfPqIndex(spark, src, dst, 8, 2, 64, 8, 32, 2)
    val survivors = emb.filter(!col("vec_id").isin(100L, 350L))
    val centsFresh = graft.search.Ann.kmeansCentroids(survivors, "vec_id", "embedding", 8, 2)
    val cbFresh = Pq.train(survivors, "vec_id", "embedding", 64, 8, 32, 2)
    assert(cents1 == centsFresh && cb1 == cbFresh,
      "deterministic trainers: retrain == fresh train on the survivors")
    val fresh = tmp + "/fresh"
    Pq.buildIvfPqIndex(survivors, centsFresh, cbFresh, fresh)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    def top(p: String, cs: Seq[Seq[Double]], b: Pq.Codebooks) =
      Pq.ivfPqIndexTopK(spark, p, q, cs, b, 5, nprobe = 3, shortlist = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(dst, cents1, cb1) == top(fresh, centsFresh, cbFresh),
      "retrained index must answer exactly like a fresh build on the survivors")
    // deleted ids can no longer surface (fresh build has no tombstones)
    assert(top(dst, cents1, cb1).forall(r => r._1 != 100L && r._1 != 350L))
  }

  test("filtered IVF-PQ probe: predicate before shortlist; exact when everything probed") {
    import spark.implicits._
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = graft.search.Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val cb = Pq.train(emb, "vec_id", "embedding", 64, 8, 64, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-filt").toString
    val idx = tmp + "/idx"
    Pq.buildIvfPqIndex(emb, cents, cb, idx)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    // every result satisfies the predicate
    val got = Pq.ivfPqIndexTopKFiltered(spark, idx, q, cents, cb,
        col("vec_id") % 3 =!= 0, 5, nprobe = 3, shortlist = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(got.size == 5 && got.forall(_ % 3 != 0), s"got $got")
    // with ALL clusters probed and a corpus-sized shortlist the filtered
    // probe degenerates to the exact filtered scan — rerank is exact
    val allProbed = Pq.ivfPqIndexTopKFiltered(spark, idx, q, cents, cb,
        col("vec_id") % 3 =!= 0, 5, nprobe = 10, shortlist = 1000)
      .collect().map(_.getLong(0)).toSeq
    val exact = graft.search.Search.knn(
        emb.filter(col("vec_id") % 3 =!= 0), q, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(allProbed == exact, s"$allProbed vs exact $exact")
    // fallback: only 3 matching rows exist corpus-wide, nprobe=1 — the
    // widened (still filtered) scan must surface all of them
    val ids = Seq(7L, 11L, 13L)
    val rare = Pq.ivfPqIndexTopKFiltered(spark, idx, q, cents, cb,
        col("vec_id").isin(ids: _*), 5, nprobe = 1, shortlist = 50)
      .collect().map(_.getLong(0)).toSet
    assert(rare == ids.toSet, s"fallback must widen corpus-wide, got $rare")
  }

  test("batch filtered IVF-PQ ≡ per-query filtered probes; short qids fall back corpus-wide") {
    import spark.implicits._
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = graft.search.Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val cb = Pq.train(emb, "vec_id", "embedding", 64, 8, 64, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-fb").toString
    val idx = tmp + "/idx"
    Pq.buildIvfPqIndex(emb, cents, cb, idx)
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pred = col("vec_id") % 3 =!= 0
    val batch = Pq.ivfPqIndexTopKFilteredBatch(spark, idx, qs, cents, cb,
        pred, 5, nprobe = 3, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    (0L until 4L).foreach { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
      val single = Pq.ivfPqIndexTopKFiltered(spark, idx, q, cents, cb,
          pred, 5, nprobe = 3, shortlist = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(batch(qid) == single, s"qid $qid: batch ${batch(qid)} vs single $single")
    }
    // a predicate with only 3 matches corpus-wide forces EVERY qid
    // through the fallback: each must still surface all 3
    val ids = Seq(7L, 11L, 13L)
    val rare = Pq.ivfPqIndexTopKFilteredBatch(spark, idx, qs, cents, cb,
        col("vec_id").isin(ids: _*), 5, nprobe = 1, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 4L).foreach(qid =>
      assert(rare(qid) == ids.toSet, s"qid $qid fallback got ${rare.get(qid)}"))
  }

  test("IVF-PQ range search ≡ brute-force threshold filter at every tau; stale certs fail loudly") {
    import spark.implicits._
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = graft.search.Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val cb = Pq.train(emb, "vec_id", "embedding", 64, 8, 64, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-range").toString
    val idx = tmp + "/idx"
    Pq.buildIvfPqIndex(emb.filter(col("vec_id") < 400), cents, cb, idx)
    // a probe before any record fails loudly — no stats to consult
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    intercept[Exception] { Pq.ivfPqRangeSearch(spark, idx, q, 0.25, cb).collect() }
    Pq.recordIvfPqRangeStats(spark, idx, cb)
    // an append DELETES the certificate: fail loudly until re-record
    Pq.appendToIvfPqIndex(emb.filter(col("vec_id") >= 400), cents, cb, idx)
    intercept[Exception] { Pq.ivfPqRangeSearch(spark, idx, q, 0.25, cb).collect() }
    Pq.recordIvfPqRangeStats(spark, idx, cb)
    def brute(tau: Double): Set[(Long, Double)] =
      emb.crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(graft.vector.VectorOps.cosine(col("embedding"), col("qvec")), 6).as("sim"))
        .filter(col("sim") >= tau)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    Seq(0.1, 0.25, 0.5, 0.99).foreach { tau =>
      val got = Pq.ivfPqRangeSearch(spark, idx, q, tau, cb)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == brute(tau), s"tau=$tau: IVF-PQ range must be exact")
    }
  }

  test("IVF-PQ range search: ADC bound pre-filters codes without losing answers on tight clusters") {
    import spark.implicits._
    // two tight antipodal clusters: the off cluster certifies out AND
    // the in-cluster ADC bound (near-zero qerr on near-duplicate rows)
    // discards the query-aligned cluster's far members by codes alone
    val dim = 8
    def v(sign: Double, eps: Double): Seq[Float] =
      Seq.tabulate(dim)(i => ((if (i == 0) 1.0 else eps * (i % 3)) * sign).toFloat)
    val rows = (0L until 20L).map(i => (i, v(1.0, 0.001 * (i % 2)))) ++
      (20L until 40L).map(i => (i, v(-1.0, 0.001 * (i % 2))))
    val tight = rows.toDF("vec_id", "embedding")
    val cents = graft.search.Ann.kmeansCentroids(tight, "vec_id", "embedding", 2, 3)
    val cb = Pq.train(tight, "vec_id", "embedding", dim, 2, 4, 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-rp").toString
    val idx = tmp + "/idx"
    Pq.buildIvfPqIndex(tight, cents, cb, idx)
    Pq.recordIvfPqRangeStats(spark, idx, cb)
    val q = tight.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val qvec = q.head().getSeq[Number](0).map(_.doubleValue()).toSeq
    assert(graft.search.Ann.rangeProbeClusters(spark, s"$idx/codes", qvec, 0.9).size == 1,
      "the antipodal cluster must be certified out")
    val got = Pq.ivfPqRangeSearch(spark, idx, q, 0.9, cb)
      .collect().map(_.getLong(0)).toSet
    val brute = tight.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.vector.VectorOps.cosine(col("embedding"), col("qvec")), 6).as("sim"))
      .filter(col("sim") >= 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute && got.nonEmpty && got.subsetOf((0L until 20L).toSet))
  }

  test("reconstruction drift: zero at build, moves after a stale append, zero after retrain") {
    import spark.implicits._
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = graft.search.Ann.kmeansCentroids(emb, "vec_id", "embedding", 8, 1)
    val cb = Pq.train(emb.filter(col("vec_id") < 300), "vec_id", "embedding", 64, 8, 16, 1)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-qd").toString
    val idx = tmp + "/idx"
    Pq.buildIvfPqIndex(emb.filter(col("vec_id") < 300), cents, cb, idx)
    Pq.recordIvfPqModel(spark, idx, cb)
    def drift(p: String, b: Pq.Codebooks): (Double, Double, Double) = {
      val r = Pq.reconstructionDrift(spark, p, b).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val atBuild = drift(idx, cb)
    assert(atBuild._3 == 0.0 && atBuild._1 == atBuild._2,
      s"baseline == current at record time: $atBuild")
    // append rows the codebooks never saw: the mean error MOVES
    Pq.appendToIvfPqIndex(emb.filter(col("vec_id") >= 300), cents, cb, idx)
    val after = drift(idx, cb)
    assert(after._1 == atBuild._1, "the recorded baseline must not change")
    assert(after._3 != 0.0 && after._3 ==
      BigDecimal(after._2 - after._1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble ||
      math.abs(after._3 - (after._2 - after._1)) < 2e-6,
      s"drift must be round6(current - build): $after")
    // a retrain re-fits the codebooks on the survivors and a fresh
    // record resets the drift to zero
    val dst = tmp + "/retrained"
    val (cents2, cb2) = Pq.retrainIvfPqIndex(spark, idx, dst, 8, 1, 64, 8, 16, 1)
    Pq.recordIvfPqModel(spark, dst, cb2)
    assert(drift(dst, cb2)._3 == 0.0)
  }

  test("ADC top-k ranks the true neighbors of the query first") {
    val cb = Pq.train(corpus, "vec_id", "embedding", 8, 2, 4, 2)
    val q = corpus.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val top = Pq.adcTopK(corpus, q, 6, cb).collect().map(_.getLong(0)).toSet
    // the 6 even ids share the query's orientation; the odd ids are
    // antipodal — ADC must keep the two groups apart
    assert(top == (0L until 12L by 2).toSet, s"got $top")
  }

  test("residual IVFADC with one codeword per residual reconstructs exactly ≡ knn") {
    import graft.search.{Ann, Search}
    // ksub = corpus size → every residual is its own codeword → the
    // reconstruction mu + r̂ equals x exactly and residual-ADC cosine
    // IS the exact cosine: top-k must equal the brute-force scan
    val cents = Ann.kmeansCentroids(corpus, "vec_id", "embedding", 2, 2)
    val cb = Pq.trainResidual(corpus, "vec_id", "embedding", cents, 8, 2, 12, 2)
    val q = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding").as("qvec"))
    val got = Pq.ivfPqResidualTopK(corpus, q, 5, nprobe = 2, cents, cb)
      .collect().map(_.getLong(0)).toSeq
    val exact = Search.knn(corpus, q, 5).collect().map(_.getLong(0)).toSeq
    assert(got == exact, s"got $got vs exact $exact")
  }

  test("residual codebooks reconstruct no worse than whole-vector PQ on the corpus") {
    import graft.search.Ann
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", 10, 2)
    val cbP = Pq.train(emb, "vec_id", "embedding", 64, 8, 64, 2)
    val cbR = Pq.trainResidual(emb, "vec_id", "embedding", cents, 64, 8, 64, 2)
    val plain = emb.select(Pq.reconErrorCol(col("embedding"), cbP).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
    val resid = emb.select(Pq.reconErrorCol(
        Pq.residualCol(col("embedding"), cents), cbR).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
    assert(resid < plain,
      s"residual encoding must be finer: resid $resid !< plain $plain")
  }

  test("PCA rotation parity: pcaRotationVectors matches the oracle's SQL-derived pv1/pv2") {
    // The round-14 red query: the Spark side ran 6 power iterations
    // while the oracle's rotation CTEs read the iteration-3 directions
    // — valid SQL, silently wrong rotation. This pins the DRIVER chain
    // (aniso scaling → Spectral 6 iters → pcaRotationVectors) against
    // the SQL derivation's output on the sf0.001 fixture (literals
    // generated once from the oracle CTE chain cut at pv1/pv2). A
    // depth or formula divergence on either side shifts these by
    // ~1e-2..1e-4; tolerance 1e-12 allows only last-ulp float noise.
    val pv1 = Seq(0.658047833841971, 0.01991792911030551, -0.12610336829676555,
      -0.06440557391276994, -0.09500058838493419, -0.09547000979470453,
      -0.09659022642232408, -0.09515108568570006, -0.09495958770939389,
      -0.09574702669832999, -0.09712622012416214, -0.09393362615101432,
      -0.09355184526196314, -0.09635302336773487, -0.09637722074421044,
      -0.09439269708875371, -0.09717402783705728, -0.09650399032232491,
      -0.0949793882040395, -0.0962030343837477, -0.09616631530515578,
      -0.0942475979781319, -0.09377630491658376, -0.09634533718333026,
      -0.09447245997937104, -0.09668725868950133, -0.09452303277973914,
      -0.09518223490938621, -0.09515826374537038, -0.0957418874388633,
      -0.09315953661252507, -0.09693019175702682, -0.09394863788135574,
      -0.09688324796798939, -0.09492420047160412, -0.09589076653427173,
      -0.09519152954408351, -0.09405997737103139, -0.09631736347149754,
      -0.09497209796872383, -0.09731018947639676, -0.09667237159396543,
      -0.0977907373968664, -0.09631566870151767, -0.094590727669685,
      -0.09425898310905817, -0.09529506465971993, -0.09677025016107603,
      -0.0970276789591727, -0.09419610074519182, -0.09582000246329728,
      -0.09538642691901701, -0.09533214335111269, -0.09548494707990243,
      -0.09456114127087568, -0.09403328801869175, -0.09643489759079917,
      -0.09627535825044332, -0.09383828768942963, -0.09589574604283395,
      -0.09397328805034576, -0.09566436313572103, -0.09367187054596637,
      -0.09531028918449728)
    val pv2 = Seq(-0.0710900384915497, 0.7154140533206262, 0.16343649392888632,
      0.06272429194219395, -0.0987609097163243, 0.0704728447739686,
      -0.10048353119432378, 0.07139674817319544, -0.10224234717684852,
      0.07189402598040277, -0.10099756851261095, 0.07069701887108645,
      -0.10132990078074458, 0.07185030744182777, -0.10156543089483597,
      0.07121450000858041, -0.10140929988452013, 0.07136404898536126,
      -0.09928984592930336, 0.07055454450025953, -0.09981711675972413,
      0.0729793162779084, -0.10024507063450455, 0.07216697557899074,
      -0.09842711197734615, 0.07035826050104806, -0.0980512097760803,
      0.07045778333839349, -0.10138005742216992, 0.07084898830604655,
      -0.09940640430894682, 0.07005257283765709, -0.09885596873296096,
      0.0705172644133785, -0.09990754091770251, 0.06978354438429274,
      -0.10151553349286616, 0.07180513408435049, -0.10038682944291849,
      0.06884427348764831, -0.10014191155651352, 0.06956297083169272,
      -0.09940001861224575, 0.07290278300145696, -0.09948193200544715,
      0.07022221563879487, -0.1016775268003933, 0.07114468054860061,
      -0.10046708515127802, 0.07305232944240006, -0.09924990762760624,
      0.07068297560243146, -0.10110417433075315, 0.0717287841783286,
      -0.09974737099206998, 0.07158074085771435, -0.10026511042989182,
      0.07148854240686585, -0.10037723708328701, 0.07210071718464742,
      -0.09921017230928, 0.07058606564145299, -0.09848110708152501,
      0.07087947355608337)
    val aniso = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") * when(i === 0, lit(8.0)).when(i === 1, lit(7.0))
            .when(i === 2, lit(6.0)).when(i === 3, lit(5.0))
            .otherwise(lit(0.25))).as("wvec"))
    val u1 = graft.analysis.Spectral.topDirection(aniso, "wvec", 64, 6)
    val u2 = graft.analysis.Spectral.secondDirection(aniso, "wvec", 64, 6, u1)
    val (v1, v2) = Pq.pcaRotationVectors(u1, u2)
    def maxDiff(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    assert(maxDiff(v1, pv1) < 1e-12, s"v1 off by ${maxDiff(v1, pv1)}")
    assert(maxDiff(v2, pv2) < 1e-12, s"v2 off by ${maxDiff(v2, pv2)}")
  }
}
