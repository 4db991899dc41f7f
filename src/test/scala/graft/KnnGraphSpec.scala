package graft

import org.apache.spark.sql.functions._

import graft.search.KnnGraph
import graft.vector.VectorOps

/** kNN graph construction: the exact graph against a driver-side
  * brute force (and block-count invariance — the blocked two-phase
  * top-k must not depend on how the corpus is split), the
  * deterministic NN-Descent machinery (ring init shape, full
  * convergence on clustered data, run-to-run determinism), and the
  * recall gate arithmetic. */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  // 40 points in 4 tight clusters on the unit circle — enough metric
  // structure that NN-Descent must fully converge in 3 rounds
  private def clustered = {
    val pts = for {
      c <- 0 until 4
      i <- 0 until 10
    } yield {
      val angle = c * math.Pi / 2 + i * 0.01
      ((c * 10 + i).toLong, Seq(math.cos(angle), math.sin(angle)))
    }
    pts.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
  }

  private def bruteTop(k: Int): Map[Long, Seq[Long]] = {
    val rows = clustered.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    rows.map { case (i, vi) =>
      i -> rows.filter(_._1 != i)
        .map { case (j, vj) =>
          (j, VectorOps.round6(VectorOps.cosineLocal(vi, vj)))
        }
        .sortBy { case (j, s) => (-s, j) }.take(k).map(_._1).toSeq
    }.toMap
  }

  test("exact graph matches driver brute force; self excluded; block-count invariant") {
    val expected = bruteTop(3)
    Seq(1, 7).foreach { blocks =>
      val got = KnnGraph.exact(clustered, 3, blocks = blocks).collect()
        .groupBy(_.getLong(0))
        .map { case (src, rs) =>
          src -> rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
        }
      assert(got == expected, s"blocks=$blocks")
      got.foreach { case (src, dsts) =>
        assert(!dsts.contains(src), "self edge leaked")
      }
    }
  }

  test("NN-Descent fully converges to the exact graph on clustered data") {
    val exact = KnnGraph.exact(clustered, 2)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // workK must be ~cluster size: at workK=4 the deterministic walk
    // can stall in a within-cluster local optimum (observed); at
    // workK=8 each working list spans its whole 10-point cluster
    // after one expansion and the top-2 is exact.
    val approx = KnnGraph.nnDescent(clustered, 2, workK = 8, revCap = 12,
        iters = 4)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == exact, s"missing ${exact -- approx}, extra ${approx -- exact}")
    val recall = KnnGraph.recallVs(
      KnnGraph.exact(clustered, 2),
      KnnGraph.nnDescent(clustered, 2, workK = 8, revCap = 12, iters = 4))
      .head().getDouble(0)
    assert(recall == 1.0)
  }

  test("ring init: run-to-run deterministic, workK edges per node, no self") {
    def run() = KnnGraph.nnDescent(clustered, 2, workK = 4, revCap = 6,
        iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(r => (r._1, r._4)).toSeq
    val a = run(); val b = run()
    assert(a == b, "NN-Descent must be bit-deterministic across runs")
    val perNode = a.groupBy(_._1)
    assert(perNode.size == 40 && perNode.values.forall(_.size == 2))
    a.foreach { case (s, d, _, _) => assert(s != d) }
  }

  test("triangle census on hand graphs") {
    // K4: 6 edges, 4 triangles, 12 wedges, coeff 3*4/12 = 1
    val k4 = (for { a <- 0 to 3; b <- 0 to 3 if a < b }
      yield (a.toLong, b.toLong)).toDF("src", "dst")
    val r1 = KnnGraph.triangleCensus(k4).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getDouble(3)) ==
      ((6L, 4L, 12L, 1.0)))
    // path 0-1-2: 2 edges, no triangle, one wedge at node 1, coeff 0;
    // input has duplicates + reversed orientations + a self-loop to
    // exercise canonicalization
    val path = Seq((0L, 1L), (2L, 1L), (1L, 0L), (0L, 1L), (2L, 2L))
      .toDF("src", "dst")
    val r2 = KnnGraph.triangleCensus(path).head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getDouble(3)) ==
      ((2L, 0L, 1L, 0.0)))
  }

  test("recallVs arithmetic on a hand fixture") {
    val truth = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 4L)).toDF("src", "dst")
    val approx = Seq((1L, 2L), (2L, 4L), (9L, 9L)).toDF("src", "dst")
    val r = KnnGraph.recallVs(truth, approx).head().getDouble(0)
    assert(r == 0.5)
  }

  test("mutualEdges keeps exactly the reciprocated pairs") {
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val got = KnnGraph.mutualEdges(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)))
  }

  test("mutual edges of the clustered graph never cross clusters") {
    val mut = KnnGraph.mutualEdges(KnnGraph.exact(clustered, 3)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(mut.nonEmpty)
    mut.foreach { case (s, d) =>
      assert(s / 10 == d / 10, s"cross-cluster mutual edge ($s,$d)")
    }
  }

  test("beam search on a connected ring graph reaches the true top-k") {
    // 40 points uniformly on the circle: the top-3 graph is a
    // connected ring, so greedy descent from ANY entry walks the arc
    // to the query's neighborhood given enough hops
    val ring = (0 until 40).map { i =>
      val a = i * 2 * math.Pi / 40
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val q = ring.filter(col("vec_id") === 17)
      .select(col("embedding").as("qvec"))
    val got = KnnGraph.beamSearch(KnnGraph.exact(ring, 3), ring, q,
        k = 3, beam = 8, hops = 25)
      .collect().map(_.getLong(0)).toSeq
    // brute truth: 17 itself, then its arc neighbors (16/18 tie -> id)
    val truth = ring.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == truth, s"got $got, want $truth")
  }

  test("medoid entry starts in the dominant cluster; bounded hops converge where the old random entry provably cannot") {
    // Two clusters with NO cross-cluster edges in the k=3 graph:
    // A = ids 10..39 near angle 0 (dominant), B = ids 0..9 near π.
    // id 0 is the global (portableHash, id) minimum — the pre-round-14
    // pseudo-random entry — and it sits in B: a fixed-hop walk from it
    // can NEVER reach A (disconnected), no matter the hop budget. The
    // medoid entry (nearest node to the corpus centroid direction)
    // lands in A because A dominates the centroid, and a small hop
    // budget reaches the true top-k.
    val pts = ((0 until 10).map { i =>
      val a = math.Pi + i * 0.01
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    } ++ (10 until 40).map { i =>
      val a = (i - 10) * 0.01
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val graph = KnnGraph.exact(pts, 3)
    // no cross-cluster edges: B's component is unreachable from A
    graph.collect().foreach { r =>
      val (s, d) = (r.getLong(0), r.getLong(1))
      assert((s < 10) == (d < 10), s"cross-cluster edge ($s,$d)")
    }
    // the old entry rule picks id 0 (min portable hash) — in B
    val oldEntry = pts.select(col("vec_id"))
      .orderBy(KnnGraph.portableHash(col("vec_id")), col("vec_id"))
      .limit(1).collect().head.getLong(0)
    assert(oldEntry == 0L && oldEntry < 10, "fixture: old entry must sit in B")
    // the medoid entry sits in A
    val vecs = pts.select(col("vec_id").as("id"), col("embedding").as("__vec"))
    val entry = KnnGraph.medoidEntry(vecs).collect().head.getLong(0)
    assert(entry >= 10, s"medoid entry $entry must be in the dominant cluster")
    // bounded hops from the medoid reach the exact top-k (the A arc
    // advances ~2 positions per hop; 12 hops cover its 30 nodes from
    // any entry inside A — while NO budget covers a B entry)
    val q = pts.filter(col("vec_id") === 12)
      .select(col("embedding").as("qvec"))
    val got = KnnGraph.beamSearch(graph, pts, q, k = 3, beam = 8, hops = 12)
      .collect().map(_.getLong(0)).toSeq
    val truth = pts.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == truth, s"got $got, want $truth")
  }

  test("layered walk crosses a chain the flat hop budget provably cannot") {
    // 160 points on a smooth arc: the k=3 graph is a CHAIN (each
    // node's neighbors are its angular neighbors), so a flat walk
    // advances ≤ ~2 positions per hop. The query sits at position 0;
    // the medoid entry sits mid-arc (~80); 8 flat hops strand the beam
    // ~65 positions short — no fixed budget scales with the diameter.
    // The 1/8 hash-sample layer (21 nodes, every ~8 positions) strides
    // the same distance in 4 coarse hops, and 4 fine hops then refine
    // to the exact top-3. Same TOTAL budget, opposite outcome.
    val pts = (0 until 160).map { i =>
      val a = (math.Pi / 2) * i / 159.0
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val graph = KnnGraph.exact(pts, 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-layered").toString + "/idx"
    KnnGraph.writeGraphIndex(graph, pts, path)
    KnnGraph.writeGraphLayer(spark, path, sampleEvery = 8, k = 6)
    val q = pts.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val truth = pts.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    val layered = KnnGraph.graphIndexBeamSearchLayered(spark, path, q,
        k = 3, degree = 6, beam = 6, hopsCoarse = 4, hopsFine = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(layered == truth, s"layered $layered must reach the truth $truth")
    // the flat walk with the SAME total hop budget falls short
    val flat = KnnGraph.beamSearch(graph, pts, q, k = 3, beam = 6, hops = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(flat != truth,
      s"fixture must defeat the flat budget, got $flat — tighten the chain")
    // layer coverage health: fresh layer -> nothing missing; appended
    // nodes whose ids hash into the sample rule (6 of ids 1000..1039)
    // are due-but-absent; the relayer remedy restores full coverage
    val h0 = KnnGraph.graphLayerHealth(spark, path).head()
    assert(h0.getAs[Long]("n_missing") == 0L, h0.toString)
    KnnGraph.appendToGraphIndex(
      pts.filter(col("vec_id") < 40)
        .select((col("vec_id") + 1000).as("vec_id"), col("embedding")), path)
    val h1 = KnnGraph.graphLayerHealth(spark, path).head()
    assert(h1.getAs[Long]("n_missing") == 6L, h1.toString)
    assert(h1.getAs[Long]("n_due") == h0.getAs[Long]("n_due") + 6L, h1.toString)
    KnnGraph.writeGraphLayer(spark, path, 8, 6)
    val h2 = KnnGraph.graphLayerHealth(spark, path).head()
    assert(h2.getAs[Long]("n_missing") == 0L &&
      h2.getAs[Long]("n_due") == h1.getAs[Long]("n_due"), h2.toString)
    // a fresh build resets the layer: stale routing cannot survive
    KnnGraph.writeGraphIndex(graph, pts, path)
    intercept[IllegalArgumentException] {
      KnnGraph.graphIndexBeamSearchLayered(spark, path, q, 3, 6)
    }
  }

  test("NN-Descent-built coarse layer: layered walk reaches the truth, conf records the method, relayer preserves it") {
    // same arc chain as the layered-walk test; the 21-node sample is
    // small enough that NN-Descent (workK=20 ≈ n−1) provably converges
    // to the exact layer graph, so the walk's outcome is pinned — the
    // method's value is the COST CLASS (no O((n/rate)²) build at
    // 100 TB), not a different answer here
    val pts = (0 until 160).map { i =>
      val a = (math.Pi / 2) * i / 159.0
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-layered-nnd").toString + "/idx"
    KnnGraph.writeGraphIndex(KnnGraph.exact(pts, 3), pts, path)
    KnnGraph.writeGraphLayer(spark, path, sampleEvery = 8, k = 6,
      method = "nndescent")
    val conf = spark.read.parquet(s"$path.layer1_conf").head()
    assert(conf.getAs[String]("method") == "nndescent", conf.toString)
    val q = pts.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val truth = pts.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    val layered = KnnGraph.graphIndexBeamSearchLayered(spark, path, q,
        k = 3, degree = 6, beam = 6, hopsCoarse = 4, hopsFine = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(layered == truth, s"layered $layered must reach the truth $truth")
    // the relayer rebuild path (the conf round trip the policy remedy
    // takes) keeps the operator's chosen method
    KnnGraph.writeGraphLayer(spark, path,
      conf.getAs[Int]("sample_every"), conf.getAs[Int]("k"),
      method = conf.getAs[String]("method"))
    assert(spark.read.parquet(s"$path.layer1_conf").head()
      .getAs[String]("method") == "nndescent")
    assert(KnnGraph.graphLayerHealth(spark, path).head()
      .getAs[Long]("n_missing") == 0L)
    intercept[IllegalArgumentException] {
      KnnGraph.writeGraphLayer(spark, path, 8, 6, method = "psychic")
    }
  }

  test("two-level layer: nested sample, 3-level walk reaches the truth, level-2 health, rate mismatch fails") {
    // longer arc so the 1/64 level-2 sample is non-degenerate
    val pts = (0 until 640).map { i =>
      val a = (math.Pi / 2) * i / 639.0
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-layer2").toString + "/idx"
    KnnGraph.writeGraphIndex(KnnGraph.exact(pts, 3), pts, path)
    KnnGraph.writeGraphLayer(spark, path, sampleEvery = 8, k = 6)
    KnnGraph.writeGraphLayer2(spark, path, sampleEvery = 8, k = 6)
    // nesting: the level-2 node set is a strict subset of level 1's
    val l1 = spark.read.parquet(s"$path.layer1").select(col("src")).distinct()
    val l2 = spark.read.parquet(s"$path.layer2").select(col("src")).distinct()
    assert(l2.join(l1, Seq("src"), "left_anti").count() == 0L,
      "layer2 nodes must nest inside layer1")
    assert(l2.count() > 1 && l2.count() < l1.count())
    val q = pts.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val truth = pts.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    val walked = KnnGraph.graphIndexBeamSearchLayered2(spark, path, q,
        k = 3, degree = 6, beam = 6, hopsCoarse = 2, hopsMid = 3,
        hopsFine = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(walked == truth, s"3-level walk $walked must reach $truth")
    // level-2 health: fresh layer covered; appends accumulate due
    // nodes under the r² rule exactly as level 1 does under r
    assert(KnnGraph.graphLayerHealth(spark, path, level = 2).head()
      .getAs[Long]("n_missing") == 0L)
    KnnGraph.appendToGraphIndex(
      pts.filter(col("vec_id") < 200)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")), path)
    val h2 = KnnGraph.graphLayerHealth(spark, path, level = 2).head()
    assert(h2.getAs[Long]("sample_every") == 64L, h2.toString)
    assert(h2.getAs[Long]("n_missing") ==
      h2.getAs[Long]("n_due") - h2.getAs[Long]("n_in_layer"), h2.toString)
    KnnGraph.writeGraphLayer2(spark, path, 8, 6)
    assert(KnnGraph.graphLayerHealth(spark, path, level = 2).head()
      .getAs[Long]("n_missing") == 0L, "relayer restores level-2 coverage")
    // a mismatched rate breaks the nesting argument and must refuse
    intercept[IllegalArgumentException] {
      KnnGraph.writeGraphLayer2(spark, path, sampleEvery = 4, k = 6)
    }
    // the 100 TB configuration at the upper rung: NN-Descent builds
    // level 2, the conf records the method (so a relayer2 remedy
    // rebuilds the way the operator chose), and the 3-level walk still
    // reaches the truth — now over the APPENDED corpus (the +10000
    // rows duplicate vecs 0..199, so the true top-3 gained vec 10000)
    KnnGraph.writeGraphLayer2(spark, path, sampleEvery = 8, k = 6,
      method = "nndescent")
    assert(spark.read.parquet(s"$path.layer2_conf").head()
      .getAs[String]("method") == "nndescent")
    val pts2 = pts.unionAll(pts.filter(col("vec_id") < 200)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val truth2 = pts2.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    val walkedNnd = KnnGraph.graphIndexBeamSearchLayered2(spark, path, q,
        k = 3, degree = 6, beam = 6, hopsCoarse = 2, hopsMid = 3,
        hopsFine = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(walkedNnd == truth2,
      s"nnd-layer2 walk $walkedNnd must reach $truth2")
  }

  test("filtered beam search: routes through excluded nodes, answers only allowed ones") {
    // ring of 40 points; allow only even ids. The true filtered top-3
    // around the query (node 17's vector) are even nodes 18, 16, 20 —
    // reachable only by routing THROUGH odd nodes.
    val ring = (0 until 40).map { i =>
      val a = i * 2 * math.Pi / 40
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val q = ring.filter(col("vec_id") === 17)
      .select(col("embedding").as("qvec"))
    val allowed = ring.filter(col("vec_id") % 2 === 0).select(col("vec_id"))
    val got = KnnGraph.beamSearchFiltered(KnnGraph.exact(ring, 3), ring, q,
        allowed, k = 3, beam = 8, hops = 25)
      .collect().map(_.getLong(0)).toSeq
    val truth = ring.join(allowed, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == truth, s"got $got, want $truth")
    got.foreach(id => assert(id % 2 == 0, "answer leaked an excluded node"))
  }

  test("index-served filtered beam search ≡ the in-memory walk; tombstoned nodes vanish from routing and answers") {
    val ring = (0 until 40).map { i =>
      val a = i * 2 * math.Pi / 40
      (i.toLong, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val q = ring.filter(col("vec_id") === 17)
      .select(col("embedding").as("qvec"))
    val allowed = ring.filter(col("vec_id") % 2 === 0).select(col("vec_id"))
    val graph = KnnGraph.exact(ring, 3)
    val root = java.nio.file.Files.createTempDirectory("graft-knng-bsf").toString
    val path = s"$root/index"
    KnnGraph.writeGraphIndex(graph, ring, path, buckets = 4)
    // serving parity: the walk through the store must land exactly
    // where the in-memory walk does (same entry rule, same hops)
    val inMem = KnnGraph.beamSearchFiltered(graph, ring, q, allowed,
        k = 3, beam = 8, hops = 25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val served = KnnGraph.graphIndexBeamSearchFiltered(spark, path, q,
        allowed, k = 3, degree = 3, beam = 8, hops = 25, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == inMem, s"served $served, in-memory $inMem")
    // tombstone the best answer: it must vanish from the served
    // answer set (and from routing) without touching the layout
    val best = served.head._1
    KnnGraph.deleteFromGraphIndex(Seq(best).toDF("vec_id"), path)
    val afterDel = KnnGraph.graphIndexBeamSearchFiltered(spark, path, q,
        allowed, k = 3, degree = 3, beam = 8, hops = 25, buckets = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(!afterDel.contains(best), s"tombstoned $best still served: $afterDel")
    assert(afterDel.nonEmpty && afterDel.forall(_ % 2 == 0))
  }

  test("graph index: append+probe equals rebuild; compact shrinks the overlay, probes unchanged; probe prunes files") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val base = clustered.filter(col("vec_id") < 30)
    val delta = clustered.filter(col("vec_id") >= 30)
    val root = java.nio.file.Files.createTempDirectory("graft-knng").toString
    val path = s"$root/index"
    KnnGraph.writeGraphIndex(KnnGraph.exact(base, 3), base, path, buckets = 4)
    KnnGraph.appendToGraphIndex(delta, path, buckets = 4)
    val probeIds = (0L until 5L) ++ (30L until 35L)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val probed = KnnGraph.graphIndexTopK(spark, path, probeIds, 3, buckets = 4)
    val rebuilt = KnnGraph.exact(clustered, 3)
      .filter(col("src").isin(probeIds: _*))
    assert(norm(probed) == norm(rebuilt))
    // plan-time pruning: the probe must not open every bucket's files
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    probed.collect()
    val scan = scans(probed.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("graft-knng")))
      .getOrElse(fail("no parquet scan over the graph index"))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val totalFiles = walk(new java.io.File(path))
      .count(_.getName.endsWith(".parquet"))
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles > 0 && numFiles < totalFiles,
      s"expected bucket pruning: read $numFiles of $totalFiles files")
    // compact: probes unchanged, overlay candidates dropped
    val compacted = s"$root/compacted"
    KnnGraph.compactGraphIndex(spark, path, compacted, 3, buckets = 4)
    assert(norm(KnnGraph.graphIndexTopK(spark, compacted, probeIds, 3,
      buckets = 4)) == norm(probed))
    val before = spark.read.parquet(path).count()
    val after = spark.read.parquet(compacted).count()
    assert(after == 40 * 3 && before > after,
      s"compact must shrink to n*k edges: $before -> $after")
  }

  test("graph index delete+repair: probe ≡ rebuild over survivors; compact applies tombstones physically") {
    val root = java.nio.file.Files.createTempDirectory("graft-knng-del").toString
    val path = s"$root/index"
    KnnGraph.writeGraphIndex(KnnGraph.exact(clustered, 3), clustered, path,
      buckets = 4)
    // delete two nodes: one that IS a stored neighbor of others (11)
    // and one isolated-ish (38)
    KnnGraph.deleteFromGraphIndex(
      clustered.filter(col("vec_id").isin(11L, 38L)), path)
    KnnGraph.repairGraphIndex(spark, path, buckets = 4)
    val survivors = clustered.filter(!col("vec_id").isin(11L, 38L))
    val probeIds = (0L until 40L)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val probed = norm(KnnGraph.graphIndexTopK(spark, path, probeIds, 3,
      buckets = 4))
    val rebuilt = norm(KnnGraph.exact(survivors, 3))
    assert(probed == rebuilt)
    probed.foreach { case (s, d, _, _) =>
      assert(s != 11L && s != 38L && d != 11L && d != 38L)
    }
    // compact: physical apply — no deleted node in any row, sidecar
    // gone from the ranking path, probes unchanged
    val compacted = s"$root/compacted"
    KnnGraph.compactGraphIndex(spark, path, compacted, 3, buckets = 4)
    assert(norm(KnnGraph.graphIndexTopK(spark, compacted, probeIds, 3,
      buckets = 4)) == probed)
    val raw = spark.read.parquet(compacted)
    assert(raw.filter(col("src").isin(11L, 38L) ||
      col("dst").isin(11L, 38L)).count() == 0)
    assert(spark.read.parquet(s"$compacted.nodes")
      .filter(col("id").isin(11L, 38L)).count() == 0)
  }

  test("compact destination resets stale sidecars, including a stale coarse layer") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-knng-sc").toString
    val (src, dst) = (s"$root/src", s"$root/dst")
    KnnGraph.writeGraphIndex(KnnGraph.exact(clustered, 3), clustered, src,
      buckets = 4)
    // plant a PREVIOUS generation's residue at dst: a coarse layer the
    // layered walk would route through silently (round-17 advice: the
    // compact deliberately does not derive a layer — a stale one must
    // not stand in), tombstones, and an order book
    KnnGraph.writeGraphIndex(KnnGraph.exact(clustered, 3), clustered, dst,
      buckets = 4)
    KnnGraph.writeGraphLayer(spark, dst, sampleEvery = 3, k = 2, buckets = 4)
    Seq(Tuple1(0L)).toDF("vec_id").write.parquet(s"$dst.tombstones")
    Seq(Tuple1(1)).toDF("x").write.parquet(s"$dst.oplog")
    Seq(Tuple1(1)).toDF("x").write.parquet(s"$dst.resolutions")
    KnnGraph.compactGraphIndex(spark, src, dst, 3, buckets = 4)
    for (side <- Seq(".tombstones", ".oplog", ".resolutions",
        ".layer1", ".layer1_conf", ".layer2", ".layer2_conf"))
      assert(!graft.io.Fs.exists(spark, s"$dst$side"),
        s"compact must reset the stale $side sidecar at the destination")
    // the layered search now fails loudly instead of routing through
    // the stale layer
    val q = clustered.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    intercept[IllegalArgumentException] {
      KnnGraph.graphIndexBeamSearchLayered(spark, dst, q, 3, 3, buckets = 4)
    }
  }

  test("appendToGraph equals the brute-force rebuild over the union") {
    val base = clustered.filter(col("vec_id") < 30)
    val delta = clustered.filter(col("vec_id") >= 30)
    val incremental = KnnGraph.appendToGraph(
        KnnGraph.exact(base, 3), base, delta, 3)
      .select(col("src"), col("dst"), col("sim"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val rebuilt = KnnGraph.exact(clustered, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(incremental == rebuilt)
  }
}
