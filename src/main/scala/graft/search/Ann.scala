package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** Approximate nearest-neighbour search — the scale path past the
  * brute-force scan (`/root/reference/services/vectorDb.ts:16-23` is
  * O(N·d) per query with no index; fine at browser scale, not at 100 TB).
  *
  * Two standard index structures, both built from DataFrame ops:
  *
  *  - IVF (inverted file): corpus clustered by a coarse key (testdata's
  *    `label` stands in for a k-means assignment); search scores the
  *    per-cluster centroids first and scans only the `nprobe` best
  *    clusters. On a real deployment the corpus is PARTITIONED BY the
  *    cluster key, so pruning is partition pruning — scans skip files.
  *
  *  - Random-hyperplane LSH: sign-bit sketch of each vector against
  *    `nbits` seeded hyperplanes; search scans only the query's bucket
  *    (plus Hamming-1 neighbours), then exact-reranks with the fused
  *    cosine kernel.
  *
  * Both are approximations: the exact brute-force `Search.knn` remains
  * the correctness oracle; recall is asserted in tests.
  */
object Ann {

  /** Per-key centroids: posexplode to (key, pos, x), two-phase avg agg,
    * reassemble ordered arrays. One shuffle of (key × dim) rows — tiny
    * versus the corpus; at scale this is the classic map-side-combined
    * centroid build. */
  def centroids(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol).as("key"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("key"), col("pos"))
      .agg(avg(col("x")).as("cx"))
      .groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pcs"))
      .select(col("key"), transform(col("pcs"), p => p.getField("cx")).as("centroid"))

  /** IVF search: probe the `nprobe` most query-similar centroids, then
    * exact top-k over only those clusters' rows. `query` is a 1-row
    * frame with column `qvec`. */
  def ivfTopK(corpus: DataFrame, query: DataFrame, k: Int, nprobe: Int,
              keyCol: String = "label", idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val cents = centroids(corpus, keyCol, vecCol)
    val probes = cents.crossJoin(broadcast(query))
      .withColumn("csim", VectorOps.cosine(col("centroid"), col("qvec")))
      .orderBy(col("csim").desc, col("key").asc)
      .limit(nprobe)
      .select(col("key").as(keyCol))
    // left_semi against the probed keys: with the corpus partitioned by
    // the cluster key this becomes partition pruning, not a join.
    Search.knn(corpus.join(broadcast(probes), Seq(keyCol), "left_semi"), query, k,
      idCol, vecCol)
  }

  /** Deterministic seeded hyperplanes (unit-free; only the sign of the
    * projection matters). */
  def planes(dim: Int, nbits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nbits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector column. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorOps.dot(vec, typedlit(p)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH search: exact rerank inside the query's bucket and all
    * Hamming-1 neighbour buckets (multi-probe — recovers most recall
    * lost to boundary vectors at a (nbits+1)/2^nbits scan fraction). */
  def lshTopK(corpus: DataFrame, query: DataFrame, k: Int,
              planes: Seq[Seq[Double]],
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nbits = planes.size
    val bucketed = corpus.withColumn("bucket", lshBucket(col(vecCol), planes))
    val qb = query.withColumn("qbucket", lshBucket(col("qvec"), planes))
    val probeBuckets = qb.select(
      explode(array(lit(0) +: (0 until nbits).map(i => lit(1 << i)): _*)).as("flip"),
      col("qbucket"))
      .select((col("qbucket").bitwiseXOR(col("flip"))).as("bucket"))
    val candidates = bucketed.join(broadcast(probeBuckets), Seq("bucket"), "left_semi")
    Search.knn(candidates.drop("bucket"), query, k, idCol, vecCol)
  }
}
