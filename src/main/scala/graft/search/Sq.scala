package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** SQ8 (int8 scalar-quantized) materialized IVF index — the middle
  * rung of the compression ladder the engine already spans (float →
  * int8 → PQ → binary): 4× smaller scans than the float corpus at far
  * higher fidelity than PQ's 8-bytes-per-vector, which makes it the
  * standard first index choice when RAM allows (FAISS's `IVFx,SQ8`).
  *
  * Layout mirrors [[Pq.buildIvfPqIndex]]: a `codes/` side partitioned
  * by the coarse cluster (probe filters are plan-time partition
  * pruning — non-probed directories never open) holding
  * `array<tinyint>` codes, and a `vectors/` side keyed by id that
  * ONLY the exact-rerank shortlist touches. Scoring needs no
  * dequantization: the per-vector scale cancels in cosine, and
  * quantized integer dot products (≤ d·127² ≪ 2⁵³) are exact in
  * double — both engines rank identically with no rounding exposure
  * (the `knn_int8_recall` contract, indexed).
  *
  * Maintenance composes exactly like the sibling indexes (append =
  * assign-against-frozen-centroids + quantize; delete = id
  * tombstones; compact/retrain = the [[Ann]] patterns on the codes
  * side + an id-keyed rewrite of the vectors side) — the build here
  * resets stale delete state the way every fresh build in the family
  * does.
  */
object Sq {

  /** Materialize the SQ8-IVF index at `path`: quantized codes
    * partitioned by nearest coarse centroid + the float vectors for
    * exact rerank. */
  def buildIvfSqIndex(corpus: DataFrame, cents: Seq[Seq[Double]], path: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    graft.io.Fs.delete(corpus.sparkSession, s"$path/codes.tombstones")
    corpus
      .withColumn("__cluster", Ann.assignCluster(col(vecCol), cents))
      .select(col(idCol), col("__cluster"),
        VectorOps.quantizeInt8(col(vecCol)).as("codes"))
      .repartition(col("__cluster"))
      .write.partitionBy("__cluster").mode("overwrite").parquet(s"$path/codes")
    corpus.select(col(idCol), col(vecCol))
      .repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))
      .write.mode("overwrite").parquet(s"$path/vectors")
  }

  /** Probe the SQ8-IVF index: plan-time partition pruning to the
    * `nprobe` query-nearest clusters (driver-ranked like
    * [[Ann.ivfIndexTopK]]), approximate cosine over the int8 codes
    * against the int8-quantized QUERY (symmetric quantization — one
    * broadcast 1-row frame), a `shortlist`-sized TakeOrdered over
    * code scores, then exact float rerank over ONLY the shortlist
    * (id-keyed semi-join into `vectors/`). Returns `(id, sim)` with
    * the exact round-6 cosine, `(sim DESC, id ASC)`. */
  def ivfSqIndexTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                     query: DataFrame, cents: Seq[Seq[Double]],
                     k: Int, shortlist: Int, nprobe: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must cover k ($k)")
    val qvec = query.select(col("qvec")).head().getSeq[Number](0)
      .map(_.doubleValue()).toSeq
    val probes = Ann.probeIds(cents, qvec, nprobe)
    val qq = query.select(
      transform(VectorOps.quantizeInt8(col("qvec")), _.cast("double"))
        .as("__qq"))
    val short = spark.read.parquet(s"$path/codes")
      .filter(col("__cluster").isin(probes: _*))
      .crossJoin(broadcast(qq))
      .select(col(idCol),
        VectorOps.cosine6(transform(col("codes"), _.cast("double")),
          col("__qq")).as("__asim"))
      .orderBy(col("__asim").desc, col(idCol).asc)
      .limit(shortlist)
    Search.knn(
      spark.read.parquet(s"$path/vectors")
        .join(short.select(col(idCol)), Seq(idCol), "left_semi"),
      query, k, idCol, vecCol)
  }
}
