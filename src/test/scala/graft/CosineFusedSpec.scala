package graft

import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** The fused codegen kernel must be bit-identical to the HOF
  * specification on real vectors (both eval and codegen paths). */
class CosineFusedSpec extends SparkSpec {
  import spark.implicits._

  test("fused == HOF bit-for-bit on sf0.001 embeddings cross pairs") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(40)
    val q = e.select(col("embedding").as("qvec")).limit(7)
    val diff = e.crossJoin(q)
      .select(VectorOps.cosine(col("embedding"), col("qvec")).as("fused"),
        VectorOps.cosineHof(col("embedding"), col("qvec")).as("hof"))
      .filter(col("fused") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("fused edge cases: dim mismatch -1, zero vector 0, mixed float/double") {
    val rows = Seq(
      (Seq(1f, 0f), Seq(1.0, 0.0, 0.0)), // mismatch
      (Seq(0f, 0f), Seq(1.0, 2.0)),      // zero norm left
      (Seq(3f, 4f), Seq(4.0, 3.0)))      // mixed types
      .toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(rows(0) == -1.0)
    assert(rows(1) == 0.0)
    assert(math.abs(rows(2) - 0.96) < 1e-12)
  }

  test("null array propagates null") {
    val out = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .head()
    assert(out.isNullAt(0))
  }

  test("null ELEMENT propagates null identically across all three kernels") {
    // one shared semantic (VERDICT r3 #7): cos_sim, dot_product and
    // l2_normalize all yield NULL for a vector with a null slot
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))),
      (Seq[Option[Double]](Some(3.0), Some(4.0)), Seq[Option[Double]](Some(4.0), Some(3.0))))
      .toDF("a", "b")
    val rows = df.select(
        graft.functions.CosineSimilarity(col("a"), col("b")).as("cos"),
        graft.functions.DotProduct(col("a"), col("b")).as("dot"),
        graft.functions.L2Normalize(col("a")).as("norm"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(math.abs(rows(1).getDouble(0) - 0.96) < 1e-12)
    assert(rows(1).getDouble(1) == 24.0)
    assert(!rows(1).isNullAt(2))
  }
}
