package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.vector.VectorOps

/** Pins for the fused int8 quantization kernel against its HOF
  * executable spec and the documented edge semantics. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(1.0f, -2.0f, 0.5f, 4.0f),     // m=4: q = 32, -63, 16, 127
                                             // (-63.5 + .5 floors to -63: half-UP)
    2L -> Seq(0.0f, 0.0f, 0.0f, 0.0f),      // zero vector → all zeros
    3L -> Seq(-3.0f, 3.0f, 1.5f, -1.5f),    // symmetric: ±127, ±64
    4L -> Seq(1e-30f, -1e-30f, 1e-30f, 1e-30f), // tiny but nonzero scale
    5L -> Seq(-5.0f, 0.1f, 0.2f, 0.3f))     // max on the negative side

  test("fused kernel == HOF executable spec, and values are hand-checked") {
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"),
        VectorOps.quantizeInt8(col("v")).as("fused"),
        VectorOps.quantizeInt8Hof(col("v")).as("hof"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1), r.getSeq[Byte](2)))
    got.foreach { case (id, fused, hof) =>
      assert(fused == hof, s"fused != hof for id=$id")
      assert(fused.forall(q => q >= -127 && q <= 127), s"byte range for id=$id")
    }
    val byId = got.map(g => g._1 -> g._2).toMap
    assert(byId(1L) == Seq[Byte](32, -63, 16, 127))
    assert(byId(2L) == Seq[Byte](0, 0, 0, 0))
    assert(byId(3L) == Seq[Byte](-127, 127, 64, -63))
    // max element always maps to ±127 (scale anchor)
    assert(byId(5L).head == -127)
  }

  test("output is a true array<tinyint> (the 4x storage claim)") {
    val dt = vecs.toDF("id", "v")
      .select(VectorOps.quantizeInt8(col("v")).as("q")).schema("q").dataType
    assert(dt == ArrayType(ByteType, containsNull = false))
  }

  test("null array and null element yield NULL") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), None))),
      (2L, None: Option[Seq[Option[Float]]]))
      .toDF("id", "v")
    val out = df.select(col("id"), VectorOps.quantizeInt8(col("v")).as("q"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toMap
    assert(out(1L) && out(2L))
  }

  test("sql surface: quantize_int8 is registered") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT quantize_int8(array(1.0D, -2.0D)) AS q")
      .collect().head.getSeq[Byte](0)
    assert(r == Seq[Byte](64, -127))
  }

  test("cosine over quantized vectors tracks the float cosine") {
    // quantization error is bounded; on smooth vectors recall survives.
    // cos(q(a), q(b)) must be within 0.02 of cos(a, b) for these pairs.
    val a = Seq(0.9f, -0.4f, 0.25f, 0.7f)
    val b = Seq(0.8f, -0.5f, 0.30f, 0.6f)
    val df = Seq((a, b)).toDF("a", "b")
    val Array(exact, quant) = df.select(
        VectorOps.cosine(col("a"), col("b")),
        VectorOps.cosine(
          transform(VectorOps.quantizeInt8(col("a")), _.cast("double")),
          transform(VectorOps.quantizeInt8(col("b")), _.cast("double"))))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(exact - quant) < 0.02, s"exact=$exact quant=$quant")
  }
}
