package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSimilarity, DotProduct, FeaturizeCounts, ImageMeta, PngText, L2Normalize, BloomFilterAgg, BloomMightContain, GunzipText, MinHashSignature, PdfExtract, QuantizeInt8, SimHash64, SortedArrayIntersectCount, SortedJaccard, TokenShingleHashes, VectorAvg}

/** Registers the engine's native expressions as SQL functions, so the
  * full surface is reachable from `spark.sql(...)` as well as the Column
  * API:
  *
  *   spark.sql("SELECT cos_sim(a.embedding, b.embedding) FROM ...")
  *   spark.sql("SELECT minhash_signature(hashes, 32) FROM ...")
  *   spark.sql("SELECT sorted_intersect_count(sa, sb) FROM ...")
  *
  * Use either as an extension (`--conf spark.sql.extensions=graft.GraftExtensions`
  * or `.withExtensions(new GraftExtensions)`) for cluster-wide install,
  * or `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // algebraic rewrite: cosine over normalized inputs → dot product
    // (see plans/NormalizedCosineRewrite.scala)
    e.injectOptimizerRule(_ => graft.plans.NormalizedCosineRewrite)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  private[graft] val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cos_sim",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cos_sim"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("sorted_intersect_count",
      new ExpressionInfo(classOf[SortedArrayIntersectCount].getName, "sorted_intersect_count"),
      (es: Seq[Expression]) => SortedArrayIntersectCount(es(0), es(1))),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (es: Seq[Expression]) => MinHashSignature(es(0), intArg(es(1), "minhash_signature"))),
    ("sorted_jaccard",
      new ExpressionInfo(classOf[SortedJaccard].getName, "sorted_jaccard"),
      (es: Seq[Expression]) => SortedJaccard(es(0), es(1))),
    ("bloom_agg",
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (es: Seq[Expression]) => BloomFilterAgg(es(0),
        intArg(es(1), "bloom_agg"), intArg(es(2), "bloom_agg"))),
    ("kmv_distinct",
      new ExpressionInfo(classOf[graft.functions.KmvSketchAgg].getName, "kmv_distinct"),
      (es: Seq[Expression]) => graft.functions.KmvSketchAgg(es(0),
        intArg(es(1), "kmv_distinct"))),
    ("random_project",
      new ExpressionInfo(classOf[graft.functions.RandomProject].getName, "random_project"),
      (es: Seq[Expression]) => graft.functions.RandomProject(es(0),
        graft.vector.VectorOps.rpSigns(intArg(es(1), "random_project"),
          intArg(es(2), "random_project")))),
    ("hilbert_index",
      new ExpressionInfo(classOf[graft.functions.HilbertIndex].getName, "hilbert_index"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.LongType
        graft.functions.HilbertIndex(Cast(es(0), LongType),
          Cast(es(1), LongType), intArg(es(2), "hilbert_index"))
      }),
    ("zvalue",
      new ExpressionInfo(graft.store.ZOrder.getClass.getName, "zvalue"),
      (es: Seq[Expression]) => {
        // the same sum-of-shifts as ZOrder.zValue, built as raw
        // catalyst nodes (a functions._ Column bridged here stays an
        // unresolved ColumnNode wrapper the analyzer won't touch)
        import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Literal, Multiply, ShiftRight}
        val bits = intArg(es(2), "zvalue")
        require(bits >= 1 && bits <= 31, s"zvalue: 1 <= bits <= 31: $bits")
        (0 until bits).map { b =>
          Add(
            Multiply(BitwiseAnd(ShiftRight(es(0), Literal(b)), Literal(1L)),
              Literal(1L << (2 * b))),
            Multiply(BitwiseAnd(ShiftRight(es(1), Literal(b)), Literal(1L)),
              Literal(1L << (2 * b + 1))))
        }.reduce[Expression]((a, c) => Add(a, c))
      }),
    ("bloom_might_contain",
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (es: Seq[Expression]) => BloomMightContain(es(0), es(1),
        intArg(es(2), "bloom_might_contain"))),
    ("gunzip_text",
      new ExpressionInfo(classOf[GunzipText].getName, "gunzip_text"),
      (es: Seq[Expression]) => GunzipText(es(0))),
    ("pdf_extract",
      new ExpressionInfo(classOf[PdfExtract].getName, "pdf_extract"),
      (es: Seq[Expression]) => PdfExtract(es(0))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    ("vector_avg",
      new ExpressionInfo(classOf[VectorAvg].getName, "vector_avg"),
      (es: Seq[Expression]) => VectorAvg(es(0))),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("l2_normalize",
      new ExpressionInfo(classOf[L2Normalize].getName, "l2_normalize"),
      (es: Seq[Expression]) => L2Normalize(es(0))),
    ("featurize",
      new ExpressionInfo(classOf[FeaturizeCounts].getName, "featurize"),
      (es: Seq[Expression]) => FeaturizeCounts(es(0), intArg(es(1), "featurize"), normalize = true)),
    ("featurize_counts",
      new ExpressionInfo(classOf[FeaturizeCounts].getName, "featurize_counts"),
      (es: Seq[Expression]) => FeaturizeCounts(es(0), intArg(es(1), "featurize_counts"), normalize = false)),
    ("token_shingle_hashes",
      new ExpressionInfo(classOf[TokenShingleHashes].getName, "token_shingle_hashes"),
      (es: Seq[Expression]) => TokenShingleHashes(es(0), intArg(es(1), "token_shingle_hashes"))),
    ("quantize_int8",
      new ExpressionInfo(classOf[QuantizeInt8].getName, "quantize_int8"),
      (es: Seq[Expression]) => QuantizeInt8(es(0))),
    ("image_meta",
      new ExpressionInfo(classOf[ImageMeta].getName, "image_meta"),
      (es: Seq[Expression]) => ImageMeta(es(0))),
    ("png_text",
      new ExpressionInfo(classOf[PngText].getName, "png_text"),
      (es: Seq[Expression]) => PngText(es(0))),
    ("chunk_text",
      new ExpressionInfo(classOf[graft.functions.ChunkText].getName, "chunk_text"),
      (es: Seq[Expression]) => graft.functions.ChunkText(es(0),
        intArg(es(1), "chunk_text"), intArg(es(2), "chunk_text"))),
    ("char_entropy",
      new ExpressionInfo(classOf[graft.functions.CharEntropy].getName, "char_entropy"),
      (es: Seq[Expression]) => graft.functions.CharEntropy(es(0))),
    ("nfc_normalize",
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (es: Seq[Expression]) => graft.functions.NfcNormalize(es(0))))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
