package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment under SQUARED EUCLIDEAN distance (argmin,
  * lowest index on ties) — the sub-quantizer assignment of product
  * quantization (Jégou et al., PAMI 2011). Same plan-size design as the
  * cosine [[NearestCentroid]]: the centroid matrix rides along as one
  * flattened `double[k*d]` reference object (model state, kilobytes),
  * one O(k·d) loop per row inside whole-stage codegen, O(1) plan size
  * in k.
  *
  * Float parity with the DuckDB oracle: the squared distance
  * accumulates `(x_j − c_j)²` left-to-right in index order — exactly a
  * `list_reduce` left fold over the per-dimension terms — and the
  * comparison uses the RAW squared values (no sqrt: monotone but able
  * to collapse adjacent doubles into false ties, which would then
  * tie-break differently cross-engine).
  *
  * Semantics: dimension mismatch → NULL, null element → NULL (the
  * unified vector-kernel null contract). The cosine [[NearestCentroid]]
  * keeps its all-sims-tie-at-−1 → 0 convention for mismatches; HERE a
  * 0 would be indistinguishable from a genuine assignment to cluster 0
  * — in a materialized PQ index a corrupted vector would silently
  * encode as a valid-looking code while the oracle's slice arithmetic
  * NULL-propagates. NULL keeps both engines agreeing and lets the
  * ingest path drop or quarantine bad rows explicitly. */
case class NearestCentroidL2(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "at least one centroid")
  require(cents.map(_.size).distinct.size == 1,
    "all centroids must share one dimension")

  private val k = cents.size
  private val d = cents.head.size

  @transient private lazy val mat: Array[Double] = {
    val m = new Array[Double](k * d)
    var i = 0
    while (i < k) {
      var j = 0
      while (j < d) { m(i * d + j) = cents(i)(j); j += 1 }
      i += 1
    }
    m
  }

  override def dataType: DataType = IntegerType

  // always nullable: a dimension-mismatched vector yields NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_l2 requires array<float|double> input, got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != d) return null
    val isF = elemIsFloat
    val nn = elemNullable
    val v = new Array[Double](d)
    var j = 0
    while (j < d) {
      if (nn && a.isNullAt(j)) return null
      v(j) = if (isF) a.getFloat(j).toDouble else a.getDouble(j)
      j += 1
    }
    var best = Double.PositiveInfinity
    var bestI = 0
    var i = 0
    while (i < k) {
      var dist = 0.0
      val off = i * d
      var jj = 0
      while (jj < d) {
        val diff = v(jj) - mat(off + jj)
        dist += diff * diff
        jj += 1
      }
      if (dist < best) { best = dist; bestI = i }
      i += 1
    }
    bestI
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centMatL2", mat, "double[]")
    val scratch = ctx.addMutableState("double[]", "ncL2Scratch",
      v => s"$v = new double[$d];")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val jj = ctx.freshName("jj")
      val off = ctx.freshName("off")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestI = ctx.freshName("bestI")
      val get = if (elemIsFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      val nullCheck =
        if (elemNullable) s"if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }" else ""
      s"""
         |if ($a.numElements() != $d) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $j = 0; $j < $d; $j++) {
         |    $nullCheck
         |    $scratch[$j] = $get;
         |  }
         |  if (!${ev.isNull}) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestI = 0;
         |    for (int $i = 0; $i < $k; $i++) {
         |      double $dist = 0.0;
         |      final int $off = $i * $d;
         |      for (int $jj = 0; $jj < $d; $jj++) {
         |        final double $diff = $scratch[$jj] - $matRef[$off + $jj];
         |        $dist += $diff * $diff;
         |      }
         |      if ($dist < $best) { $best = $dist; $bestI = $i; }
         |    }
         |    ${ev.value} = $bestI;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid_l2"
}

object NearestCentroidL2 {
  def apply(a: Column, cents: Seq[Seq[Double]]): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(NearestCentroidL2(eu.expression(a), cents))
  }
}
