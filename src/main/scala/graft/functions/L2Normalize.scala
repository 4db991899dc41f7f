package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused L2-normalization kernel: one pass accumulates the squared norm,
  * one pass divides — O(d) per row with a single output allocation.
  *
  * This replaces the composed-HOF normalize (`transform(a, x => x / n)`
  * with `n = sqrt(aggregate(...))`): Catalyst inlines the norm's whole
  * expression tree into the lambda body and does NOT hoist
  * loop-invariant subexpressions out of HOF lambdas, so the HOF form
  * recomputes the norm for EVERY array element — O(d²) per row (the
  * round-2 `knn_top5_normalized` 16× regression).
  *
  * Semantics (parity with the HOF spec, asserted in tests):
  *   - zero vector normalizes to itself (downstream dots then yield 0.0,
  *     the reference's zero-norm edge, `vectorDb.ts:47-49`);
  *   - output is always array<double> (floats widened);
  *   - a null array, or any null element, yields NULL (a partial vector
  *     has no meaningful norm; failing whole beats reading nulls as 0).
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = child.nullable || elemNullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize requires array<float|double> input, got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = elemIsFloat
    val out = new Array[Double](n)
    var sq = 0.0
    var i = 0
    while (i < n) {
      if (elemNullable && a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x
      sq += x * x
      i += 1
    }
    val norm = java.lang.Math.sqrt(sq)
    if (norm != 0.0) {
      i = 0
      while (i < n) { out(i) /= norm; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val sq = ctx.freshName("sq")
      val norm = ctx.freshName("norm")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      // The null-element check is emitted only for containsNull schemas —
      // the common embeddings path (non-null elements) keeps the tight
      // loop. Without it the template must not mention ev.isNull: under
      // a non-nullable child nullSafeCodeGen never declares that name
      // (see [[CosineSimilarity.doGenCode]]).
      val nullCheck =
        if (elemNullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }" else ""
      val finish =
        s"""final double $norm = java.lang.Math.sqrt($sq);
           |if ($norm != 0.0) {
           |  for (int $i = 0; $i < $n; $i++) { $out[$i] /= $norm; }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);""".stripMargin
      val guardedFinish =
        if (elemNullable) s"if (!${ev.isNull}) {\n$finish\n}" else finish
      s"""
         |final int $n = $a.numElements();
         |final double[] $out = new double[$n];
         |double $sq = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  final double $x = $get;
         |  $out[$i] = $x;
         |  $sq += $x * $x;
         |}
         |$guardedFinish
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "l2_normalize"
}

object L2Normalize {
  /** Column builder: `l2_normalize(a)`. */
  def apply(a: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(L2Normalize(eu.expression(a)))
  }
}
