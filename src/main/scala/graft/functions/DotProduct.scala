package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused dot-product kernel — the score function for a PRE-NORMALIZED
  * corpus, where `dot(a/|a|, b/|b|) == cosine(a, b)` at a third of the
  * multiply-adds and no sqrt per row. This is the scale optimization
  * the reference misses: `/root/reference/services/vectorDb.ts:38-44`
  * recomputes both magnitudes for every row of every query.
  *
  * Edge semantics are aligned with [[CosineSimilarity]] so it is a
  * drop-in for normalized data: dimension mismatch → -1.0 (a zero
  * vector L2-normalizes to itself, so its dot is 0.0 — the same value
  * cosine defines). Accepts float/double arrays in any mix; a null
  * ELEMENT yields NULL — the single null semantic shared by all three
  * vector kernels ([[CosineSimilarity]], [[L2Normalize]]); the check
  * is emitted only for `containsNull` schemas. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) -1.0
    else {
      val (af, bf) = (elemIsFloat(left), elemIsFloat(right))
      val (an, bn) = (elemNullable(left), elemNullable(right))
      var dot = 0.0
      var i = 0
      while (i < n) {
        if ((an && a.isNullAt(i)) || (bn && b.isNullAt(i))) return null
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // null-element checks emitted only for containsNull schemas (the
      // nullable override guarantees ev.isNull is a real variable then).
      // With NO containsNull side the template must not mention
      // ev.isNull: under non-nullable children nullSafeCodeGen never
      // declares that name (see [[CosineSimilarity.doGenCode]]).
      val anyElemNullable = elemNullable(left) || elemNullable(right)
      val nullCheck = (
        (if (elemNullable(left)) Seq(s"$a.isNullAt($i)") else Nil) ++
        (if (elemNullable(right)) Seq(s"$b.isNullAt($i)") else Nil)) match {
        case Nil => ""
        case cs => s"if (${cs.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      }
      val finish = s"${ev.value} = $dot;"
      val guardedFinish =
        if (anyElemNullable) s"if (!${ev.isNull}) { $finish }" else finish
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.value} = -1.0;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $dot += ($getA) * ($getB);
         |  }
         |  $guardedFinish
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column builder: `dot_product(a, b)`. */
  def apply(a: Column, b: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(DotProduct(eu.expression(a), eu.expression(b)))
  }
}
