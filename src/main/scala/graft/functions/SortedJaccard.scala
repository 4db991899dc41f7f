package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Jaccard similarity |A∩B| / |A∪B| of two SORTED, de-duplicated
  * arrays, in one merge pass: `c / (|A| + |B| - c)`.
  *
  * Built for blocked near-dup pair joins: Catalyst pushes the
  * jaccard-threshold filter into the join condition, and an expression
  * composed of two `sorted_intersect_count` references runs the merge
  * twice per candidate pair there. This fused form runs it once.
  * Both inputs empty → 0.0 (no shingles, nothing shared).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b && TypeUtils.typeWithProperEquals(a) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard needs two arrays of one comparable element type, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    if (na + nb == 0) 0.0
    else {
      var i = 0; var j = 0; var c = 0L
      val et = elemType
      while (i < na && j < nb) {
        val cmp = ordering.compare(a.get(i, et), b.get(j, et))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      c.toDouble / (na.toLong + nb - c).toDouble
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val et = elemType
      val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(et)
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val cmp = ctx.freshName("cmp")
      val getA = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.getValue(a, et, i)
      val getB = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.getValue(b, et, j)
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |if ($na + $nb == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  int $i = 0; int $j = 0; long $c = 0L;
         |  while ($i < $na && $j < $nb) {
         |    final $javaType $x = $getA;
         |    final $javaType $y = $getB;
         |    final int $cmp = ${ctx.genComp(et, x, y)};
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; } else { $j++; }
         |  }
         |  ${ev.value} = (double) $c / (double) ((long) $na + (long) $nb - $c);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_jaccard"
}

object SortedJaccard {
  def apply(a: Column, b: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(SortedJaccard(eu.expression(a), eu.expression(b)))
  }
}
