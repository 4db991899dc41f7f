package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED, de-duplicated arrays via a single merge pass.
  *
  * `array_intersect` builds a hash set per invocation — O(n) allocations
  * per row pair. When each side is sorted once upstream (`sort_array`
  * over `array_distinct` output), the intersection count is an
  * allocation-free two-pointer merge — the workhorse for exact n-gram
  * Jaccard over blocked pair joins (graft.analysis.Dedup), where the
  * same arrays are compared against many partners.
  *
  * Elements must be non-null and sorted ascending by Spark's ordering
  * (exactly what `sort_array(..., asc=true)` produces). Works for any
  * atomic element type; comparison is `ctx.genComp` in codegen /
  * the interpreted ordering in eval — the same ordering `sort_array`
  * uses, so only element *equality* affects the count.
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b && TypeUtils.typeWithProperEquals(a) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs two arrays of one comparable element type, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0L
    val et = elemType
    while (i < na && j < nb) {
      val cmp = ordering.compare(a.get(i, et), b.get(j, et))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val et = elemType
      val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(et)
      // every local must be freshName'd: the same expression can appear
      // more than once in one generated function (e.g. a predicate using
      // the count in numerator and denominator)
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
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  final $javaType $x = $getA;
         |  final $javaType $y = $getB;
         |  final int $cmp = ${ctx.genComp(et, x, y)};
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedArrayIntersectCount {
  def apply(a: Column, b: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(SortedArrayIntersectCount(eu.expression(a), eu.expression(b)))
  }
}
