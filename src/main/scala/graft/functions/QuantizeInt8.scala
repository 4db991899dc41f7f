package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization: `q_i = ⌊x_i / (m/127) + ½⌋`
  * with `m = max|x_i|` — the standard scalar-quantization compression
  * for vector search. Output is a true `array<tinyint>`: 8× smaller
  * than the double form and 4× smaller than the float corpus column,
  * which at 100 TB is the difference between an index that fits in
  * cluster RAM and one that doesn't. Cosine on the quantized vectors
  * needs no dequantization — the per-vector scale cancels in the
  * ratio — and integer dot products up to d·127² ≪ 2⁵³ are EXACT in
  * double, so the DuckDB oracle reproduces scores bit-for-bit.
  *
  * Fused two-pass kernel (max pass + quantize pass), O(d) per row with
  * one output allocation; the composed-HOF form would re-evaluate the
  * `array_max` subtree per ELEMENT (Catalyst does not hoist
  * loop-invariant subexpressions out of HOF lambdas — the documented
  * O(d²) trap, see [[L2Normalize]]).
  *
  * Semantics:
  *   - `m = 0` (zero vector) → all-zero output (no division);
  *   - `⌊x + ½⌋` rounds half UP for both signs — exactly DuckDB's
  *     `floor(x/(m/127.0) + 0.5)`, unlike HALF_EVEN/HALF_AWAY library
  *     rounds;
  *   - |q_i| ≤ 127 by construction (x/(m/127) ∈ [-127, 127], and
  *     ⌊-127 + ½⌋ = -127), so the byte cast cannot overflow;
  *   - null array or any null element → NULL (same contract as the
  *     other vector kernels: a partial vector has no meaningful scale).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullable: Boolean = child.nullable || elemNullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 requires array<float|double> input, got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = elemIsFloat
    val xs = new Array[Double](n)
    var m = 0.0
    var i = 0
    while (i < n) {
      if (elemNullable && a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      xs(i) = x
      val ax = java.lang.Math.abs(x)
      if (ax > m) m = ax
      i += 1
    }
    val out = new Array[Byte](n)
    if (m != 0.0) {
      val scale = m / 127.0
      i = 0
      while (i < n) {
        out(i) = java.lang.Math.floor(xs(i) / scale + 0.5).toByte
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val xs = ctx.freshName("xs")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val ax = ctx.freshName("ax")
      val scale = ctx.freshName("scale")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      // Null-element check only for containsNull schemas; without it the
      // template must not mention ev.isNull — under a non-nullable child
      // nullSafeCodeGen never declares that name (see
      // [[CosineSimilarity.doGenCode]]).
      val nullCheck =
        if (elemNullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }" else ""
      val finish =
        s"""final byte[] $out = new byte[$n];
           |if ($m != 0.0) {
           |  final double $scale = $m / 127.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $out[$i] = (byte) java.lang.Math.floor($xs[$i] / $scale + 0.5);
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);""".stripMargin
      val guardedFinish =
        if (elemNullable) s"if (!${ev.isNull}) {\n$finish\n}" else finish
      s"""
         |final int $n = $a.numElements();
         |final double[] $xs = new double[$n];
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  final double $x = $get;
         |  $xs[$i] = $x;
         |  final double $ax = java.lang.Math.abs($x);
         |  if ($ax > $m) { $m = $ax; }
         |}
         |$guardedFinish
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quantize_int8"
}

object QuantizeInt8 {
  /** Column builder: `quantize_int8(a)`. */
  def apply(a: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(QuantizeInt8(eu.expression(a)))
  }
}
