package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.embed.Featurizer

/** Hashing-trick term-frequency featurizer as a native Catalyst
  * expression — the deterministic, zero-egress substitution for the
  * reference's remote embedding call
  * (`/root/reference/services/geminiService.ts:27-77`).
  *
  * Semantics are exactly [[Featurizer.featurizeCountsText]] /
  * [[Featurizer.featurizeText]] (lowercase, split on single spaces,
  * portable polynomial hash mod `dim`, optional L2 normalization;
  * empty/whitespace text → zero vector) — asserted against those JVM
  * forms in FeaturizerSpec.
  *
  * Versus the Scala UDF this replaces: the UDF forces a
  * catalyst→Scala-String→catalyst round trip plus a
  * `GenericInternalRow` allocation per row and blocks expression-level
  * null short-circuiting. Here the fused O(tokens + dim) loop runs on
  * the UTF8String's code points directly and whole-stage codegen calls
  * it as one static-shaped method — the projection stays inside the
  * generated stage (no `BatchEvalPython`/`ScalaUDF` plan node on the
  * ingest hot path).
  */
case class FeaturizeCounts(child: Expression, dim: Int, normalize: Boolean)
    extends UnaryExpression {

  require(dim >= 1, s"featurize dim must be >= 1, got $dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"featurize needs string, got ${other.catalogString}")
  }

  /** One fused pass: hash each space-delimited token over Unicode code
    * points (parity with SQL `lower`/`ord`) into `dim` buckets. */
  def kernel(input: UTF8String): ArrayData = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT)
    val v = new Array[Double](dim)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1 // skip delimiters
      if (i < n) {
        var h = Featurizer.HashSeed
        while (i < n && s.charAt(i) != ' ') {
          val cp = s.codePointAt(i)
          h = (h * 31 + cp) % Featurizer.HashMod
          i += Character.charCount(cp)
        }
        v((h % dim).toInt) += 1.0
      }
    }
    if (normalize) {
      var ss = 0.0
      var j = 0
      while (j < dim) { ss += v(j) * v(j); j += 1 }
      if (ss != 0.0) {
        val norm = java.lang.Math.sqrt(ss)
        j = 0
        while (j < dim) { v(j) /= norm; j += 1 }
      }
    }
    new GenericArrayData(v)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featurizeExpr", this, classOf[FeaturizeCounts].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.kernel($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = if (normalize) "featurize" else "featurize_counts"
}

object FeaturizeCounts {
  def apply(text: Column, dim: Int, normalize: Boolean): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(FeaturizeCounts(eu.expression(text), dim, normalize))
  }
}
