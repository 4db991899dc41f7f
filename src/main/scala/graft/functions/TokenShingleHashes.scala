package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All n-token shingle hashes of a text, fused into one pass.
  *
  * Semantics match the composed form the contamination oracle mirrors
  * (`Contamination.tokenHashes` + `shinglesOfHashes`, asserted
  * element-for-element in LexicalSpec): lowercase → split on single
  * spaces → drop empties → per-token polynomial hash (fold (h·31 +
  * codepoint) mod 1e9+7, seed 7) → per-shingle fold of the n token
  * hashes with the same polynomial. A text with fewer than n tokens
  * yields its single truncated shingle; an empty token list yields
  * `[seed]` = [7] (the composed form's `aggregate([], 7)` identity).
  *
  * The composed HOF form allocates a split array per token and an
  * interpreted lambda frame per element; this walks the string once and
  * folds in primitive longs. CodegenFallback is deliberate — evaluated
  * once per document row, all time inside the primitive loop (same
  * trade as [[SortedShingleHashes]]).
  */
case class TokenShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  private val M = 1000000007L
  private val Seed = 7L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_shingle_hashes needs string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    // Locale.ROOT + code points: parity with SQL lower()/ord() (the
    // JVM-vs-SQL folding trap — UTF-16-unit folds break on emoji)
    val s = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    // per-token hashes, single walk (split-on-single-space, empties dropped)
    val th = new scala.collection.mutable.ArrayBuffer[Long](64)
    var h = Seed
    var sawChar = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') {
        if (sawChar) th += h
        h = Seed; sawChar = false
      } else {
        h = (h * 31 + cp) % M
        sawChar = true
      }
      i += Character.charCount(cp)
    }
    if (sawChar) th += h
    val t = th.length
    val count = math.max(t - n, 0) + 1
    val out = new Array[Long](count)
    var g = 0
    while (g < count) {
      var gh = Seed
      var j = g
      val end = math.min(g + n, t)
      while (j < end) { gh = (gh * 31 + th(j)) % M; j += 1 }
      out(g) = gh
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_shingle_hashes"
}

object TokenShingleHashes {
  def apply(text: Column, n: Int): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(TokenShingleHashes(eu.expression(text), n))
  }
}
