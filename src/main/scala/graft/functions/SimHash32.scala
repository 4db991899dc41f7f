package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.embed.Featurizer

/** 32-bit SimHash of a string's whitespace tokens, one pass.
  *
  * Semantics ≡ the composed-HOF form (graft.analysis.Dedup.simhash32Hof,
  * asserted in tests): tokens = lowercased space-split non-empties; for
  * bit j, sum ±1 over tokens by bit j of the portable polynomial token
  * hash; fingerprint bit j set iff the sum is positive. The HOF form
  * evaluates 32 aggregates that each re-derive the token-hash array —
  * O(32·tokens) hashing; this hashes each token once and updates 32
  * counters — O(tokens·32) counter bumps, no allocation.
  * Per-document evaluation ⇒ CodegenFallback costs nothing measurable.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 needs string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Long](32)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          // fold CODE POINTS for parity with the HOF spec's ascii()
          var h = Featurizer.HashSeed
          var j = start
          while (j < i) {
            val cp = s.codePointAt(j)
            h = (h * 31 + cp) % Featurizer.HashMod
            j += Character.charCount(cp)
          }
          var b = 0
          while (b < 32) {
            counts(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  def apply(text: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(SimHash32(eu.expression(text)))
  }
}
