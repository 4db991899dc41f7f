package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.embed.Featurizer

/** 64-bit SimHash of a string's whitespace tokens, one pass.
  *
  * The portable polynomial token hash ([[Featurizer.tokenHash]], mod
  * 1e9+7) carries only ~30 bits of entropy — a "64-bit" fingerprint
  * built from it alone would have 34 structurally-dead bits and its
  * pigeonhole bands would collapse to the same ≤2^11-value keys as the
  * old 32-bit fingerprint (the round-3 scale defect). So the low 32
  * fingerprint bits derive from that hash and the high 32 bits from a
  * SECOND independent polynomial (seed [[SimHash64.SeedB]], multiplier
  * [[SimHash64.MultB]], mod [[SimHash64.ModB]], also oracle-portable).
  * Both moduli are < 2^30, so fingerprint bits 30, 31, 62, 63 are
  * structurally 0 — 60 live bits, and the value is always non-negative
  * (no BIGINT sign edge in either engine).
  *
  * Semantics ≡ the composed-HOF form (graft.analysis.Dedup.simhash64Hof,
  * asserted in tests): tokens = lowercased space-split non-empties; for
  * bit j, sum ±1 over tokens by bit j of the bit source (j<32: hash A
  * bit j; j≥32: hash B bit j−32); fingerprint bit j set iff the sum is
  * positive. Each token is hashed once (both polynomials in the same
  * char loop) and bumps 64 counters.
  * Per-document evaluation ⇒ CodegenFallback costs nothing measurable.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Long](64)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          // fold CODE POINTS for parity with the HOF spec's ascii()
          var ha = Featurizer.HashSeed
          var hb = SimHash64.SeedB
          var j = start
          while (j < i) {
            val cp = s.codePointAt(j)
            ha = (ha * 31 + cp) % Featurizer.HashMod
            hb = (hb * SimHash64.MultB + cp) % SimHash64.ModB
            j += Character.charCount(cp)
          }
          var b = 0
          while (b < 32) {
            counts(b) += (if (((ha >> b) & 1L) == 1L) 1L else -1L)
            counts(b + 32) += (if (((hb >> b) & 1L) == 1L) 1L else -1L)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Second polynomial (high fingerprint half): independent of the
    * featurizer hash, still < 2^30 so every engine folds it exactly. */
  val SeedB = 13L
  val MultB = 37L
  val ModB = 998244353L

  def apply(text: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(SimHash64(eu.expression(text)))
  }
}
