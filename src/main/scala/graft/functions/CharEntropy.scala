package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a string's code-point distribution — the
  * classic cheap quality signal for corpus curation (low entropy =
  * repetitive or degenerate text; the compression-ratio heuristic of
  * CCNet/Gopher approximated without a codec, so the DuckDB oracle can
  * replay it exactly from character counts).
  *
  * One O(len) pass + an O(distinct) fold per row, no shuffle; the fold
  * runs in ASCENDING code-point order so the sum is deterministic
  * run-to-run (cross-engine reduction-order drift is absorbed by the
  * round-6 contract at the query site). Empty string → 0.0; the
  * single-symbol case returns +0.0 (not IEEE −0.0, which would
  * hash-mismatch an oracle computing +0.0). Per-document evaluation ⇒
  * CodegenFallback costs nothing measurable. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy needs a string column, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var total = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      total += 1
      i += Character.charCount(cp)
    }
    var ent = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / total
      ent -= p * math.log(p)
    }
    ent + 0.0 // -0.0 → +0.0 for the single-symbol case
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropy {
  def apply(text: Column): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(CharEntropy(eu.expression(text)))
  }
}
