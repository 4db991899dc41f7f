package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D integer cell — the locality-preserving
  * alternative to the Morton/Z interleave ([[graft.store.ZOrder]]).
  * The Hilbert curve never takes the Z curve's long diagonal jumps:
  * consecutive curve positions are always GRID NEIGHBORS (L1 distance
  * exactly 1), so range-clustering files by the Hilbert value yields
  * tighter per-file bounding boxes than Z on the same grid — the
  * reason Databricks liquid clustering moved from Z to Hilbert. The
  * `hilbert_locality` query measures exactly this on our data: mean
  * L1 jump along curve order, Hilbert vs Z.
  *
  * This is a native codegen expression rather than a Column
  * composition because the per-bit state rotation makes each step's
  * (x, y) depend on the previous step's BOTH outputs — composing
  * Columns would double the expression tree per bit (2^bits terms);
  * the generated loop is O(bits).
  *
  * Algorithm: the classic iterative xy2d walk (Hilbert 1891; the
  * public-domain formulation popularized via Wikipedia's "Hilbert
  * curve" xy2d/rot pseudocode): consume bits high→low, accumulate
  * s²·((3·rx) XOR ry), and rotate/reflect the lower-order subsquare.
  * Integer-only arithmetic, so the cell assignment replays exactly in
  * any engine ([[graft.store.Hilbert.hSqlCte]] generates the DuckDB
  * twin as a per-bit CTE chain — same linear-size trick in SQL).
  *
  * Inputs are masked to the low `bits` bits (values ≥ 2^bits alias,
  * deterministically — the [[graft.store.ZOrder.zValueN]] truncation
  * contract); scale dimensions to comparable grids first, exactly as
  * for Z. Output fits a signed long for bits ≤ 31 (d < 4^bits).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"1 <= bits <= 31, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires (bigint, bigint), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val mask = (1L << bits) - 1L
    var x = l.asInstanceOf[Long] & mask
    var y = r.asInstanceOf[Long] & mask
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      val s = 1L << b
      val rx = (x >> b) & 1L
      val ry = (y >> b) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = mask - x; y = mask - y } // reflect: (2^bits-1)-v
        val t = x; x = y; y = t                      // transpose
      }
      b -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val mask = (1L << bits) - 1L
      s"""
         |long $x = $xa & ${mask}L;
         |long $y = $ya & ${mask}L;
         |long $d = 0L;
         |for (int $b = ${bits - 1}; $b >= 0; $b--) {
         |  long $s = 1L << $b;
         |  long $rx = ($x >> $b) & 1L;
         |  long $ry = ($y >> $b) & 1L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${mask}L - $x; $y = ${mask}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {
  /** Column builder: `hilbert_index(x, y, bits)` — integral inputs are
    * cast to long (the masking contract handles overwide values). */
  def apply(x: Column, y: Column, bits: Int): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(HilbertIndex(
      eu.expression(x.cast("long")), eu.expression(y.cast("long")), bits))
  }
}
