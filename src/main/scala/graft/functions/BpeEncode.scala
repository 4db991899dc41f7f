package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a TRAINED byte-pair-encoding merge table to a single word —
  * the per-document ingest-time half of the tokenizer whose training
  * half is [[graft.text.Bpe.merges]] (Sennrich et al. 2016). Training
  * runs once per corpus; THIS runs on every word of every document
  * forever after, so it is a native expression, not a k-deep lambda
  * chain: the composed form ([[graft.text.Bpe.applyMerge]] folded once
  * per merge) duplicates a lambda body per merge step and hits the
  * plan-size/codegen ceiling long before a real vocabulary (k in the
  * tens of thousands); here the merge table rides as two flattened
  * String[] reference objects (model state — the
  * [[RandomProject]]/[[NearestCentroid]] precedent) and the whole
  * encode is one JVM loop, O(k · |word|) worst case with an early skip
  * per merge.
  *
  * Semantics per merge, EXACTLY [[graft.text.Bpe.applyMerge]]'s greedy
  * single left-to-right scan (spec-pinned in BpeSpec, replayed by the
  * DuckDB `list_reduce` fold in the oracle): walk the word's symbols
  * in order; when the output's last symbol is `l` and the next input
  * symbol is `r`, coalesce them to `lr` — the just-merged token CAN
  * seed the next coalesce within the same scan only if `lr` equals the
  * merge's own `l` (impossible: `r` is non-empty), which is how
  * self-overlapping runs resolve (`aaaa` + (a,a) → `aa aa`). Merges
  * apply in rank order. Initial symbols are code points.
  *
  * Null semantics: null word → NULL. Empty word → empty array.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "merge sides must be non-empty")

  @transient private lazy val lhs: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rhs: Array[String] = merges.map(_._2).toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string word, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], lhs, rhs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLhs", lhs, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bpeRhs", rhs, "java.lang.String[]")
    // one static call carrying the reference objects: the string walk
    // stays a JVM method (no codegen win to be had inlining it), the
    // expression stays inside whole-stage codegen
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncode.encode($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** The JVM kernel codegen calls into. */
  def encode(word: UTF8String, lhs: Array[String], rhs: Array[String]): ArrayData = {
    // initial symbols: one per code point (Java regex `(.)` and RE2 `.`
    // both split at code points — surrogate pairs stay one symbol)
    val s = word.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(s.substring(i, i + n))
      i += n
    }
    var m = 0
    while (m < lhs.length) {
      val l = lhs(m)
      val r = rhs(m)
      // greedy left-to-right single scan (see class doc); skip the
      // rewrite entirely when the word no longer contains `l`
      var contains = false
      var j = 0
      while (!contains && j < syms.size()) {
        if (syms.get(j) == l) contains = true
        j += 1
      }
      if (contains) {
        val out = new java.util.ArrayList[String](syms.size())
        var p = 0
        while (p < syms.size()) {
          val x = syms.get(p)
          if (!out.isEmpty && out.get(out.size() - 1) == l && x == r)
            out.set(out.size() - 1, l + r)
          else out.add(x)
          p += 1
        }
        syms = out
      }
      m += 1
    }
    val res = new Array[Any](syms.size())
    var q = 0
    while (q < syms.size()) { res(q) = UTF8String.fromString(syms.get(q)); q += 1 }
    new GenericArrayData(res)
  }

  /** Column builder. */
  def apply(word: org.apache.spark.sql.Column,
            merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(BpeEncode(eu.expression(word), merges))
  }
}
