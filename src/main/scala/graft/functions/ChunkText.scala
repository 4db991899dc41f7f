package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface form of the sliding-window chunker — a table GENERATOR,
  * so a SQL-only user can run the ingest path end-to-end without the
  * Column API:
  *
  *   SELECT doc_id, c.pos, c.chunk
  *   FROM documents LATERAL VIEW chunk_text(text, 100, 20) c AS pos, chunk
  *
  * Identical semantics to [[graft.text.Chunker.chunk]] (the reference's
  * window loop, `/root/reference/App.tsx:56-61`): 0-based character
  * offsets advancing by `size - overlap`, last chunk may be short,
  * empty/null text emits zero rows. Positions count Unicode code
  * points via `UTF8String.substringSQL`, matching the builtin
  * `substring` the Column-API chunker composes — the Column API form
  * stays the codegen'd builtin pipeline; this Generator exists for the
  * SQL surface. */
case class ChunkText(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(overlap >= 0, s"overlap $overlap must be >= 0")
  require(overlap < size, s"overlap $overlap must be < size $size")
  private val stride = size - overlap

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_text needs a string column, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val u = v.asInstanceOf[UTF8String]
    val len = u.numChars()
    if (len == 0) Nil
    else (0 until len by stride).map(i => InternalRow(i, u.substringSQL(i + 1, size)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "chunk_text"
}
