package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.embed.Featurizer

/** MinHash signature of a set of element hashes, in one fused pass.
  *
  * For permutation i (0 until numHashes): `min((h·(2i+1) + b_i) mod p)`
  * over the input hashes, with `b_i = 7919·(i+1) mod p`, p = 1e9+7 —
  * the same family the DuckDB oracle replicates. Output is a fixed
  * `array<long>` of length `numHashes`; an EMPTY input yields null
  * (a doc with no shingles has no signature).
  *
  * Versus exploding hashes to rows and running numHashes min-aggregates,
  * this computes the whole signature inside the scan's codegen stage —
  * no explode, no shuffle, no aggregation state; the only shuffle left
  * in LSH dedup is the band join itself.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val p = Featurizer.HashMod

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs array<bigint>, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) null
    else {
      val sig = new Array[Long](numHashes)
      java.util.Arrays.fill(sig, Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var s = 0
        while (s < numHashes) {
          val v = (h * (2L * s + 1) + 7919L * (s + 1) % p) % p
          if (v < sig(s)) sig(s) = v
          s += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $sig = new long[$numHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $a.getLong($i);
         |    for (int $s = 0; $s < $numHashes; $s++) {
         |      final long $v = ($h * (2L * $s + 1) + 7919L * ($s + 1) % ${p}L) % ${p}L;
         |      if ($v < $sig[$s]) $sig[$s] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  def apply(hashes: Column, numHashes: Int): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(MinHashSignature(eu.expression(hashes), numHashes))
  }
}
