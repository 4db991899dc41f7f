package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.embed.Featurizer

/** Sorted distinct polynomial hashes of all character k-shingles of a
  * string, in one pass.
  *
  * Semantics match the composed-HOF form
  * `sort_array(array_distinct(transform(sequence(0, greatest(len-k, 0)),
  * i -> polyHash(substring(text, i+1, k)))))` (asserted bit-for-bit in
  * tests), with the same hash family as [[Featurizer.tokenHash]]
  * (h = fold(h·31 + charCode) mod 1e9+7, seed 7; BMP/ASCII char codes).
  * Texts shorter than k yield their single truncated shingle's hash.
  *
  * The HOF form allocates a substring + a per-char split array per
  * shingle (~10 allocations per input character); this walks the chars
  * once into a primitive long[], sorts, and dedupes — the document-side
  * cost of n-gram Jaccard and MinHash dedup drops ~6×. CodegenFallback
  * is deliberate: the expression is evaluated once per document row and
  * all time is inside the primitive loop, so generated-code inlining
  * buys nothing.
  */
case class SortedShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  private val p = Featurizer.HashMod

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_shingle_hashes needs string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    // fold CODE POINTS, not UTF-16 units: SQL substring/length/ascii are
    // codepoint-based, so shingle boundaries and hash terms must be too
    // (parity breaks on supplementary-plane chars otherwise)
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n == 0) {
      // HOF-spec parity: split("", "") yields [""] and ascii("") is 0,
      // so the empty string hashes one empty shingle: (seed·31 + 0) mod p
      return new GenericArrayData(Array((Featurizer.HashSeed * 31) % p))
    }
    val count = math.max(n - k, 0) + 1
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = Featurizer.HashSeed
      var j = i
      val end = math.min(i + k, n)
      while (j < end) { h = (h * 31 + cps(j)) % p; j += 1 }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var out = 0
    i = 0
    while (i < count) { // in-place unique over the sorted array
      if (out == 0 || hs(out - 1) != hs(i)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(if (out == count) hs else java.util.Arrays.copyOf(hs, out))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sorted_shingle_hashes"
}

object SortedShingleHashes {
  def apply(text: Column, k: Int): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(SortedShingleHashes(eu.expression(text), k))
  }
}
