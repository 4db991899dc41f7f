package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Engine-portable KMV (k-minimum-values / bottom-k) distinct-count
  * sketch — the cross-engine-deterministic alternative to HLL.
  *
  * Spark's `approx_count_distinct` (HyperLogLog++) produces an
  * implementation-defined estimate: another engine computing "the same"
  * sketch gets a different number, so the result can only ever be
  * rows-only-checked. KMV fixes that. Map every key through the
  * engine's portable polynomial hash
  * `h(x) = (((x mod p)+p) mod p · a + b) mod p`, p = 1e9+7 (the
  * MinHash/Bloom seed family, [[BloomFilter.position]] precedent), and
  * keep the k SMALLEST DISTINCT hash values. "k smallest distinct
  * values of a set" is a pure set property — invariant to row order,
  * partitioning, and merge order — and the hash is integer arithmetic
  * any engine reproduces exactly, so the ESTIMATE (not just the
  * cardinality being estimated) replays bit-for-bit in SQL:
  * `SELECT DISTINCT hash ORDER BY hash LIMIT k` + the same formula.
  *
  * Estimator (Bar-Yossef et al. 2002; Beyer et al. 2007 unbiased
  * form): the k-th smallest of D uniform draws on [0,p) sits near
  * k·p/D, so D̂ = (k−1)·p / h_(k). Relative error ≈ 1/√(k−2) — k=1024
  * gives ~3%. If fewer than k distinct hashes exist the sketch holds
  * ALL of them and reports its exact size.
  *
  * Scale shape: O(k) state per group (8k bytes at k=1024) regardless
  * of row count, map-side partial+final combined, merge = set union
  * capped at k — associative, commutative, order-free.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    asSet: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16, s"k >= 16 for a usable estimate: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (asSet) ArrayType(LongType, containsNull = false) else DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs an integral key, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val key = v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    add(buffer, KmvSketch.hash(key))
    buffer
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next().longValue())
    b1
  }

  /** Insert a hash, keeping only the k smallest distinct values. Skip
    * early when the sketch is full and the hash can't make the cut —
    * the common case on a big scan, O(1) amortized. */
  private def add(buffer: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buffer.size() >= k) {
      if (h >= buffer.last().longValue()) return
      buffer.add(h)
      if (buffer.size() > k) buffer.pollLast()
    } else buffer.add(h)
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    if (asSet) {
      // the sketch CONTENTS, ascending (TreeSet order) — for set
      // operations between sketches, where the estimator needs the
      // hash values themselves, not just the k-th one
      val arr = new Array[Long](buffer.size())
      val it = buffer.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
    } else if (buffer.size() < k) buffer.size().toDouble
    else (k - 1).toDouble * KmvSketch.P / buffer.last().doubleValue()

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < bytes.length / 8) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_distinct"
}

object KmvSketch {
  val P: Double = 1000000007.0

  /** The portable polynomial hash: xxhash-prime multiplier over the
    * Mersenne-ish modulus the whole engine shares. (p−1)·a < 2^63, so
    * BIGINT arithmetic replays it in any SQL engine. */
  def hash(key: Long): Long = {
    val p = 1000000007L
    ((((key % p) + p) % p) * 2654435761L + 7919L) % p
  }

  /** SQL fragment computing [[hash]] over `col` — the DuckDB-replayable
    * form, kept next to the Scala so the two can't drift. */
  def hashSql(col: String): String =
    s"((($col % 1000000007) + 1000000007) % 1000000007 * 2654435761 + 7919) % 1000000007"

  def distinctEstimate(key: Column, k: Int): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(KmvSketchAgg(eu.expression(key), k).toAggregateExpression())
  }

  /** The bottom-k sketch itself as a sorted `array<long>` — the
    * mergeable summary [[graft.analysis.SketchSetOps]] combines for
    * union/intersection/Jaccard estimates between slices. */
  def sketchSet(key: Column, k: Int): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(KmvSketchAgg(eu.expression(key), k, asSet = true).toAggregateExpression())
  }
}
