package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense random projection (`p_i = Σ_j v_j · s_ij`) as a single native
  * expression over a driver-side ±1 sign matrix — the codegen kernel
  * behind [[graft.vector.VectorOps.randomProject]].
  *
  * The builtin-HOF form (`transform(lit(matrix), row → aggregate(
  * zip_with(vec, row, ·*·), 0, +))`) allocates a zipped struct array
  * per OUTPUT dimension per row and walks `ArrayData` accessors
  * throughout — outDim·inDim virtual reads and outDim temporary arrays
  * per row. Here the matrix rides as one flattened `double[out·in]`
  * reference object (model state, like [[NearestCentroid]]'s
  * centroids), the input vector is copied to a per-task scratch once,
  * and the whole projection is one allocation-free O(out·in) loop
  * inside whole-stage codegen. Accumulation is double, index order —
  * bit-identical to the HOF form (asserted in RandomProjectionSpec)
  * and to the oracle's `list_dot_product`.
  *
  * Null/shape semantics (the vector-kernel convention): null array →
  * NULL, null element → NULL, dimension mismatch with the matrix →
  * NULL (the HOF form degenerates to nulls there too; a silent
  * truncated projection would mis-rank). */
case class RandomProject(child: Expression, signs: Seq[Seq[Double]])
    extends UnaryExpression {

  require(signs.nonEmpty, "at least one output dimension")
  require(signs.map(_.size).distinct.size == 1,
    "all sign rows must share the input dimension")

  private val out = signs.size
  private val in = signs.head.size

  @transient private lazy val mat: Array[Double] = {
    val m = new Array[Double](out * in)
    var i = 0
    while (i < out) {
      var j = 0
      while (j < in) { m(i * in + j) = signs(i)(j); j += 1 }
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_project requires array<float|double> input, got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != in) return null
    val isF = elemIsFloat
    val nn = elemNullable
    val v = new Array[Double](in)
    var j = 0
    while (j < in) {
      if (nn && a.isNullAt(j)) return null
      v(j) = if (isF) a.getFloat(j).toDouble else a.getDouble(j)
      j += 1
    }
    val res = new Array[Double](out)
    var i = 0
    while (i < out) {
      var dot = 0.0
      val off = i * in
      var jj = 0
      while (jj < in) { dot += v(jj) * mat(off + jj); jj += 1 }
      res(i) = dot
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("rpMat", mat, "double[]")
    val scratch = ctx.addMutableState("double[]", "rpScratch",
      v => s"$v = new double[$in];")
    val res = ctx.addMutableState("double[]", "rpRes",
      v => s"$v = new double[$out];")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val jj = ctx.freshName("jj")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      val ok = ctx.freshName("rpOk")
      val getX = if (elemIsFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      // ev.isNull is only declared by nullSafeCodeGen under a nullable
      // child; a non-nullable, non-containsNull input must not mention
      // it (the CosineSimilarity round-9 rule). Mismatch/null-element
      // still must yield NULL, so nullable=true forces isNull to exist:
      // this expression OVERRIDES nullable to true unconditionally.
      val body =
        s"""if ($a.numElements() != $in) {
           |  ${ev.isNull} = true;
           |} else {
           |  boolean $ok = true;
           |  for (int $j = 0; $j < $in; $j++) {
           |    ${if (elemNullable)
                   s"if ($a.isNullAt($j)) { $ok = false; break; }"
                 else ""}
           |    $scratch[$j] = $getX;
           |  }
           |  if (!$ok) {
           |    ${ev.isNull} = true;
           |  } else {
           |    for (int $i = 0; $i < $out; $i++) {
           |      double $dot = 0.0;
           |      final int $off = $i * $in;
           |      for (int $jj = 0; $jj < $in; $jj++) {
           |        $dot += $scratch[$jj] * $matRef[$off + $jj];
           |      }
           |      $res[$i] = $dot;
           |    }
           |    ${ev.value} =
           |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
           |  }
           |}""".stripMargin
      body
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
}

object RandomProject {
  /** Column builder. */
  def apply(vec: org.apache.spark.sql.Column,
            signs: Seq[Seq[Double]]): org.apache.spark.sql.Column = {
    val eu = org.apache.spark.sql.graftbridge.ColumnBridge
    eu.column(RandomProject(eu.expression(vec), signs))
  }
}
