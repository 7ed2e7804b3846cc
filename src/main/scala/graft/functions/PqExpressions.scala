package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encoder.
  *
  * The composed form — per subspace, `transform` over a codebook-sized
  * struct-array literal scoring every centroid, then `array_sort` to
  * pick the argmin ([[graft.ops.Similarity]]'s `nearestCell`) — is fine
  * for IVF's 16 centroids, but PQ evaluates it numSubspaces ×
  * codebookSize times per row, and higher-order functions are
  * `CodegenFallback`: at the 8 × 256 defaults that is ~2k interpreted
  * struct allocations plus a 256-element sort per subspace per row,
  * repeated over every Lloyd assignment pass AND the final encode —
  * measured 18.7 s for `q_pq_topk` on the sf0.1 sweep, the slowest
  * query in the engine. This kernel runs the identical argmin
  * arithmetic as one tight codegen'd loop: per subspace, `d = -2·(v_m ·
  * c) + |c|²` per centroid (the same constant-per-row reduction of the
  * squared distance, same left-fold dot order), strict-min compare with
  * ties to the lower cell index and NaN ranked greatest
  * (`Double.compare` — the ordering `array_sort` applies), no
  * allocation beyond the output codes array.
  *
  * Null semantics (simpler than the composed form's accidental HOF
  * null plumbing, documented deviation): NULL input vector, a length ≠
  * dim, or a NULL element all yield NULL codes — a silently wrong
  * argmin from reading a null slot as 0.0 would corrupt the codebook
  * assignment. The Lloyd trainer and encoder guard the same way.
  *
  * Codebooks ride in the expression (model state, M × codebookSize ×
  * subDim doubles — a few hundred KB at most, same class as IVF's
  * centroid literal); `|c|²` per cell is precomputed once per executor
  * with the same fold order the composed form uses per row, so values
  * are bit-identical. */
case class PqEncodeCodes(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty),
    "pq_encode: every subspace needs at least one centroid")
  private val subDim: Int = books.head.head.length
  require(subDim >= 1 && books.forall(_.forall(_.length == subDim)),
    "pq_encode: all centroids must share one subspace width")
  private val numSubspaces: Int = books.length
  private val dim: Int = numSubspaces * subDim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires an array<double> input, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  // flat (subspace, cell, component)-major centroid components, per-
  // subspace cell counts/offsets, and per-cell |c|² (left-fold order,
  // the composed form's dot(c, c)); lazy per executor, never mutated
  @transient private lazy val cellCounts: Array[Int] = books.map(_.length).toArray
  @transient private lazy val cellOffsets: Array[Int] =
    cellCounts.scanLeft(0)(_ + _).init
  @transient private lazy val flat: Array[Double] =
    books.flatMap(_.flatMap(_.iterator)).toArray
  @transient private lazy val cc: Array[Double] = {
    val out = new Array[Double](cellCounts.sum)
    var cell = 0
    var base = 0
    while (cell < out.length) {
      var s = 0.0
      var i = 0
      while (i < subDim) { s += flat(base + i) * flat(base + i); i += 1 }
      out(cell) = s
      cell += 1
      base += subDim
    }
    out
  }

  @transient private lazy val mayHaveNullElements: Boolean =
    child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }

  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() != dim) return null
    if (mayHaveNullElements) {
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) return null
        i += 1
      }
    }
    val codes = new Array[Int](numSubspaces)
    var m = 0
    while (m < numSubspaces) {
      val vecBase = m * subDim
      var bestD = Double.NaN // any real distance beats NaN (compare > 0)
      var bestCell = 0
      var cell = 0
      val nCells = cellCounts(m)
      var centBase = (cellOffsets(m) + 0) * subDim
      while (cell < nCells) {
        var dotVC = 0.0
        var i = 0
        while (i < subDim) {
          dotVC += arr.getDouble(vecBase + i) * flat(centBase + i)
          i += 1
        }
        val d = dotVC * -2.0 + cc(cellOffsets(m) + cell)
        // strict <: ties keep the earlier (lower) cell; NaN sorts
        // greatest — both exactly array_sort's struct ordering
        if (cell == 0 || java.lang.Double.compare(d, bestD) < 0) {
          bestD = d
          bestCell = cell
        }
        cell += 1
        centBase += subDim
      }
      codes(m) = bestCell
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("pqe", this, classOf[PqEncodeCodes].getName)
    ev.copy(code = childGen.code +
      code"""
         |ArrayData ${ev.value} = $ref.compute(
         |  ${childGen.isNull} ? null : ${childGen.value});
         |boolean ${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqFunctions {
  /** Column-API entry point (array<double> input; codebooks are
    * planning-time model state). */
  def pq_encode(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncodeCodes(Bridge.expression(vec), books))
}
