package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Count-min probe: the minimum over `depth` sketch rows of this key's
  * bucket count, with the sketch cells held as PLAIN MODEL STATE on the
  * expression instead of a plan literal.
  *
  * The composed form — `least(element_at(typedlit(cells), pmod(
  * xxhash64(k, i), width) + i·width + 1) …)` — is semantically
  * identical and stays in codegen, but embeds the full depth × width
  * cell array into the plan as a printed literal: at the default
  * 5 × 8192 shape that is ~400 KB of text in EVERY explain string,
  * UI plan node, and event-log entry for the query. Here the cells ride
  * as a constructor field (a single broadcast-with-the-closure array,
  * printed as a JVM reference), and the probe is one tight loop.
  *
  * Hash parity is the load-bearing invariant: [[graft.ops.Sketch]]
  * BUILDS the sketch with the declarative `xxhash64(k, lit(i))` +
  * `pmod`, so the probe replicates that exact chain — seed 42, key
  * hashed by its Catalyst type, then the row index hashed as an INT
  * (`lit(i)` is IntegerType) — via the same public
  * [[XxHash64Function]] the builtin evaluates through. Bit parity with
  * the composed form is spec-pinned in both codegen modes. */
// model-state fields are immutable Seqs, NOT Arrays: a case class with
// an Array field compares by REFERENCE (Scala equals on Array is eq),
// which breaks Catalyst's structural expression equality — two probes
// built from equal-but-distinct arrays would never semanticEquals, so
// common-subexpression elimination and cached-plan dedup
// (Dataset.cache dedups by canonicalized plan) silently stop working.
// The hot loop reads a @transient lazy Array copy.
case class CmsProbe(child: Expression, cells: IndexedSeq[Long], depth: Int, width: Int)
    extends UnaryExpression {
  require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
  require(cells.length == depth * width,
    s"cells length ${cells.length} != $depth x $width")

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess // XxHash64Function hashes any Catalyst value
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_probe"

  @transient private lazy val childType: DataType = child.dataType
  @transient private lazy val cellsArr: Array[Long] = cells.toArray

  def compute(input: Any): Long = {
    val cs = cellsArr
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      var h = 42L
      h = XxHash64Function.hash(input, childType, h)
      h = XxHash64Function.hash(i, IntegerType, h) // lit(i) is IntegerType in the build
      val b = (((h % width) + width) % width).toInt // pmod
      val c = cs(i * width + b)
      if (c < est) est = c
      i += 1
    }
    est
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", this, classOf[CmsProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsProbe {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry for the probe kernel. */
  def probe(key: Column, cells: Array[Long], depth: Int, width: Int): Column =
    Bridge.column(CmsProbe(Bridge.expression(key), cells.toIndexedSeq, depth, width))
}
