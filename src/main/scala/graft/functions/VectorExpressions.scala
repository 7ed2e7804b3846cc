package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the vector dot product.
  *
  * The composed-builtin form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — allocates a zipped array and evaluates interpreted lambda closures
  * per element. This expression whole-stage-codegens to a tight
  * `for` loop over the two `ArrayData` buffers: no allocation, no
  * per-element virtual calls. Same strict left-to-right summation order
  * as the fold (and as DuckDB's list_reduce), so results stay
  * bit-identical to the oracle.
  *
  * Custom expressions are deliberately rare: per SURVEY.md §4 every
  * reference operator maps to built-ins. The two exceptions are the
  * hot paths where composition genuinely can't express the efficient
  * form — this vector kernel, and the text-hash kernels in
  * [[graft.functions.TextHash TextHashExpressions]] (whose composed
  * forms are higher-order functions, i.e. `CodegenFallback`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<double> inputs, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // nullable even when both children are not: mismatched lengths yield
  // NULL (matching the zip_with+aggregate fold, whose null padding
  // poisons the sum) — a truncated min-length partial sum would be a
  // plausible-looking wrong score for a corrupt vector
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry point (requires array<double> inputs; cast first). */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}

/** SQL-side registration: `SELECT dot_product(a, b)` after installing via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
  }
}
