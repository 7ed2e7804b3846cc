package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
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
  // plausible-looking wrong score for a corrupt vector. A NULL ELEMENT
  // poisons the composed fold the same way (x*null => null, acc+null
  // => null), so it must yield NULL too — getDouble would read the
  // slot as 0.0, a plausible-looking wrong score. The element checks
  // are gated at plan time on containsNull: parquet float-list schemas
  // routinely declare nullable elements while the data has none, so
  // rejecting the TYPE (the minhash_signature treatment) would break
  // every real embeddings table, and a clean containsNull=false schema
  // pays no per-element branch.
  override def nullable: Boolean = true

  @transient private lazy val mayHaveNullElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  // The element-null check is FUSED into the accumulation loop (a null
  // anywhere ⇒ result NULL regardless of position, so bailing mid-sum is
  // exact): a separate pre-pass would double element accesses on the
  // common all-non-null path of containsNull=true schemas. The partial
  // sum accumulated before the bail is discarded with isNull set, so
  // summation order for non-null results is unchanged (still the strict
  // left fold the oracle parity depends on).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    if (mayHaveNullElements) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (!mayHaveNullElements) ""
        else s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |}
         |if (!${ev.isNull}) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `numTables` random-hyperplane LSH bucket keys of one vector in a
  * single native pass — the kernel form of
  * [[graft.ops.Similarity.lshBanded]]'s composed expression (a sign-bit
  * `transform` plus per-table `slice`/`aggregate` folds, all
  * CodegenFallback HOFs — the same interpreted per-row tax the text-hash
  * kernels removed, and numTables × numPlanes dot products per vector
  * make this the hottest per-row stage of every ANN query). Output:
  * `array<bigint>` of length `numTables`, where
  * `bucket[t] = fold(acc * 2 + signbit)` over that table's planes, drawn
  * from `Random(seedBase + t)` in the composed form's exact order —
  * bucket values are bit-identical (parity spec in both codegen modes).
  *
  * Null parity quirk, preserved deliberately: the composed bits come
  * from `when(dot(v, p) >= 0, 1).otherwise(0)`, so a NULL vector — or
  * one whose length ≠ dim, or one with a NULL ELEMENT (either way dot
  * yields NULL for every plane) — produces all-ZERO bits, i.e. bucket 0
  * in every table, not NULL. The kernel therefore never returns null
  * and evaluates its own null branch (no nullSafeEval); the element
  * check is gated at plan time on the schema's containsNull, so a clean
  * schema pays nothing (getDouble would otherwise silently read a null
  * slot as 0.0 — non-zero buckets where the composed form degrades to
  * bucket 0, a silently different candidate set). */
case class LshBandBuckets(child: Expression, dim: Int, numPlanes: Int,
                          numTables: Int, seedBase: Int)
    extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(numPlanes >= 1 && numPlanes <= 62,
    s"numPlanes must be in [1,62] (bucket fold is a long), got $numPlanes")
  require(numTables >= 1, s"numTables must be >= 1, got $numTables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_buckets requires an array<double> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_band_buckets"

  // planes laid out flat, (table, plane, component)-major — the order the
  // composed form draws them; rebuilt per executor from the four Ints
  // (lazy val init is synchronized, the array is never mutated after)
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](numTables * numPlanes * dim)
    var idx = 0
    var t = 0
    while (t < numTables) {
      val rnd = new scala.util.Random(seedBase + t)
      var j = 0
      while (j < numPlanes * dim) { out(idx) = rnd.nextGaussian(); idx += 1; j += 1 }
      t += 1
    }
    out
  }

  @transient private lazy val mayHaveNullElements: Boolean =
    child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }

  private def anyNullElement(arr: ArrayData): Boolean = {
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  def compute(input: Any): ArrayData = {
    val out = new Array[Long](numTables)
    val arr = input.asInstanceOf[ArrayData]
    if (arr != null && arr.numElements() == dim &&
        !(mayHaveNullElements && anyNullElement(arr))) {
      val p = planes
      var idx = 0
      var t = 0
      while (t < numTables) {
        var bucket = 0L
        var j = 0
        while (j < numPlanes) {
          // same left-fold order and getDouble calls as DotProduct
          var s = 0.0
          var i = 0
          while (i < dim) { s += arr.getDouble(i) * p(idx); idx += 1; i += 1 }
          // Spark's >= on doubles is nan-safe (NaN sorts greater than
          // everything), so a NaN dot gives bit 1 in the composed form;
          // Java's primitive >= would give 0 — match Spark, not Java
          bucket = bucket * 2 + (if (s >= 0 || java.lang.Double.isNaN(s)) 1L else 0L)
          j += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("lshb", this, classOf[LshBandBuckets].getName)
    ev.copy(
      code = childGen.code +
        code"""ArrayData ${ev.value} = $ref.compute(${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `p` nearest centroid cell ids of one vector (squared-distance
  * argmin, closest first) in a single native pass — the kernel form of
  * the composed `slice(transform(array_sort(transform(lits, …)), …))`
  * expression in [[graft.ops.Similarity]]. The composed form is an
  * interpreted HOF stack (transform/array_sort are CodegenFallback)
  * that allocates and sorts an nlist-row struct array per input row —
  * fine at nlist = 16, but k-means assignment is nlist dot products
  * per row, and cluster counts must GROW with the corpus (fixed-size
  * cells are what keep SemDeDup's within-cell pair join linear), so
  * the per-row interpreted tax multiplies twice at scale. Here the
  * centroid matrix rides flat as model state (one reference, not a
  * printed plan literal), the distance loop is tight, and top-p is an
  * insertion pass over a p-length buffer instead of a full sort.
  *
  * Parity contract with the composed form, spec-pinned bit-for-bit in
  * both codegen modes:
  *  - distances use the same left-fold arithmetic:
  *    `(Σ v[i]·c[i]) · -2.0 + (Σ c[i]·c[i])`, with the centroid
  *    self-dot pre-folded driver-side in the same order (IEEE ops are
  *    deterministic, so the bits match the per-row fold);
  *  - ordering is (distance, cell id) ascending under Spark's double
  *    ordering (`a == b` first, so -0.0 ties 0.0; NaN sorts greatest,
  *    NaN ties NaN);
  *  - an invalid input (null vector, length ≠ dim, or — when the
  *    schema admits them — a null element) nulls every distance in the
  *    composed form, which then orders by cell id alone: the kernel
  *    returns the p smallest cell ids (`ids` arrives sorted). The
  *    expression is therefore never null itself, like the composed
  *    slice. */
// model-state fields are immutable IndexedSeqs, NOT Arrays (the
// CmsProbe rule): Array fields give the case class reference equality,
// which breaks Catalyst structural equality — CSE and cached-plan
// dedup would treat two probes over equal centroid tables as different
// expressions. The hot loop reads @transient lazy Array copies.
case class NearestCells(child: Expression, flatSeq: IndexedSeq[Double],
                        idsSeq: IndexedSeq[Long], dim: Int, p: Int)
    extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(p >= 1, s"p must be >= 1, got $p")
  require(idsSeq.nonEmpty && flatSeq.length == idsSeq.length * dim,
    s"centroid matrix ${flatSeq.length} != ${idsSeq.length} cells x $dim")

  @transient private lazy val flat: Array[Double] = flatSeq.toArray
  @transient private lazy val ids: Array[Long] = idsSeq.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires an array<double> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_cells"

  @transient private lazy val mayHaveNullElements: Boolean =
    child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }

  // centroid self-dots, same left-fold order as dot(c, c)
  @transient private lazy val selfDots: Array[Double] = {
    val out = new Array[Double](ids.length)
    var n = 0
    while (n < ids.length) {
      var s = 0.0
      var i = 0
      while (i < dim) { val x = flat(n * dim + i); s += x * x; i += 1 }
      out(n) = s
      n += 1
    }
    out
  }

  // Spark's double ordering: primitive == first (-0.0 ties 0.0), then
  // java compare (NaN greatest, total)
  private def lessThan(d1: Double, c1: Long, d2: Double, c2: Long): Boolean = {
    val cd = if (d1 == d2) 0 else java.lang.Double.compare(d1, d2)
    if (cd != 0) cd < 0 else c1 < c2
  }

  def compute(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val take = math.min(p, ids.length)
    val valid = arr != null && arr.numElements() == dim && {
      var ok = true
      if (mayHaveNullElements) {
        var i = 0
        while (ok && i < dim) { if (arr.isNullAt(i)) ok = false; i += 1 }
      }
      ok
    }
    val out = new Array[Long](take)
    if (!valid) {
      // composed form: every distance null → ordered by cell id alone
      var i = 0
      while (i < take) { out(i) = ids(i); i += 1 }
    } else {
      // top-p insertion over (distance, cell) pairs, ascending
      val bd = new Array[Double](take)
      val bc = new Array[Long](take)
      var filled = 0
      var n = 0
      while (n < ids.length) {
        var s = 0.0
        var i = 0
        var idx = n * dim
        while (i < dim) { s += arr.getDouble(i) * flat(idx); idx += 1; i += 1 }
        val d = s * -2.0 + selfDots(n)
        val c = ids(n)
        if (filled < take || lessThan(d, c, bd(filled - 1), bc(filled - 1))) {
          var j = if (filled < take) filled else take - 1
          while (j > 0 && lessThan(d, c, bd(j - 1), bc(j - 1))) {
            bd(j) = bd(j - 1); bc(j) = bc(j - 1); j -= 1
          }
          bd(j) = d; bc(j) = c
          if (filled < take) filled += 1
        }
        n += 1
      }
      System.arraycopy(bc, 0, out, 0, take)
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("nc", this, classOf[NearestCells].getName)
    ev.copy(
      code = childGen.code +
        code"""ArrayData ${ev.value} = $ref.compute(${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column-API entry point (requires array<double> inputs; cast first). */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  /** Column-API entry for the centroid-assignment kernel: centroids as
    * `(cell id, vector)` pairs, any id spacing, ids must be sorted. */
  def nearest_cells(vec: Column, centroids: Seq[(Long, Seq[Double])], p: Int): Column = {
    require(centroids.nonEmpty, "nearest_cells requires at least one centroid")
    val dim = centroids.head._2.length
    require(centroids.forall(_._2.length == dim), "ragged centroid matrix")
    val ids = centroids.map(_._1).toArray
    require(ids.sorted.sameElements(ids), "centroid ids must be sorted")
    val flat = new Array[Double](centroids.length * dim)
    centroids.zipWithIndex.foreach { case ((_, v), n) =>
      var i = 0
      while (i < dim) { flat(n * dim + i) = v(i); i += 1 }
    }
    Bridge.column(NearestCells(Bridge.expression(vec),
      flat.toIndexedSeq, ids.toIndexedSeq, dim, p))
  }
  /** Column-API entry point (array<double> input; widths are
    * planning-time constants). */
  def lsh_band_buckets(vec: Column, dim: Int, numPlanes: Int,
                       numTables: Int, seedBase: Int): Column =
    Bridge.column(LshBandBuckets(Bridge.expression(vec),
      dim, numPlanes, numTables, seedBase))
}

/** SQL-side registration: `SELECT dot_product(a, b)`,
  * `token_window_hashes(text, 5)`, `shingle_fingerprint(text, 5, 8)`,
  * `minhash_signature(hashes, 64)` after installing via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.{intArg, stringArg}

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    extensions.injectFunction((
      FunctionIdentifier("token_window_hashes"),
      new ExpressionInfo(classOf[TokenWindowHashes].getName, "token_window_hashes"),
      (exprs: Seq[Expression]) =>
        TokenWindowHashes(exprs.head, intArg("token_window_hashes", "k", exprs, 1))))
    extensions.injectFunction((
      FunctionIdentifier("shingle_fingerprint"),
      new ExpressionInfo(classOf[ShingleFingerprint].getName, "shingle_fingerprint"),
      (exprs: Seq[Expression]) =>
        ShingleFingerprint(exprs.head,
          intArg("shingle_fingerprint", "k", exprs, 1),
          intArg("shingle_fingerprint", "n", exprs, 2))))
    extensions.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) =>
        MinHashSignature(exprs.head, intArg("minhash_signature", "numHashes", exprs, 1))))
    extensions.injectFunction((
      FunctionIdentifier("lsh_band_buckets"),
      new ExpressionInfo(classOf[LshBandBuckets].getName, "lsh_band_buckets"),
      (exprs: Seq[Expression]) =>
        LshBandBuckets(exprs.head,
          intArg("lsh_band_buckets", "dim", exprs, 1),
          intArg("lsh_band_buckets", "numPlanes", exprs, 2),
          intArg("lsh_band_buckets", "numTables", exprs, 3),
          intArg("lsh_band_buckets", "seedBase", exprs, 4))))
    extensions.injectFunction((
      FunctionIdentifier("token_stop_counts"),
      new ExpressionInfo(classOf[TokenStopCounts].getName, "token_stop_counts"),
      (exprs: Seq[Expression]) =>
        TokenStopCounts(exprs.head,
          exprs.drop(1).map(stringArg("token_stop_counts", "stopword", _)))))
    extensions.injectFunction((
      FunctionIdentifier("ascii_class_counts"),
      new ExpressionInfo(classOf[AsciiClassCounts].getName, "ascii_class_counts"),
      (exprs: Seq[Expression]) => AsciiClassCounts(exprs.head)))
    // Bloom sketch surface (see graft.functions.BloomFunctions): build
    // an aggregate sketch in SQL, probe it join-free. Registered under
    // graft-prefixed names so Spark's own internal might_contain /
    // bloom_filter_agg registrations (version-dependent) are never
    // shadowed. The analyzer wraps a returned AggregateFunction in its
    // AggregateExpression automatically, like any SQL aggregate.
    extensions.injectFunction((
      FunctionIdentifier("bloom_filter_build"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_build"),
      (exprs: Seq[Expression]) => {
        // the aggregate requires BIGINT sizing literals; SQL integer
        // literals arrive as INT — coerce (a cast of a literal stays
        // foldable, which its type check also demands)
        def asLong(e: Expression): Expression = e.dataType match {
          case LongType => e
          case _ => org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)
        }
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, asLong(exprs(1)), asLong(exprs(2)))
      }))
    extensions.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))))
  }
}

object GraftExtensions {
  /** The kernels take their widths as constructor Ints (they size
    * per-row buffers and the seed-base table at planning time), so the
    * SQL arguments must be foldable integer literals. */
  private def intArg(fn: String, name: String, exprs: Seq[Expression], pos: Int): Int = {
    require(exprs.length > pos,
      s"$fn: missing argument $name at position ${pos + 1}")
    val e = exprs(pos)
    require(e.foldable, s"$fn: $name must be a literal integer, got $e")
    e.eval(null) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be a literal integer, got $other")
    }
  }

  /** `token_stop_counts` takes its stopword list as trailing string
    * literals (sized into per-plan byte tables); no trailing args means
    * pure token counting (`stop_hits` always 0). */
  private def stringArg(fn: String, name: String, e: Expression): String = {
    require(e.foldable, s"$fn: $name must be a literal string, got $e")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be a literal string, got $other")
    }
  }
}
