package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash kernels.
  *
  * The composed-builtin forms of the shingle pipelines run on Spark's
  * higher-order functions (`transform` / `sequence` / `slice` /
  * `aggregate` / `zip_with`), and HOFs are `CodegenFallback`: any
  * projection containing one drops out of whole-stage codegen and
  * evaluates the whole lambda tree interpreted, per row, per element.
  * Measured on sf0.1 documents (5k docs × ~54 tokens) that put the
  * bottom-k fingerprint at ~600 µs/doc — ~100× a native loop — and the
  * same interpreted tax sits inside every minhash / jaccard /
  * corpus-clean signature stage. (The old count()-sink bench hid all of
  * this by letting Catalyst prune the projections; the noop sink
  * exposed it.)
  *
  * Each expression here is BIT-IDENTICAL to the composed form it
  * replaces (pinned by equivalence property specs): same trim/split
  * calls (`UTF8String.trim` / `UTF8String.split`, the exact methods
  * `StringTrim` / `StringSplit` evaluate), same xxhash64 chaining
  * (`XXH64` statics, seed 42, the exact functions `XxHash64`
  * interprets/codegens). Bit parity is load-bearing: the recorded
  * 10×/100× CandProbe candidate counts and every minhash/jaccard
  * oracle hash are functions of these hash values.
  */
object TextHash {
  private val Seed = 42L // xxhash64's default seed (XxHash64.seed)
  private val WhitespaceRe = UTF8String.fromString("\\s+")

  /** `split(trim(text), "\\s+", -1)` — the exact token frame of
    * [[graft.ops.Dedup.shingled]]/`shingleHashed`, via the same
    * UTF8String methods their built-in forms evaluate. */
  def tokenize(text: UTF8String): Array[UTF8String] =
    text.trim().split(WhitespaceRe, -1)

  /** xxhash64 of a k-token window hashed AS AN ARRAY of strings —
    * `xxhash64(slice(toks, i, k))` chains the running hash through each
    * element (`InterpretedHashFunction.hash` over `ArrayType`), so the
    * window hash is a fold of `XXH64.hashUnsafeBytes` over token bytes
    * with the previous hash as seed. */
  def windowHashOfTokens(toks: Array[UTF8String], start: Int, k: Int): Long = {
    var h = Seed
    var j = start
    val end = start + k
    while (j < end) {
      val t = toks(j)
      h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, h)
      j += 1
    }
    h
  }
}

/** `array<long>` of `xxhash64(slice(toks, i, k))` for every k-token
  * window of the whitespace-tokenized trimmed text — the native form of
  * [[graft.ops.Dedup.shingleHashed]]'s per-row expression (NOT
  * distinct; minhash folds duplicates away, jaccard dedups on the
  * longs). Fewer than k tokens ⇒ empty array; null text ⇒ null. */
case class TokenWindowHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_window_hashes"

  def compute(text: UTF8String): ArrayData = {
    val toks = TextHash.tokenize(text)
    val m = toks.length - k + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      hashes(i) = TextHash.windowHashOfTokens(toks, i, k)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(hashes)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twh", this, classOf[TokenWindowHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bottom-n distinct shingle-hash sketch: the n smallest distinct
  * `xxhash64(concat_ws(" ", window))` values over all k-token windows,
  * ascending — the native form of [[graft.ops.TextOps.fingerprint]]'s
  * composed `slice(array_sort(array_distinct(transform(shingles(text,
  * k), xxhash64))), 1, n)`. Note the hash basis differs from
  * [[TokenWindowHashes]] by design (shingle STRING vs token ARRAY):
  * each matches the composed form it replaces. */
case class ShingleFingerprint(child: Expression, k: Int, n: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle width k must be >= 1, got $k")
  require(n >= 1, s"sketch size n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_fingerprint requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_fingerprint"

  def compute(text: UTF8String): ArrayData = {
    val toks = TextHash.tokenize(text)
    val m = toks.length - k + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hashes = new Array[Long](m)
    // one scratch buffer per row, grown to the largest window — the
    // shingle string's bytes are identical to the UTF8String that
    // concat_ws would build, so hashing the buffer hashes the string
    var buf = new Array[Byte](256)
    var i = 0
    while (i < m) {
      var len = k - 1 // single-byte ' ' separators
      var j = i
      while (j < i + k) { len += toks(j).numBytes; j += 1 }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      j = i
      while (j < i + k) {
        if (j > i) { buf(pos) = ' '; pos += 1 }
        val t = toks(j)
        Platform.copyMemory(t.getBaseObject, t.getBaseOffset,
          buf, Platform.BYTE_ARRAY_OFFSET + pos, t.numBytes)
        pos += t.numBytes
        j += 1
      }
      hashes(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    val out = new Array[Long](math.min(n, m))
    var cnt = 0
    i = 0
    while (i < m && cnt < out.length) {
      if (i == 0 || hashes(i) != hashes(i - 1)) { out(cnt) = hashes(i); cnt += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (cnt == out.length) out else java.util.Arrays.copyOf(out, cnt))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sfp", this, classOf[ShingleFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over a hashed-shingle array: per seed i,
  * `min over shingles h of xxhash64(i, h)` — the native form of
  * [[graft.ops.Dedup.minhashSignatureFromHashes]]'s
  * `aggregate(shh, fill(MaxValue), zip_with(acc, seeds, least(a,
  * xxhash64(s, h))))`. `xxhash64(s: int, h: long)` chains
  * `hashInt(s, 42)` then `hashLong(h, ·)`; the int stage is
  * h-independent, so it is precomputed once per seed — the composed
  * form re-hashes it per (shingle, seed) pair. Empty input ⇒ the
  * Long.MaxValue init vector (callers exclude shingle-less docs before
  * banding); null ⇒ null. Input contract: no null elements (the
  * [[TokenWindowHashes]] output shape). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      "minhash_signature requires array<bigint> with non-null elements " +
        "(the token_window_hashes output shape): compute() reads slots " +
        "with getLong, which would fold a null as 0 instead of skipping " +
        "it the way the composed xxhash64 fold does")
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires an array<bigint> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // hashInt(seed_i, 42) once per seed; thread-safe (lazy val init is
  // synchronized, the array is never mutated after)
  @transient private lazy val seedBases: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  def compute(arr: ArrayData): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val bases = seedBases
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val c = XXH64.hashLong(h, bases(j))
        if (c < sig(j)) sig(j) = c
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhs", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positionwise-equal signature slots — the minhash estimate
  * screen's kernel. Bit-identical to the composed
  * `size(filter(zip_with(a, b, (x, y) => x === y), x => x))`
  * (equivalence property spec): counts positions inside BOTH arrays
  * (zip_with pads past the shorter array with nulls, whose comparisons
  * filter drops — so only the overlapping prefix counts) where both
  * elements are non-null and equal (a null element's comparison is
  * null, dropped the same way; the branch is plan-gated on
  * containsNull like [[DotProduct]], since a parquet-reloaded index
  * declares nullable elements the data never has). NULL array → NULL
  * count → the `>= minMatches` screen drops the pair, exactly as
  * `size(null) = null` did.
  *
  * Why native: the composed form is two nested higher-order functions
  * — `CodegenFallback`, interpreted per candidate pair per slot — and
  * it sits ON the screen every banded candidate pair must pass
  * (minhashVerifiedDups, the cross-corpus variant, and the index
  * probe). At real candidate mass that is the screen's hot loop; this
  * is a tight primitive comparison loop inside whole-stage codegen. */
case class SigMatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_match_count requires array<bigint> inputs, got ($l, $r)")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sig_match_count"

  @transient private lazy val mayHaveNullElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    if (mayHaveNullElements) {
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
          c += 1
        i += 1
      }
    } else {
      while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val nullCheck =
        if (!mayHaveNullElements) ""
        else s"if ($a.isNullAt($i) || $b.isNullAt($i)) continue;"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextHashFunctions {
  /** Column-API entry points (string / array<bigint> inputs). */
  def token_window_hashes(text: Column, k: Int): Column =
    Bridge.column(TokenWindowHashes(Bridge.expression(text), k))
  def shingle_fingerprint(text: Column, k: Int, n: Int): Column =
    Bridge.column(ShingleFingerprint(Bridge.expression(text), k, n))
  def minhash_signature(hashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashes), numHashes))
  def sig_match_count(a: Column, b: Column): Column =
    Bridge.column(SigMatchCount(Bridge.expression(a), Bridge.expression(b)))
}
