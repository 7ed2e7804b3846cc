package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics kernels for the quality-scoring family
  * ([[graft.ops.TextOps]]: tokenCount / stopwordRatio / punctRatio /
  * digitRatio / bpeishTokenCount / qualityScore).
  *
  * The composed forms pay two per-row taxes the honest noop-sink bench
  * exposed at scale: `stopwordRatio`'s `filter(toks, isin(...))` is a
  * higher-order function — `CodegenFallback`, so the whole projection
  * evaluates interpreted, per token, per stopword — and the character
  * ratios each run a `regexp_replace` that allocates a rewritten copy
  * of the document just to measure its length. Together they made the
  * corpus quality scan the hottest per-row stage in the engine
  * (q_corpus_filter 50.4 s on the 100× corpus — ~2× the whole verified
  * near-dedup).
  *
  * Each kernel returns INTEGER COUNTS only; every ratio keeps its
  * existing Catalyst double arithmetic on top, so the final doubles are
  * bit-identical to the composed forms (pinned by equivalence property
  * specs in both codegen and interpreted modes, and by the DuckDB
  * oracle's exact hash compare). The counting semantics replicated:
  *
  *  - token frame: `split(s, "\\s+", -1)` = Java `Pattern.split` with
  *    limit -1 — a leading whitespace run emits a leading "" element, a
  *    trailing run emits a trailing "" (kept by limit -1), and the empty
  *    string yields [""] (count 1). `\s` is ASCII-only by default:
  *    exactly { space, tab, LF, VT, FF, CR } - U+00A0 etc. are
  *    token bytes, not separators.
  *  - char classes: Java regex char classes match one CODEPOINT; counts
  *    here iterate UTF-8 lead bytes so a multi-byte codepoint counts
  *    once (matching `length()` = `UTF8String.numChars` arithmetic on
  *    the `regexp_replace` side).
  */
object TextStat {
  /** Java regex `\s` (default, non-UNICODE_CHARACTER_CLASS). */
  @inline def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
}

/** struct<tokens int, stop_hits int> over the whitespace token frame of
  * the input AS GIVEN (callers pre-apply lower exactly as their
  * composed forms do): `tokens` = number of maximal non-whitespace
  * runs — REAL tokens, `size(filter(split(s, "\\s+"), _ != ""))`, NOT
  * the raw split size (see the r12 note in compute: the phantom empty
  * tokens of split(-1) read every newline-terminated document one
  * token high); `stop_hits` = number of tokens equal to a stopword.
  * Null text ⇒ null. */
case class TokenStopCounts(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  // the composed filter(toks, isin(...)) would count the empty TOKENS a
  // leading/trailing separator emits against an empty stopword; the
  // kernel scans only non-whitespace runs — refuse the shape rather
  // than silently diverge (no real stopword list contains "")
  require(stopwords.forall(_.nonEmpty),
    "token_stop_counts: empty-string stopwords are not supported")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stop_counts requires a string input, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("tokens", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))
  override def prettyName: String = "token_stop_counts"

  // stopword byte images, grouped by byte length for a cheap
  // length-first reject (the list is small and static per plan)
  @transient private lazy val stopByLen: Map[Int, Array[Array[Byte]]] =
    stopwords.distinct.map(_.getBytes("UTF-8"))
      .groupBy(_.length).map { case (l, ws) => l -> ws.toArray }

  def compute(text: UTF8String): InternalRow = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes
    // tokens = maximal non-whitespace runs — REAL tokens only. (The
    // pre-r12 form replicated Java split(-1)'s phantom empty tokens: a
    // leading/trailing separator counted an empty token, so every
    // newline-terminated document read one token high and "\t" read 2 —
    // off-by-one quality gates on essentially all real web text. The
    // composed reference and the oracle SQL count non-empty splits to
    // match.)
    val byLen = stopByLen
    var tokens = 0
    var hits = 0
    var i = 0
    var runStart = -1
    while (i <= n) {
      val ws = i == n || TextStat.isAsciiWs(Platform.getByte(base, off + i))
      if (!ws && runStart < 0) runStart = i
      else if (ws && runStart >= 0) {
        tokens += 1
        val len = i - runStart
        byLen.get(len) match {
          case Some(cands) =>
            var c = 0
            var matched = false
            while (c < cands.length && !matched) {
              matched = ByteArrayMethods.arrayEquals(base, off + runStart,
                cands(c), Platform.BYTE_ARRAY_OFFSET, len)
              c += 1
            }
            if (matched) hits += 1
          case None => ()
        }
        runStart = -1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](tokens, hits))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tsc", this, classOf[TokenStopCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct<punct int, digit int, alpha_runs int> in one byte pass:
  * `punct` = codepoints matching `[^A-Za-z0-9\s]` (what
  * `length(s) - length(regexp_replace(s, "[^A-Za-z0-9\\s]", ""))`
  * measures), `digit` = chars matching `[0-9]`, `alpha_runs` = maximal
  * `[A-Za-z]+` runs — so `size(regexp_extract_all(s,
  * "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))` = alpha_runs + digit + punct.
  * Non-ASCII codepoints are always punct (lead byte counted once,
  * continuation bytes skipped) and break alpha runs. Null ⇒ null. */
case class AsciiClassCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ascii_class_counts requires a string input, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("punct", IntegerType, nullable = false),
    StructField("digit", IntegerType, nullable = false),
    StructField("alpha_runs", IntegerType, nullable = false)))
  override def prettyName: String = "ascii_class_counts"

  def compute(text: UTF8String): InternalRow = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes
    var punct = 0
    var digit = 0
    var alphaRuns = 0
    var inAlpha = false
    var i = 0
    while (i < n) {
      val b = Platform.getByte(base, off + i)
      if ((b & 0x80) == 0) { // ASCII
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          if (!inAlpha) { alphaRuns += 1; inAlpha = true }
        } else {
          inAlpha = false
          if (b >= '0' && b <= '9') digit += 1
          else if (!TextStat.isAsciiWs(b)) punct += 1
        }
      } else if ((b & 0xC0) != 0x80) { // non-ASCII lead byte: one codepoint
        inAlpha = false
        punct += 1
      } // continuation bytes: already counted at the lead byte
      i += 1
    }
    new GenericInternalRow(Array[Any](punct, digit, alphaRuns))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acc", this, classOf[AsciiClassCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatFunctions {
  /** Column-API entry points. `stopwords` is a static list (sized into
    * per-plan byte tables), mirroring the other kernels' constructor
    * scalars. */
  def token_stop_counts(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TokenStopCounts(Bridge.expression(text), stopwords))
  def ascii_class_counts(text: Column): Column =
    Bridge.column(AsciiClassCounts(Bridge.expression(text)))
}
