package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLICATION: encode a document with a learned,
  * rank-ordered merge list ([[graft.ops.TextOps.bpeLearnMerges]]) in one
  * native per-row pass — the per-row hot loop of "tokenize 100 TB with
  * the induced vocabulary", which has no composed-builtin form at all
  * (the greedy lowest-rank merge loop is iterative per word; a HOF
  * encoding would need unbounded nesting).
  *
  * Algorithm (the reference BPE encode, cf. Sennrich et al. 2016 and
  * the HuggingFace tokenizer): per whitespace word, start from single
  * code-point symbols; repeatedly find the adjacent symbol pair with
  * the LOWEST merge rank and fuse every left-to-right non-overlapping
  * occurrence of that pair; stop when no adjacent pair is in the merge
  * table. Tokens of all words concatenate in order (no end-of-word
  * marker — the trainer learns on the same convention).
  *
  * Contract details that keep the operator exactly mirrorable:
  *  - splitting matches Java-regex `\s+` (space, \t, \n, \u000B, \f,
  *    \r) — the same separator class Spark's `split` and the trainer
  *    use, so `concat(tokens) == regexp_replace(doc, "\\s+", "")`
  *    holds as a LOSSLESSNESS invariant (gated in `q_bpe_encode`);
  *  - case handling belongs to the caller (pass `lower(trim(text))`),
  *    the kernel never re-normalizes;
  *  - symbols are Unicode code points, so astral-plane characters
  *    (surrogate pairs) are one symbol, never split mid-character;
  *  - merge ranks ride as model state on the expression (a
  *    vocabulary-sized map, the same class as the CMS cells /
  *    centroid matrices), printed as a reference, not a plan literal.
  *
  * Null in → null out; a whitespace-only or empty document encodes to
  * the empty token array. */
// merges is an immutable Seq, NOT an Array (the CmsProbe rule): an
// Array field compares by reference, breaking Catalyst structural
// equality and with it CSE and cached-plan dedup.
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // rank lookup: pair key a + " " + b. The space separator cannot
  // collide with symbol content: every symbol descends from a
  // \s+-split word, so no symbol ever contains whitespace. First rank
  // wins for a duplicated pair (the trainer never emits duplicates).
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val ms = merges.toArray
    val m = new java.util.HashMap[String, Integer](ms.length * 2)
    var i = 0
    while (i < ms.length) {
      val (a, b) = ms(i)
      m.putIfAbsent(a + " " + b, Integer.valueOf(i))
      i += 1
    }
    m
  }

  private def isWs(c: Char): Boolean = // Java regex \s exactly
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Encode one word (no whitespace inside) into `out`. */
  private def encodeWord(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    // initial symbols: code points
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    // greedy lowest-rank merge loop
    var done = syms.size < 2
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val ab = a + b
        // fuse every left-to-right non-overlapping (a, b) occurrence —
        // the same greedy fold the trainer applies to its vocabulary
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            next.add(ab); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
        done = syms.size < 2
      }
    }
    var k = 0
    while (k < syms.size) { out.add(UTF8String.fromString(syms.get(k))); k += 1 }
  }

  def compute(input: Any): ArrayData = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) encodeWord(s.substring(start, i), out)
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry: tokens of `text` under the rank-ordered merge
    * list (caller normalizes case first). */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), merges.toVector))
}
