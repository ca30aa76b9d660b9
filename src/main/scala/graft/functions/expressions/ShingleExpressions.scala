package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shingle kernel shared by interpreted eval and generated code.
  *
  * Computes exactly
  * `array_distinct(transform(sequence(1, greatest(n-(k-1), 1)),
  *    i => concat_ws(" ", slice(split(text, " "), i, k))))`
  * but in ONE pass over the string: because tokens are split on a single
  * space and re-joined with a single space, every k-token window IS a
  * contiguous substring of the input — so the kernel just records token
  * boundaries and emits substring slices, instead of materializing a
  * token array and per-window array slices through four interpreted
  * higher-order functions (the dominant cost of every shingle-based
  * query at sf0.1 — 2.2 s of q_decontaminate's 2.6 s was this chain).
  *
  * Split semantics match Spark's `split(text, " ")` (Java `Pattern.split`
  * with limit −1): leading/trailing/double spaces produce empty tokens,
  * which the substring reconstruction reproduces byte-for-byte. Windows
  * shorter than k occur only when the document has fewer than k tokens,
  * where the single shingle equals the whole text. Dedup preserves
  * first-occurrence order like `array_distinct`.
  */
object TokenShingles {

  def compute(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    // token boundaries: tokens = maximal runs between single spaces
    var nTok = 1
    var p = 0
    while (p < s.length) { if (s.charAt(p) == ' ') nTok += 1; p += 1 }
    if (nTok <= k) return new GenericArrayData(Array[Any](text))
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    p = 0
    while (p < s.length) {
      if (s.charAt(p) == ' ') { ends(t) = p; t += 1; starts(t) = p + 1 }
      p += 1
    }
    ends(t) = s.length
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i <= nTok - k) {
      seen.add(s.substring(starts(i), ends(i + k - 1)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** INSTANCE variant (r15, the q_lm_score kernel): every k-token
    * window in order, duplicates preserved, and EMPTY when the text has
    * fewer than k tokens — exactly the multiset the posexplode +
    * lead()-window formulation emits (windows there exist only where a
    * full k-run does), where [[compute]] would return the whole text as
    * one short shingle. Same one-pass boundary scan, no dedup set.
    */
  def computeAll(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    var nTok = 1
    var p = 0
    while (p < s.length) { if (s.charAt(p) == ' ') nTok += 1; p += 1 }
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    p = 0
    while (p < s.length) {
      if (s.charAt(p) == ' ') { ends(t) = p; t += 1; starts(t) = p + 1 }
      p += 1
    }
    ends(t) = s.length
    val out = new Array[Any](nTok - k + 1)
    var i = 0
    while (i <= nTok - k) {
      out(i) = UTF8String.fromString(s.substring(starts(i), ends(i + k - 1)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `token_shingles(text, k)` → ARRAY<STRING> of the distinct k-token
  * sliding windows of `text` (k a foldable positive literal).
  */
case class TokenShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "token_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, foldable INT), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else right.eval() match {
      // k is foldable, so enforce the "positive literal" half of the
      // contract at analysis time — k <= 0 would otherwise surface as an
      // executor-side ArrayIndexOutOfBoundsException from the kernel.
      case k: java.lang.Integer if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case k => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1, got $k")
    }

  override def nullSafeEval(text: Any, k: Any): Any =
    TokenShingles.compute(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.expressions.TokenShingles.compute($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `token_shingles_all(text, k)` → ARRAY<STRING> of ALL k-token sliding
  * windows of `text` in order, duplicates preserved, empty below k
  * tokens (k a foldable positive literal) — [[TokenShinglesExpr]]'s
  * instance-multiset sibling for frequency queries.
  */
case class TokenShinglesAllExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "token_shingles_all"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, foldable INT), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else right.eval() match {
      case k: java.lang.Integer if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case k => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1, got $k")
    }

  override def nullSafeEval(text: Any, k: Any): Any =
    TokenShingles.computeAll(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.expressions.TokenShingles.computeAll($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
