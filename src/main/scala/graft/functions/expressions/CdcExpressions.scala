package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking kernel shared by interpreted eval and
  * generated code.
  *
  * Splits `text` into variable-length chunks at ROLLING-HASH boundaries
  * (the Rabin/CDC family used by dedup storage and by shift-robust
  * corpus dedup): a boundary falls after code point i (i ≥ 7) when
  *
  *   h(i) = Σ_{j=0..7} cp(i−j) · 31^j   ≡   d−1  (mod d)
  *
  * — a pure function of the last 8 code points, so an insertion near
  * the start of a document shifts only the boundaries inside the
  * following 8 code points and every later boundary RE-SYNCHRONIZES;
  * fixed-size chunking (O-31 / q_dedup_chunks) shifts every boundary
  * and finds nothing. No min/max chunk bounds on purpose: bounded CDC
  * makes each boundary depend on the previous one (sequential state),
  * which would not be SQL-replayable; unbounded CDC is position-local
  * and the DuckDB twin replays the identical integer polynomial.
  *
  * The polynomial needs no modulus: cp < 2^21 and Σ 2^21·31^j over
  * j ≤ 7 is < 2^57, inside BIGINT in both engines. The trailing
  * remainder is always emitted, as "" when a boundary lands on the
  * final code point — the twin reproduces exactly that.
  */
object CdcChunks {

  private val W = 8
  private[graft] val Pow: Array[Long] = {
    val p = new Array[Long](W)
    p(0) = 1L
    var j = 1
    while (j < W) { p(j) = p(j - 1) * 31L; j += 1 }
    p
  }

  private val Pow8: Long = Pow(W - 1) * 31L // 31^8 ≈ 2^39.6

  /** Production path (r15, ADVICE r14 #3): the window hash is maintained
    * INCREMENTALLY — h' = 31·h − cp_out·31^8 + cp_in, one multiply-add
    * per code point instead of re-evaluating the 8-term polynomial.
    * Exactly the same Long value as the reference loop: every
    * intermediate is bounded by 31·h_max < 2^61 (h < 2^57, doc header),
    * so no wrap ever occurs and the arithmetic is bit-identical —
    * pinned against [[computeReference]] in CurationOpsSpec.
    */
  def compute(text: UTF8String, d: Int): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any]
    val win = new Array[Int](W) // ring buffer of the last W code points
    var h = 0L
    var cpSeen = 0
    var charIdx = 0
    var chunkStart = 0
    while (charIdx < s.length) {
      val cp = s.codePointAt(charIdx)
      val slot = cpSeen % W
      // warm-up (window not yet full): h accumulates 31·h + cp, which IS
      // the k-term polynomial with the newest point at weight 31^0
      h = if (cpSeen < W) h * 31L + cp
          else h * 31L - win(slot) * Pow8 + cp // evict the point 8 back
      win(slot) = cp
      cpSeen += 1
      charIdx += Character.charCount(cp)
      if (cpSeen >= W && h % d == d - 1) {
        out.add(UTF8String.fromString(s.substring(chunkStart, charIdx)))
        chunkStart = charIdx
      }
    }
    out.add(UTF8String.fromString(s.substring(chunkStart)))
    new GenericArrayData(out.toArray)
  }

  /** The original O(8n) re-evaluating form, kept as the parity-test
    * reference for [[compute]] (ADVICE r14 #3).
    */
  private[graft] def computeReference(text: UTF8String, d: Int): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any]
    val win = new Array[Int](W)
    var cpSeen = 0
    var charIdx = 0
    var chunkStart = 0
    while (charIdx < s.length) {
      val cp = s.codePointAt(charIdx)
      win(cpSeen % W) = cp
      cpSeen += 1
      charIdx += Character.charCount(cp)
      if (cpSeen >= W) {
        var h = 0L
        var j = 0
        while (j < W) {
          // cp(i-j): j steps back from the newest entry in the ring;
          // cpSeen >= W and j < W keep the operand non-negative
          h += win((cpSeen - 1 - j) % W) * Pow(j)
          j += 1
        }
        if (h % d == d - 1) {
          out.add(UTF8String.fromString(s.substring(chunkStart, charIdx)))
          chunkStart = charIdx
        }
      }
    }
    out.add(UTF8String.fromString(s.substring(chunkStart)))
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_chunks(text, d)` → ARRAY<STRING>: content-defined chunks of
  * `text` with expected chunk length d (d a foldable int ≥ 2).
  */
case class CdcChunksExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "cdc_chunks"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, foldable INT), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else right.eval() match {
      case d: java.lang.Integer if d >= 2 => TypeCheckResult.TypeCheckSuccess
      case d => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires d >= 2, got $d")
    }

  override def nullSafeEval(text: Any, d: Any): Any =
    CdcChunks.compute(text.asInstanceOf[UTF8String], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.functions.expressions.CdcChunks.compute($t, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
