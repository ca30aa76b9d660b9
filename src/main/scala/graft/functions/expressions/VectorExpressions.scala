package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the vector hot path (O-54/O-56).
  *
  * The HOF compositions in [[graft.functions.VectorOps]] are correct but
  * allocate an intermediate array per row (`zip_with`) and evaluate a
  * lambda per element. These expressions generate a tight primitive loop
  * via `doGenCode` — no allocation, no virtual calls — which is the
  * "native Expression beats UDF beats everything else" tier of the
  * custom-operator preference order (builder brief; SURVEY §4).
  *
  * Semantics are IDENTICAL to the HOF forms: strict left-to-right double
  * accumulation over ARRAY<DOUBLE>; a NULL input OR a NULL element
  * yields NULL (matching zip_with/aggregate null propagation — asserted
  * in tests). Mismatched lengths iterate the shorter prefix (callers
  * pass fixed-dim vectors).
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // element-level nulls can produce NULL even from non-nullable arrays
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Scala fold for interpreted eval; null on null element. */
  protected def fold(a: ArrayData, b: ArrayData): Any

  /** Java statements: given array vars `a`/`b`, set `evValue` or
    * `evIsNull = true` (on a null element). Every local MUST come from
    * `ctx.freshName` — generated predicate methods pass the input row as a
    * parameter named `i`, and Java forbids shadowing an enclosing
    * local/parameter, so any fixed name risks a janino "Redefinition of
    * local variable" error and a silent fall back to interpreted eval.
    */
  protected def genLoop(ctx: CodegenContext, evValue: String, evIsNull: String,
      a: String, b: String): String

  override def nullSafeEval(left: Any, right: Any): Any =
    fold(left.asInstanceOf[ArrayData], right.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      genLoop(ctx, s"${ev.value}", s"${ev.isNull}", a, b))
}

/** Σ aᵢ·bᵢ / (‖a‖·‖b‖) in one pass (three accumulators, one loop). */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "cosine_similarity"

  override protected def fold(a: ArrayData, b: ArrayData): Any = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def genLoop(ctx: CodegenContext, evValue: String, evIsNull: String,
      a: String, b: String): String = {
    val n = ctx.freshName("n"); val idx = ctx.freshName("idx")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val anyNull = ctx.freshName("anyNull")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |boolean $anyNull = false;
       |for (int $idx = 0; $idx < $n && !$anyNull; $idx++) {
       |  if ($a.isNullAt($idx) || $b.isNullAt($idx)) { $anyNull = true; }
       |  else {
       |    double $x = $a.getDouble($idx);
       |    double $y = $b.getDouble($idx);
       |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |  }
       |}
       |if ($anyNull) { $evIsNull = true; }
       |else { $evValue = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
       |""".stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ — for hot paths that pair a dot with PREcomputed norms. */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "dot_product"

  override protected def fold(a: ArrayData, b: ArrayData): Any = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i); i += 1
    }
    s
  }

  override protected def genLoop(ctx: CodegenContext, evValue: String, evIsNull: String,
      a: String, b: String): String = {
    val n = ctx.freshName("n"); val idx = ctx.freshName("idx")
    val s = ctx.freshName("s"); val anyNull = ctx.freshName("anyNull")
    s"""int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $s = 0.0;
       |boolean $anyNull = false;
       |for (int $idx = 0; $idx < $n && !$anyNull; $idx++) {
       |  if ($a.isNullAt($idx) || $b.isNullAt($idx)) { $anyNull = true; }
       |  else { $s += $a.getDouble($idx) * $b.getDouble($idx); }
       |}
       |if ($anyNull) { $evIsNull = true; } else { $evValue = $s; }
       |""".stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σⱼ lut[j·k + codes[j]] — the PQ asymmetric-distance fold over a
  * per-probe subspace lookup table (PqOps scaladoc; Jégou et al. 2011).
  * Children: codes ARRAY<INT> (length m), lut ARRAY<DOUBLE> (length
  * m·k), k INT. Same left-to-right double accumulation as the HOF form
  * `aggregate(sequence(0,m-1), 0.0, (acc,j) => acc + element_at(lut,
  * j·k + codes[j+1] + 1))`, so swapping them cannot flip an oracle
  * hash. NULL input, NULL element, or out-of-range lookup → NULL
  * (element_at's non-ANSI behavior).
  */
case class PqAdcExpr(codes: Expression, lut: Expression, kExpr: Expression)
    extends TernaryExpression {
  override def prettyName: String = "pq_adc"
  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = kExpr
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, lut.dataType, kExpr.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (c, l, kk) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<INT>, ARRAY<DOUBLE>, INT), " +
        s"got ${c.simpleString}, ${l.simpleString}, ${kk.simpleString}")
  }

  override def nullSafeEval(codesV: Any, lutV: Any, kV: Any): Any = {
    val cs = codesV.asInstanceOf[ArrayData]
    val lt = lutV.asInstanceOf[ArrayData]
    val k = kV.asInstanceOf[Int]
    val m = cs.numElements(); val ln = lt.numElements()
    var s = 0.0; var j = 0
    while (j < m) {
      if (cs.isNullAt(j)) return null
      val idx = j * k + cs.getInt(j)
      if (idx < 0 || idx >= ln || lt.isNullAt(idx)) return null
      s += lt.getDouble(idx); j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, lt, kV) => {
      val m = ctx.freshName("m"); val ln = ctx.freshName("ln")
      val j = ctx.freshName("j"); val idx = ctx.freshName("idx")
      val s = ctx.freshName("s"); val anyNull = ctx.freshName("anyNull")
      s"""int $m = $cs.numElements();
         |int $ln = $lt.numElements();
         |double $s = 0.0;
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $m && !$anyNull; $j++) {
         |  if ($cs.isNullAt($j)) { $anyNull = true; }
         |  else {
         |    int $idx = $j * $kV + $cs.getInt($j);
         |    if ($idx < 0 || $idx >= $ln || $lt.isNullAt($idx)) { $anyNull = true; }
         |    else { $s += $lt.getDouble($idx); }
         |  }
         |}
         |if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(codes = newFirst, lut = newSecond, kExpr = newThird)
}

/** √ Σ (aᵢ−bᵢ)² — Euclidean distance (graph_creator.py:350). */
case class L2DistanceExpr(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "l2_distance"

  override protected def fold(a: ArrayData, b: ArrayData): Any = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val t = a.getDouble(i) - b.getDouble(i); s += t * t; i += 1
    }
    math.sqrt(s)
  }

  override protected def genLoop(ctx: CodegenContext, evValue: String, evIsNull: String,
      a: String, b: String): String = {
    val n = ctx.freshName("n"); val idx = ctx.freshName("idx")
    val s = ctx.freshName("s"); val anyNull = ctx.freshName("anyNull")
    val t = ctx.freshName("t")
    s"""int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $s = 0.0;
       |boolean $anyNull = false;
       |for (int $idx = 0; $idx < $n && !$anyNull; $idx++) {
       |  if ($a.isNullAt($idx) || $b.isNullAt($idx)) { $anyNull = true; }
       |  else { double $t = $a.getDouble($idx) - $b.getDouble($idx); $s += $t * $t; }
       |}
       |if ($anyNull) { $evIsNull = true; }
       |else { $evValue = java.lang.Math.sqrt($s); }
       |""".stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
