package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Inference, OnnxMini}

/** VERDICT r8 #3: transformer-class ops in the ONNX interpreter. The
  * checks avoid re-implementing the arithmetic under test: they pin
  * structural invariants (permutation equivariance of attention without
  * positional encoding, fused-vs-composed LayerNorm agreement, Split/
  * Concat round trip) plus the fail-loudly contract for everything the
  * interpreter refuses.
  */
class OnnxTransformerSpec extends AnyFunSuite {

  private def mkInput(seq: Int, nIn: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(seq, nIn)((rnd.nextDouble() * 2 - 1).toFloat)
  }

  test("2-layer transformer: parse + forward pass, per-row logits") {
    val m = OnnxMini.parse(OnnxFixture.tinyTransformerBytes())
    val x = mkInput(4, 5, seed = 7)
    val out = OnnxMini.run(m, x)
    assert(out.length === 4)
    assert(out.forall(_.length === 6))
    assert(out.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
    // two different rows must score differently (the graph is not
    // collapsing everything to a constant)
    assert(out(0).toSeq !== out(1).toSeq)
  }

  test("no positional encoding => permutation equivariance (attention wiring)") {
    // reversing the token rows must reverse the output rows: every
    // attention score q_i·k_j exists under both orders, only summation
    // order differs — a wrong Split/Transpose/Concat wiring breaks this
    // immediately, while a per-row MLP would pass trivially only if
    // attention were not mixing rows (checked separately below)
    val m = OnnxMini.parse(OnnxFixture.tinyTransformerBytes())
    val x = mkInput(5, 5, seed = 11)
    val fwd = OnnxMini.run(m, x)
    val rev = OnnxMini.run(m, x.reverse)
    fwd.reverse.lazyZip(rev).foreach { (a, b) =>
      a.lazyZip(b).foreach((u, v) => assert(math.abs(u - v) < 1e-4f))
    }
    // ...and attention genuinely mixes rows: changing row 4 changes row 0
    val x2 = x.map(_.clone)
    x2(4)(0) += 2.5f
    val out2 = OnnxMini.run(m, x2)
    assert(fwd(0).lazyZip(out2(0)).exists((u, v) => math.abs(u - v) > 1e-6f))
  }

  test("mean-pooled head: permutation INVARIANT, one row out") {
    val m = OnnxMini.parse(OnnxFixture.tinyTransformerBytes(pool = true))
    val x = mkInput(6, 5, seed = 13)
    val a = OnnxMini.run(m, x)
    val b = OnnxMini.run(m, new scala.util.Random(3).shuffle(x.toSeq).toArray)
    assert(a.length === 1 && a(0).length === 6)
    a(0).lazyZip(b(0)).foreach((u, v) => assert(math.abs(u - v) < 1e-4f))
  }

  test("fused LayerNormalization == composed ReduceMean/Sub/Mul/Sqrt/Div") {
    import OnnxFixture._
    val (n, c) = (3, 8)
    val scale = Array.tabulate(c)(i => 0.5f + 0.1f * i)
    val bias = Array.tabulate(c)(i => -0.2f + 0.05f * i)
    val eps = 1e-5f
    val fused = modelBytes(
      Seq(N("LayerNormalization", Seq("x", "g", "b"), Seq("y"),
        FloatAttr("epsilon", eps))),
      Seq(("g", Seq(c), scale), ("b", Seq(c), bias)), "x", "y")
    val composed = modelBytes(
      Seq(
        N("ReduceMean", Seq("x"), Seq("mu"), IntsAttr("axes", Seq(-1L))),
        N("Sub", Seq("x", "mu"), Seq("d")),
        N("Mul", Seq("d", "d"), Seq("sq")),
        N("ReduceMean", Seq("sq"), Seq("var"), IntsAttr("axes", Seq(-1L))),
        N("Add", Seq("var", "eps"), Seq("ve")),
        N("Sqrt", Seq("ve"), Seq("sd")),
        N("Div", Seq("d", "sd"), Seq("z")),
        N("Mul", Seq("z", "g"), Seq("zg")),
        N("Add", Seq("zg", "b"), Seq("y"))),
      Seq(("g", Seq(c), scale), ("b", Seq(c), bias),
        ("eps", Seq(1, 1), Array(eps))), "x", "y")
    val x = mkInput(n, c, seed = 17)
    val yf = OnnxMini.run(OnnxMini.parse(fused), x)
    val yc = OnnxMini.run(OnnxMini.parse(composed), x)
    yf.lazyZip(yc).foreach { (a, b) =>
      a.lazyZip(b).foreach((u, v) => assert(math.abs(u - v) < 1e-4f))
    }
  }

  test("Gelu exact vs tanh approximation agree to ~1e-3 on small inputs") {
    import OnnxFixture._
    def gelu(approx: String) = OnnxMini.parse(modelBytes(
      Seq(N("Gelu", Seq("x"), Seq("y"), StrAttr("approximate", approx))),
      Seq.empty, "x", "y"))
    val x = mkInput(2, 16, seed = 19)
    val exact = OnnxMini.run(gelu("none"), x)
    val tanh = OnnxMini.run(gelu("tanh"), x)
    exact.lazyZip(tanh).foreach { (a, b) =>
      a.lazyZip(b).foreach((u, v) => assert(math.abs(u - v) < 2e-3f))
    }
    // monotone-ish sanity at the anchor points gelu(0)=0, gelu(3)≈3
    val anchors = OnnxMini.run(gelu("none"), Array(Array(0f, 3f, -10f)))
    assert(math.abs(anchors(0)(0)) < 1e-6f)
    assert(math.abs(anchors(0)(1) - 2.9959502f) < 1e-3f)
    assert(math.abs(anchors(0)(2)) < 1e-6f)
  }

  test("Split/Concat round trip is the identity") {
    import OnnxFixture._
    val m = OnnxMini.parse(modelBytes(
      Seq(
        N("Split", Seq("x"), Seq("a", "b", "c"), IntAttr("axis", -1L)),
        N("Concat", Seq("a", "b", "c"), Seq("y"), IntAttr("axis", -1L))),
      Seq.empty, "x", "y"))
    val x = mkInput(3, 9, seed = 23)
    val y = OnnxMini.run(m, x)
    x.lazyZip(y).foreach((a, b) => assert(a.toSeq === b.toSeq))
  }

  test("fail-loudly: refused attrs and shapes throw, never skip") {
    import OnnxFixture._
    def run1(node: N, cols: Int = 6): Unit = {
      val m = OnnxMini.parse(modelBytes(Seq(node), Seq.empty, "x", "y"))
      OnnxMini.run(m, mkInput(2, cols, seed = 29))
      ()
    }
    intercept[IllegalArgumentException](run1(
      N("Gelu", Seq("x"), Seq("y"), StrAttr("approximate", "fancy"))))
    intercept[IllegalArgumentException](run1(
      N("ReduceMean", Seq("x"), Seq("y"), IntsAttr("axes", Seq(-1L)),
        IntAttr("keepdims", 0L))))
    intercept[IllegalArgumentException](run1(
      N("ReduceMean", Seq("x"), Seq("y"), IntsAttr("axes", Seq(0L, 1L)))))
    intercept[IllegalArgumentException](run1(
      N("Transpose", Seq("x"), Seq("y"), IntsAttr("perm", Seq(0L, 1L)))))
    intercept[IllegalArgumentException](run1(
      N("Softmax", Seq("x"), Seq("y"), IntAttr("axis", 0L))))
    intercept[IllegalArgumentException](run1(
      N("Split", Seq("x"), Seq("a", "b", "c", "d"), IntAttr("axis", -1L))))
  }
}
