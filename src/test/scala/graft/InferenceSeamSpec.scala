package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Inference

/** VERDICT r5 "What's missing" #5: prove the O-55 model seam with a
  * SECOND implementation behind the same per-partition handle — the
  * swap must touch nothing outside the factory argument.
  */
class InferenceSeamSpec extends SparkSpec {

  private def windows: DataFrame = {
    import spark.implicits._
    Seq((1L, "a calm day by the sea"), (2L, "sudden loud 3 alarms !!"),
      (3L, "numbers 123 456 789"), (4L, ""), (5L, "love and joy and fear"))
      .toDF("doc_id", "win").repartition(3)
  }

  private def collectProbs(df: DataFrame): Map[Long, Seq[Double]] =
    df.collect().map(r => r.getLong(0) ->
      Inference.EmotionLabels.indices.map(i => r.getDouble(2 + i))).toMap

  test("both models run through the identical operator: schema + batching fixed") {
    val stub = Inference.scoreWindows(windows, "win")
    val linear = Inference.scoreWindows(windows, "win",
      modelFactory = () => new Inference.LinearModel())
    assert(stub.schema === linear.schema)
    val (ps, pl) = (collectProbs(stub), collectProbs(linear))
    assert(ps.keySet === pl.keySet)
    // valid distributions from both implementations
    (ps.values ++ pl.values).foreach { p =>
      assert(math.abs(p.sum - 1.0) < 1e-9)
      assert(p.forall(x => x >= 0 && x <= 1))
    }
    // ...but genuinely different models (the seam carries the behavior)
    assert(ps.keys.exists(k => ps(k) != pl(k)))
  }

  test("each implementation is deterministic across runs and partitionings") {
    val a = collectProbs(Inference.scoreWindows(windows, "win",
      modelFactory = () => new Inference.LinearModel()))
    val b = collectProbs(Inference.scoreWindows(windows.repartition(1), "win",
      batchSize = 2, modelFactory = () => new Inference.LinearModel()))
    assert(a === b)
  }

  test("ONNX model file: parse + forward pass matches LinearModel (r7 #6)") {
    // the checked-in fixture carries LinearModel's weights in unit
    // space as float32, so probabilities agree to float precision
    val onnx = new Inference.OnnxModel()
    val linear = new Inference.LinearModel()
    val texts = Seq("a calm day by the sea", "sudden loud 3 alarms !!",
      "", "love and joy and fear", "x" * 500)
    val po = onnx.predictBatch(texts)
    val pl = linear.predictBatch(texts)
    po.lazyZip(pl).foreach { (o, l) =>
      assert(math.abs(o.sum - 1.0) < 1e-9)
      o.lazyZip(l).foreach((a, b) => assert(math.abs(a - b) < 1e-5,
        s"onnx $a vs linear $b"))
    }
  }

  test("ONNX model slots into the operator seam unchanged") {
    val out = Inference.scoreWindows(windows, "win",
      modelFactory = () => new Inference.OnnxModel())
    assert(out.schema === Inference.scoreWindows(windows, "win").schema)
    collectProbs(out).values.foreach { p =>
      assert(math.abs(p.sum - 1.0) < 1e-9)
      assert(p.forall(x => x >= 0 && x <= 1))
    }
  }

  test("tiny 2-layer transformer runs through the operator seam (r8 #3)") {
    // per-text token sequence → transformer encoder → mean-pooled
    // logits → softmax: the roberta-head shape behind the SAME
    // per-partition handle. Per-text evaluation keeps the contract
    // scoreWindows relies on — a row's score must not depend on which
    // batch/partition it landed in.
    import graft.operators.OnnxMini
    val bytes = OnnxFixture.tinyTransformerBytes(pool = true)
    class TransformerModel extends Inference.Model {
      private val m = OnnxMini.parse(bytes)
      private val featurizer = new Inference.LinearModel()
      override def predictBatch(texts: Seq[String]): Seq[Array[Double]] =
        texts.map { t =>
          val toks = t.split("\\s+").filter(_.nonEmpty).take(16)
          val seqToks = if (toks.isEmpty) Array("") else toks
          val x = seqToks.map(tok =>
            featurizer.featuresBp(tok).map(v => (v / 1e4).toFloat))
          val logits = OnnxMini.run(m, x)(0).map(_.toDouble)
          val mx = logits.max
          val ex = logits.map(v => math.exp(v - mx))
          ex.map(_ / ex.sum)
        }
    }
    val out = Inference.scoreWindows(windows, "win",
      modelFactory = () => new TransformerModel)
    assert(out.schema === Inference.scoreWindows(windows, "win").schema)
    val p1 = collectProbs(out)
    p1.values.foreach { p =>
      assert(math.abs(p.sum - 1.0) < 1e-9)
      assert(p.forall(x => x >= 0 && x <= 1))
    }
    // deterministic under repartitioning + batch-size changes
    val p2 = collectProbs(Inference.scoreWindows(windows.repartition(1), "win",
      batchSize = 2, modelFactory = () => new TransformerModel))
    assert(p1 === p2)
    // the in-memory bytes path is the same class the resource path uses
    val viaFactory = Inference.OnnxModel.fromBytes(OnnxFixture.emotionMlpBytes())
    assert(viaFactory.predictBatch(Seq("seam check")).head.sum > 0.99)
  }

  test("quantized ONNX path emits LinearModel's exact integer logits (r14)") {
    // the q_infer_onnx contract: the float32 Gemm over the quantized
    // fixture is exact-integer by construction, so the ONNX forward
    // pass must reproduce the LinearModel's ×1e6 logits BIT-FOR-BIT —
    // including emoji (surrogate pairs land in the punct class once),
    // long texts (capped length feature), and empty strings
    val onnx = new Inference.OnnxLogitModel()
    val lin = new Inference.LinearModel()
    val texts = Seq(
      "", " ", "plain text with vowels", "UPPER 12345 !!!",
      "😀 emoji and spaces 🎉", "a" * 500,
      "mixed 42 Words, punct; and\nnewlines\ttabs",
      (1 to 100).map(i => s"tok$i").mkString(" "))
    assert(onnx.logitsE6Batch(texts).map(_.toSeq) ===
      lin.logitsE6Batch(texts).map(_.toSeq))
    // and the checked-in resource is byte-identical to the generator
    val in = classOf[Inference.OnnxLogitModel]
      .getResourceAsStream("/graft/emotion_mlp_q.onnx")
    val resBytes = try in.readAllBytes() finally in.close()
    assert(resBytes.toSeq === OnnxFixture.emotionMlpQBytes().toSeq)
  }

  test("OnnxMini fails loudly on unsupported graphs, not silently") {
    // an unsupported op must throw at run time — a skipped node would
    // silently mis-score every row
    import graft.operators.OnnxMini
    val m = OnnxMini.parse(OnnxFixture.emotionMlpBytes())
    val bad = m.copy(nodes = m.nodes.map(_.copy(opType = "Conv")))
    intercept[IllegalArgumentException](OnnxMini.run(bad, Array(Array.fill(5)(0f))))
  }
}
