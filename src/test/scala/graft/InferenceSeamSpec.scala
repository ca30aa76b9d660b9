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

  test("OnnxMini fails loudly on unsupported graphs, not silently") {
    // an unsupported op must throw at run time — a skipped node would
    // silently mis-score every row
    import graft.operators.OnnxMini
    val m = OnnxMini.parse(OnnxFixture.emotionMlpBytes())
    val bad = m.copy(nodes = m.nodes.map(_.copy(opType = "Conv")))
    intercept[IllegalArgumentException](OnnxMini.run(bad, Array(Array.fill(5)(0f))))
  }
}
