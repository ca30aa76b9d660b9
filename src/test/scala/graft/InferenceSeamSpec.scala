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
}
