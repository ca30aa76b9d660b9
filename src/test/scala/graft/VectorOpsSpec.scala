package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps._
import graft.operators.{Inference, Ordinals}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def evalD(c: org.apache.spark.sql.Column): Double =
    spark.range(1).select(c.cast("double").as("v")).head().getDouble(0)

  test("dot / l2 / cosine on known vectors") {
    val a = array(lit(1.0), lit(0.0))
    val b = array(lit(0.0), lit(1.0))
    assert(evalD(dot(a, b)) == 0.0)
    assert(math.abs(evalD(l2Distance(a, b)) - math.sqrt(2)) < 1e-12)
    assert(math.abs(evalD(cosineSimilarity(a, a)) - 1.0) < 1e-12)
    assert(evalD(cosineSimilarity(a, b)) == 0.0)
    val c = array(lit(3.0), lit(4.0))
    assert(math.abs(evalD(norm2(c)) - 5.0) < 1e-12)
  }

  test("global ordinals match row_number semantics without a global window") {
    val df = (1 to 97).reverse.map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val withOrd = Ordinals.withGlobalOrdinal(df, "rn", col("k"))
    val rows = withOrd.orderBy("rn").collect()
    assert(rows.map(_.getAs[Long]("rn")).toSeq == (1L to 97L),
      "ordinals must be contiguous from 1")
    assert(rows.map(_.getAs[Long]("k")).toSeq == (1L to 97L),
      "ordinal order must follow the sort key")
  }

  test("inference stub: per-window probabilities are a distribution and deterministic") {
    val df = Seq((0L, "hello world"), (1L, "other text")).toDF("doc_id", "win")
    val out1 = Inference.scoreWindows(df, "win").collect().sortBy(_.getLong(0))
    val out2 = Inference.scoreWindows(df, "win").collect().sortBy(_.getLong(0))
    assert(out1.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq, "must be deterministic")
    out1.foreach { r =>
      val probs = Inference.EmotionLabels.map(l => r.getAs[Double](l))
      assert(math.abs(probs.sum - 1.0) < 1e-9, "softmax must sum to 1")
      assert(probs.forall(p => p > 0 && p < 1))
    }
  }
}
