package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** O-55 batched NN emotion inference (emotion_analysis/model.py:108-141)
  * as the Spark-idiomatic model-inference pattern: `mapPartitions` with a
  * ONE-PER-PARTITION model handle, micro-batched inside the partition
  * (reference batch_size=16), emitting one probability row per window.
  *
  * The model itself is a deterministic stand-in (per SURVEY §2.8 O-55 and
  * the builder brief's stub guidance): "logits" are bytes of the window
  * text's md5, pushed through a real softmax. Everything AROUND the model
  * — per-partition init, batching, schema, row shape — is the production
  * pattern; swapping in ONNX Runtime replaces only [[StubModel]].
  *
  * Scale: no shuffle, no driver involvement; the expensive handle is
  * created once per partition (not per row), exactly why this is
  * mapPartitions and not a scalar expression.
  */
object Inference {

  val EmotionLabels: Seq[String] =
    Seq("sadness", "joy", "love", "anger", "fear", "surprise")

  /** The heavyweight "model handle" a real ONNX session would be. */
  final class StubModel {
    private val digest = MessageDigest.getInstance("MD5")

    /** One forward pass over a micro-batch of texts → 6 probs each. */
    def predictBatch(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
      digest.reset()
      val h = digest.digest(t.getBytes("UTF-8"))
      val logits = (0 until 6).map(j => (h(j) & 0xff) / 64.0).toArray
      val m = logits.max
      val exps = logits.map(x => math.exp(x - m))
      val z = exps.sum
      exps.map(_ / z)
    }
  }

  /** Appends the 6 emotion-probability columns to a window frame. */
  def scoreWindows(windows: DataFrame, textCol: String,
      batchSize: Int = 16): DataFrame = {
    val schema = StructType(windows.schema.fields ++
      EmotionLabels.map(l => StructField(l, DoubleType, nullable = false)))
    val textIdx = windows.schema.fieldIndex(textCol)
    val rdd = windows.rdd.mapPartitions { it =>
      val model = new StubModel // per-partition init — the whole point
      it.grouped(batchSize).flatMap { batch =>
        val probs = model.predictBatch(batch.map(_.getString(textIdx)))
        batch.lazyZip(probs).map { (r, p) => Row.fromSeq(r.toSeq ++ p) }
      }
    }
    windows.sparkSession.createDataFrame(rdd, schema)
  }
}
