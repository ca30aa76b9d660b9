package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** O-55 batched NN emotion inference (emotion_analysis/model.py:108-141)
  * as the Spark-idiomatic model-inference pattern: `mapPartitions` with a
  * ONE-PER-PARTITION model handle, micro-batched inside the partition
  * (reference batch_size=16), emitting one probability row per window.
  *
  * The model behind the handle is pluggable ([[Inference.Model]]): the
  * default [[Inference.StubModel]] is the deterministic stand-in (per
  * SURVEY §2.8 O-55 and the builder brief's stub guidance — md5 bytes
  * through a real softmax), and [[Inference.LinearModel]] is a second,
  * weights-loaded-from-classpath implementation proving the seam: an
  * ONNX session would slot in the same way, replacing ONLY the factory
  * passed to [[Inference.scoreWindows]] (asserted in InferenceSeamSpec).
  *
  * Scale: no shuffle, no driver involvement; the expensive handle is
  * created once per partition (not per row), exactly why this is
  * mapPartitions and not a scalar expression.
  */
object Inference {

  val EmotionLabels: Seq[String] =
    Seq("sadness", "joy", "love", "anger", "fear", "surprise")

  /** The per-partition model handle contract: batch of texts in, one
    * 6-probability row per text out. Implementations are constructed
    * INSIDE the partition (via the factory), so heavyweight state —
    * an ONNX session, native buffers, weight files — never rides the
    * closure and is never shared across threads.
    */
  trait Model {
    def predictBatch(texts: Seq[String]): Seq[Array[Double]]
  }

  protected[operators] def softmax(logits: Array[Double]): Array[Double] = {
    val m = logits.max
    val exps = logits.map(x => math.exp(x - m))
    val z = exps.sum
    exps.map(_ / z)
  }

  /** Deterministic stand-in: "logits" are bytes of the text's md5. */
  final class StubModel extends Model {
    private val digest = MessageDigest.getInstance("MD5")

    override def predictBatch(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
      digest.reset()
      val h = digest.digest(t.getBytes("UTF-8"))
      softmax((0 until 6).map(j => (h(j) & 0xff) / 64.0).toArray)
    }
  }

  /** A real (if tiny) scorer: per-class linear model over surface text
    * features, weights loaded from a classpath resource at handle-init
    * time — the same lifecycle a serialized model file would have.
    * Resource format: 6 lines (one per [[EmotionLabels]] class), each
    * `w1..w5 bias` whitespace-separated.
    */
  final class LinearModel(resource: String = "/graft/emotion_linear.tsv") extends Model {
    private val weights: Array[Array[Double]] = {
      val in = getClass.getResourceAsStream(resource)
      require(in != null, s"model resource $resource not on classpath")
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.trim.nonEmpty)
        .map(_.trim.split("\\s+").map(_.toDouble)).toArray
      finally in.close()
    }
    require(weights.length == 6 && weights.forall(_.length == 6),
      "expected 6 rows of 5 weights + bias")

    private def features(t: String): Array[Double] = {
      val n = math.max(t.length, 1)
      Array(
        math.min(t.length / 100.0, 2.0),
        t.count(c => "aeiouAEIOU".indexOf(c) >= 0).toDouble / n,
        t.count(_.isDigit).toDouble / n,
        t.count(_ == ' ').toDouble / n,
        t.count(c => !c.isLetterOrDigit && c != ' ').toDouble / n)
    }

    override def predictBatch(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
      val f = features(t)
      softmax(weights.map(w =>
        w.last + w.iterator.take(5).zip(f.iterator).map { case (a, b) => a * b }.sum))
    }
  }

  /** Appends the 6 emotion-probability columns to a window frame. The
    * model factory runs once per partition; swapping implementations
    * changes nothing else — schema, batching, and row shape are fixed
    * by this operator, not the model.
    */
  def scoreWindows(windows: DataFrame, textCol: String,
      batchSize: Int = 16,
      modelFactory: () => Model = () => new StubModel): DataFrame = {
    val schema = StructType(windows.schema.fields ++
      EmotionLabels.map(l => StructField(l, DoubleType, nullable = false)))
    val textIdx = windows.schema.fieldIndex(textCol)
    val rdd = windows.rdd.mapPartitions { it =>
      val model = modelFactory() // per-partition init — the whole point
      it.grouped(batchSize).flatMap { batch =>
        val probs = model.predictBatch(batch.map(_.getString(textIdx)))
        batch.lazyZip(probs).map { (r, p) => Row.fromSeq(r.toSeq ++ p) }
      }
    }
    windows.sparkSession.createDataFrame(rdd, schema)
  }
}
