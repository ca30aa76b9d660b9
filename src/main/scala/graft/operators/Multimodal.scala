package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal column processing (builder brief): image/audio/video as
  * opaque BINARY payloads with typed metadata, decoded/featurized in
  * batches inside `mapPartitions`.
  *
  * The container has no codec libraries, so [[StubCodec]] is a
  * deterministic stand-in (per the brief's stub guidance) deriving
  * "decoded" properties from the payload bytes; everything around it —
  * binary column in, per-partition codec handle, micro-batching, typed
  * feature struct out, frame sampling — is the production shape. A real
  * deployment swaps StubCodec for JNI/FFmpeg/libvips behind the same
  * two methods.
  *
  * Scale: stateless over partitions, no shuffle; payload bytes never
  * move except partition-locally; output is narrow typed features, so
  * downstream pruning drops the heavy binary column at the scan.
  */
object Multimodal {

  /** The per-partition "codec handle" (a real one is expensive to open). */
  final class StubCodec {
    /** "Decode" fixed properties from the payload header bytes. */
    def probe(payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 320 + math.floorMod(h, 8) * 160
      val height = 240 + math.floorMod(h >> 3, 8) * 120
      val nFrames = 1 + math.floorMod(h >> 6, 240)
      (width, height, nFrames)
    }

    /** "Sample" every `stride`-th frame: here a byte slice per frame. */
    def sampleFrames(payload: Array[Byte], nFrames: Int, stride: Int): Seq[Array[Byte]] =
      (0 until nFrames by stride).map { f =>
        val off = math.floorMod(f * 7, math.max(1, payload.length))
        java.util.Arrays.copyOfRange(payload, off,
          math.min(payload.length, off + 4))
      }

    def close(): Unit = ()
  }

  private val featSchema = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_sampled", IntegerType, nullable = false),
    StructField("sampled_bytes", IntegerType, nullable = false)))

  /** Appends a `decoded` feature struct to a frame with a BINARY
    * `payloadCol`, decoding in `batchSize` groups per partition.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String,
      frameStride: Int = 24, batchSize: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("decoded", featSchema, nullable = false))
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      val codec = new StubCodec // once per partition, like Inference
      val out = it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]](idx)
          val (w, h, n) = codec.probe(payload)
          val frames = codec.sampleFrames(payload, n, frameStride)
          Row.fromSeq(r.toSeq :+ Row(w, h, n, frames.size, frames.map(_.length).sum))
        }
      }
      out // iterator; codec lives for the partition lifetime
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
