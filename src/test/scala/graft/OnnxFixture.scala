package graft

import graft.operators.Inference

/** Builder for the checked-in ONNX fixture (`graft/emotion_mlp.onnx`):
  * a single-Gemm head `logits = x·Wᵀ + b` carrying [[Inference.LinearModel]]'s
  * weights in unit space (centi/100 as float32). The writer emits the
  * protobuf wire format directly — the mirror of `OnnxMini`'s reader —
  * so the fixture is a genuine ONNX file any runtime can load, and the
  * generator (`MakeOnnxFixture`) documents exactly how the binary in
  * resources was produced.
  */
object OnnxFixture {

  /** Minimal protobuf writer: varints + length-delimited submessages. */
  final class W {
    private val buf = new java.io.ByteArrayOutputStream()
    def varint(v: Long): W = {
      var x = v
      while ((x & ~0x7fL) != 0) { buf.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt)
      this
    }
    def tag(field: Int, wire: Int): W = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): W = {
      tag(field, 2); varint(b.length); buf.write(b); this
    }
    def str(field: Int, s: String): W = bytes(field, s.getBytes("UTF-8"))
    def int(field: Int, v: Long): W = { tag(field, 0); varint(v) }
    def msg(field: Int)(f: W => Unit): W = {
      val sub = new W; f(sub); bytes(field, sub.toBytes)
    }
    def packedFloats(field: Int, vs: Array[Float]): W = {
      val bb = java.nio.ByteBuffer.allocate(vs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putFloat)
      bytes(field, bb.array())
    }
    def toBytes: Array[Byte] = buf.toByteArray
  }

  /** TensorProto: dims=1, data_type=2 (1=FLOAT), float_data=4, name=8. */
  private def tensor(w: W, field: Int, name: String, dims: Seq[Int],
      data: Array[Float]): Unit =
    w.msg(field) { t =>
      dims.foreach(d => t.int(1, d))
      t.int(2, 1)
      t.packedFloats(4, data)
      t.str(8, name)
    }

  /** ModelProto with one Gemm(x, W, b, transB=1) node. */
  def gemmModelBytes(weights: Array[Array[Float]],
      bias: Array[Float]): Array[Byte] = {
    val out = new W
    out.int(1, 8) // ir_version
    out.msg(8)(op => op.int(2, 13)) // opset_import { version = 13 }
    out.msg(7) { g => // GraphProto
      g.msg(1) { n => // NodeProto
        n.str(1, "x"); n.str(1, "W"); n.str(1, "b")
        n.str(2, "logits")
        n.str(4, "Gemm")
        n.msg(5) { a => a.str(1, "transB"); a.int(3, 1) } // AttributeProto
      }
      g.str(2, "emotion_mlp") // graph name
      tensor(g, 5, "W", Seq(weights.length, weights(0).length), weights.flatten)
      tensor(g, 5, "b", Seq(bias.length), bias)
      g.msg(11)(v => v.str(1, "x"))      // ValueInfoProto input
      g.msg(12)(v => v.str(1, "logits")) // ValueInfoProto output
    }
    out.toBytes
  }

  /** The fixture's exact contents: LinearModel centi-weights / 100. */
  def emotionMlpBytes(): Array[Byte] = {
    val cw = new Inference.LinearModel().centiWeights
    val w = cw.map(_.take(5).map(v => v / 100.0f))
    val b = cw.map(r => r(5) / 100.0f)
    gemmModelBytes(w, b)
  }
}

/** One-shot generator for `src/main/resources/graft/emotion_mlp.onnx` —
  * run `sbt "Test/runMain graft.MakeOnnxFixture"` to (re)produce the
  * checked-in binary.
  */
object MakeOnnxFixture {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get("src/main/resources/graft/emotion_mlp.onnx")
    java.nio.file.Files.write(out, OnnxFixture.emotionMlpBytes())
    println(s"wrote $out (${OnnxFixture.emotionMlpBytes().length} bytes)")
  }
}
