package graft.operators

/** Minimal ONNX reader + interpreter for small feed-forward graphs.
  *
  * The container has no onnxruntime jar (offline resolver), so the
  * O-55 seam's "real model file" implementation parses the ONNX
  * serialization itself: ONNX models are protobuf messages (public
  * schema `onnx/onnx.proto`), and the protobuf wire format is just
  * varints + length-delimited blocks — small enough to read without a
  * generated binding. Field numbers below cite onnx.proto.
  *
  * Supported graph subset: `Gemm` (transA=0/alpha=beta=1), `MatMul`,
  * elementwise `Add`/`Sub`/`Mul`/`Div`/`Pow` with 2-D numpy broadcast,
  * `Relu`, `Sigmoid`, `Tanh`, `Erf`, `Gelu` (exact + tanh approx),
  * `Sqrt`, `Softmax` (last axis), `ReduceMean` (keepdims, one axis),
  * `LayerNormalization`, `Transpose` (2-D), `Split`/`Concat` (for
  * multi-head attention composed from MatMuls), `Identity`; float32
  * initializers in `raw_data` or `float_data`. Enough for MLP heads AND
  * small transformer encoders (attention is Q/K/V Gemms → scores
  * MatMul → scale → Softmax → context MatMul, per head via Split/
  * Concat; the reference's roberta head is this shape,
  * `/root/reference/src/backend/emotion_analysis/model.py:108-141`).
  * Tensors are dense 2-D [rows, cols] — a batch of feature rows or a
  * token sequence of hidden states. Anything else fails loudly — a
  * silent skip would mis-score.
  *
  * This is deliberately an INTERPRETER of the public format, not a
  * re-implementation of onnxruntime: the engine-side contract being
  * proven is the [[Inference.Model]] seam (per-partition handle, batch
  * in → probabilities out); swapping this class for a real ORT session
  * changes nothing upstream (`InferenceSeamSpec`).
  */
object OnnxMini {

  final case class Tensor(name: String, dims: Seq[Int], data: Array[Float])
  final case class Node(opType: String, inputs: Seq[String],
      outputs: Seq[String], intAttrs: Map[String, Long],
      floatAttrs: Map[String, Float] = Map.empty,
      intsAttrs: Map[String, Seq[Long]] = Map.empty,
      strAttrs: Map[String, String] = Map.empty)
  final case class Model(nodes: Seq[Node], inits: Map[String, Tensor],
      inputName: String, outputName: String)

  // ---- protobuf wire-format reader ----

  private final class Reader(val b: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var out = 0L
      while ({
        require(pos < end, s"varint runs past window $end")
        // Scala's Long << wraps the shift mod 64, so a 10-byte varint
        // (canonical encoding of a negative int attr from some
        // exporters) would decode to a silently wrong value — refuse it
        require(shift < 64, s"varint wider than 64 bits at pos $pos")
        val v = b(pos); pos += 1
        out |= (v & 0x7fL) << shift; shift += 7
        (v & 0x80) != 0
      }) ()
      out
    }
    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    /** Length-delimited payload as a sub-reader. */
    def readSub(): Reader = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, s"submessage len $len past window $end")
      val r = new Reader(b, pos, pos + len)
      pos += len
      r
    }
    def readString(): String = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, s"string len $len past window $end")
      val s = new String(b, pos, len, "UTF-8")
      pos += len
      s
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 =>
        // read the length BEFORE adding: `pos += readVarint()` snapshots
        // the pre-read pos on the left of +=
        val len = readVarint().toInt
        require(len >= 0 && pos + len <= end, s"skip len $len past window $end")
        pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(
        s"wire type $w at pos $pos (window $end)")
    }
    def readFloatLE(): Float = {
      // bounds-checked against the SUBMESSAGE window: a float payload
      // whose length is not a multiple of 4 would otherwise silently
      // read the next field's bytes as a garbage weight
      require(pos + 4 <= end, s"float32 runs past window $end (pos $pos)")
      val bits = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  // ---- onnx.proto message parsers (field numbers cited) ----

  def parse(bytes: Array[Byte]): Model = {
    // ModelProto: graph = field 7
    val r = new Reader(bytes, 0, bytes.length)
    var graph: Reader = null
    while (r.hasNext) r.readTag() match {
      case (7, 2) => graph = r.readSub()
      case (_, w) => r.skip(w)
    }
    require(graph != null, "ModelProto has no graph (field 7)")
    parseGraph(graph)
  }

  private def parseGraph(g: Reader): Model = {
    // GraphProto: node=1, initializer=5, input=11, output=12
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    var inputName: String = null
    var outputName: String = null
    val initNames = scala.collection.mutable.Set.empty[String]
    val pending = scala.collection.mutable.ListBuffer.empty[(String, () => Unit)]
    while (g.hasNext) g.readTag() match {
      case (1, 2)  => nodes += parseNode(g.readSub())
      case (5, 2)  =>
        val t = parseTensor(g.readSub()); inits += t.name -> t; initNames += t.name
      case (11, 2) =>
        val n = valueInfoName(g.readSub())
        // graph `input` lists initializers too in some exporters; the
        // model input is the one WITHOUT an initializer
        pending += ((n, () => if (inputName == null && !initNames(n)) inputName = n))
      case (12, 2) => if (outputName == null) outputName = valueInfoName(g.readSub())
      case (_, w)  => g.skip(w)
    }
    pending.foreach(_._2())
    require(inputName != null && outputName != null,
      "graph missing input/output value info")
    Model(nodes.result(), inits.result(), inputName, outputName)
  }

  private def parseNode(n: Reader): Node = {
    // NodeProto: input=1, output=2, op_type=4, attribute=5
    val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]
    var op = ""
    val attrs = Map.newBuilder[String, Long]
    val fattrs = Map.newBuilder[String, Float]
    val iattrs = Map.newBuilder[String, Seq[Long]]
    val sattrs = Map.newBuilder[String, String]
    while (n.hasNext) n.readTag() match {
      case (1, 2) => ins += n.readString()
      case (2, 2) => outs += n.readString()
      case (4, 2) => op = n.readString()
      case (5, 2) =>
        // AttributeProto: name=1, f=2 (float — Gemm alpha/beta, LN
        // epsilon), i=3 (int — trans flags, axis), s=4 (string — Gelu
        // approximate), ints=8 (repeated int64 — Transpose perm,
        // ReduceMean axes; proto3 packs it, some writers don't).
        // Attrs must be CAPTURED, not skipped, so run() can refuse a
        // value it would ignore
        val a = n.readSub()
        var name = ""; var i = 0L
        var f = Float.NaN
        var s: String = null
        val ints = Seq.newBuilder[Long]
        var hasInts = false
        while (a.hasNext) a.readTag() match {
          case (1, 2) => name = a.readString()
          case (2, 5) => f = a.readFloatLE()
          case (3, 0) => i = a.readVarint()
          case (4, 2) => s = a.readString()
          case (8, 0) => ints += a.readVarint(); hasInts = true
          case (8, 2) =>
            val sub = a.readSub()
            while (sub.hasNext) ints += sub.readVarint()
            hasInts = true
          case (_, w) => a.skip(w)
        }
        if (name.nonEmpty) {
          attrs += name -> i
          if (!f.isNaN) fattrs += name -> f
          if (s != null) sattrs += name -> s
          if (hasInts) iattrs += name -> ints.result()
        }
      case (_, w) => n.skip(w)
    }
    Node(op, ins.result(), outs.result(), attrs.result(), fattrs.result(),
      iattrs.result(), sattrs.result())
  }

  private def parseTensor(t: Reader): Tensor = {
    // TensorProto: dims=1, data_type=2, float_data=4, name=8, raw_data=9
    val dims = Seq.newBuilder[Int]
    var dtype = 0L; var name = ""
    var floats = Array.empty[Float]
    while (t.hasNext) t.readTag() match {
      case (1, 0) => dims += t.readVarint().toInt
      case (1, 2) => // packed dims
        val s = t.readSub()
        while (s.hasNext) dims += s.readVarint().toInt
      case (2, 0) => dtype = t.readVarint()
      case (4, 2) => // packed float_data
        val s = t.readSub()
        val buf = Array.newBuilder[Float]
        while (s.hasNext) buf += s.readFloatLE()
        floats = buf.result()
      case (4, 5) => floats = floats :+ t.readFloatLE() // unpacked
      case (8, 2) => name = t.readString()
      case (9, 2) => // raw_data: little-endian float32 per data_type=1
        val s = t.readSub()
        val buf = Array.newBuilder[Float]
        while (s.hasNext) buf += s.readFloatLE()
        floats = buf.result()
      case (_, w) => t.skip(w)
    }
    require(dtype == 1, s"tensor $name: only FLOAT (1) supported, got $dtype")
    Tensor(name, dims.result(), floats)
  }

  private def valueInfoName(v: Reader): String = {
    // ValueInfoProto: name=1
    var name = ""
    while (v.hasNext) v.readTag() match {
      case (1, 2) => name = v.readString()
      case (_, w) => v.skip(w)
    }
    name
  }

  // ---- forward evaluation ----

  /** Runs the graph on a [batch, features] input, returning the output
    * tensor rows. Dense row-major float arrays — these graphs are tiny
    * heads (the heavy lift at scale is the PARTITIONED map over rows,
    * not the per-row flops).
    */
  def run(m: Model, input: Array[Array[Float]]): Array[Array[Float]] = {
    val env = scala.collection.mutable.Map[String, Array[Array[Float]]](
      m.inputName -> input)
    m.inits.foreach { case (n, t) =>
      env(n) = t.dims match {
        case Seq(r, c) => Array.tabulate(r)(i => t.data.slice(i * c, i * c + c))
        case Seq(c)    => Array(t.data.take(c))
        case d         => throw new IllegalArgumentException(s"tensor $n rank ${d.size}")
      }
    }
    def get(n: String) = env.getOrElse(n,
      throw new IllegalArgumentException(s"undefined tensor '$n'"))
    m.nodes.foreach { node =>
      // a node's LAST-axis attr: Softmax/LayerNormalization default -1;
      // only the last axis of a 2-D tensor is implemented
      def requireLastAxis(default: Long): Unit = {
        val ax = node.intAttrs.getOrElse("axis", default)
        require(ax == -1L || ax == 1L,
          s"${node.opType} axis $ax unsupported (only last axis of 2-D)")
      }
      val outs: Seq[Array[Array[Float]]] = node.opType match {
        case "Gemm" =>
          val a = get(node.inputs(0)); val b = get(node.inputs(1))
          require(node.intAttrs.getOrElse("transA", 0L) == 0L, "transA unsupported")
          // evaluate only what we implement: a Gemm carrying alpha/beta
          // scaling would be silently mis-scored if ignored
          require(node.floatAttrs.getOrElse("alpha", 1.0f) == 1.0f,
            s"Gemm alpha ${node.floatAttrs("alpha")} unsupported (only 1.0)")
          require(node.floatAttrs.getOrElse("beta", 1.0f) == 1.0f,
            s"Gemm beta ${node.floatAttrs("beta")} unsupported (only 1.0)")
          val bT = if (node.intAttrs.getOrElse("transB", 0L) == 1L) b.transpose else b
          val c = if (node.inputs.size > 2) Some(get(node.inputs(2))) else None
          c.foreach(bias => require(bias.length == 1,
            s"Gemm C with ${bias.length} rows unsupported (only row-broadcast)"))
          Seq(matmul(a, bT, c))
        case "MatMul" => Seq(matmul(get(node.inputs(0)), get(node.inputs(1)), None))
        case "Add" => Seq(broadcast2(node, get(node.inputs(0)), get(node.inputs(1)), _ + _))
        case "Sub" => Seq(broadcast2(node, get(node.inputs(0)), get(node.inputs(1)), _ - _))
        case "Mul" => Seq(broadcast2(node, get(node.inputs(0)), get(node.inputs(1)), _ * _))
        case "Div" => Seq(broadcast2(node, get(node.inputs(0)), get(node.inputs(1)), _ / _))
        case "Pow" => Seq(broadcast2(node, get(node.inputs(0)), get(node.inputs(1)),
          (a, b) => math.pow(a, b).toFloat))
        case "Relu" => Seq(get(node.inputs(0)).map(_.map(v => math.max(v, 0f))))
        case "Sigmoid" =>
          Seq(get(node.inputs(0)).map(_.map(v => (1.0 / (1.0 + math.exp(-v))).toFloat)))
        case "Tanh" => Seq(get(node.inputs(0)).map(_.map(v => math.tanh(v).toFloat)))
        case "Erf" => Seq(get(node.inputs(0)).map(_.map(v => erf(v).toFloat)))
        case "Sqrt" => Seq(get(node.inputs(0)).map(_.map(v => math.sqrt(v).toFloat)))
        case "Gelu" =>
          val x = get(node.inputs(0))
          node.strAttrs.getOrElse("approximate", "none") match {
            case "none" => Seq(x.map(_.map(v => (0.5 * v * (1.0 + erf(v / math.sqrt(2.0)))).toFloat)))
            case "tanh" => Seq(x.map(_.map { v =>
              val v3 = v.toDouble * v * v
              (0.5 * v * (1.0 + math.tanh(0.7978845608028654 * (v + 0.044715 * v3)))).toFloat
            }))
            case other => throw new IllegalArgumentException(
              s"Gelu approximate='$other' unsupported")
          }
        case "Softmax" =>
          requireLastAxis(default = -1L)
          Seq(get(node.inputs(0)).map(softmaxRow))
        case "ReduceMean" =>
          // opset ≤17 attr form; keepdims only (the result stays 2-D)
          require(node.intAttrs.getOrElse("keepdims", 1L) == 1L,
            "ReduceMean keepdims=0 unsupported")
          require(node.inputs.size == 1,
            "ReduceMean axes-as-input (opset 18) unsupported; use the axes attr")
          val x = get(node.inputs(0))
          node.intsAttrs.getOrElse("axes", Seq(-1L)) match {
            case Seq(a) if a == -1L || a == 1L =>
              Seq(x.map(r => Array((r.foldLeft(0.0)(_ + _) / r.length).toFloat)))
            case Seq(0L) =>
              val cols = x(0).length
              Seq(Array(Array.tabulate(cols)(j =>
                (x.foldLeft(0.0)(_ + _(j)) / x.length).toFloat)))
            case axes => throw new IllegalArgumentException(
              s"ReduceMean axes $axes unsupported (one axis of 2-D)")
          }
        case "LayerNormalization" =>
          requireLastAxis(default = -1L)
          val eps = node.floatAttrs.getOrElse("epsilon", 1e-5f).toDouble
          val x = get(node.inputs(0))
          val scale = rowVec(node, get(node.inputs(1)))
          val bias = if (node.inputs.size > 2) rowVec(node, get(node.inputs(2)))
            else Array.fill(scale.length)(0f)
          Seq(x.map { r =>
            val mean = r.foldLeft(0.0)(_ + _) / r.length
            val varr = r.foldLeft(0.0)((s, v) => s + (v - mean) * (v - mean)) / r.length
            val inv = 1.0 / math.sqrt(varr + eps)
            Array.tabulate(r.length)(j =>
              ((r(j) - mean) * inv * scale(j) + bias(j)).toFloat)
          })
        case "Transpose" =>
          val perm = node.intsAttrs.getOrElse("perm", Seq(1L, 0L))
          require(perm == Seq(1L, 0L),
            s"Transpose perm $perm unsupported (2-D swap only)")
          Seq(get(node.inputs(0)).transpose)
        case "Split" =>
          // equal split along the last axis into node.outputs.size parts
          // (the multi-head attention shape: hidden → per-head slices)
          requireLastAxis(default = 0L)
          val x = get(node.inputs(0))
          val n = node.outputs.size
          require(n > 0 && x(0).length % n == 0,
            s"Split: ${x(0).length} cols not divisible into $n outputs")
          require(node.inputs.size == 1 && !node.intsAttrs.contains("split"),
            "Split with explicit sizes unsupported (equal split only)")
          val w = x(0).length / n
          (0 until n).map(h => x.map(_.slice(h * w, (h + 1) * w)))
        case "Concat" =>
          requireLastAxis(default = 0L)
          val parts = node.inputs.map(get)
          require(parts.forall(_.length == parts.head.length),
            "Concat: row counts differ")
          Seq(parts.head.indices.toArray.map(i =>
            Array.concat(parts.map(_(i)): _*)))
        case "Identity" => Seq(get(node.inputs(0)))
        case op => throw new IllegalArgumentException(s"unsupported op $op")
      }
      require(outs.length == node.outputs.length,
        s"${node.opType}: ${outs.length} results for ${node.outputs.length} outputs")
      node.outputs.lazyZip(outs).foreach((n, o) => env(n) = o)
    }
    get(m.outputName)
  }

  /** Numerically stable softmax of one row (double accumulation). */
  private def softmaxRow(r: Array[Float]): Array[Float] = {
    val mx = r.max
    val ex = r.map(v => math.exp((v - mx).toDouble))
    val s = ex.sum
    ex.map(v => (v / s).toFloat)
  }

  /** Abramowitz & Stegun 7.1.26 — max error 1.5e-7, below float32 ulp
    * for the |x| ≤ ~10 range these heads produce.
    */
  private def erf(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }

  /** A scale/bias operand as one row, accepting [c] stored as [1,c]. */
  private def rowVec(node: Node, m: Array[Array[Float]]): Array[Float] = {
    require(m.length == 1, s"${node.opType}: expected a vector operand, " +
      s"got ${m.length} rows")
    m(0)
  }

  /** Elementwise with 2-D numpy broadcast: each dim matches or is 1.
    * Row-broadcast (bias add), column-broadcast (per-row mean/std from
    * keepdims ReduceMean), and scalar all fall out of the same rule.
    */
  private def broadcast2(node: Node, a: Array[Array[Float]],
      b: Array[Array[Float]], f: (Float, Float) => Float): Array[Array[Float]] = {
    val rows = math.max(a.length, b.length)
    val cols = math.max(a(0).length, b(0).length)
    require(a.length == rows || a.length == 1,
      s"${node.opType}: ${a.length} vs $rows rows don't broadcast")
    require(b.length == rows || b.length == 1,
      s"${node.opType}: ${b.length} vs $rows rows don't broadcast")
    Array.tabulate(rows) { i =>
      val ar = a(if (a.length == 1) 0 else i)
      val br = b(if (b.length == 1) 0 else i)
      require(ar.length == cols || ar.length == 1,
        s"${node.opType}: ${ar.length} vs $cols cols don't broadcast")
      require(br.length == cols || br.length == 1,
        s"${node.opType}: ${br.length} vs $cols cols don't broadcast")
      Array.tabulate(cols)(j => f(
        if (ar.length == 1) ar(0) else ar(j),
        if (br.length == 1) br(0) else br(j)))
    }
  }

  private def matmul(a: Array[Array[Float]], b: Array[Array[Float]],
      bias: Option[Array[Array[Float]]]): Array[Array[Float]] = {
    val k = b.length; val mCols = b(0).length
    a.map { row =>
      require(row.length == k, s"matmul shape ${row.length} vs $k")
      Array.tabulate(mCols) { j =>
        var acc = bias.map(_(0)(j)).getOrElse(0f).toDouble
        var i = 0
        while (i < k) { acc += row(i).toDouble * b(i)(j).toDouble; i += 1 }
        acc.toFloat
      }
    }
  }
}
