package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.functions.TextClean
import graft.operators.Chunker
import graft.operators.clustering.{TreeOps, Ward}

/** scalacheck property suites (SURVEY §5.3): generated-input invariants
  * for the pure driver-side algebra (Ward, rebalance, title parsing) and
  * small-corpus DataFrame round trips for the chunkers.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop, min: Int = 50): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("ward linkage: monotone merge heights, leaves partition the input") {
    val genPts = for {
      n <- Gen.choose(2, 40)
      dim <- Gen.choose(1, 6)
      pts <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-100.0, 100.0)))
    } yield pts.map(_.toArray).toArray
    check("ward", forAll(genPts) { pts =>
      val root = Ward.linkage(pts)
      def monotone(d: Ward.Dendro): Boolean = d match {
        case Ward.Leaf(_) => true
        case Ward.Merge(l, r, dist, _) =>
          dist >= l.dist && dist >= r.dist && monotone(l) && monotone(r)
      }
      monotone(root) && root.leaves.sorted == pts.indices.toList
    })
  }

  test("rebalance: conserves counts/members, respects the depth cap") {
    val genCase = for {
      n <- Gen.choose(2, 60)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 50L))
      pts <- Gen.listOfN(n, Gen.listOfN(3, Gen.choose(-10.0, 10.0)))
    } yield (pts.map(_.toArray).toArray, sizes)
    check("rebalance", forAll(genCase) { case (pts, sizes) =>
      val sizeMap = sizes.indices.map(i => i -> sizes(i)).toMap
      val tree = TreeOps.fromDendro(Ward.linkage(pts), sizeMap)
      val r = TreeOps.rebalance(tree)
      def depth(t: TreeOps.TNode, d: Int = 0): Int =
        if (t.children.isEmpty) d else t.children.map(depth(_, d + 1)).max
      def leafClusters(t: TreeOps.TNode): Seq[Int] =
        if (t.children.isEmpty) t.clusters else t.children.flatMap(leafClusters)
      def countsOk(t: TreeOps.TNode): Boolean =
        t.children.isEmpty ||
          (t.count == t.children.map(_.count).sum && t.children.forall(countsOk))
      r.count == sizes.sum && depth(r) <= 5 &&
        leafClusters(r).sorted == pts.indices.toList && countsOk(r)
    })
  }

  test("flatten: ids are dense DFS preorder, every path has a parent") {
    val genPts = Gen.choose(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(2, Gen.choose(-5.0, 5.0))))
    check("flatten", forAll(genPts) { ptsL =>
      val pts = ptsL.map(_.toArray).toArray
      val tree = TreeOps.rebalance(
        TreeOps.fromDendro(Ward.linkage(pts), pts.indices.map(_ -> 1L).toMap))
      val (rows, assign) = TreeOps.flatten(tree)
      val paths = rows.map(_.path).toSet
      rows.map(_.id) == (1L to rows.size) &&
        rows.tail.forall(r => paths.contains(r.path.substring(0, r.path.lastIndexOf('.')))) &&
        assign.keySet == pts.indices.toSet
    })
  }

  test("title/year parse inverts formatting (incl. 1800 fallback)") {
    val genTitle = Gen.nonEmptyListOf(
      Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.mkString.trim)
      .suchThat(_.nonEmpty)
    val genYear = Gen.choose(1000, 9999)
    check("titleYear", forAll(genTitle, genYear) { (t, y) =>
      val formatted = s"$t ($y)"
      val parsedT = evalStr(TextClean.titleOf(lit(formatted)))
      val parsedY = evalStr(TextClean.yearOf(lit(formatted)))
      val bareY = evalStr(TextClean.yearOf(lit(t)))
      parsedT == t && parsedY == y.toString && bareY == "1800"
    }, min = 20)
  }

  test("chunker: reconstruction and window-count over generated corpora") {
    val genCorpus = Gen.listOfN(15, for {
      nTok <- Gen.choose(1, 120)
      toks <- Gen.listOfN(nTok, Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString))
    } yield toks.mkString(" "))
    check("chunker", forAll(genCorpus, Gen.choose(8, 64), Gen.choose(2, 16)) {
      (texts, size, stride) =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val rebuilt = Chunker.chunkChars(df, "text", size, Seq("doc_id"))
          .groupBy("doc_id")
          .agg(concat_ws("",
            sort_array(collect_list(struct(col("chunk_id"), col("chunk"))))
              .getField("chunk")).as("rebuilt"))
          .join(df, "doc_id")
          .filter(col("rebuilt") =!= col("text")).count()
        val winBad = Chunker.slidingTokenWindows(df, "text", size, stride, Seq("doc_id"))
          .groupBy("doc_id").count()
          .join(df.select(col("doc_id"),
            size_(split(col("text"), " ")).cast("long").as("n")), "doc_id")
          .filter(col("count") =!= greatest(ceil(col("n") / stride.toDouble), lit(1L)))
          .count()
        rebuilt == 0 && winBad == 0
    }, min = 8)
  }

  test("onnx round trip: write → parse → run equals the direct matmul") {
    // the OnnxMini reader is hand-rolled wire-format code (an eval-order
    // bug in exactly this kind of code shipped and was caught in r8) —
    // fuzz it: random Gemm heads through the writer must evaluate to
    // x·Wᵀ + b within float tolerance for random batches
    val genCase = for {
      nIn <- Gen.choose(1, 8)
      nOut <- Gen.choose(1, 8)
      nBatch <- Gen.choose(1, 5)
      w <- Gen.listOfN(nOut, Gen.listOfN(nIn, Gen.choose(-4.0, 4.0).map(_.toFloat)))
      b <- Gen.listOfN(nOut, Gen.choose(-4.0, 4.0).map(_.toFloat))
      x <- Gen.listOfN(nBatch, Gen.listOfN(nIn, Gen.choose(-4.0, 4.0).map(_.toFloat)))
    } yield (w.map(_.toArray).toArray, b.toArray, x.map(_.toArray).toArray)
    check("onnx", forAll(genCase) { case (w, b, x) =>
      val bytes = OnnxFixture.gemmModelBytes(w, b)
      val out = graft.operators.OnnxMini.run(
        graft.operators.OnnxMini.parse(bytes), x)
      x.indices.forall { r =>
        w.indices.forall { o =>
          val expect = w(o).indices.map(i => w(o)(i).toDouble * x(r)(i)).sum + b(o)
          math.abs(out(r)(o) - expect) < 1e-3
        }
      }
    })
  }

  test("onnx transformer ops: Softmax/LayerNorm/Transpose round-trip fuzz") {
    // same rationale as the Gemm fuzz: the wire writer/reader pair plus
    // the new op kernels, driven with random shapes/values. Checks are
    // closed-form invariants, not re-implementations: softmax rows are
    // distributions and order-preserving; double-Transpose is identity;
    // LayerNorm(scale=1,bias=0) rows have mean≈0 and unit variance.
    val genCase = for {
      n <- Gen.choose(1, 6)
      c <- Gen.choose(2, 10)
      x <- Gen.listOfN(n, Gen.listOfN(c, Gen.choose(-8.0, 8.0).map(_.toFloat)))
    } yield (x.map(_.toArray).toArray, n, c)
    check("onnxOps", forAll(genCase) { case (x, n, c) =>
      import OnnxFixture._
      import graft.operators.OnnxMini
      val sm = OnnxMini.run(OnnxMini.parse(modelBytes(
        Seq(N("Softmax", Seq("x"), Seq("y"), IntAttr("axis", -1L))),
        Seq.empty, "x", "y")), x)
      val softmaxOk = sm.zipWithIndex.forall { case (row, i) =>
        math.abs(row.map(_.toDouble).sum - 1.0) < 1e-5 &&
          row.indices.forall { j => row.indices.forall { k =>
            (x(i)(j) <= x(i)(k)) == (row(j) <= row(k)) } }
      }
      val tt = OnnxMini.run(OnnxMini.parse(modelBytes(
        Seq(N("Transpose", Seq("x"), Seq("t"), IntsAttr("perm", Seq(1L, 0L))),
          N("Transpose", Seq("t"), Seq("y"), IntsAttr("perm", Seq(1L, 0L)))),
        Seq.empty, "x", "y")), x)
      val transposeOk = tt.lazyZip(x).forall((a, b) => a.sameElements(b))
      val ln = OnnxMini.run(OnnxMini.parse(modelBytes(
        Seq(N("LayerNormalization", Seq("x", "g", "b"), Seq("y"),
          FloatAttr("epsilon", 1e-5f))),
        Seq(("g", Seq(c), Array.fill(c)(1f)), ("b", Seq(c), Array.fill(c)(0f))),
        "x", "y")), x)
      val lnOk = ln.forall { row =>
        val mean = row.map(_.toDouble).sum / c
        val varr = row.map(v => (v - mean) * (v - mean)).sum / c
        // rows with ~zero input variance normalize toward 0/eps, not 1
        math.abs(mean) < 1e-4 && (varr < 1.01)
      }
      softmaxOk && transposeOk && lnOk
    })
  }

  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
