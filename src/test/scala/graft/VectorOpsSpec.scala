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

  test("native codegen expressions match the HOF forms bit-exactly") {
    val df = spark.range(200).select(
      transform(sequence(lit(0), lit(63)), i => sin(col("id") * 64 + i)).as("a"),
      transform(sequence(lit(0), lit(63)), i => cos(col("id") * 64 + i)).as("b"))
    val mismatches = df.filter(
      cosineSimilarityNative(col("a"), col("b")) =!= cosineSimilarity(col("a"), col("b")) ||
        l2DistanceNative(col("a"), col("b")) =!= l2Distance(col("a"), col("b")) ||
        dotNative(col("a"), col("b")) =!= dot(col("a"), col("b"))).count()
    assert(mismatches == 0, "native and HOF folds must be bit-identical")
  }

  test("pq_adc matches the HOF fold bit-exactly and handles nulls/OOB") {
    val k = 16; val m = 8
    // codes in range, lut of m*k pseudo-random doubles per row
    val df = spark.range(200).select(
      transform(sequence(lit(0), lit(m - 1)),
        j => pmod(col("id") * 7 + j * 3, lit(k)).cast("int")).as("codes"),
      transform(sequence(lit(0), lit(m * k - 1)),
        i => sin(col("id") * 1000 + i)).as("lut"))
    val hof = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc + element_at(col("lut"),
        (j * lit(k) + element_at(col("codes"), j + lit(1)) + lit(1)).cast("int")))
    val native = call_function("pq_adc", col("codes"), col("lut"), lit(k))
    assert(df.filter(native =!= hof).count() == 0,
      "pq_adc and the HOF fold must be bit-identical")
    // null code element and OOB lookup both yield NULL (element_at parity)
    val r = spark.sql(
      "SELECT pq_adc(array(CAST(NULL AS INT)), array(1.0d), 1) AS a, " +
        "pq_adc(array(5), array(1.0d, 2.0d), 2) AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native exprs compile codegen'd inside a filter predicate (no janino fallback)") {
    // Generated predicate methods take the input row as a parameter named
    // `i` (ctx.INPUT_ROW) and Java forbids shadowing, so any fixed local
    // name in doGenCode dies in janino ("Redefinition of local variable")
    // and Spark silently falls back to interpreted per-row eval — exactly
    // the slow path these expressions exist to avoid. generate() throws on
    // compile failure, so this test fails loudly where prod would degrade.
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    import graft.functions.expressions.{CosineSimilarityExpr, DotProductExpr, L2DistanceExpr, PqAdcExpr}
    val arrT = ArrayType(DoubleType, containsNull = true)
    val a = BoundReference(0, arrT, nullable = true)
    val b = BoundReference(1, arrT, nullable = true)
    val codes = BoundReference(2, ArrayType(IntegerType, containsNull = true), nullable = true)
    Seq[Expression](
      CosineSimilarityExpr(a, b), DotProductExpr(a, b), L2DistanceExpr(a, b),
      PqAdcExpr(codes, b, Literal(16))
    ).foreach { e =>
      val pred = GeneratePredicate.generate(GreaterThan(e, Literal(-1e18)))
      // and twice in ONE predicate (the q_dedup_embed shape: expr appears
      // in both the projection and the threshold filter)
      GeneratePredicate.generate(And(GreaterThan(e, Literal(-1e18)),
        LessThan(e.makeCopy(e.children.toArray), Literal(1e18))))
      assert(pred != null)
    }
  }

  test("native expressions propagate element nulls like the HOF forms") {
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS c, " +
        "dot_product(array(CAST(NULL AS DOUBLE)), array(1.0d)) AS d, " +
        "l2_distance(array(1.0d), array(CAST(NULL AS DOUBLE))) AS l").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      "a null element must yield NULL, matching zip_with/aggregate")
  }

  test("extension-registered functions are callable from SQL text") {
    val r = spark.sql(
      "SELECT cosine_similarity(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c, " +
        "l2_distance(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS d").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-12)
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

  test("multimodal resize: stride-2 keeps exactly the even rows/columns") {
    import graft.operators.Multimodal
    val codec = new Multimodal.PpmGzCodec
    // 100 bytes → 3 pixel rows (48/48/4+pad); stride 2 keeps rows 0,2
    // and pixel columns 0,2,..,14 (8 of 16)
    val content = Array.tabulate[Byte](100)(i => (i + 1).toByte)
    val (ow, oh, ob, ck) = codec.resize(codec.encode(content), 2)
    assert((ow, oh, ob) == (8L, 2L, 48L))
    // reference: padded plane, keep (row % 2 == 0) && (pixelcol % 2 == 0)
    val plane = content ++ new Array[Byte](3 * 48 - 100)
    val expect = plane.zipWithIndex.collect {
      case (b, i) if (i / 48) % 2 == 0 && ((i % 48) / 3) % 2 == 0 => (b & 0xff).toLong
    }.sum
    assert(ck == expect, s"checksum $ck != $expect")
    // identity stride keeps everything: checksum == sum of all bytes
    val (ow1, oh1, _, ck1) = codec.resize(codec.encode(content), 1)
    assert((ow1, oh1) == (16L, 3L))
    assert(ck1 == content.map(_ & 0xff).map(_.toLong).sum)
  }

  test("multimodal dhash: scalar reference, perturbation bound, planted recall") {
    import graft.operators.Multimodal
    val codec = new Multimodal.PpmGzCodec
    // (1) independent scalar re-implementation (the q_span_corrupt
    // convention): sampled rows g*h/8, even pixel columns, gray =
    // 3-byte sum / 3, bit 1<<(g*7+j) when left < right
    def refHash(content: Array[Byte]): Long = {
      val h = math.max(1, (content.length + 47) / 48)
      val plane = content ++ new Array[Byte](h * 48 - content.length)
      def gray(r: Int, c: Int): Int =
        (0 until 3).map(ch => plane((r * 16 + c) * 3 + ch) & 0xff).sum / 3
      (for { g <- 0 until 8; j <- 0 until 7 } yield {
        val r = g * h / 8
        if (gray(r, 2 * j) < gray(r, 2 * (j + 1))) 1L << (g * 7 + j) else 0L
      }).sum
    }
    val content = ("the quick brown fox " * 30).getBytes("UTF-8") // h = 13
    assert(codec.dhash(codec.encode(content)) == refHash(content))
    assert(refHash(content) != 0L && refHash(content) < (1L << 56))
    // (2) one-byte perturbation of a tall image (h >= 8: every pixel
    // row is sampled by at most one grid row) flips <= 2 adjacent bits
    // -> at least 2 of the 4 14-bit bands stay clean
    (0 until content.length by 37).foreach { p =>
      val mut = content.clone(); mut(p) = (mut(p) + 1).toByte
      val a = codec.dhash(codec.encode(content))
      val b = codec.dhash(codec.encode(mut))
      assert(java.lang.Long.bitCount(a ^ b) <= 2, s"pos $p flips >2 bits")
      val cleanBands = (0 until 4).count(k =>
        ((a >> (14 * k)) & 16383L) == ((b >> (14 * k)) & 16383L))
      assert(cleanBands >= 2, s"pos $p dirties >2 bands")
    }
    // (3) planted recall through the declared query: every planted
    // mutant pair (id, id+600000) must be recovered at sf0.001 — the
    // plant predicate requires h >= 8 (len >= 337), which is exactly
    // the regime where (2)'s band bound holds, so recall is 100% BY
    // GUARANTEE, not by luck of the mutation position
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.IoQueries.queries("q_multimodal_phash")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val planted = Tables.documents(spark, sf)
      .filter("doc_id % 5 = 0 AND length(text) >= 337")
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    val missed = planted.filterNot(id => out.contains((id, id + 600000L)))
    assert(missed.isEmpty, s"planted pairs missed: ${missed.take(5).mkString(",")}")
  }

  test("multimodal codec: gzip'd PPM round-trips geometry, digest, pad") {
    import graft.operators.Multimodal
    // one short doc (sub-row, padded), one spanning many pixel rows
    val big = "x" * 1000
    val df = Seq((0L, "payload one"), (1L, big)).toDF("doc_id", "text")
    val out1 = Multimodal.decodeFeatures(
      Multimodal.encodePayloads(df, "text"), "payload")
      .select("doc_id", "decoded.*").collect().sortBy(_.getLong(0))
    val out2 = Multimodal.decodeFeatures(
      Multimodal.encodePayloads(df, "text"), "payload")
      .select("doc_id", "decoded.*").collect().sortBy(_.getLong(0))
    assert(out1.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq, "must be deterministic")
    val byId = out1.map(r => r.getLong(0) -> r).toMap
    // doc 0: 11 bytes → one 48-byte pixel row
    assert(byId(0L).getAs[Long]("width") == 16 && byId(0L).getAs[Long]("height") == 1)
    assert(byId(0L).getAs[Long]("n_bytes") == 48)
    // doc 1: 1000 bytes → ceil(1000/48) = 21 rows, sampled every 24th
    assert(byId(1L).getAs[Long]("height") == 21)
    assert(byId(1L).getAs[Long]("n_sampled") == 1)
    // digest is of the ORIGINAL bytes (pad stripped via the header
    // comment) — compare against MessageDigest directly
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("payload one".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(byId(0L).getAs[String]("content_md5") == expect)
    // a corrupted payload must throw, not emit garbage features
    val codec = new Multimodal.PpmGzCodec
    val bad = codec.encode("abc".getBytes("UTF-8"))
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x7f).toByte
    intercept[Exception](codec.decode(bad))
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
