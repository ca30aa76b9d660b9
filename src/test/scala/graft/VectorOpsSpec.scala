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

  test("native exprs compile codegen'd inside a filter predicate (no janino fallback)") {
    // Generated predicate methods take the input row as a parameter named
    // `i` (ctx.INPUT_ROW) and Java forbids shadowing, so any fixed local
    // name in doGenCode dies in janino ("Redefinition of local variable")
    // and Spark silently falls back to interpreted per-row eval — exactly
    // the slow path these expressions exist to avoid. generate() throws on
    // compile failure, so this test fails loudly where prod would degrade.
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.functions.expressions.{CosineSimilarityExpr, DotProductExpr, L2DistanceExpr}
    val arrT = ArrayType(DoubleType, containsNull = true)
    val a = BoundReference(0, arrT, nullable = true)
    val b = BoundReference(1, arrT, nullable = true)
    Seq[Expression](
      CosineSimilarityExpr(a, b), DotProductExpr(a, b), L2DistanceExpr(a, b)
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

  test("multimodal decode: per-partition codec, deterministic typed features") {
    val df = Seq((0L, "payload one"), (1L, "payload two"))
      .toDF("doc_id", "t").select(col("doc_id"), col("t").cast("binary").as("payload"))
    val out1 = graft.operators.Multimodal.decodeFeatures(df, "payload")
      .select("doc_id", "decoded.*").collect().sortBy(_.getLong(0))
    val out2 = graft.operators.Multimodal.decodeFeatures(df, "payload")
      .select("doc_id", "decoded.*").collect().sortBy(_.getLong(0))
    assert(out1.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq, "must be deterministic")
    out1.foreach { r =>
      assert(r.getAs[Int]("width") >= 320 && r.getAs[Int]("height") >= 240)
      assert(r.getAs[Int]("n_sampled") ==
        math.ceil(r.getAs[Int]("n_frames") / 24.0).toInt)
    }
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
