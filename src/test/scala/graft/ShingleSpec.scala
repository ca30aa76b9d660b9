package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parity proof for the native token_shingles kernel vs the HOF chain it
  * replaces (array_distinct∘transform∘slice∘concat_ws∘split). The two
  * must agree ELEMENT-FOR-ELEMENT (values and order) on real documents,
  * the mutated dedup corpus, and adversarial whitespace edge cases —
  * the dedup/decontamination hashes depend on it.
  */
class ShingleSpec extends SparkSpec {

  private def hof(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  private def native(text: Column, k: Int): Column =
    call_function("token_shingles", text, lit(k))

  private def assertParity(df: DataFrame, k: Int): Unit = {
    val bad = df
      .select(hof(col("text"), k).as("a"), native(col("text"), k).as("b"))
      .filter(not(col("a") === col("b")))
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("edge cases: empty, short, leading/trailing/double spaces") {
    import spark.implicits._
    val edge = Seq("", " ", "  ", "a", "a b", "a b c", "a b c d",
      " a b c", "a b c ", "a  b  c", "a b  c d ", "x x x x x",
      "a b a b a b").toDF("text")
    assertParity(edge, 3)
    assertParity(edge, 2)
    assertParity(edge, 5)
  }

  test("real documents + mutated dedup corpus at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d).select(col("text"))
    val mut = Tables.documents(spark, d)
      .select(expr("substring(text, instr(text, ' ')+1)").as("text"))
    assertParity(docs.unionAll(mut), 3)
  }

  test("k < 1 is a clean analysis error, not an executor exception") {
    // ADVICE r6: k is foldable, so the positive-literal half of the
    // contract is enforced at analysis time (checkInputDataTypes)
    Seq(0, -3).foreach { k =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.range(1).select(native(lit("a b c"), k)).collect()
      }
      assert(e.getMessage.contains("k >= 1"), e.getMessage)
    }
  }

  test("whole-stage codegen keeps the shingle explode compiled") {
    val d = "/root/testdata/sf0.001"
    val plan = Tables.documents(spark, d)
      .select(explode(native(col("text"), 3)).as("sh"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix is the WholeStageCodegen marker in plan toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Generate")),
      plan.take(600))
  }
}
