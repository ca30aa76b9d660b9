package graft

import org.apache.spark.sql.functions._

import graft.operators.ActFeatures

class ActFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("groups with fewer rows than numActs are dropped (graph_creator.py:88-89)") {
    val df = Seq(
      ("a", 1, 1.0), ("a", 2, 2.0),                       // 2 rows < 3 acts → dropped
      ("b", 1, 1.0), ("b", 2, 2.0), ("b", 3, 3.0), ("b", 4, 4.0))
      .toDF("movie", "w", "x")
    val out = ActFeatures.actFeatures(df, "movie", Seq("w"), Seq("x"), numActs = 3)
    assert(out.select("movie").as[String].collect().toSeq == Seq("b"))
  }

  test("ntile act sizes match np.array_split (first len%n acts get one extra)") {
    // 7 rows, 3 acts → np.array_split sizes [3, 2, 2]
    val df = (1 to 7).map(i => ("m", i, i.toDouble)).toDF("movie", "w", "x")
    val acts = df.withColumn("act",
      ntile(3).over(org.apache.spark.sql.expressions.Window
        .partitionBy("movie").orderBy("w")))
      .groupBy("act").count().orderBy("act")
      .as[(Int, Long)].collect().toSeq
    assert(acts == Seq((1, 3L), (2, 2L), (3, 2L)))
    // act means follow contiguous runs: act1 = {1,2,3} → mean 2.0
    val out = ActFeatures.actFeatures(df, "movie", Seq("w"), Seq("x"), numActs = 3)
    assert(out.head().getAs[Double]("x_act1") == 2.0)
    assert(out.head().getAs[Double]("x_act2") == 4.5)
    assert(out.head().getAs[Double]("x_act3") == 6.5)
  }
}
