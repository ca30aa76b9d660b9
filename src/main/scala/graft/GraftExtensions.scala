package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{CdcChunksExpr, CleanSuffixExpr, CosineSimilarityExpr, DotProductExpr, L2DistanceExpr, PiiScrubExpr, PqAdcExpr, TokenShinglesAllExpr, TokenShinglesExpr}

/** Session extension registering the engine's native expressions as SQL
  * functions (`cosine_similarity`, `l2_distance`) — enable with
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * This is the (b) tier of the custom-operator ladder (SURVEY §4): a
  * whole-stage-codegen expression surfaced through the normal function
  * registry, usable from both the Column API and SQL text.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarityExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (children: Seq[Expression]) => DotProductExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_distance"),
      new ExpressionInfo(classOf[L2DistanceExpr].getName, "l2_distance"),
      (children: Seq[Expression]) => L2DistanceExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("token_shingles"),
      new ExpressionInfo(classOf[TokenShinglesExpr].getName, "token_shingles"),
      (children: Seq[Expression]) => TokenShinglesExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("token_shingles_all"),
      new ExpressionInfo(classOf[TokenShinglesAllExpr].getName, "token_shingles_all"),
      (children: Seq[Expression]) => TokenShinglesAllExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdcExpr].getName, "pq_adc"),
      (children: Seq[Expression]) => PqAdcExpr(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunksExpr].getName, "cdc_chunks"),
      (children: Seq[Expression]) => CdcChunksExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("pii_scrub"),
      new ExpressionInfo(classOf[PiiScrubExpr].getName, "pii_scrub"),
      (children: Seq[Expression]) => PiiScrubExpr(children(0))))
    ext.injectFunction((
      FunctionIdentifier("clean_suffix"),
      new ExpressionInfo(classOf[CleanSuffixExpr].getName, "clean_suffix"),
      (children: Seq[Expression]) => CleanSuffixExpr(children(0))))
  }
}
