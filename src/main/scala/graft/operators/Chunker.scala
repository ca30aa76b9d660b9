package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-generating chunking operators (SURVEY.md §2.4) — the reference's
  * two genuinely UDTF-shaped ops, built on `explode(sequence(...))` so
  * they stay inside Catalyst (the GenerateExec operator) with no UDTF or
  * RDD hop. Generation is per-row and stateless: no shuffle, linear
  * scale-out, and column pruning still reaches the scan.
  */
object Chunker {

  /** O-31 fixed-size character chunker (preprocessing_agent.py:370-374,
    * chunk size settings.py:83-87; reference default 4096, 0 overlap).
    * Emits (chunk_id BIGINT, chunk STRING) per input row; `ceil(len/size)`
    * chunks, minimum 1 (an empty text yields one empty chunk).
    * Invariant (tested): concat_ws("", collect chunks) == input.
    */
  def chunkChars(df: DataFrame, textCol: String, size: Int,
      keep: Seq[String]): DataFrame = {
    val nChunks = greatest(ceil(length(col(textCol)) / lit(size.toDouble)), lit(1)).cast("long")
    df.select(keep.map(col) :+ col(textCol) :+
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"): _*)
      .select(keep.map(col) :+ col("chunk_id") :+
        col(textCol).substr(
          (col("chunk_id") * size + 1).cast("int"), lit(size)).as("chunk"): _*)
  }

  /** O-32 overlapping sliding token windows (emotion_analysis/
    * model.py:89-105,174-177; reference defaults 512/256). Tokens =
    * single-space split (stand-in for the HF tokenizer — the window
    * algebra is the operator; the tokenizer is pluggable). Emits
    * `ceil(n/stride)` windows per doc with the reference's exact bounds:
    * start = i*stride, end = min(start+size, n).
    */
  def slidingTokenWindows(df: DataFrame, textCol: String, size: Int,
      stride: Int, keep: Seq[String]): DataFrame = {
    val toks = split(col(textCol), " ")
    val n = size_(toks).cast("long")
    val nWin = greatest(ceil(n / lit(stride.toDouble)), lit(1)).cast("long")
    df.select(keep.map(col) :+ toks.as("_toks") :+ n.as("_n") :+
        explode(sequence(lit(0L), nWin - 1)).as("window_id"): _*)
      .select(keep.map(col) :+ col("window_id") :+
        (col("window_id") * stride).as("window_start") :+
        least(col("window_id") * stride + size, col("_n")).as("window_end") :+
        array_join(slice(col("_toks"),
          (col("window_id") * stride + 1).cast("int"), lit(size)), " ").as("win"): _*)
  }

  // functions.size clashes with the `size` parameters above
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
