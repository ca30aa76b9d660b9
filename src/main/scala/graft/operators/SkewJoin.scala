package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (builder brief: "salting for skew").
  *
  * When one join key holds a disproportionate share of the fact rows, a
  * plain hash join sends that whole key to ONE reducer. Salting splits
  * it: the fact side gets a random-but-deterministic salt in [0, S), the
  * (smaller) build side is replicated S× with every salt value, and the
  * join key becomes (key, salt) — the hot key now spreads over S tasks.
  *
  * AQE's skew-join handles sort-merge cases adaptively at runtime; this
  * explicit form is for when the build side must stay a shuffle join
  * (too big to broadcast) and the skew is known — the classic manual
  * remedy, kept deterministic (hash-based salt) so results are testable.
  */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `key`, salting `fact` with
    * `salts` buckets and exploding `dim` accordingly.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, factCols: Seq[String], dimCols: Seq[String]): DataFrame = {
    // deterministic salt: stable across runs/partitions (unlike rand())
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt"))
      .select((factCols ++ dimCols).distinct.map(col): _*)
  }
}
