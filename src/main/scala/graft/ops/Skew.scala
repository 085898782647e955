package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot keys too
  * large for one task even after AQE's skew-join splitting (AQE only
  * splits the SORTED side of a sort-merge join; a hot build side or a
  * hot aggregation key still needs salting).
  *
  * Salted join: the skewed (large) side gets a random-but-deterministic
  * salt in [0, salts); the small side replicates each row `salts` times.
  * The join key becomes (key, salt) — the hot key's rows spread over
  * `salts` tasks. Cost: small side inflates ×salts, so keep it to the
  * dimension side.
  */
object Skew {

  /** Deterministic pseudo-random salt derived from the whole row —
    * stable across retries (a rand()-based salt breaks task retry
    * idempotency in exchange-reuse corners).
    */
  def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int")

  /** Inner equi-join `large ⋈ small` on `key`, salted `salts` ways. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt", saltCol(large, salts))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Skewed aggregation: two-phase — partial aggregate on (key, salt),
    * then final aggregate on key. `partial` must be an algebraic
    * aggregate expressed on the value column (sum/count/min/max);
    * `merge` combines the partials (e.g. sum of partial sums).
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                partial: Column, merge: Column => Column): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(df, salts))
    salted.groupBy(col(key), col("__salt"))
      .agg(partial.as("__partial"))
      .groupBy(col(key))
      .agg(merge(col("__partial")).as("agg"))
  }
}
