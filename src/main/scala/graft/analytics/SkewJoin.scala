package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for joins/aggregations on zipf-distributed keys
  * (north rule: "salted repartitioning for skewed hosts"; reference's
  * manual work-striping C2, `small_model_inference.py:147`).
  *
  * Two tools:
  *  - [[saltedJoin]]: big-side rows get a deterministic salt from a
  *    row-unique column; the small side is exploded ×S so every
  *    (key, salt) bucket joins locally. One hot key spreads over S tasks.
  *  - [[saltedAggregate]]: two-phase aggregation — partial per (key, salt),
  *    final per key — for algebraic aggregates on skewed group keys.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`) handles
  * sort-merge cases at runtime; these are for the planned-ahead path and
  * for aggregations, which AQE does not re-balance.
  */
object SkewJoin {

  /** Equi join of a skewed big side against a small dimension, salted S ways.
    * `rowId` must be unique-ish per big-side row (e.g. url) so the salt is
    * deterministic — no `rand()`, results are reproducible.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      rowId: Column, salt: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(rowId), lit(salt)))
    val exploded = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase count/sum on a skewed key: groupBy(key, salt) partial →
    * groupBy(key) final. The first shuffle spreads the hot key across
    * `salt` reducers; the second moves only `distinct keys × salt` rows.
    */
  def saltedAggregate(df: DataFrame, key: String, rowId: Column,
      valueCol: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(rowId), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("total"))
}
