package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation by salting: a two-phase aggregation that splits each hot
  * key across `salts` sub-keys before the wide shuffle, then combines the
  * partials.
  *
  * Phase 1 shuffles on (key, salt) — a skewed key's rows spread over `salts`
  * reducers instead of melting one. Phase 2 shuffles only the tiny partial
  * table (|keys| × salts rows). For associative aggregates the result is
  * EXACTLY the direct groupBy (the oracle-checked query q21_salted_sum pins
  * this; sums go through exact decimals so even floating-point association
  * can't diverge).
  *
  * The salt must be deterministic data (not rand()) so retried/speculative
  * tasks reproduce their output — here a hash of the value column.
  */
object Salting {

  def saltedSum(df: DataFrame, key: String, valueDecimal: Column,
                as: String, salts: Int = 8): DataFrame =
    df
      .withColumn("__salt", pmod(hash(valueDecimal), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueDecimal).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(as))
}
