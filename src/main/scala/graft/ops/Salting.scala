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
  * The salt must spread a hot key even when ALL its rows carry the same
  * value (a default price, a count-style aggregate): hashing the value alone
  * collapses such a key back onto one reducer. The salt therefore mixes the
  * value with `spark_partition_id()` — rows of a hot key arriving from
  * different input splits land on different salts regardless of the value.
  * Both components are deterministic for a fixed input layout, so retried /
  * speculative tasks reproduce their output (no `rand()`).
  */
object Salting {

  /** Deterministic per-row salt in [0, salts). */
  def saltExpr(value: Column, salts: Int): Column =
    pmod(hash(value, spark_partition_id()), lit(salts))

  def saltedSum(df: DataFrame, key: String, valueDecimal: Column,
                as: String, salts: Int = 8): DataFrame =
    df
      .withColumn("__salt", saltExpr(valueDecimal, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueDecimal).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(as))
}
