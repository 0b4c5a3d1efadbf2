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

  /** Inner join where `fact.key` is SKEWED: a hot key otherwise lands its
    * entire fact volume in one shuffle partition. The fact side gets a
    * deterministic per-row salt in [0, salts) (hash-derived from `saltBy` —
    * never partition-dependent, so retries and speculative attempts
    * re-derive the same salt); the dim side replicates each row once per
    * salt value; the join runs on (key, salt), spreading a hot key across
    * `salts` partitions. Output is EXACTLY the plain inner join: each fact
    * row carries one salt and meets each matching dim row exactly once —
    * in that salt's replica.
    *
    * This is the manual form for plans AQE's skew split does not cover
    * (shuffled hash joins, or skew known ahead of time — AQE's
    * skewJoin rewrites sort-merge partitions only); the dim side grows
    * `salts`×, so size `salts` to the skew, not to the cluster.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, salts: Int = 8): DataFrame = {
    require(salts >= 1, s"saltedJoin: salts must be >= 1, got $salts")
    val f = fact.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
