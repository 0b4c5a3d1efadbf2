package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting — the selection operators a
  * training-data pipeline runs constantly.
  *
  * Everything here is HASH-derived, never `rand()`:
  *  - reproducible across runs, retries, and speculative task re-execution
  *    (a rand() sample re-draws per attempt — lineage recomputation then
  *    yields a DIFFERENT sample, silently corrupting downstream caches);
  *  - stable under repartitioning (keyed on data, not on partition layout);
  *  - consistent across tables: sampling users and their events by the same
  *    key keeps referential integrity.
  * One narrow map pass, no shuffle, fused with the scan.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep rows where hash(key, salt) lands under `rate` of the bucket
    * space — Bernoulli-by-hash.
    */
  def byHash(df: DataFrame, key: Column, rate: Double, salt: Long = 0L): DataFrame =
    df.filter(pmod(xxhash64(key, lit(salt)), lit(Buckets)) < (lit(Buckets) * rate))

  /** Deterministic train/val/test split: adds `split` with the name whose
    * cumulative weight band contains the row's hash bucket. Weights are
    * normalized; every row lands in exactly one split.
    */
  def splitByHash(df: DataFrame, key: Column, weights: Seq[Double],
                  names: Seq[String], salt: Long = 0L): DataFrame = {
    require(weights.size == names.size && weights.forall(_ > 0))
    val total = weights.sum
    val cuts = weights.scanLeft(0.0)(_ + _).map(w => (w / total * Buckets).toLong)
    val bucket = pmod(xxhash64(key, lit(salt)), lit(Buckets))
    val expr = names.zip(cuts.sliding(2).toSeq).foldLeft(lit(null).cast("string")) {
      case (acc, (name, Seq(lo, hi))) =>
        when(bucket >= lo && bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Systematic modulo sampling on an integer key (1-in-k). Coarser than
    * [[byHash]] (correlated with key structure) but expressible in any
    * engine — the oracle-checkable member of the family.
    */
  def byModulo(df: DataFrame, key: Column, k: Int): DataFrame =
    df.filter(pmod(key, lit(k)) === 0)

  /** Stratified modulo sampling: per-stratum 1-in-k rates (corpus
    * REBALANCING — e.g. downsample the dominant language, keep the rare
    * ones whole). Strata missing from `rates` fall back to `defaultK`;
    * k=1 keeps the stratum entire. Same determinism contract as
    * [[byModulo]] (pure map pass, no shuffle, engine-portable), and the
    * stratum column stays a column — no driver-side group enumeration, so
    * an unexpected new stratum at 100 TB changes selectivity, not the
    * plan.
    */
  def stratifiedByModulo(df: DataFrame, stratum: Column, key: Column,
                         rates: Map[String, Int], defaultK: Int = 1): DataFrame = {
    require(defaultK >= 1 && rates.values.forall(_ >= 1),
      "stratifiedByModulo: every k must be >= 1")
    val k = rates.foldLeft(lit(defaultK)) { case (acc, (s, ki)) =>
      when(stratum === s, lit(ki)).otherwise(acc)
    }
    df.filter(pmod(key, k) === 0)
  }
}
