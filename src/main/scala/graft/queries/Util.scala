package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query registry.
  *
  * Cross-engine float determinism: a `sum` over doubles is order-dependent,
  * and Spark's partial-aggregate order differs run to run and engine to
  * engine — a raw `sum(double)` can never hash-match DuckDB. Every SUM/AVG
  * in the registry therefore goes through an exact DECIMAL(28,10) cast
  * (per-row double→decimal conversion is order-independent; decimal addition
  * is exact and associative), and converts back to double only at the end.
  * The oracle SQL mirrors the exact same casts. Per-row double arithmetic
  * (e.g. `price * (1 - discount)`) is bit-identical IEEE in both engines and
  * needs no special handling.
  */
object Util {
  private val Dec = DecimalType(28, 10)

  /** Exact decimal view of a double column (for associative aggregation). */
  def dec(c: Column): Column = c.cast(Dec)

  /** Order-insensitive, engine-exact sum of a double column, as double.
    *
    * Three-step dance, mirrored exactly in [[sqlDsum]]:
    *  1. exact decimal sum (associative — partial-aggregate order can't
    *     change it);
    *  2. `round(_, 2)` — both Spark and DuckDB round() are HALF_UP (DuckDB's
    *     decimal CAST is half-even, so round() it must be);
    *  3. cast to double — exact for scale-2 decimals below 2^53/100, whereas
    *     a scale-10 decimal→double conversion is NOT correctly rounded in
    *     DuckDB and diverges in the last ulp (observed empirically).
    */
  def dsum(c: Column): Column = round(sum(dec(c)), 2).cast("double")

  /** Engine-exact average: exact decimal sum, rounded at scale 6 (a no-op
    * for inputs with ≤6 decimals, but pins the conversion), cast double,
    * divided by the count — identical IEEE division on both engines.
    */
  def davg(c: Column): Column = round(sum(dec(c)), 6).cast("double") / count(c)

  /** The DuckDB-side spelling of [[dsum]] for oracle SQL strings. */
  def sqlDsum(expr: String): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(28,10))), 2) AS DOUBLE)"

  def sqlDavg(expr: String): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(28,10))), 6) AS DOUBLE) / count($expr)"

  /** DuckDB counts are HUGEINT; Spark's are BIGINT — always cast. */
  def sqlCount(star: String = "*"): String = s"CAST(count($star) AS BIGINT)"

  /** DuckDB emulation of Spark's `initcap` (DuckDB 1.0 has no initcap):
    * split on single spaces, uppercase first char + lowercase rest, re-join.
    * Matches initcap for single-space-separated text (the only shape in the
    * testdata).
    */
  def sqlInitcap(expr: String): String =
    s"list_aggr(list_transform(string_split($expr, ' '), x -> upper(x[1:1]) || lower(x[2:])), 'string_agg', ' ')"
}
