package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary quality-classifier TRAINING in the engine via IRLS/Newton — the
  * missing piece of the DCLM/FineWeb-Edu loop beside [[Classifier]] (scores
  * with GIVEN weights) and [[LinearProbe]] (ridge regression): train the
  * binary gate itself on a labeled slice, then score the full corpus.
  *
  * Model: a generalized linear model with the ALGEBRAIC sigmoid link
  * μ(η) = ½·(1 + η/(1+|η|)) — monotone, (0,1), μ(0)=½, the "fast sigmoid".
  * Why not exp: transcendentals never cross engines (the repo convention
  * behind [[UnigramLm]]'s frozen ln literals and [[NgramLm]]'s integer
  * probabilities) — but here the nonlinearity must be evaluated PER ROW,
  * so freezing is impossible; the algebraic link uses only +,−,×,÷,|·|,
  * which IEEE-754 rounds correctly, so Spark and DuckDB produce
  * BIT-IDENTICAL doubles for the same expression tree. The canonical GLM
  * loss for this link, L(η,y) = ∫(μ(t)−y)dt, is convex in η (μ is
  * increasing), so Newton's method on it is well-posed:
  *   gradient  g = Σ (μ−y)·z + λ·[w,0]
  *   Hessian   H = Σ μ′(η)·z·zᵀ + λ·diag([1…1,0]),  μ′(η) = ½/(1+|η|)²
  * over the augmented vector z = [x, 1] (bias unpenalized, the
  * [[LinearProbe.trainRidge]] convention).
  *
  * Scale shape (the [[LinearProbe]] recipe): the ONLY distributed work per
  * Newton round is one moments pass over the LABELED SLICE — labels are
  * the expensive resource, so a quality-gate trainer reads the small
  * labeled set, never the corpus — emitting (d+1)(d+2)/2 Hessian cells +
  * (d+1) gradient cells per row, decimal-exact sums, one keyed
  * aggregation. The (d+1)-solve is driver-side (deterministic partial
  * pivoting — model state, like the IVF centroids). Scoring the full
  * corpus is one narrow pass with the weights broadcast as literals.
  *
  * Oracle-ability: per round, the INCOMING weights are frozen as SQL
  * literals (the trained-centroid trust model) and DuckDB re-derives
  * η → μ → μ′ → every cell with the identical expression tree, so each
  * round's entire distributed computation hash-matches; the driver-side
  * update consumes exactly the ROUNDED cell values the oracle checks, so
  * the next round's literals are reproducible from verified state.
  */
object Irls {

  /** Trained state: `preWeights(t)` = (w, b) ENTERING round t+1 (so
    * `preWeights(0)` is the zero init — what round 1's oracle freezes),
    * `cells` = every round's collected moment cells (round, i, j, v) with
    * j ≤ dim ⇒ Hessian upper triangle, j = dim+1 ⇒ gradient; `w`/`b` the
    * final model. Bounded driver state: rounds × (d+2)(d+3)/2 doubles.
    */
  final case class IrlsModel(dim: Int,
                             preWeights: Seq[(Array[Double], Double)],
                             cells: Seq[(Int, Int, Int, Double)],
                             w: Array[Double], b: Double)

  /** η per row: round(w·x + b, 6) — the round absorbs any last-ulp
    * accumulation difference in the dot fold before the value feeds the
    * (exactly-rounded) link arithmetic.
    */
  private def etaCol(vecCol: String, w: Array[Double], b: Double): Column =
    round(Similarity.dot(col(vecCol).cast("array<double>"),
      typedLit(w.toSeq)) + lit(b), 6)

  /** μ(η) = ½·(1 + η/(1+|η|)) — mirrored verbatim in the oracle SQL. */
  private def muCol(eta: Column): Column =
    lit(0.5) * (lit(1.0) + eta / (lit(1.0) + abs(eta)))

  /** μ′(η) = ½/(1+|η|)² — the Hessian row weight. */
  private def muPrimeCol(eta: Column): Column =
    lit(0.5) / ((lit(1.0) + abs(eta)) * (lit(1.0) + abs(eta)))

  /** One Newton round's moment cells over frozen weights: rows (i, j, v),
    * i ≤ j ≤ dim ⇒ v = Σ (μ′·z_i)·z_j (Hessian upper triangle),
    * j = dim+1 ⇒ v = Σ (μ−y)·z_i (gradient). Exact decimal sums rounded
    * at 1e-6 (queries/Util scheme). `yCol` must evaluate to 0/1.
    */
  def momentCells(labeled: DataFrame, w: Array[Double], b: Double,
                  yCol: Column, vecCol: String = "embedding"): DataFrame =
    // fixed-point execution of the decimal cell sum (the oracle mirrors
    // the decimal form; bit-identical under the certificate —
    // FixedPointAgg's contract, pinned in IrlsSpec)
    FixedPointAgg.cellsRound6(momentCellRows(labeled, w, b, yCol, vecCol))

  /** The definitional exact-decimal form of [[momentCells]]'s aggregation
    * (the oracle's spelling) — the correctness pin for the fixed-point
    * execution, asserted bitwise-equal in IrlsSpec.
    */
  private[ext] def momentCellsViaDecimal(labeled: DataFrame, w: Array[Double], b: Double,
                                         yCol: Column, vecCol: String = "embedding"): DataFrame =
    momentCellRows(labeled, w, b, yCol, vecCol)
      .groupBy(col("i"), col("j"))
      .agg(round(sum(col("p").cast("decimal(28,10)")), 6).cast("double").as("v"))

  /** Shared cell-row generator for both aggregation forms. */
  private def momentCellRows(labeled: DataFrame, w: Array[Double], b: Double,
                             yCol: Column, vecCol: String): DataFrame = {
    val base = labeled.select(
      expr(s"concat(cast($vecCol as array<double>), array(cast(1.0 as double)))").as("z"),
      etaCol(vecCol, w, b).as("eta"), yCol.cast("double").as("y"))
      .select(col("z"), col("y"),
        muCol(col("eta")).as("mu"), muPrimeCol(col("eta")).as("s"))
      .withColumn("g", col("mu") - col("y"))
    val hess = base.select(col("s"), explode(expr(
        """transform(sequence(0, size(z) - 1), i ->
             struct(i AS i, element_at(z, i + 1) AS zi,
                    slice(z, i + 1, size(z) - i) AS tail))""")).as("t"))
      .select(col("t.i").as("i"),
        posexplode(expr("transform(t.tail, zj -> (s * t.zi) * zj)")).as(Seq("dj", "p")))
      .select(col("i"), (col("i") + col("dj")).cast("int").as("j"), col("p"))
    val grad = base.select(col("g"),
        posexplode(expr("transform(z, zi -> g * zi)")).as(Seq("i", "p")),
        size(col("z")).as("n"))
      .select(col("i").cast("int").as("i"), col("n").cast("int").as("j"), col("p"))
    hess.unionByName(grad)
  }

  /** Deterministic symmetric solve (Gaussian elimination, max-|pivot|
    * partial pivoting, lowest row on ties — the [[LinearProbe.trainRidge]]
    * discipline) of `a·x = rhs`; mutates its inputs.
    */
  private def solve(a: Array[Array[Double]], rhs: Array[Double]): Array[Double] = {
    val k = rhs.length
    var c0 = 0
    while (c0 < k) {
      var p = c0
      var best = math.abs(a(c0)(c0))
      var r = c0 + 1
      while (r < k) {
        val v = math.abs(a(r)(c0))
        if (v > best) { best = v; p = r } // strict >: lowest row wins ties
        r += 1
      }
      require(best > 0.0, s"irls: singular Newton system at column $c0 (raise lambda)")
      if (p != c0) {
        val t = a(p); a(p) = a(c0); a(c0) = t
        val tb = rhs(p); rhs(p) = rhs(c0); rhs(c0) = tb
      }
      var r2 = c0 + 1
      while (r2 < k) {
        val f = a(r2)(c0) / a(c0)(c0)
        if (f != 0.0) {
          var c = c0
          while (c < k) { a(r2)(c) -= f * a(c0)(c); c += 1 }
          rhs(r2) -= f * rhs(c0)
        }
        r2 += 1
      }
      c0 += 1
    }
    val x = new Array[Double](k)
    var i = k - 1
    while (i >= 0) {
      var s = rhs(i)
      var c = i + 1
      while (c < k) { s -= a(i)(c) * x(c); c += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** One driver-side Newton update from collected (rounded) cells:
    * w ← w − (H + λ·diag)⁻¹ (g + λ·[w,0]). Consumes exactly the values
    * the oracle verifies, so trained state is reproducible from checked
    * state.
    */
  def newtonStep(cells: Seq[(Int, Int, Double)], w: Array[Double], b: Double,
                 dim: Int, lambda: Double): (Array[Double], Double) = {
    val k = dim + 1
    val h = Array.ofDim[Double](k, k)
    val g = new Array[Double](k)
    cells.foreach { case (i, j, v) =>
      if (j <= dim) { h(i)(j) = v; h(j)(i) = v }
      else g(i) = v
    }
    var i = 0
    while (i < dim) { h(i)(i) += lambda; g(i) += lambda * w(i); i += 1 }
    val d = solve(h, g)
    (Array.tabulate(dim)(i => w(i) - d(i)), b - d(dim))
  }

  /** Train `rounds` Newton rounds from the zero model on a labeled slice.
    * Each round: ONE distributed moments pass (collected — cell count is
    * (d+2)(d+3)/2, model-state-sized) + the driver solve.
    */
  def train(labeled: DataFrame, yCol: Column, rounds: Int = 2,
            lambda: Double = 1e-2, vecCol: String = "embedding"): IrlsModel = {
    require(rounds >= 1, s"irls: rounds >= 1, got $rounds")
    // probe the dimension defensively: an empty labeled slice must fail
    // with a named error, not .head's opaque NoSuchElementException
    // (round-12 ADVICE — the UnigramLm empty-corpus discipline)
    val dim = labeled.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(throw new IllegalArgumentException(
        "irls: empty labeled slice — no rows to train on"))
    var w = new Array[Double](dim)
    var b = 0.0
    val pre = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
    val all = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Double)]
    var t = 1
    while (t <= rounds) {
      pre += ((w, b))
      val cells = momentCells(labeled, w, b, yCol, vecCol)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
      all ++= cells.map { case (i, j, v) => (t, i, j, v) }
      val (w2, b2) = newtonStep(cells, w, b, dim, lambda)
      w = w2; b = b2
      t += 1
    }
    IrlsModel(dim, pre.toSeq, all.toSeq, w, b)
  }

  /** Score a corpus with a trained gate: `round(μ(η), 6)` per row — one
    * narrow pass, weights broadcast as literals (the generated oracle
    * embeds the identical literals).
    */
  def scores(corpus: DataFrame, w: Array[Double], b: Double,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("vec_id"),
      round(muCol(etaCol(vecCol, w, b)), 6).as("quality"))
}
