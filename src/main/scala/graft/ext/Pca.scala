package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine PCA over an embedding column — the decorrelate/compress step
  * between raw embeddings and everything downstream (clustering, ANN
  * bucketing, probe features): train a mean + top-k principal components,
  * then project map-only.
  *
  * Shape (the IVF/PQ/LinearProbe discipline): the ONLY distributed work is
  * one pass accumulating the second-moment matrix of the AUGMENTED vector
  * `z = [x, 1]` — a single (d+1)(d+2)/2-cell [[MomentsAgg]] buffer per
  * task (≈17 KB at d=64), which simultaneously yields Σx·xᵀ, Σx and n, so
  * mean and covariance need no extra pass. The eigensolve is driver-side
  * on the d×d covariance (model state, corpus-size-independent): fixed-
  * iteration power iteration with deflation, deterministic init and a
  * deterministic sign convention (largest-|coordinate| positive), so the
  * trained model is a pure function of the moment matrix. Projection is
  * `x·vᶜ − μ·vᶜ` with the `μ·vᶜ` constant folded on the driver — the
  * native [[graft.functions.GraftFunctions.dot_product]] kernel per
  * component, rounded at 1e-6 (the repo's cross-engine float convention),
  * zero shuffles.
  */
object Pca {

  /** Trained model — driver-side state, never grows with the corpus. */
  final case class PcaModel(dim: Int, nRows: Long, mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double])

  /** One moments pass + driver eigensolve. */
  def train(emb: DataFrame, k: Int, iters: Int = 100,
            vecCol: String = "embedding"): PcaModel = {
    val spark = emb.sparkSession
    import spark.implicits._
    val d = emb.select(size(col(vecCol)).as("d")).head.getInt(0)
    require(k >= 1 && k <= d, s"pcaTrain: k=$k out of range for dim $d")
    val m = d + 1
    val mom = emb
      .select(expr(s"transform($vecCol, v -> cast(v as double))").as("x"))
      .as[Seq[Double]]
      .map(x => x :+ 1.0)
      .select(new MomentsAgg(m).toColumn)
      .head()
    // upper-triangle unflatten: cell (i,j), i<=j, sits at i·m − i(i−1)/2 + (j−i)
    def tri(i0: Int, j0: Int): Double = {
      val (i, j) = if (i0 <= j0) (i0, j0) else (j0, i0)
      mom(i * m - i * (i - 1) / 2 + (j - i))
    }
    val n = tri(d, d) // Σ 1·1
    require(n > 0, "pcaTrain: empty corpus")
    val mean = Array.tabulate(d)(i => tri(i, d) / n)
    val cov = Array.tabulate(d, d)((i, j) => tri(i, j) / n - mean(i) * mean(j))

    val comps = new Array[Array[Double]](k)
    val evs = new Array[Double](k)
    for (cIdx <- 0 until k) {
      // Gram-Schmidt against the components found so far (in place)
      def gs(w: Array[Double]): Unit =
        for (p <- 0 until cIdx) {
          val cp = comps(p)
          var dp = 0.0; var j = 0
          while (j < d) { dp += w(j) * cp(j); j += 1 }
          j = 0
          while (j < d) { w(j) -= dp * cp(j); j += 1 }
        }
      def norm2(w: Array[Double]): Double = math.sqrt(w.map(x => x * x).sum)
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 0 until iters) {
        val w = Array.tabulate(d) { i =>
          var acc = 0.0; var j = 0
          while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
          acc
        }
        // re-orthogonalize every step: deflation alone leaves residue that
        // re-attracts the iteration on rank-deficient covariances
        gs(w)
        val norm = norm2(w)
        v = if (norm > 0) w.map(_ / norm) else w
      }
      // final DOUBLE Gram-Schmidt ("twice is enough"): when the deflated
      // spectrum is numerically null, one pass leaves a residual whose
      // orthogonality error is relative to its own ~1e-28 norm — i.e.
      // arbitrary direction after normalizing (observed: a rank-2 planted
      // corpus put component 3 back inside span(c0, c2)). A second pass
      // shrinks the error relative to the residual itself; if even that
      // norm is numerically null, complete the basis deterministically
      // from coordinate vectors (any orthonormal completion is a valid
      // null-space component, eigenvalue 0).
      val wf = v.clone
      gs(wf); gs(wf)
      val nf = norm2(wf)
      v = if (nf > 1e-8) wf.map(_ / nf)
      else {
        var chosen: Array[Double] = null
        var b = 0
        while (chosen == null && b < d) {
          val e = Array.tabulate(d)(i => if (i == b) 1.0 else 0.0)
          gs(e); gs(e)
          val ne = norm2(e)
          if (ne > 0.5) chosen = e.map(_ / ne)
          b += 1
        }
        require(chosen != null, s"pcaTrain: cannot complete basis at component $cIdx")
        chosen
      }
      var lambda = 0.0
      for (i <- 0 until d; j <- 0 until d) lambda += v(i) * cov(i)(j) * v(j)
      // deterministic sign: the largest-|coordinate| entry is positive
      // (lowest index on ties), so the model is reproducible bit-for-bit
      val mx = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(mx) < 0) v = v.map(x => -x)
      comps(cIdx) = v
      evs(cIdx) = lambda
      for (i <- 0 until d; j <- 0 until d) cov(i)(j) -= lambda * v(i) * v(j)
    }
    PcaModel(d, n.toLong, mean, comps, evs)
  }

  /** Deterministic Rademacher matrix: ±1 from a FULL 64-bit mix (splitmix64
    * finalizer), seeded — no RNG, so every consumer is reproducible and
    * retry/speculation-stable. A linear formula's parity is NOT usable
    * here — parity of `a·i + b·j` with odd a, b degenerates to (i+j) mod 2,
    * which collapses every column onto ±one direction and silently reduces
    * a sketch to rank 1 (observed: the second eigenpair vanished entirely).
    * Shared by [[trainSketched]] (range finder) and [[randomProject]] (JL).
    */
  private[graft] def rademacher(d: Int, m: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(d, m) { (i, j) =>
      var z = seed + i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  /** Johnson–Lindenstrauss random projection: TRAINING-FREE dimensionality
    * reduction — `r_j = (x · ω_j)/√m` for the deterministic [[rademacher]]
    * matrix. Where PCA needs a moments pass and an eigensolve, this needs
    * NOTHING before the first row flows: map-only, one codegen dot product
    * per output dimension, no shuffle, no model state beyond the seed —
    * the right first move at web-scale dims (d=4096 → m=64 preserves
    * pairwise distances within ~1/√m distortion by the JL lemma) before
    * any trained structure exists. Engine-portable: ±1 literals and one
    * IEEE division, rounded at 1e-6 like the PCA projections.
    */
  def randomProject(emb: DataFrame, m: Int, seed: Long = 42L,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m >= 1, s"randomProject: m must be >= 1, got $m")
    val d = emb.select(size(col(vecCol)).as("d")).head.getInt(0)
    val om = rademacher(d, m, seed)
    val sqrtM = math.sqrt(m.toDouble)
    val x = col(vecCol).cast("array<double>")
    val rcols: Seq[Column] = (0 until m).map { j =>
      val colv = Array.tabulate(d)(i => om(i)(j))
      round(Similarity.dot(x, typedLit(colv.toSeq)) / lit(sqrtM), 6).as(s"r$j")
    }
    emb.select(col(idCol).as("vec_id") +: rcols: _*)
  }

  /** SKETCHED training — the large-d scale path the exact trainer cannot
    * take: [[train]]'s moment buffer is (d+1)(d+2)/2 doubles (≈64 MB per
    * task at d=4096), while this one-pass randomized range finder (Halko
    * et al. 2011, single-pass Nyström variant) accumulates only
    * `Σx·yᵀ` (d×m) and `Σy·yᵀ` (m×m) for the sketch `y = Ωᵀx`,
    * m = k + oversample — ~256 KB per task at d=4096, m=8.
    *
    * Ω is a DETERMINISTIC Rademacher matrix (±1 from integer hash parity,
    * seeded) — no RNG, so training is reproducible and retry/speculation
    * -stable. Driver-side small algebra: `CΩ = A/n − μ(Ωᵀμ)ᵀ`,
    * `ΩᵀCΩ = W/n − (Ωᵀμ)(Ωᵀμ)ᵀ`, then the Nyström eigensolve
    * `C ≈ (CΩ)(ΩᵀCΩ)⁻¹(CΩ)ᵀ` via the exact [[train]] machinery on the
    * m×m core. Returns a standard [[PcaModel]] — [[project]] is identical
    * downstream.
    */
  def trainSketched(emb: DataFrame, k: Int, oversample: Int = 4,
                    seed: Long = 42L, vecCol: String = "embedding"): PcaModel = {
    val spark = emb.sparkSession
    import spark.implicits._
    val d = emb.select(size(col(vecCol)).as("d")).head.getInt(0)
    val m = k + oversample
    require(k >= 1 && m <= d, s"trainSketched: k=$k + oversample=$oversample > dim $d")
    val omega = rademacher(d, m, seed)
    val bOmega = spark.sparkContext.broadcast(omega)
    // one pass: z = [x, y, 1] (d + m + 1) — its moment matrix holds Σx·xᵀ
    // too, which we DON'T need; accumulate only the blocks we use via a
    // dedicated reducer to keep the buffer at d·m + m² + d + m + 1 cells.
    val cells = d * m + m * m + d + m + 1
    val agg = new org.apache.spark.sql.expressions.Aggregator[Seq[Double], Array[Double], Array[Double]] {
      override def zero: Array[Double] = new Array[Double](cells)
      override def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
        val om = bOmega.value
        val xa = x.toArray
        val y = new Array[Double](m)
        var j = 0
        while (j < m) {
          var acc = 0.0; var i = 0
          while (i < d) { acc += xa(i) * om(i)(j); i += 1 }
          y(j) = acc; j += 1
        }
        var idx = 0
        var i = 0
        while (i < d) { // Σ x·yᵀ
          val xi = xa(i); var jj = 0
          while (jj < m) { buf(idx) += xi * y(jj); idx += 1; jj += 1 }
          i += 1
        }
        i = 0
        while (i < m) { // Σ y·yᵀ
          val yi = y(i); var jj = 0
          while (jj < m) { buf(idx) += yi * y(jj); idx += 1; jj += 1 }
          i += 1
        }
        i = 0
        while (i < d) { buf(idx) += xa(i); idx += 1; i += 1 } // Σ x
        i = 0
        while (i < m) { buf(idx) += y(i); idx += 1; i += 1 }  // Σ y
        buf(idx) += 1.0                                        // n
        buf
      }
      override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
        var i = 0
        while (i < cells) { a(i) += b(i); i += 1 }
        a
      }
      override def finish(r: Array[Double]): Array[Double] = r
      override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
      override def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }
    val mom = emb
      .select(expr(s"transform($vecCol, v -> cast(v as double))").as("x"))
      .as[Seq[Double]]
      .select(agg.toColumn)
      .head()
    // unpack
    val n = mom(cells - 1)
    require(n > 0, "trainSketched: empty corpus")
    val a = Array.tabulate(d, m)((i, j) => mom(i * m + j))           // Σ x·yᵀ
    val w = Array.tabulate(m, m)((i, j) => mom(d * m + i * m + j))   // Σ y·yᵀ
    val sx = Array.tabulate(d)(i => mom(d * m + m * m + i))          // Σ x
    val sy = Array.tabulate(m)(j => mom(d * m + m * m + d + j))      // Σ y
    val mu = sx.map(_ / n)
    val muY = sy.map(_ / n) // = Ωᵀμ
    // CΩ (d×m) and ΩᵀCΩ (m×m)
    val cOm = Array.tabulate(d, m)((i, j) => a(i)(j) / n - mu(i) * muY(j))
    val core = Array.tabulate(m, m)((i, j) => w(i)(j) / n - muY(i) * muY(j))
    // Nyström: C ≈ B G⁻¹ Bᵀ with B = CΩ, G = ΩᵀCΩ. Eigenpairs: with the
    // small symmetric eigensolve G = U Λ Uᵀ (exact-trainer machinery),
    // F = B U Λ^{-1/2} gives C ≈ F Fᵀ; the top-k eigenpairs of C are the
    // top-k of the m×m matrix FᵀF mapped back through F.
    val (uG, lG) = eigSym(core, m)
    val f = Array.tabulate(d, m) { (i, j) =>
      if (lG(j) > 1e-12) {
        var acc = 0.0; var t = 0
        while (t < m) { acc += cOm(i)(t) * uG(t)(j); t += 1 }
        acc / math.sqrt(lG(j))
      } else 0.0
    }
    val ftf = Array.tabulate(m, m) { (p, q) =>
      var acc = 0.0; var i = 0
      while (i < d) { acc += f(i)(p) * f(i)(q); i += 1 }
      acc
    }
    val (uS, lS) = eigSym(ftf, m)
    val comps = Array.tabulate(k) { c =>
      val v = Array.tabulate(d) { i =>
        var acc = 0.0; var t = 0
        while (t < m) { acc += f(i)(t) * uS(t)(c); t += 1 }
        acc
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      val vn = if (norm > 1e-12) v.map(_ / norm) else v
      val mx = vn.indices.maxBy(i => (math.abs(vn(i)), -i))
      if (vn(mx) < 0) vn.map(x => -x) else vn
    }
    PcaModel(d, n.toLong, mu, comps, Array.tabulate(k)(c => lS(c)))
  }

  /** Small symmetric eigensolve (columns of U = eigenvectors, Λ
    * descending) via the same deterministic power-iteration-with-deflation
    * the exact trainer uses — adequate for m ≤ a few dozen.
    */
  private def eigSym(mat: Array[Array[Double]], m: Int,
                     iters: Int = 200): (Array[Array[Double]], Array[Double]) = {
    val c = mat.map(_.clone)
    val vecs = new Array[Array[Double]](m)
    val vals = new Array[Double](m)
    for (cIdx <- 0 until m) {
      def gs(wv: Array[Double]): Unit =
        for (p <- 0 until cIdx) {
          val cp = vecs(p)
          var dp = 0.0; var j = 0
          while (j < m) { dp += wv(j) * cp(j); j += 1 }
          j = 0
          while (j < m) { wv(j) -= dp * cp(j); j += 1 }
        }
      var v = Array.tabulate(m)(i => 1.0 / math.sqrt(m.toDouble) * (if (i % 2 == 0) 1 else -1))
      for (_ <- 0 until iters) {
        val wv = Array.tabulate(m) { i =>
          var acc = 0.0; var j = 0
          while (j < m) { acc += c(i)(j) * v(j); j += 1 }
          acc
        }
        gs(wv)
        val norm = math.sqrt(wv.map(x => x * x).sum)
        v = if (norm > 0) wv.map(_ / norm) else wv
      }
      val wf = v.clone
      gs(wf); gs(wf)
      val nf = math.sqrt(wf.map(x => x * x).sum)
      v = if (nf > 1e-10) wf.map(_ / nf)
      else {
        var chosen: Array[Double] = null
        var b = 0
        while (chosen == null && b < m) {
          val e = Array.tabulate(m)(i => if (i == b) 1.0 else 0.0)
          gs(e); gs(e)
          val ne = math.sqrt(e.map(x => x * x).sum)
          if (ne > 0.5) chosen = e.map(_ / ne)
          b += 1
        }
        require(chosen != null, "eigSym: cannot complete basis")
        chosen
      }
      var lambda = 0.0
      for (i <- 0 until m; j <- 0 until m) lambda += v(i) * c(i)(j) * v(j)
      vecs(cIdx) = v
      vals(cIdx) = lambda
      for (i <- 0 until m; j <- 0 until m) c(i)(j) -= lambda * v(i) * v(j)
    }
    // column-major: U(t)(j) = eigenvector j's coordinate t
    (Array.tabulate(m, m)((t, j) => vecs(j)(t)), vals)
  }

  /** `μ·vᶜ` for component c — computed with one fixed left-to-right loop
    * so the projection path and a generated oracle embed the bit-identical
    * constant.
    */
  def meanOffset(model: PcaModel, c: Int): Double = {
    val v = model.components(c)
    var off = 0.0
    var j = 0
    while (j < v.length) { off += v(j) * model.mean(j); j += 1 }
    off
  }

  /** Whitened projection: `round((x·vᶜ − μ·vᶜ)/√λᶜ, 6)` as `w{c}` —
    * decorrelated unit-variance features (what a downstream probe or
    * clusterer consumes). Eigenvalues are floored at 1e-12 so null-space
    * components never divide by ~0. Same map-only shape as [[project]];
    * rounding is applied AFTER the division.
    */
  def whiten(emb: DataFrame, model: PcaModel, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    val wcols: Seq[Column] = model.components.toSeq.zipWithIndex.map { case (v, i) =>
      val sd = math.sqrt(math.max(model.eigenvalues(i), 1e-12))
      round((Similarity.dot(x, typedLit(v.toSeq)) - lit(meanOffset(model, i))) / lit(sd), 6)
        .as(s"w$i")
    }
    emb.select(col(idCol).as("vec_id") +: wcols: _*)
  }

  /** Map-only projection: per component c, `round(x·vᶜ − μ·vᶜ, 6)` as
    * column `p{c}` — the mean-dot constant is folded on the driver so the
    * hot path is one codegen dot product per component, no centering pass.
    */
  def project(emb: DataFrame, model: PcaModel, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    val pcols: Seq[Column] = model.components.toSeq.zipWithIndex.map { case (v, i) =>
      round(Similarity.dot(x, typedLit(v.toSeq)) - lit(meanOffset(model, i)), 6).as(s"p$i")
    }
    emb.select(col(idCol).as("vec_id") +: pcols: _*)
  }
}
