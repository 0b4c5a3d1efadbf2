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
