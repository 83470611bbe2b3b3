package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-component analysis of an embedding column — the
  * data-DEPENDENT dimensionality reduction next to
  * [[SimilaritySearch.rpReduce]]'s data-independent JL projection:
  * where the Rademacher map spends distortion uniformly, PCA spends it
  * where the corpus has no variance, which on real (clustered,
  * anisotropic) embedding corpora preserves neighborhoods at a
  * fraction of the width. The price is a training pass and a fitted
  * model to ship; both are built scale-first:
  *
  *  - TRAIN (one pass, corpus never shuffled): per-partition
  *    FIXED-POINT moment accumulators — count, per-component sums, and
  *    the upper-triangular Gram matrix, every term rounded to
  *    `rint(x · 2²⁰)` Long before accumulation — tree-reduced as exact
  *    integer adds. Long addition is associative and commutative, so
  *    the fitted covariance (and therefore the basis, the projection,
  *    and every pinned recall count downstream) is a pure function of
  *    the corpus: independent of partitioning, task order, retries,
  *    and tree shape — the same determinism discipline as
  *    [[Clustering]]'s centroid update, which a plain double sum
  *    breaks. Reduce traffic is ≤ partitions · (d²/2 + d + 1) Longs
  *    (~17 KB per partial at d = 64), tree-combined, never a hot key.
  *  - SOLVE (driver, O(d³)): cyclic Jacobi on the d×d covariance —
  *    fixed sweep order, deterministic rotations; eigenpairs sorted by
  *    (eigenvalue desc, index asc) and sign-normalized (the largest-
  *    magnitude component of each basis vector is made positive,
  *    lowest index on ties), so the basis is canonical.
  *  - APPLY: the top-`outDim` basis ships as a
  *    [[graft.functions.MatrixProject]] codegen reference object — a
  *    pure projection pass, no shuffle, composable with any of the
  *    ANN index paths exactly like [[SimilaritySearch.rpReduce]].
  *
  * Fixed-point granularity 2⁻²⁰ bounds the covariance perturbation at
  * ~2⁻²¹ per entry (unit-scale inputs) — far below the spectral gaps
  * that decide a basis. Overflow bound: |Σ| < n · max|xᵢxⱼ| · 2²⁰,
  * safe past 10¹¹ unit-scale rows per partition tree.
  *
  * No reference analog (`/root/reference/.../NND.scala` has no
  * projection surface); §2.9 training-pipeline family.
  */
object Pca {

  private val Scale = 1L << 20

  /** Fitted top-`outDim` orthonormal basis (outDim × d floats), rows
    * ordered by explained variance. */
  def fit(df: DataFrame, vecCol: String, outDim: Int): Array[Array[Float]] =
    fitSpectrum(df, vecCol, outDim)._1

  /** [[fit]] plus the FULL eigenvalue spectrum (d doubles, descending)
    * — the variance-explained diagnostic a width choice is made from. */
  def fitSpectrum(df: DataFrame, vecCol: String,
                  outDim: Int): (Array[Array[Float]], Array[Double]) =
    fitSpectrumFromMoments(momentSketch(df, vecCol), outDim)

  /** The fixed-point moment sketch of an embedding column:
    * `[count | per-component sums (d) | upper-tri Gram sums (d(d+1)/2)]`
    * as exact Longs. Because every entry is an integer SUM, the sketch
    * is EXACTLY mergeable ([[mergeMoments]] is plain element-wise
    * addition): fitting a basis on yesterday's corpus plus today's
    * increment from two separately-computed sketches is bit-identical
    * to one fit over the union — incremental PCA with zero
    * approximation, the same daily-append shape as
    * [[graft.nnd.NND.updateGraph]] but closed-form. Persist the ~17 KB
    * Long array next to the corpus snapshot and the training pass for
    * an increment touches only the increment. */
  def momentSketch(df: DataFrame, vecCol: String): Array[Long] = {
    val vecs = df.select(col(vecCol))
    val first = vecs.limit(1).collect()
    require(first.nonEmpty, "empty input")
    val dim = first.head.getSeq[Float](0).length
    val triLen = dim * (dim + 1) / 2

    // One pass: mapPartitions is genuinely imperative (primitive-array
    // accumulation); treeReduce combines partials with exact integer
    // adds — deterministic under any tree shape.
    vecs.rdd.mapPartitions { it =>
      val a = new Array[Long](1 + dim + triLen)
      it.foreach { row =>
        val v = row.getSeq[Float](0)
        a(0) += 1
        var i = 0
        var t = 1 + dim
        while (i < dim) {
          val xi = v(i).toDouble
          a(1 + i) += math.rint(xi * Scale).toLong
          var j = i
          while (j < dim) {
            a(t) += math.rint(xi * v(j).toDouble * Scale).toLong
            t += 1
            j += 1
          }
          i += 1
        }
      }
      Iterator.single(a)
    }.treeReduce(mergeMoments, depth = 2)
  }

  /** Exact merge of two moment sketches (element-wise Long add) —
    * associative, commutative, lossless. */
  def mergeMoments(x: Array[Long], y: Array[Long]): Array[Long] = {
    require(x.length == y.length, s"sketch size mismatch: ${x.length} vs ${y.length}")
    val out = new Array[Long](x.length)
    var i = 0
    while (i < x.length) { out(i) = x(i) + y(i); i += 1 }
    out
  }

  /** Solve the basis from a (possibly merged) moment sketch. */
  def fitSpectrumFromMoments(acc: Array[Long],
                             outDim: Int): (Array[Array[Float]], Array[Double]) = {
    // length = 1 + d + d(d+1)/2 → d from the positive quadratic root.
    val dim = ((math.sqrt(9.0 + 8.0 * (acc.length - 1)) - 3.0) / 2.0).round.toInt
    require(1 + dim + dim * (dim + 1) / 2 == acc.length,
      s"malformed sketch of length ${acc.length}")
    require(outDim >= 1 && outDim <= dim, s"bad outDim=$outDim for dim=$dim")
    val n = acc(0)
    require(n > 0, "empty input")
    val mean = Array.tabulate(dim)(i => acc(1 + i).toDouble / Scale / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var t = 1 + dim
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = acc(t).toDouble / Scale / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }

    val (eigVals, eigVecs) = jacobiEigen(cov)
    // Sort (eigenvalue desc, original index asc); canonical sign.
    val order = eigVals.indices.sortBy(c => (-eigVals(c), c))
    val spectrum = order.map(eigVals(_)).toArray
    val basis = order.take(outDim).map { c =>
      val vec = Array.tabulate(dim)(r => eigVecs(r)(c))
      var big = 0
      var r = 1
      while (r < dim) {
        if (math.abs(vec(r)) > math.abs(vec(big))) big = r
        r += 1
      }
      val signed = if (vec(big) < 0) vec.map(-_) else vec
      signed.map(_.toFloat)
    }.toArray
    (basis, spectrum)
  }

  /** Replace `vecCol` with its projection through a fitted basis. */
  def reduce(df: DataFrame, vecCol: String, basis: Array[Array[Float]]): DataFrame =
    df.withColumn(vecCol, VectorFunctions.matrix_project(col(vecCol), basis))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * `(eigenvalues, eigenvector columns)` — fixed sweep order (p < q
    * ascending), rotations until the SQUARED off-diagonal Frobenius
    * mass falls below 1e-28·d² (i.e. off-norm ≤ 1e-14·d) or 64 sweeps:
    * deterministic to the bit for a given input. O(d³) per sweep on
    * the driver — d is vector width (64 here), never data size. */
  private def jacobiEigen(
      input: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = input.length
    val a = input.map(_.clone())
    val v = Array.tabulate(n)(i => Array.tabulate(n)(j => if (i == j) 1.0 else 0.0))

    def offMass(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }

    var sweep = 0
    while (sweep < 64 && offMass() > 1e-28 * n * n) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tRot =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tRot * tRot + 1.0)
            val s = tRot * c
            var k = 0
            while (k < n) {
              if (k != p && k != q) {
                val akp = a(k)(p)
                val akq = a(k)(q)
                a(k)(p) = c * akp - s * akq
                a(p)(k) = a(k)(p)
                a(k)(q) = s * akp + c * akq
                a(q)(k) = a(k)(q)
              }
              k += 1
            }
            val app = a(p)(p)
            val aqq = a(q)(q)
            a(p)(p) = c * c * app - 2.0 * s * c * apq + s * s * aqq
            a(q)(q) = s * s * app + 2.0 * s * c * apq + c * c * aqq
            a(p)(q) = 0.0
            a(q)(p) = 0.0
            k = 0
            while (k < n) {
              val vkp = v(k)(p)
              val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
