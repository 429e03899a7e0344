package graft.ops

import graft.functions.moments
import graft.ops.Similarity.{dot, toDouble}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Distributed principal-component analysis over an embedding column —
 * the classic linear dimensionality reduction for embedding corpora
 * (whitening, storage cuts, reduce-then-index retrieval à la
 * [[Similarity.jlTopK]], but DATA-ADAPTIVE: components follow the
 * corpus's actual variance directions instead of random hyperplanes).
 *
 * Scale decomposition (the only shape that survives 100 TB):
 *
 *  1. MOMENTS — one pass over the corpus through the mergeable
 *     [[graft.functions.VectorMoments]] aggregate: each task folds its
 *     rows into a `1 + d + d(d+1)/2` double buffer, the shuffle carries
 *     one buffer per task, the driver receives ONE row. Nothing
 *     row-shaped ever reaches the driver.
 *  2. EIGEN — the d×d covariance eigensolve runs on the driver (cyclic
 *     Jacobi; d ≤ a few hundred makes this microseconds — the same
 *     bounded-driver-work argument as the IVF centroid refinement).
 *  3. PROJECT — components become plan literals; each row's projection
 *     is `nComponents` native sequential dots — zero shuffle, embarrassingly
 *     parallel, whole-stage-codegen'd.
 *
 * Numerical discipline: covariance entries are exact-shape expressions
 * `(S_ij − s_i·s_j/n)/n` over task-order-dependent sums — cross-engine
 * (and cross-run) agreement is at the 1e-12 level, absorbed by the
 * 6-dp rounding every consumer applies before ranking. Eigenvector SIGN
 * is canonicalized (largest-|component| entry positive, ties to the
 * lowest index) so the model is reproducible run to run.
 */
object Pca {

  /** Fitted model: `components` is nComponents × dim, row-major;
    * eigenvalues descend. */
  final case class PcaModel(
      dim: Int,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def nComponents: Int = components.length
    /** Projection offsets: proj_c = dot(x, e_c) − dot(mean, e_c). */
    def offsets: Array[Double] = components.map(e => dotArr(e, mean))
  }

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** One-pass moment collect: (n, sums[d], upper-scatter[d(d+1)/2]) —
    * a single driver row of `O(d²)` doubles regardless of corpus size. */
  def momentsOf(df: DataFrame, vecCol: String, dim: Int): (Double, Array[Double], Array[Double]) = {
    val row = df.select(
      moments.vector_moments(toDouble(col(vecCol)), dim).as("m")).head()
    val buf = row.getSeq[Double](0).toArray
    val n = buf(0)
    require(n > 0, "pca: empty corpus")
    (n, buf.slice(1, 1 + dim), buf.drop(1 + dim))
  }

  /** Dense symmetric covariance from the packed moments. */
  def covarianceMatrix(n: Double, sums: Array[Double], scatter: Array[Double]): Array[Array[Double]] = {
    val d = sums.length
    val cov = Array.ofDim[Double](d, d)
    var tri = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (scatter(tri) - sums(i) * sums(j) / n) / n
        cov(i)(j) = c; cov(j)(i) = c
        tri += 1; j += 1
      }
      i += 1
    }
    cov
  }

  /**
   * Cyclic Jacobi eigensolve of a symmetric matrix: repeated (p,q)
   * rotations zeroing the largest off-diagonal mass, until the
   * off-diagonal Frobenius norm falls below `tol` (or `maxSweeps`).
   * Returns (eigenvalues, eigenvectors-as-rows), UNSORTED. Textbook
   * Golub & Van Loan §8.5 — O(d³) per sweep, ~10 sweeps at d=64:
   * driver microseconds.
   */
  def jacobiEigen(
      m: Array[Array[Double]], maxSweeps: Int = 50,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else 1.0 / (theta - math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
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
    val values = Array.tabulate(d)(i => a(i)(i))
    val vectors = Array.tabulate(d)(c0 => Array.tabulate(d)(r => v(r)(c0)))
    (values, vectors)
  }

  /** Eigensolve + ordering + sign canonicalization from packed moments —
    * the shared driver tail of [[fit]] and [[fitFromState]]. */
  def modelFromMoments(
      d: Int, nComponents: Int,
      n: Double, sums: Array[Double], scatter: Array[Double]): PcaModel = {
    require(nComponents > 0 && nComponents <= d,
      s"pca: nComponents $nComponents out of range for dim $d")
    val cov = covarianceMatrix(n, sums, scatter)
    val (values, vectors) = jacobiEigen(cov)
    // order by eigenvalue desc (ties by original index for determinism),
    // canonicalize sign: the largest-|entry| coefficient (lowest index on
    // ties) is made positive
    val order = values.indices.sortBy(i => (-values(i), i)).take(nComponents)
    val comps = order.map { ci =>
      val e = vectors(ci)
      var best = 0
      var i = 1
      while (i < e.length) {
        if (math.abs(e(i)) > math.abs(e(best))) best = i
        i += 1
      }
      if (e(best) < 0) e.map(x => -x) else e.clone()
    }.toArray
    PcaModel(d, sums.map(_ / n), order.map(values).toArray, comps)
  }

  /** Fit top-`nComponents` principal components of `vecCol`. */
  def fit(
      df: DataFrame, nComponents: Int,
      vecCol: String = "embedding", inDim: Int = 0): PcaModel = {
    val d = if (inDim > 0) inDim
            else df.select(size(col(vecCol))).head(1).headOption
              .map(_.getInt(0))
              .getOrElse(throw new IllegalArgumentException("pca: empty input"))
    val (n, sums, scatter) = momentsOf(df, vecCol, d)
    modelFromMoments(d, nComponents, n, sums, scatter)
  }

  // --------------------------------------------------- persisted moments

  /**
   * The moment buffer IS the model's sufficient statistic, and it is
   * MERGEABLE — so it persists as state the way the IVF/text indexes do:
   * one tiny parquet row `(dim, buffer)`. Refreshing the model after new
   * data arrives folds ONLY the new batch (one linear pass over the
   * batch) and adds two O(d²) vectors; the historical corpus is never
   * re-scanned. `fitFromState` re-runs the (driver-microseconds)
   * eigensolve over the merged statistics. Single-writer semantics like
   * the index append path; the state file is O(d²) bytes, so the write
   * is metadata-sized at any corpus scale.
   */
  def writeMomentsState(
      df: DataFrame, path: String,
      vecCol: String = "embedding", inDim: Int = 0): Unit = {
    val d = if (inDim > 0) inDim
            else df.select(size(col(vecCol))).head(1).headOption
              .map(_.getInt(0))
              .getOrElse(throw new IllegalArgumentException("pca: empty input"))
    val buf = df.select(
      moments.vector_moments(toDouble(col(vecCol)), d).as("m"))
      .head().getSeq[Double](0).toArray
    writeState(df.sparkSession, path, d, buf)
  }

  private def writeState(
      spark: SparkSession, path: String, d: Int, buf: Array[Double]): Unit = {
    import spark.implicits._
    Seq((d, buf.toSeq)).toDF("dim", "buf")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readMomentsState(spark: SparkSession, path: String): (Int, Array[Double]) = {
    val row = spark.read.parquet(path).head()
    (row.getInt(0), row.getSeq[Double](1).toArray)
  }

  /** Fold `batch` into the persisted state: one pass over the BATCH plus
    * an elementwise O(d²) add — never a corpus re-scan. */
  def appendMomentsState(
      spark: SparkSession, path: String, batch: DataFrame,
      vecCol: String = "embedding"): Unit = {
    val (d, state) = readMomentsState(spark, path)
    val delta = batch.select(
      moments.vector_moments(toDouble(col(vecCol)), d).as("m"))
      .head().getSeq[Double](0).toArray
    var i = 0
    while (i < state.length) { state(i) += delta(i); i += 1 }
    writeState(spark, path, d, state)
  }

  private def unpack(d: Int, buf: Array[Double]): (Double, Array[Double], Array[Double]) =
    (buf(0), buf.slice(1, 1 + d), buf.drop(1 + d))

  def fitFromState(spark: SparkSession, path: String, nComponents: Int): PcaModel = {
    val (d, buf) = readMomentsState(spark, path)
    val (n, sums, scatter) = unpack(d, buf)
    require(n > 0, "pca: empty state")
    modelFromMoments(d, nComponents, n, sums, scatter)
  }

  /** Covariance rows from persisted state — same emit as [[covarianceDf]]. */
  def covarianceDfFromState(spark: SparkSession, path: String): DataFrame = {
    val (d, buf) = readMomentsState(spark, path)
    val (n, sums, scatter) = unpack(d, buf)
    require(n > 0, "pca: empty state")
    covRows(spark, covarianceMatrix(n, sums, scatter), d)
  }

  /**
   * Pure ROTATION into the eigenbasis — [[project]] WITHOUT the mean
   * offsets: `rot_c = ⟨x, e_c⟩`. With a full-rank model this is an
   * orthogonal change of basis, so inner products (and hence exact
   * cosine rankings) are preserved EXACTLY while variance concentrates
   * along leading axes — the property OPQ-style product quantization
   * wants: the rotated subspace split balances information across code
   * books without changing what the exact score means.
   */
  def rotate(
      df: DataFrame, model: PcaModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.withColumn("__v", toDouble(col(vecCol)))
      .select(col(idCol),
        array(model.components.toIndexedSeq.map(e =>
          dot(col("__v"), typedlit(e.toSeq))): _*).as("rot"))

  /** Centered projection of `vecCol` onto the model's components:
    * (idCol, proj array<double>) — component rows are plan literals, each
    * coordinate one native sequential dot; zero shuffle. */
  def project(
      df: DataFrame, model: PcaModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val offs = model.offsets
    df.withColumn("__v", toDouble(col(vecCol)))
      .select(col(idCol),
        array(model.components.toIndexedSeq.zipWithIndex.map { case (e, c) =>
          dot(col("__v"), typedlit(e.toSeq)) - lit(offs(c))
        }: _*).as("proj"))
  }

  /**
   * Reduce-then-index retrieval in PCA space: the data-adaptive sibling
   * of [[Similarity.jlTopK]], and the same scale shape — project, then
   * rank under [[Similarity.ivfTopK]] INSIDE probe cells (bucketed join,
   * bounded heap; never an all-pairs scan). The projected corpus is
   * checkpointed once so the centroid sample and the cell-assignment
   * pass don't re-run the projection dots.
   */
  def pcaTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, nComponents: Int = 8,
      nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      precomputed: Option[PcaModel] = None): DataFrame = {
    val model = precomputed.getOrElse(fit(corpus, nComponents, vecCol))
    val pc = project(corpus, model, idCol, vecCol).localCheckpoint()
    Similarity.ivfTopK(
      project(queries, model, idCol, vecCol), pc, k, nCells, nProbe,
      idCol = idCol, vecCol = "proj")
  }

  /**
   * Low-rank reconstruction error per vector — the classic embedding
   * outlier/novelty score: `‖x−μ‖² − Σ_c ⟨x−μ, e_c⟩²` (components are
   * orthonormal, so the residual norm needs no explicit reconstruction).
   * A vector the principal subspace explains well scores ≈ 0; a vector
   * pointing off-manifold scores high — the filter signal for corrupted
   * or out-of-distribution embeddings. Row-local after the (cached) fit:
   * one centered dot per component plus one self-dot, zero shuffle.
   *
   * Fold shapes are fixed for the oracle: centering is an elementwise
   * zip, every dot is the sequential kernel, and the Σ over components
   * is a left-associated reduce — DuckDB replays the same op sequence
   * (list_inner_product + ord-sorted list_sum), so `round(err, 6)` is
   * hash-stable; `+ 0.0` collapses a −0.0 from tiny negative residuals.
   */
  def reconstructionError(
      df: DataFrame, model: PcaModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val meanLit = typedlit(model.mean.toSeq)
    val centered = zip_with(toDouble(col(vecCol)), meanLit, (a, b) => a - b)
    val projSq = model.components.toIndexedSeq
      .map { e =>
        val p = dot(col("__c"), typedlit(e.toSeq))
        p * p
      }
      .reduce(_ + _)
    df.withColumn("__c", centered)
      .select(col(idCol),
        (round(dot(col("__c"), col("__c")) - projSq, 6) + lit(0.0)).as("err_r"))
  }

  /** Upper-triangle covariance as rows (i, j, cov_r) — the
    * moments-aggregate output surfaced as a first-class query (i ≤ j,
    * 0-based, rounded to 6 dp AFTER the exact-shape covariance
    * expression). */
  def covarianceDf(
      spark: SparkSession, df: DataFrame, vecCol: String = "embedding",
      inDim: Int = 0): DataFrame = {
    val d = if (inDim > 0) inDim
            else df.select(size(col(vecCol))).head(1).headOption
              .map(_.getInt(0))
              .getOrElse(throw new IllegalArgumentException("pca: empty input"))
    val (n, sums, scatter) = momentsOf(df, vecCol, d)
    covRows(spark, covarianceMatrix(n, sums, scatter), d)
  }

  private def covRows(
      spark: SparkSession, cov: Array[Array[Double]], d: Int): DataFrame = {
    import spark.implicits._
    val rows = for { i <- 0 until d; j <- i until d } yield (i, j, cov(i)(j))
    // + 0.0 collapses IEEE −0.0 to +0.0 (a covariance that rounds to zero
    // from below would otherwise hash-differ from the oracle's +0.0)
    rows.toDF("i", "j", "cov")
      .select(col("i").cast("int"), col("j").cast("int"),
        (round(col("cov"), 6) + lit(0.0)).as("cov_r"))
  }
}
