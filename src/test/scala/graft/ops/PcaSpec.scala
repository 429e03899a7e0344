package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private def approx(a: Double, b: Double, eps: Double = 1e-9) =
    math.abs(a - b) < eps

  test("jacobiEigen recovers the known eigensystem of [[2,1],[1,2]]") {
    val (values, vectors) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = values.indices.sortBy(i => -values(i))
    assert(approx(values(order(0)), 3.0) && approx(values(order(1)), 1.0))
    // e(3) ∝ (1,1)/√2; e(1) ∝ (1,−1)/√2 (sign-free check via |components|)
    val e3 = vectors(order(0)); val e1 = vectors(order(1))
    val s = 1.0 / math.sqrt(2)
    assert(approx(math.abs(e3(0)), s) && approx(math.abs(e3(1)), s))
    assert(approx(math.abs(e1(0)), s) && approx(math.abs(e1(1)), s))
    assert(approx(e3(0) * e1(0) + e3(1) * e1(1), 0.0)) // orthogonal
  }

  test("jacobiEigen residual ‖Av − λv‖ is tiny on a random symmetric matrix") {
    val rng = new java.util.Random(7)
    val d = 12
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rng.nextGaussian(); m(i)(j) = x; m(j)(i) = x
    }
    val (values, vectors) = Pca.jacobiEigen(m)
    for (c <- 0 until d) {
      val v = vectors(c)
      val av = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
      val res = math.sqrt(
        (0 until d).map(i => math.pow(av(i) - values(c) * v(i), 2)).sum)
      assert(res < 1e-8, s"component $c residual $res")
    }
  }

  test("fit: covariance matches a naive local computation; model is canonical") {
    import spark.implicits._
    val rng = new java.util.Random(42)
    val data = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(6)(rng.nextGaussian())))
    val df = data.toDF("vec_id", "embedding")
    val (n, sums, scatter) = Pca.momentsOf(df, "embedding", 6)
    assert(n == 200.0)
    // naive local moments
    val raw = data.map(_._2.toArray)
    for (i <- 0 until 6)
      assert(approx(sums(i), raw.map(_(i)).sum, 1e-9))
    val cov = Pca.covarianceMatrix(n, sums, scatter)
    val mean = sums.map(_ / 200)
    for (i <- 0 until 6; j <- i until 6) {
      val naive = raw.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / 200
      assert(approx(cov(i)(j), naive, 1e-8), s"cov($i,$j)")
    }
    val model = Pca.fit(df, 4)
    // eigenvalues descend; components orthonormal; sign canonical
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    for (a <- 0 until 4; b <- 0 until 4) {
      val d0 = (0 until 6).map(i => model.components(a)(i) * model.components(b)(i)).sum
      assert(approx(d0, if (a == b) 1.0 else 0.0, 1e-8), s"<e$a,e$b>")
    }
    for (e <- model.components) {
      val best = e.indices.maxBy(i => (math.abs(e(i)), -i))
      assert(e(best) > 0, "canonical sign")
    }
    // Av = λv against the fitted covariance
    for (c <- 0 until 4) {
      val v = model.components(c)
      for (i <- 0 until 6) {
        val avi = (0 until 6).map(j => cov(i)(j) * v(j)).sum
        assert(approx(avi, model.eigenvalues(c) * v(i), 1e-8))
      }
    }
  }

  test("top component tracks the dominant variance axis of an elongated cloud") {
    import spark.implicits._
    val rng = new java.util.Random(3)
    // variance 100 along axis 2, ~1 elsewhere
    val df = Seq.tabulate(500)(i => (i.toLong, Seq(
      rng.nextGaussian(), rng.nextGaussian(),
      10.0 * rng.nextGaussian(), rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val model = Pca.fit(df, 1)
    val e = model.components(0)
    assert(math.abs(e(2)) > 0.99, e.mkString(","))
    assert(model.eigenvalues(0) > 50)
  }

  test("project is centered and exact; a planted twin projects identically and ranks first") {
    import spark.implicits._
    val rng = new java.util.Random(9)
    val base = Seq.tabulate(60)(i => (i.toLong, Seq.fill(8)(rng.nextGaussian())))
    // vec 999 is an exact twin of vec 5
    val data = base :+ (999L, base(5)._2)
    val df = data.toDF("vec_id", "embedding")
    val model = Pca.fit(df, 3)
    val proj = Pca.project(df, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(proj(5L) == proj(999L))
    // centered: projections sum to ~0 per component ONLY over the fitted
    // corpus mean — check against a direct driver-side computation instead
    val mean = model.mean
    val v0 = data.head._2.toArray
    for (c <- 0 until 3) {
      val expect = (0 until 8).map(i => (v0(i) - mean(i)) * model.components(c)(i)).sum
      assert(approx(proj(0L)(c), expect, 1e-9))
    }
    val top = Pca.pcaTopK(df.filter(col("vec_id") === 5), df, k = 1,
      nComponents = 3, precomputed = Some(model)).collect()
    assert(top.length == 1 && top(0).getLong(1) == 999L &&
      top(0).getDouble(2) == 1.0)
  }

  test("reconstructionError matches the naive local score and shrinks with rank") {
    import spark.implicits._
    val rng = new java.util.Random(21)
    val data = Seq.tabulate(120)(i => (i.toLong, Seq.fill(6)(rng.nextGaussian())))
    val df = data.toDF("vec_id", "embedding")
    val m3 = Pca.fit(df, 3)
    val err3 = Pca.reconstructionError(df, m3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // naive driver-side recompute of the same formula
    for ((id, v) <- data.take(10)) {
      val c = v.toArray.zip(m3.mean).map { case (x, mu) => x - mu }
      val cn = c.map(x => x * x).sum
      val ps = m3.components.map(e =>
        math.pow(c.zip(e).map { case (a, b) => a * b }.sum, 2)).sum
      assert(math.abs(err3(id) - (cn - ps)) < 1e-5, s"vec $id")
    }
    // residual is non-negative and non-increasing in rank
    val m6 = Pca.fit(df, 6)
    val err6 = Pca.reconstructionError(df, m6).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(err3.values.forall(_ >= 0.0))
    for (id <- err3.keys) assert(err6(id) <= err3(id) + 1e-6)
    // full-rank model reconstructs exactly: residual ~ 0
    assert(err6.values.forall(_ < 1e-3))
  }

  test("reconstructionError flags an off-manifold outlier") {
    import spark.implicits._
    val rng = new java.util.Random(4)
    // corpus lives in dims 0-1 (plus tiny noise); vec 999 points off-plane
    val base = Seq.tabulate(150)(i => (i.toLong, Seq(
      3.0 * rng.nextGaussian(), 2.0 * rng.nextGaussian(),
      0.01 * rng.nextGaussian(), 0.01 * rng.nextGaussian())))
    val data = base :+ (999L, Seq(0.0, 0.0, 5.0, 5.0))
    val df = data.toDF("vec_id", "embedding")
    val model = Pca.fit(df, 2)
    val err = Pca.reconstructionError(df, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inliers = base.map(b => err(b._1))
    assert(err(999L) > 10 * inliers.max,
      s"outlier ${err(999L)} vs max inlier ${inliers.max}")
  }

  test("persisted moments state: batch append equals the full-corpus statistics") {
    import spark.implicits._
    val rng = new java.util.Random(33)
    val data = Seq.tabulate(150)(i => (i.toLong, Seq.fill(5)(rng.nextGaussian())))
    val df = data.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_state_t").toString
    Pca.writeMomentsState(df.filter(col("vec_id") % 2 === 0), dir)
    Pca.appendMomentsState(spark, dir, df.filter(col("vec_id") % 2 === 1))
    val (d, buf) = Pca.readMomentsState(spark, dir)
    assert(d == 5)
    val (n, sums, scatter) = Pca.momentsOf(df, "embedding", 5)
    assert(buf(0) == n)
    for (i <- 0 until 5) assert(approx(buf(1 + i), sums(i), 1e-9))
    for (t <- scatter.indices) assert(approx(buf(1 + 5 + t), scatter(t), 1e-9))
    // the refit from merged state matches the direct fit
    val m1 = Pca.fitFromState(spark, dir, 3)
    val m2 = Pca.fit(df, 3)
    for (c <- 0 until 3; i <- 0 until 5)
      assert(approx(m1.components(c)(i), m2.components(c)(i), 1e-7))
  }

  test("incremental covariance query equals the direct covariance query") {
    def rows(q: String) = graft.SparkEntry.queries(q)(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val direct = rows("sim_pca_covariance")
    val inc = rows("sim_pca_covariance_incremental")
    assert(direct.keySet == inc.keySet)
    for ((k, v) <- direct)
      assert(math.abs(v - inc(k)) <= 2e-6, s"cov$k: $v vs ${inc(k)}")
  }

  test("sim_pca queries run bounded against sf0.001") {
    val covd = graft.SparkEntry.queries("sim_pca_covariance")(spark, sf0001)
    assert(covd.count() == 64L * 65 / 2)
    val top = graft.SparkEntry.queries("sim_topk_pca")(spark, sf0001)
    val rows = top.collect()
    assert(rows.length == 50) // 10 probes × k=5
    assert(rows.forall(_.getInt(3) <= 5))
  }
}
