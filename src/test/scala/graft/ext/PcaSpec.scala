package graft.ext

import graft.TestSpark
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
  private lazy val fit = Pca.fitTop(emb, dim = 64)

  test("the fitted direction is a unit vector and a near-fixed-point of C") {
    val v = fit.component
    val norm = math.sqrt(v.map(x => x * x).sum)
    // the 1e-12-grid decimal summation (oracle-parity discipline) leaves
    // an O(d * 1e-12 / term) relative wobble — unit up to ~1e-8
    assert(math.abs(norm - 1.0) < 1e-6)
    // Rebuild C from an independent local pass and check the Rayleigh
    // residual: after 8 iterations ||Cv - lambda v|| should be small
    // relative to lambda (synthetic embeddings have a clear top axis).
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val d = 64
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    def cdot(i: Int, j: Int) =
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    val cv = Array.tabulate(d)(i => (0 until d).map(j => cdot(i, j) * v(j)).sum)
    val lambda = v.zip(cv).map { case (a, b) => a * b }.sum
    val resid = math.sqrt(v.indices.map(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
    assert(lambda > 0.0)
    // the synthetic embeddings have a near-flat spectrum (no eigengap),
    // so power iteration converges slowly in DIRECTION — the residual is
    // a loose sanity bound; the sharp claims are Rayleigh dominance
    // (below) and monotonicity (next test)
    assert(resid < 0.2 * lambda, s"residual $resid vs lambda $lambda")
    // the Rayleigh quotient must dominate every coordinate axis (e_i has
    // Rayleigh C_ii)
    val maxDiag = (0 until d).map(i => cdot(i, i)).max
    assert(lambda >= maxDiag * 0.999, s"lambda $lambda vs max C_ii $maxDiag")
  }

  test("more iterations never decrease the Rayleigh quotient") {
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val d = 64
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    def rayleigh(v: Array[Double]): Double = {
      val centered = rows.map(r => r.indices.map(i => r(i) - mean(i)).toArray)
      val proj = centered.map(c => c.indices.map(i => c(i) * v(i)).sum)
      proj.map(p => p * p).sum / n
    }
    val l4 = rayleigh(Pca.fitTop(emb, dim = 64, iters = 4).component)
    val l16 = rayleigh(fit.component)
    assert(l16 >= l4 - 1e-9, s"lambda(16)=$l16 < lambda(4)=$l4")
  }

  test("pc1 captures at least as much variance as any coordinate axis") {
    val pcs = Pca.projectTop(emb, fit).collect().map(_.getDouble(1))
    val n = pcs.length
    val mu = pcs.sum / n
    val pcVar = pcs.map(x => (x - mu) * (x - mu)).sum / n
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val axisVars = (0 until 64).map { i =>
      val xs = rows.map(_(i)); val m = xs.sum / rows.length
      xs.map(x => (x - m) * (x - m)).sum / rows.length
    }
    assert(pcVar >= axisVars.max * 0.999,
      s"pc1 var $pcVar vs max axis var ${axisVars.max}")
  }

  test("deflated second component is near-orthogonal with a smaller eigenvalue") {
    val f2 = Pca.fitTopK(emb, dim = 64, k = 2)
    val v1 = f2.components(0); val v2 = f2.components(1)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    // orthogonality up to power-iteration convergence on a near-flat
    // spectrum (deflation annihilates v1 modulo the fixed-point residual)
    assert(math.abs(dot) < 0.05, s"|v1.v2| = ${math.abs(dot)}")
    // with a near-flat spectrum the eigenvalue ORDER is only approximate
    // at finite iteration count — strict ordering would demand a
    // convergence the spectrum can't give; near-equality is the claim
    assert(f2.lambdas(1) <= f2.lambdas(0) * 1.05,
      s"lambda order: ${f2.lambdas(0)} vs ${f2.lambdas(1)}")
    assert(f2.lambdas(1) > 0.0)
  }

  test("fitting is deterministic") {
    val fit2 = Pca.fitTop(emb, dim = 64)
    assert(fit.component.toSeq === fit2.component.toSeq)
    assert(fit.mean.toSeq === fit2.mean.toSeq)
  }
}
