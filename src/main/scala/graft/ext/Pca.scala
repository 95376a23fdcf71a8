package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact distributed PCA (top principal component) by power iteration.
  *
  * The corpus contributes ONLY bounded sufficient statistics — the d×d
  * second-moment matrix and the d-vector of per-dimension sums, computed
  * in one exploded-pair aggregation with exact DECIMAL(18,8) arithmetic
  * (the x_embed_standardize discipline: float embeddings cast to decimal,
  * products and sums exact, order-independent). At 100 TB that is one
  * map-side-combined shuffle into d² = 256 groups; the iteration itself
  * runs on the driver over the 16×16 covariance — the same bounded-driver
  * -state shape as the PQ codebooks and IVF centroids.
  *
  * Oracle-exactness of the ITERATION (which DuckDB replays as unrolled
  * CTE stages): every mat-vec partial product is floor-rounded to the
  * 1e-12 grid and summed as DECIMAL(28,12) (the x_pagerank discipline),
  * so the only floating-point ops are elementwise on bitwise-identical
  * inputs — norms, divisions, sqrt — which every IEEE engine computes
  * identically. Sign is whatever the deterministic iteration converges
  * to from the uniform start vector: identical in any mirroring engine,
  * so no canonical-sign fixup is needed for parity.
  */
object Pca {

  final case class FittedPc(mean: Array[Double], component: Array[Double], n: Long)

  /** Top-k fit: components in decreasing-eigenvalue order (Hotelling
    * deflation C ← C − λ v vᵀ between components; every deflation factor
    * is an elementwise double op on bitwise-identical inputs, so the
    * mirror holds; λ itself is one decimal-grid mat-vec + dot).
    */
  final case class FittedPca(
      mean: Array[Double], components: Array[Array[Double]],
      lambdas: Array[Double], n: Long)

  private def dec12(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(
      math.floor(x * 1e12 + 0.5) / 1e12))
      .setScale(12, java.math.RoundingMode.HALF_UP)

  /** Exploded (vec_id, dim, x, xdec) view of an embedding table. */
  private def dims(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .withColumn("x", col("xf").cast("double"))
      .withColumn("xdec", col("x").cast("decimal(18,8)"))

  /** d(d+1)/2 exact-decimal second moments (upper triangle — S is
    * symmetric, the mirror is filled on the driver). The pair explode is
    * mapper-side; partial decimal aggregation means the exchange carries
    * partitions × groups PARTIALS, not corpus × d² rows — pinned as a
    * measured invariant in ShuffleAuditSpec.
    */
  private[graft] def secondMoments(embeddings: DataFrame): DataFrame = {
    val d = dims(embeddings)
    val a = d.select(col("vec_id"), col("dim").as("i"), col("xdec").as("xa"))
    val b = d.select(col("vec_id"), col("dim").as("j"), col("xdec").as("xb"))
    a.join(b, "vec_id")
      .filter(col("i") <= col("j"))
      .groupBy("i", "j").agg(sum(col("xa") * col("xb")).as("s"))
  }

  /** One decimal-grid power-iteration pass on a (possibly deflated)
    * covariance; returns the unit component. Mirrors the oracle's
    * unrolled stages exactly (see dec12).
    */
  private def powerIterate(cov: Array[Array[Double]], dim: Int, iters: Int): Array[Double] = {
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    while (it < iters) {
      val raw = matvecDec(cov, v, dim)
      var nacc = java.math.BigDecimal.ZERO
      var k = 0
      while (k < dim) { nacc = nacc.add(dec12(raw(k) * raw(k))); k += 1 }
      val nrm = math.sqrt(nacc.doubleValue())
      v = raw.map(_ / nrm)
      it += 1
    }
    v
  }

  private def matvecDec(cov: Array[Array[Double]], v: Array[Double], dim: Int): Array[Double] = {
    val raw = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      var acc = java.math.BigDecimal.ZERO
      var j = 0
      while (j < dim) { acc = acc.add(dec12(cov(i)(j) * v(j))); j += 1 }
      raw(i) = acc.doubleValue()
      i += 1
    }
    raw
  }

  /** Rayleigh quotient on the decimal grid: λ = Σ round12(v_i (Cv)_i). */
  private def rayleighDec(cov: Array[Array[Double]], v: Array[Double], dim: Int): Double = {
    val raw = matvecDec(cov, v, dim)
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < dim) { acc = acc.add(dec12(v(i) * raw(i))); i += 1 }
    acc.doubleValue()
  }

  /** Fit the top-k principal components: one stats pass + driver
    * iterations with Hotelling deflation.
    */
  def fitTopK(embeddings: DataFrame, dim: Int, iters: Int = 16, k: Int = 2): FittedPca = {
    val (cov, mean, n) = covariance(embeddings, dim)
    val comps = new Array[Array[Double]](k)
    val lambdas = new Array[Double](k)
    var c = 0
    while (c < k) {
      val v = powerIterate(cov, dim, iters)
      val l = rayleighDec(cov, v, dim)
      comps(c) = v
      lambdas(c) = l
      // deflate: C ← C − λ v vᵀ (elementwise, mirrored as
      // c.v - l * wa.x * wb.x in the oracle)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { cov(i)(j) = cov(i)(j) - l * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    FittedPca(mean, comps, lambdas, n)
  }

  /** Exact covariance + mean from the decimal stats pass. */
  private def covariance(embeddings: DataFrame, dim: Int): (Array[Array[Double]], Array[Double], Long) = {
    val pairRows = secondMoments(embeddings).collect()
    val meanRows = dims(embeddings).groupBy("dim").agg(
      count(lit(1)).as("n"),
      sum(col("xdec")).cast("double").as("s1"))
      .collect()
    val n = meanRows.head.getLong(1)
    val s1 = new Array[Double](dim)
    meanRows.foreach(r => s1(r.getInt(0)) = r.getDouble(2))
    val cov = Array.ofDim[Double](dim, dim)
    pairRows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val sij = r.getDecimal(2).doubleValue()
      val c = (sij - s1(i) * s1(j) / n) / n
      cov(i)(j) = c
      cov(j)(i) = c
    }
    (cov, s1.map(_ / n), n)
  }

  /** Fit the top principal component: fitTopK with k = 1. */
  def fitTop(embeddings: DataFrame, dim: Int = 16, iters: Int = 16): FittedPc = {
    val f = fitTopK(embeddings, dim, iters, k = 1)
    FittedPc(f.mean, f.components(0), f.n)
  }

  /** Project every vector onto the fitted component: pc1 = v·(x − mean),
    * decimal-summed per vector (order-independent), floor-round-6.
    */
  def projectTop(embeddings: DataFrame, fit: FittedPc): DataFrame =
    projectTopK(embeddings, FittedPca(fit.mean, Array(fit.component), Array(0.0), fit.n))
      .select(col("vec_id"), col("pc1"))

  /** Project every vector onto all fitted components: one broadcast join
    * on dim, one per-vector decimal-summed rollup emitting pc1..pck.
    */
  def projectTopK(embeddings: DataFrame, fit: FittedPca): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val comp = fit.components.zipWithIndex.flatMap { case (v, c) =>
      v.zipWithIndex.map { case (vi, i) => (i, c, vi, fit.mean(i)) }
    }.toSeq.toDF("dim", "c", "vi", "mi")
    val terms = dims(embeddings)
      .join(broadcast(comp), "dim")
      .withColumn("term",
        (floor(col("vi") * (col("x") - col("mi")) * lit(1e12) + lit(0.5)) / lit(1e12))
          .cast("decimal(28,12)"))
      .groupBy("vec_id", "c")
      .agg(sum(col("term")).cast("double").as("pc"))
      .withColumn("pcr", floor(col("pc") * lit(1e6) + lit(0.5)) / lit(1e6))
    val cols = fit.components.indices.map(c =>
      max(when(col("c") === c, col("pcr"))).as(s"pc${c + 1}"))
    terms.groupBy("vec_id").agg(cols.head, cols.tail: _*)
  }
}
