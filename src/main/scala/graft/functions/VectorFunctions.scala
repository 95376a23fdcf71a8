package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, via Spark's
  * higher-order functions (north-star extension; SURVEY.md §2.10).
  *
  * HOFs (`zip_with`, `aggregate`) evaluate inside the JVM per row with no
  * shuffle and no UDF serialization boundary. Values are cast to double
  * before arithmetic so results match a double-precision oracle and don't
  * accumulate float error over 100 TB of vectors.
  *
  * If profiling shows the HOF interpreter dominating at bench scale, the
  * upgrade path is a fused codegen `Expression` for dot product — measure
  * first (SURVEY.md §7.3).
  */
object VectorFunctions {

  /** Element-wise cast to double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two equal-length numeric arrays (double accumulation,
    * sequential order — matches a scalar SQL loop bit-for-bit).
    */
  def dot(a: Column, b: Column): Column = DotProduct.dotProduct(a, b)

  /** Reference HOF formulation of [[dot]] — kept as the executable
    * specification the native expression is tested against (the
    * cosineHof pattern).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; 0.0 when either vector has zero norm.
    * Backed by the fused codegen [[CosineSimilarity]] expression — the HOF
    * form ([[cosineHof]]) measured 3+ s/query interpreted at sf0.1.
    */
  def cosine(a: Column, b: Column): Column = CosineSimilarity.cosineSim(a, b)

  /** Reference HOF formulation of [[cosine]] — kept as the executable
    * specification the native expression is tested against.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Unit-L2-normalized copy (doubles); zero vectors pass through
    * unchanged. On unit vectors `||a-b||² = 2·(1-cos)`, so L2 ranking is
    * exactly cosine ranking — the bridge PQ uses to serve cosine search
    * with L2 codebooks.
    */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    when(n === 0.0, toDouble(v)).otherwise(transform(toDouble(v), x => x / n))
  }

  /** Sign-random-projection bucket for LSH ANN: `nBits` deterministic
    * pseudo-random hyperplanes; bit i is the sign of the projection onto
    * plane i. Planes are derived from xxhash64(seed+bit, dim) —
    * deterministic across runs, no stored model. `seed` offsets the plane
    * family so independent hash tables (OR-amplification) can be built.
    */
  def srpBucket(v: Column, nBits: Int, seed: Int = 0): Column = {
    val d = toDouble(v)
    val bits = (0 until nBits).map { i =>
      // plane_i[j] = hash(seed+i, j) mapped to [-1, 1]
      val proj = aggregate(
        zip_with(d, transform(d, (_, j) => planeCoef(seed + i, j)), (x, c) => x * c),
        lit(0.0),
        (acc, x) => acc + x
      )
      when(proj >= 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Deterministic pseudo-random plane coefficient in [-1, 1] from
    * (planeId, dimIndex) — xxhash64 scaled. Public so tests can recompute.
    */
  def planeCoef(planeId: Int, dimIdx: Column): Column =
    (xxhash64(lit(planeId), dimIdx).cast("double") / lit(Long.MaxValue.toDouble))
}
