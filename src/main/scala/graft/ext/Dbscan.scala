package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN) over an embedding corpus — the
  * density complement of the centroid family (Similarity.lloydKMeans) and
  * the near-dup graph family (Dedup.semanticGridPairs → CC): clusters are
  * ε-connected cores, arbitrary-shaped, with explicit noise.
  *
  * Scale design: the ε-neighborhood pair generation NEVER all-pairs the
  * corpus — candidates come from a 2-D Rademacher projection grid
  * (the SemDeDup cell trick). Each projection coordinate is
  * `dot(v, s)/√2` with s ∈ {±1}^d, so it is Lipschitz with constant
  * L = ‖s‖₂/√2 = √d/√2 in L2; any pair within ε therefore lands within
  * ⌈L·ε / cellWidth⌉ cells, and with cellWidth ≥ L·ε the 3×3 neighbor
  * probe is EXACT (no candidate below the radius is ever missed — the
  * DuckDB oracle recomputes neighborhoods by brute force, so a pruning
  * bug is a correctness failure, not a silent recall loss). Neighbor
  * counting, the core test, core-core connected components
  * ([[Dedup.connectedComponents]]) and border attachment are all
  * equi-join/groupBy shaped.
  *
  * Determinism: distances are floor-rounded to 6 dp before the ε
  * comparison (boundary-stable across engines), cluster ids are
  * component-minimum ids, border points attach to the MIN cluster id
  * among their core neighbors.
  */
object Dbscan {

  /** Planted-structure id spacing shared by SparkEntry's x_dbscan query
    * and DbscanSpec, so the query and its test cannot drift (round-10's
    * red test was exactly such a drift). Planted copies live at
    * `base + k·PlantedIdSpacing`; 10M spacing is collision-free against
    * any corpus whose real vec_ids stay under 10M (the sf1 tiled corpus
    * reaches 19,999). The 4th plant (every-20th satellite) is the border
    * set: `SatellitePlantOffset = 4 · PlantedIdSpacing`.
    */
  val PlantedIdSpacing: Long = 10000000L
  val SatellitePlantOffset: Long = 4L * PlantedIdSpacing

  /** All unordered pairs (id_a < id_b) with round6(‖a−b‖₂) <= eps, via the
    * projection-grid candidate join. `cellWidth` must be >= √d/√2 · eps
    * for exact completeness (see object doc).
    *
    * `nProj`: number of projection rows in `signs2`. The GRID stays 2-D
    * (rows 1–2 — so the cell structure, and any caller passing a 2-row
    * matrix, is unchanged); rows 3..nProj are used ONLY as additional
    * Lipschitz band filters on the candidates. Every projection obeys the
    * same |Δy_j| <= L·eps bound for a true ε-pair, so each extra row is a
    * pure superset filter: the final exact-distance test — and therefore
    * the result — is identical, but far fewer candidates reach the
    * vector fetch + distance stage (measured ~2x on x_dbscan at sf0.1
    * with 4 extra rows; the win grows with corpus density).
    */
  def epsPairs(embs: DataFrame, idCol: String, vecCol: String,
      signs2: Array[Double], cellWidth: Double, eps: Double,
      nProj: Int = 2): DataFrame = {
    require(nProj >= 2 && signs2.length % nProj == 0,
      s"signs2 length ${signs2.length} must be a multiple of nProj=$nProj (>= 2)")
    import graft.functions.{VectorFunctions => VF}
    // per-row squared norms computed ONCE on the corpus scan (not per
    // candidate pair — measured 3x on the pair stage); the pair distance
    // keeps the three-dot algebra DuckDB's list_dot_product replays,
    // value-identical because the norm fold is the same op sequence
    val proj = graft.sources.Tables.spread(embs).select(
      col(idCol).as("id"), col(vecCol).as("v"),
      VF.dot(col(vecCol), col(vecCol)).as("sq"),
      graft.functions.RpProject.rpProject(col(vecCol), signs2, nProj).as("y"))
      .withColumn("cx", floor(element_at(col("y"), 1) / cellWidth))
      .withColumn("cy", floor(element_at(col("y"), 2) / cellWidth))
    // SLIM candidate join: only ids + a few scalars ride the 9x cell-grid
    // explosion (the 64-double vectors would cost ~1 KB per candidate row
    // — measured as the stage's dominant cost); vectors are fetched by id
    // AFTER the Lipschitz band filter. The band: any pair within eps has
    // |Δy_j| <= L·eps, L = ‖s‖₂/√2 — a pure superset filter (the 1.0001
    // margin absorbs few-ulp projection rounding). The id fetch joins
    // hash on the corpus (AQE broadcasts when the corpus side fits).
    val dim = signs2.length / nProj
    val band = math.sqrt(dim.toDouble) / math.sqrt(2.0) * eps * 1.0001
    val slim = proj.select(col("id"), col("sq"), col("y"), col("cx"), col("cy"))
    val home = slim.select(col("id").as("id_b"), col("sq").as("sq_b"),
      col("y").as("yb"), col("cx"), col("cy"))
    val probes = slim
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("id_a"), col("sq").as("sq_a"),
        col("y").as("ya"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val bandPred = (1 to nProj)
      .map(j => abs(element_at(col("ya"), j) - element_at(col("yb"), j)) <= band)
      .reduce(_ && _)
    val cand = probes.join(home, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .filter(bandPred)
      .select(col("id_a"), col("id_b"), col("sq_a"), col("sq_b"))
    val vmap = proj.select(col("id"), col("v"))
    cand
      .join(vmap.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vmap.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("d",
        floor(sqrt(col("sq_a") - lit(2.0) * VF.dot(col("v_a"), col("v_b")) + col("sq_b"))
          * lit(1e6) + lit(0.5)) / lit(1e6))
      .filter(col("d") <= eps)
      .select("id_a", "id_b", "d")
  }

  /** Full DBSCAN labeling: (id, role ∈ core|border|noise, cluster_id —
    * null for noise). Core iff >= minPts neighbors within eps (self
    * EXCLUDED); clusters are connected components of the core-core
    * ε-graph labeled by component minimum; border = non-core with a core
    * neighbor, attached to the min core-neighbor cluster.
    */
  def dbscan(embs: DataFrame, idCol: String, vecCol: String,
      signs2: Array[Double], cellWidth: Double, eps: Double, minPts: Int,
      nProj: Int = 2): DataFrame = {
    val pairs = epsPairs(embs, idCol, vecCol, signs2, cellWidth, eps, nProj)
      .localCheckpoint() // read by counts, the core-core filter, and borders
    val sym = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
    val core = sym.groupBy("u").agg(count(lit(1)).as("n_nbrs"))
      .filter(col("n_nbrs") >= minPts).select(col("u").as("id"))
    val corePairs = pairs
      .join(core.select(col("id").as("id_a")), "id_a")
      .join(core.select(col("id").as("id_b")), "id_b")
    val cc = Dedup.connectedComponents(corePairs, "id_a", "id_b")
    val coreClusters = core.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    val border = sym
      .join(coreClusters.select(col("id").as("v"), col("cluster_id").as("cid")), "v")
      .join(core.select(col("id").as("u")), Seq("u"), "left_anti")
      .groupBy("u").agg(min(col("cid")).as("cluster_id"))
    val roles = coreClusters.select(col("id"), lit("core").as("role"), col("cluster_id"))
      .unionAll(border.select(col("u").as("id"), lit("border").as("role"), col("cluster_id")))
    embs.select(col(idCol).as("id")).join(roles, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("role"), lit("noise")).as("role"), col("cluster_id"))
  }
}
