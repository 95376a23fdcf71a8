package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring (PageRank) for crawl-corpus curation
  * (north-star extension; SURVEY.md §2.10): a page/domain linked by many
  * well-linked pages is likelier to be quality training text, and the rank
  * is a standard input to crawl-frontier and quality-mixture policies.
  *
  * Scale design: the edge table — the corpus-scale input — is shuffled
  * ONCE (hash-repartitioned by src and cached); every iteration after that
  * moves only the rank vector (one row per node) to the edges' existing
  * partitioning, aggregates contributions map-side-combined by dst, and
  * broadcasts the dangling mass as a 1-row aggregate. Per iteration:
  * one small-side shuffle + one aggregation shuffle, never a re-shuffle of
  * the edges. Each iteration is eagerly localCheckpoint'ed so the logical
  * plan stays one-iteration deep at any iteration count (the CC pattern,
  * [[Dedup.connectedComponents]]).
  *
  * Cross-engine determinism (the repo's decimal-sum discipline): per-edge
  * contributions are rounded to 12 decimals and summed as DECIMAL(28,12)
  * (order-independent), the dangling mass is a DECIMAL sum, and each new
  * rank is rounded to 12 decimals — so results are partitioning-independent
  * and bit-equal to the DuckDB oracle running the same algebra.
  */
object LinkRank {

  /** `iterations` rounds of damped PageRank over `edges`; every node in
    * `nodes` is ranked (in-edge-less nodes get the base rank). Dangling
    * nodes (no out-edges) redistribute their mass uniformly each round —
    * total mass stays 1 up to the per-node rounding. Multi-edges count
    * once each in both out-degree and contribution.
    * Output: node, pr (rounded 12).
    */
  def pageRank(
      nodes: DataFrame, nodeCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // No Tables.spread here: the per-row work of a rank iteration is
    // trivial, and spread's repartition(defaultParallelism) pins the node
    // vector — and through it EVERY iteration's stages — at core-count
    // partitions regardless of data size (measured: 32-task stages, each
    // task ~hundreds of ms of fixed scheduling/codegen cost, dominating
    // the whole query at bench scale). repartition(col) instead lets AQE
    // size the layout from the data (guide §2: scale-adaptive
    // partitioning); at production scale the hash shuffle is required
    // anyway, so nothing is lost.
    val nsRaw = nodes.select(col(nodeCol).as("node")).repartition(col("node")).localCheckpoint()
    val n = nsRaw.count() // one count job over the cached node column (bounded: one scalar)
    val eRaw = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).localCheckpoint() // the ONLY corpus-scale shuffle, paid once
    val deg = eRaw.groupBy("src").agg(count(lit(1)).as("deg"))
    // deg pre-joined into the edge table ONCE (co-partitioned, zero extra
    // corpus shuffle) so each iteration's contribution pass is a single
    // join + aggregation instead of two joins (guide §2.4: operations
    // keyed the same way share one exchange — here, one materialization).
    val e = eRaw.join(deg, "src").localCheckpoint()
    // dangling membership is a per-NODE constant: compute it once and
    // carry it as a flag in the rank vector, so the per-iteration dangling
    // mass is a narrow filter+agg over pr instead of an anti-join against
    // the degree table every round (measured: ~2 jobs/iteration saved).
    val ns = nsRaw
      .join(deg.select(col("src").as("node"), lit(true).as("_has_out")), Seq("node"), "left")
      .select(col("node"), col("_has_out").isNull.as("dang"))
      .localCheckpoint()

    // (1 - d) computed, not precomputed as a literal: the oracle runs the
    // same subtraction, so both engines get the identical IEEE double
    val base = (lit(1.0) - lit(damping)) / lit(n.toDouble)

    var pr = ns.withColumn("pr", round(lit(1.0) / lit(n.toDouble), 12))
      .select("node", "pr", "dang")
    for (_ <- 1 to iterations) {
      val dm = pr.filter(col("dang"))
        .agg(coalesce(sum(col("pr").cast("decimal(28,12)")),
          lit(0).cast("decimal(28,12)")).as("dm"))
      val contrib = e.join(pr, e("src") === pr("node")) // rank vector shuffles TO the edges
        .select(col("dst").as("node"),
          round(col("pr") / col("deg"), 12).cast("decimal(28,12)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = ns
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dm))
        .withColumn("pr",
          round(base + lit(damping) *
            (coalesce(col("s").cast("double"), lit(0.0)) +
              col("dm").cast("double") / lit(n.toDouble)), 12))
        .select("node", "pr", "dang")
        .localCheckpoint(eager = true)
    }
    pr.select("node", "pr")
  }

  /** Personalized PageRank — random walk with restart to a SEED set (the
    * crawl-curation form: "rank pages by proximity to a trusted seed
    * list", TrustRank-style). Same loop shape, lineage discipline, and
    * decimal-sum determinism as [[pageRank]]; the only changes are the
    * restart vector r (1/|seeds| on seeds, 0 elsewhere, riding the node
    * table as a column) and the dangling mass redistributing to the
    * RESTART distribution instead of uniformly:
    *   pr'(i) = round(r(i)·((1−d) + d·dm) + d·Σ_in pr/deg, 12).
    * Per iteration: one rank-vector shuffle to the edges' partitioning +
    * one aggregation shuffle — edges never re-shuffle.
    * Output: node, pr (rounded 12).
    */
  def personalizedPageRank(
      nodes: DataFrame, nodeCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val sd = seeds.select(col(seedCol).as("node")).distinct().localCheckpoint()
    val nSeeds = sd.count()
    require(nSeeds >= 1, "seed set must be non-empty")
    // Same de-spread + pre-joined-degree + carried-dangling-flag shape as
    // [[pageRank]] (see the comment there): fewer jobs per iteration, and
    // the state layout is sized by AQE from the data, not pinned at core
    // count.
    val eRaw = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).localCheckpoint()
    val deg = eRaw.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = eRaw.join(deg, "src").localCheckpoint()
    // restart weight rides the node table: 1/|S| on seeds, 0 elsewhere
    val ns = nodes.select(col(nodeCol).as("node"))
      .join(sd.withColumn("__seed", lit(1)), Seq("node"), "left")
      .join(deg.select(col("src").as("node"), lit(true).as("_has_out")), Seq("node"), "left")
      .withColumn("r",
        when(col("__seed").isNotNull, lit(1.0) / lit(nSeeds.toDouble)).otherwise(lit(0.0)))
      .select(col("node"), col("r"), col("_has_out").isNull.as("dang"))
      .repartition(col("node")).localCheckpoint()
    var pr = ns.withColumn("pr", round(col("r"), 12)).select("node", "pr", "dang")
    for (_ <- 1 to iterations) {
      val dm = pr.filter(col("dang"))
        .agg(coalesce(sum(col("pr").cast("decimal(28,12)")),
          lit(0).cast("decimal(28,12)")).as("dm"))
      val contrib = e.join(pr, e("src") === pr("node"))
        .select(col("dst").as("node"),
          round(col("pr") / col("deg"), 12).cast("decimal(28,12)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      pr = ns
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dm))
        .withColumn("pr",
          round(col("r") * ((lit(1.0) - lit(damping)) + lit(damping) * col("dm").cast("double"))
            + lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 12))
        .select("node", "pr", "dang")
        .localCheckpoint(eager = true)
    }
    pr.select("node", "pr")
  }

  /** Per-node triangle participation counts over an undirected view of
    * `edges` — the link-graph cohesion metric behind spam-farm and
    * boilerplate-ring detection in crawl curation (a page whose neighbors
    * all link each other is a template cluster, not organic content).
    *
    * Scale design — degree-ordered orientation (the node-iterator
    * algorithm): every undirected edge {u,v} is stored ONCE, directed from
    * the lower to the higher (degree, id) key. Wedge enumeration then
    * self-joins the oriented edges on their SOURCE, so each node generates
    * only C(out-deg, 2) candidate wedges and out-degrees are bounded by
    * O(sqrt(|E|)) on any graph (arboricity bound) — the high-degree hub
    * that makes the naive all-neighbor-pairs join quadratic never orients
    * outward. Each triangle is found exactly once (its three edges form
    * one oriented path a→b, a→c, b→c with key(a)<key(b)<key(c)). Three
    * equi-join shuffles total, all on node keys; nothing is ever
    * per-pair-of-nodes.
    *
    * Output: node, n_triangles (nodes in ≥1 triangle), integer-exact.
    */
  /** HITS hubs & authorities (Kleinberg 1999), L1-normalized (sum-to-1 —
    * keeps every step inside the decimal-sum discipline; L2 would put a
    * sqrt inside the iteration). Per iteration: authority = in-sum of
    * hub scores, hub = out-sum of authority scores, each round-12 and
    * renormalized by the exact decimal total. Edges are hashed once and
    * cached; per-iteration traffic is the two score vectors — the
    * pageRank plan shape. Mirrored by unrolled CTE stages in the oracle.
    */
  def hits(
      nodes: DataFrame, nodeCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1)
    // de-spread (see pageRank): rank iterations do trivial per-row work;
    // core-count partitions on the score vectors only multiply fixed
    // per-task cost at bench scale and add an extra shuffle at any scale
    val ns = nodes.select(col(nodeCol).as("node")).localCheckpoint()
    val n = ns.count()
    // BOTH edge orientations are materialized once: the authority update
    // joins on src, the hub update on dst — with a single src-hashed copy
    // the hub join would re-shuffle the whole edge table every iteration
    // (caught by ShuffleAuditSpec's edge-multiplicity invariant). Two
    // one-time corpus-scale shuffles; after that only score vectors move.
    val eSrc = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).localCheckpoint()
    val eDst = eSrc.repartition(col("dst")).localCheckpoint()
    // One normalize = round-12 of raw/total. The total rides a broadcast
    // subquery INSIDE the consuming plan (no standalone scalar job), so a
    // full HITS iteration — authority normalize fused lazily into the hub
    // update — materializes ONCE: only the hub vector is
    // localCheckpoint'ed to cut lineage, and exchange reuse lets the
    // raw-score shuffle compute a single time. The loop runs on SPARSE
    // score vectors (a zero-score node contributes nothing to any in/out
    // sum or total, so dropping it is arithmetically identical to
    // carrying its 0.0 — the dense completion happens once, at the end),
    // which removes two node-table joins per iteration. Round-12 per
    // normalize and decimal raw sums are unchanged, so the unrolled-CTE
    // oracle still matches bit-for-bit.
    def normalize(raw: DataFrame): DataFrame = {
      val tot = raw.agg(sum(col("raw")).as("t"))
      raw.crossJoin(broadcast(tot))
        .select(col("node"),
          round(col("raw").cast("double") / col("t").cast("double"), 12).as("s"))
    }
    var h = ns.select(col("node"), round(lit(1.0) / lit(n.toDouble), 12).as("s"))
      .localCheckpoint()
    var a: DataFrame = null
    var i = 0
    while (i < iterations) {
      a = normalize(eSrc
        .join(h.select(col("node").as("src"), col("s").as("hs")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("hs").cast("decimal(28,12)")).as("raw")))
      h = normalize(eDst
        .join(a.select(col("node").as("dst"), col("s").as("asc")), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("asc").cast("decimal(28,12)")).as("raw")))
        .localCheckpoint() // the ONE lineage cut per iteration
      i += 1
    }
    // dense completion, once: every node appears with 0.0 where it never
    // earned hub/authority mass — the value the dense loop would carry
    ns.join(h.select(col("node"), col("s").as("hub")), Seq("node"), "left")
      .join(a.localCheckpoint().select(col("node"), col("s").as("authority")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("authority"), lit(0.0)).as("authority"))
  }

  /** Synchronous label propagation (Raghavan 2007) for community
    * detection: every node adopts its neighbors' modal label each round
    * (ties → smallest label — fully deterministic, so a fixed round
    * budget is well-defined and the oracle can replay it as unrolled
    * stages). One neighbor-join + one count + one per-node argmax per
    * round over the symmetrized edge set; lineage cut per round.
    * Returns (node, label) after `rounds` rounds.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String, rounds: Int): DataFrame = {
    val und = edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("u"), greatest(col("s"), col("d")).as("v"))
      .distinct()
    val sym = und.select(col("u"), col("v"))
      .unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    import org.apache.spark.sql.expressions.Window
    var lab = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lab")).localCheckpoint()
    var r = 0
    while (r < rounds) {
      val cnt = sym.join(lab.select(col("node").as("v"), col("lab")), "v")
        .groupBy(col("u"), col("lab")).agg(count(lit(1)).as("cnt"))
      lab = cnt.withColumn("rk", row_number().over(
          Window.partitionBy("u").orderBy(col("cnt").desc, col("lab"))))
        .filter(col("rk") === 1)
        .select(col("u").as("node"), col("lab"))
        .localCheckpoint()
      r += 1
    }
    lab
  }

  /** k-core decomposition by synchronized peeling: drop every node whose
    * degree within the surviving subgraph is < k, rerun on the survivors,
    * `rounds` times. Each round is one join + one count over the live
    * edge set (lineage cut per round with localCheckpoint — the pageRank
    * discipline); the peel is SYNCHRONOUS, so an engine replaying the
    * same rounds (the oracle's unrolled CTEs) sees identical sets at
    * every stage. Returns (node, core_deg) for nodes alive after the
    * last round, where core_deg is the node's degree measured in the
    * subgraph entering the FINAL peel (the quantity the oracle's last
    * unrolled stage computes). At convergence — the alive set stops
    * changing — that equals the degree inside the surviving subgraph;
    * short of convergence it may still count edges to just-peeled
    * neighbors. On this corpus 8 rounds converge (pinned in
    * LinkRankSpec).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int, rounds: Int): DataFrame = {
    val und = edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("u"), greatest(col("s"), col("d")).as("v"))
      .distinct()
    // symmetrize once: deg(u) = #live neighbors over both directions
    val sym = und.select(col("u"), col("v"))
      .unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var alive = sym.select(col("u").as("node")).distinct().localCheckpoint()
    var r = 0
    var lastDeg: DataFrame = null
    while (r < rounds) {
      val deg = sym
        .join(alive.select(col("node").as("u")), "u")
        .join(alive.select(col("node").as("v")), "v")
        .groupBy(col("u").as("node")).agg(count(lit(1)).as("core_deg"))
      lastDeg = deg.localCheckpoint()
      alive = lastDeg.filter(col("core_deg") >= k).select("node").localCheckpoint()
      r += 1
    }
    lastDeg.filter(col("core_deg") >= k)
  }

  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("u"), greatest(col("s"), col("d")).as("v"))
      .distinct()
      .localCheckpoint() // degree pass + orientation both read it
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // total-order key: a (deg, node) STRUCT compared lexicographically —
    // overflow-proof for any node id / degree (a packed deg*2^32+node
    // long would silently collide once ids reach 2^32 or degrees 2^31)
    val ku = struct(col("du").as("d"), col("u").as("n"))
    val kv = struct(col("dv").as("d"), col("v").as("n"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(ku < kv, col("u")).otherwise(col("v")).as("a"),
        when(ku < kv, col("v")).otherwise(col("u")).as("b"),
        when(ku < kv, kv).otherwise(ku).as("kb"))
      .localCheckpoint() // read three times (two wedge sides + closing-edge probe)
    val wedges = oriented.select(col("a"), col("b").as("w_b"), col("kb").as("kb1"))
      .join(oriented.select(col("a"), col("b").as("w_c"), col("kb").as("kb2")), "a")
      .filter(col("kb1") < col("kb2"))
      .select(col("a"), col("w_b").as("b"), col("w_c").as("c"))
    val tri = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Multi-source BFS: minimum hop distance from any node of `seeds`,
    * explored for `maxDepth` rounds. Classic frontier expansion — each
    * round joins the CURRENT frontier (not the visited set) to the edge
    * table, anti-joins the already-visited set, and cuts lineage
    * (localCheckpoint — the pageRank discipline), so per-round traffic
    * is frontier×fanout, the visited set is touched only by the
    * hash anti-join, and the first round a node is reached IS its
    * minimum distance (deterministic regardless of partitioning).
    * Returns (node, dist) for every node reached within `maxDepth`.
    */
  def bfsDistances(seeds: DataFrame, seedCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxDepth: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).localCheckpoint()
    var frontier = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var visited = frontier
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = frontier.select(col("node").as("src"))
        .join(e, "src").select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(depth)).localCheckpoint()
      visited = visited.unionAll(next).localCheckpoint()
      frontier = next
    }
    visited
  }

  /** Cycle analysis of a FUNCTIONAL graph (out-degree exactly 1 — ID
    * remapping chains, symlink/redirect graphs, successor hashing) by
    * POINTER DOUBLING: ⌈log₂ N⌉ rounds of p ← p∘p with a running
    * path-minimum, instead of N sequential hops. Round k holds, per
    * vertex, f^(2^k)(v) and min{f^i(v) : i < 2^k}; once 2^k ≥ N the
    * pointer sits on v's terminal cycle and the minimum is stable, so
    * cycle_id(v) = pathmin(p(v)) is the cycle's least vertex, and the
    * cyclic vertices are exactly the image of f^(2^k). Each round is ONE
    * self-equi-join of N rows (O(N log N) total traffic — the
    * list-ranking bound); lineage cut per round like pageRank. Input
    * `succ0`: one row (v, p) per vertex with p = f(v). Output: one row
    * per cycle — cycle_id, cycle_len, n_basin (vertices draining in).
    */
  def functionalCycles(succ0: DataFrame): DataFrame = {
    val n = succ0.count() // bounded scalar (vertex count — the pageRank pattern)
    val rounds = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1)))
    var cur = succ0.select(col("v"), col("p"), col("v").as("mn")).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val b = cur.select(col("v").as("bv"), col("p").as("bp"), col("mn").as("bmn"))
      cur = cur.join(b, cur("p") === col("bv"))
        .select(cur("v").as("v"), col("bp").as("p"), least(cur("mn"), col("bmn")).as("mn"))
        .localCheckpoint(true)
    }
    val b2 = cur.select(col("v").as("bv"), col("mn").as("bmn"))
    val cyc = cur.join(b2, cur("p") === col("bv"))
      .select(cur("v").as("v"), col("bmn").as("cycle_id"))
    val cyclic = cur.select(col("p").as("cv")).distinct()
    val lens = cyc.join(cyclic, cyc("v") === col("cv"), "left_semi")
      .groupBy("cycle_id").agg(count(lit(1)).as("cycle_len"))
    val basin = cyc.groupBy("cycle_id").agg(count(lit(1)).as("n_basin"))
    lens.join(basin, "cycle_id").orderBy("cycle_id")
  }
}
