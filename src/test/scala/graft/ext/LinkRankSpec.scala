package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LinkRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: two-node cycle plus dangling node matches the hand-run recurrence") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst") // 3 is dangling
    val out = LinkRank.pageRank(nodes, "id", edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // mirror of the engine arithmetic: round-12 contributions, dangling
    // mass redistributed uniformly, round-12 new ranks
    def rd(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = 3.0; val d = 0.85; val base = (1.0 - d) / n
    var pr = Map(1L -> rd(1.0 / n), 2L -> rd(1.0 / n), 3L -> rd(1.0 / n))
    for (_ <- 1 to 2) {
      val dm = pr(3L)
      def nxt(inflow: Double) = rd(base + d * (inflow + dm / n))
      pr = Map(1L -> nxt(rd(pr(2L) / 1)), 2L -> nxt(rd(pr(1L) / 1)), 3L -> nxt(0.0))
    }
    assert(out === pr)
    // total mass conserved up to per-node rounding; linked nodes outrank dangling
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(out(1L) > out(3L))
  }

  test("personalizedPageRank: all-nodes seed set degenerates to exactly pageRank; unreachable non-seed gets 0") {
    // with r = 1/n everywhere the restart recurrence
    //   r·((1−d) + d·dm) + d·contrib  ≡  (1−d)/n + d·(contrib + dm/n)
    // is term-for-term the uniform recurrence, so the two must agree to
    // the rounded-12 bit
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst") // 3, 4 dangling
    val uni = LinkRank.pageRank(nodes, "id", edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ppr = LinkRank.personalizedPageRank(nodes, "id", edges, "src", "dst",
        nodes, "id", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr === uni)
    // seed localization: restart only to node 1 — node 4 (no in-edges,
    // not a seed) holds exactly zero mass at every iteration
    val seeded = LinkRank.personalizedPageRank(nodes, "id", edges, "src", "dst",
        Seq(1L).toDF("id"), "id", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(seeded(4L) === 0.0)
    // total mass conserved (up to per-node rounding) and confined to the
    // seed's reachable component — per-node comparisons at a fixed
    // iteration are oscillation-prone on a 2-cycle, so the invariant is
    // the component-level mass, not a rank order
    assert(math.abs(seeded.values.sum - 1.0) < 1e-9)
    assert(seeded(1L) + seeded(2L) + seeded(3L) > 0.999)
  }

  test("pageRank: multi-edges count in both degree and contribution; in-edge-less node gets base") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    // 1 has out-degree 3 (two edges to 2, one to 3); nothing points at 1
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val out = LinkRank.pageRank(nodes, "id", edges, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def rd(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p0 = rd(1.0 / 3); val base = (1.0 - 0.85) / 3
    // no dangling nodes here; node 1 receives nothing
    assert(out(1L) === rd(base))
    // node 2: two contributions of p0/3 from 1, one of p0/1 from 3
    val exp2 = rd(base + 0.85 * (BigDecimal(rd(p0 / 3)) * 2 + BigDecimal(rd(p0 / 1))).toDouble)
    assert(out(2L) === exp2)
  }

  test("triangleCounts: K4 has four triangles, every node in three; direction/dup/self noise ignored") {
    // K4 edges with deliberate noise: reversed duplicates, a self-loop, a
    // pendant edge (5 hangs off 1 — no triangle through it)
    val edges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ++
      Seq((2L, 1L), (3L, 1L), (4L, 4L), (1L, 5L))).toDF("src", "dst")
    val got = LinkRank.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: a K4 plus a pendant chain peels to exactly the K4 at k=3") {
    // K4 on 1-4; chain 4-5-6 hangs off it; node 7 isolated edge to 5
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 7L)).toDF("src", "dst")
    val core = LinkRank.kCore(edges, "src", "dst", k = 3, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: the corpus link graph converges within the 8-round budget") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents").select("doc_id")
    import org.apache.spark.sql.functions._
    val nRow = docs.agg(count(lit(1)).as("n"))
    val edges = docs.crossJoin(broadcast(nRow))
      .filter(col("doc_id") % 10 =!= 9)
      .select(col("doc_id").as("src"),
        explode(array(Seq(2, 3, 5).map(m =>
          (col("doc_id") * m + m) % col("n")): _*)).as("dst"))
    val r8 = LinkRank.kCore(edges, "src", "dst", k = 3, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r9 = LinkRank.kCore(edges, "src", "dst", k = 3, rounds = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r8 === r9, "peeling had not converged by round 8")
    assert(r8.nonEmpty)
    assert(r8.forall(_._2 >= 3))
  }

  test("triangleCounts: triangle-free graphs (path, star) yield no rows") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(LinkRank.triangleCounts(path, "src", "dst").count() === 0L)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst")
    assert(LinkRank.triangleCounts(star, "src", "dst").count() === 0L)
  }

  test("triangleCounts: two triangles sharing an edge — shared nodes count both") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = LinkRank.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("functionalCycles: rho-shaped graph — two cycles with tails, exact census") {
    // cycle {0,1,2} fed by 5; cycle {3,4} fed by 6; 7 → 6 → 4 (depth-2 tail)
    val succ = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 5L -> 0L,
      3L -> 4L, 4L -> 3L, 6L -> 4L, 7L -> 6L).toDF("v", "p")
    val got = LinkRank.functionalCycles(succ)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet === Set((0L, 3L, 4L), (3L, 2L, 4L)))
  }

  test("functionalCycles: basins partition the vertex set on the corpus successor map") {
    val spark2 = spark
    import spark2.implicits._
    val n = 500L
    val succ = (0L until n).map(v => (v, (v * 3 + 7) % n)).toDF("v", "p")
    val rows = LinkRank.functionalCycles(succ).collect()
    assert(rows.map(_.getLong(2)).sum === n, "basins must partition all vertices")
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(2)))
    // cycle ids are the least member of each cycle, hence distinct
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }
}
