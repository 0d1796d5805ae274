package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRankInt: a 2-cycle is an exact fixpoint at SCALE") {
    // each node has outdeg 1, so r' = 0.15e9 + (85 * 1e9) div 100 = 1e9 exactly
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 4)
    assert(r == Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("pageRankInt: star graph, hand-computed integer values") {
    // A(0) -> B(1), A -> C(2); B,C dangling. After iter 1:
    //   A: base only                         = 150000000
    //   B = C: 150000000 + (85 * (1e9 div 2)) div 100 = 575000000
    val r1 = ranks(Seq((0L, 1L), (0L, 2L)), iters = 1)
    assert(r1 == Map(0L -> 150000000L, 1L -> 575000000L, 2L -> 575000000L))
    // iter 2: A has no in-edges -> base again; B/C fed by A's NEW rank:
    //   150000000 + (85 * (150000000 div 2)) div 100 = 213750000
    val r2 = ranks(Seq((0L, 1L), (0L, 2L)), iters = 2)
    assert(r2 == Map(0L -> 150000000L, 1L -> 213750000L, 2L -> 213750000L))
  }

  test("pageRankInt: partitioning-independent and duplicate-edge-insensitive") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L))
    val base = ranks(edges, iters = 4)
    val shuffled = Graph.pageRankInt(
        edges.toDF("src", "dst").repartition(7), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled == base)
    val duped = ranks(edges ++ edges, iters = 4) // graph is simple: dups collapse
    assert(duped == base)
  }

  test("pageRankInt: link structure orders ranks (hub and its heir beat leaves)") {
    // 1,2,3 all point at 9; 9 points at 1. Nothing points at 2/3, so they
    // fall to base; 9 aggregates three in-edges; 1 inherits ALL of 9's mass
    // (outdeg 1) and ends highest.
    val r = ranks(Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)), iters = 4)
    assert(r(9L) > r(2L) && r(1L) > r(9L))
    assert(r(2L) == r(3L)) // symmetric nodes tie exactly (integer arithmetic)
  }

  test("ssspInt: multi-source exact distances, cycles safe, cap honest") {
    // 1 ->2 (5), 1->3 (2), 3->2 (1), 2->4 (1), 4->1 (1) cycle; island 9
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 2L), (3L, 2L, 1L),
      (2L, 4L, 1L), (4L, 1L, 1L), (9L, 9L, 1L)).toDF("s", "d", "w")
    val r = Graph.ssspInt(edges, "s", "d", "w", sources = Seq(1L))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // 1: 0; 3: 2; 2: min(5, 2+1)=3; 4: 4; island unreachable -> absent
    assert(r == Map(1L -> 0L, 2L -> 3L, 3L -> 2L, 4L -> 4L))
    // multi-source takes the nearer source; cap=1 only sees 1-hop paths
    val m = Graph.ssspInt(edges, "s", "d", "w", Seq(1L, 4L))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(m == Map(1L -> 0L, 4L -> 0L, 2L -> 3L, 3L -> 2L))
    val capped = Graph.ssspInt(edges, "s", "d", "w", Seq(1L), maxRounds = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(capped == Map(1L -> 0L, 2L -> 5L, 3L -> 2L))
  }

  test("boruvkaMst equals a JVM Kruskal on a cyclic graph; forests work") {
    // two components; distinct weights; parallel edge keeps the lighter
    val edges = Seq(
      (1L, 2L, 4L), (2L, 3L, 1L), (3L, 1L, 3L), (3L, 4L, 7L),
      (4L, 1L, 9L), (2L, 1L, 11L), // parallel to (1,2,4): dropped
      (10L, 11L, 2L), (11L, 12L, 5L), (12L, 10L, 6L))
      .toDF("s", "d", "w")
    val got = Graph.boruvkaMst(edges, "s", "d", "w")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // JVM Kruskal with union-find on the deduped undirected edge set
    val es = Seq((1L, 2L, 4L), (2L, 3L, 1L), (1L, 3L, 3L), (3L, 4L, 7L),
      (1L, 4L, 9L), (10L, 11L, 2L), (11L, 12L, 5L), (10L, 12L, 6L))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val want = es.sortBy(_._3).flatMap { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) None else { parent(ra) = rb; Some((a, b, w)) }
    }.toSet
    assert(got == want && got.size == 5) // 4-node tree + 3-node tree
    assert(got.map(_._3).sum == 1L + 3L + 7L + 2L + 5L)
  }

  test("personalizedPageRankInt: seed-only teleport, JVM-replayed 2 iters") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L))
    val df = edges.toDF("s", "d")
    val r = Graph.personalizedPageRankInt(df, "s", "d", seeds = Seq(1L),
        iters = 2).orderBy("node").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    // exact-integer replay with the same schedule
    val nodes = Seq(1L, 2L, 3L, 4L)
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank = nodes.map(n => n -> (if (n == 1L) 1000000000L else 0L)).toMap
    for (_ <- 0 until 2) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(n => n -> ((if (n == 1L) 150000000L else 0L) +
        85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(r.toSeq == nodes.map(n => (n, rank(n))))
    // non-seed leaf (4) ends at zero: nothing links to it, no teleport
    assert(rank(4L) == 0L)
  }

  test("hitsInt: star graph, hand-computed integer hub/auth after one iteration") {
    // A(0)->B(1), A->C(2), D(3)->B.  h0 = 1e6 everywhere.
    // auth raw: B = 2e6, C = 1e6; max 2e6 -> a1: B = 1e6, C = 5e5, A = D = 0.
    // hub raw:  A = 1.5e6, D = 1e6; max 1.5e6 -> h1: A = 1e6,
    //           D = (1e6 * 1e6) div 1.5e6 = 666666, B = C = 0.
    val r = Graph.hitsInt(Seq((0L, 1L), (0L, 2L), (3L, 1L)).toDF("src", "dst"),
        "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(
      0L -> ((1000000L, 0L)), 1L -> ((0L, 1000000L)),
      2L -> ((0L, 500000L)), 3L -> ((666666L, 0L))))
  }

  test("hitsInt: partitioning-independent, duplicate-edge-insensitive, max side at scale") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L))
    def run(d: org.apache.spark.sql.DataFrame) =
      Graph.hitsInt(d, "src", "dst", iters = 3)
        .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val base = run(edges.toDF("src", "dst"))
    assert(run(edges.toDF("src", "dst").repartition(7)) == base)
    assert(run((edges ++ edges).toDF("src", "dst")) == base)
    // each side's max is exactly the fixed-point scale after rescaling
    assert(base.values.map(_._1).max == 1000000L)
    assert(base.values.map(_._2).max == 1000000L)
  }

  test("triangleStats: K4 is all-triangles, a path has none") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val r = Graph.triangleStats(k4.toDF("src", "dst"), "src", "dst")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r.size == 4)
    r.values.foreach(v => assert(v == ((3L, 3L, 1.0))))
    val path = Graph.triangleStats(
        Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst"), "src", "dst")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(path(0L) == ((1L, 0L, 0.0))) // degree 1: coeff defined as 0
    assert(path(1L) == ((2L, 0L, 0.0)))
  }

  test("triangleStats: direction- and duplicate-insensitive; self-loops dropped") {
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val base = Graph.triangleStats(tri.toDF("src", "dst"), "src", "dst")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSet
    assert(base == (0L to 2L).map(n => (n, 2L, 1L, 1.0)).toSet)
    val messy = tri ++ tri.map(_.swap) ++ Seq((0L, 0L), (1L, 1L)) ++ tri
    val r = Graph.triangleStats(messy.toDF("src", "dst"), "src", "dst")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSet
    assert(r == base)
  }

  test("bfsDepth: multi-source shortest hops, depth cap, cycles, early exit") {
    // two components: 1->2->3->4 (+ back-edge 4->1) and 5->6
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("s")
    val full = Graph.bfsDepth(edges, "src", "dst", seeds, "s", maxDepth = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // early exit: the cycle back-edge must not re-discover node 1
    assert(full == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 6L -> 1L, 3L -> 2L, 4L -> 3L))
    val capped = Graph.bfsDepth(edges, "src", "dst", seeds, "s", maxDepth = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(capped == full - 4L) // node 4 is 3 hops out
    val zero = Graph.bfsDepth(edges, "src", "dst", seeds, "s", maxDepth = 0)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(zero == Map(1L -> 0L, 5L -> 0L))
    // unreachable seeds-only graph: nodes with no out-edges from seeds
    val iso = Graph.bfsDepth(edges, "src", "dst", Seq(6L).toDF("s"), "s", 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(iso == Map(6L -> 0L))
  }

  test("kCore: cascading peel, within-core degrees, dup/self/direction-proof") {
    // 4-clique {1,2,3,4} + path 4-5-6 + pendant 7 on 5; noise: duplicate,
    // reversed and self edges
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L), (5L, 7L),
      (2L, 1L), (1L, 2L), (3L, 3L))).toDF("src", "dst")
    // k=3: 5 has degree 3 (4,6,7) at first, but 6 and 7 peel (deg 1),
    // then 5 peels (deg 1) — cascade leaves exactly the clique
    val k3 = Graph.kCore(edges, "src", "dst", k = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(k3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=2: clique + nothing else (path nodes have degree <= 2 but 6/7 are
    // pendants; their removal leaves 5 a pendant too)
    val k2 = Graph.kCore(edges, "src", "dst", k = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(k2.keySet == Set(1L, 2L, 3L, 4L))
    // k=1: everything except the self-loop-only structure survives
    val k1 = Graph.kCore(edges, "src", "dst", k = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(k1.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(k1(6L) == 1L && k1(7L) == 1L && k1(5L) == 3L)
    // k above the max core: empty result
    assert(Graph.kCore(edges, "src", "dst", k = 4).count() == 0L)
    // maxRounds cap stops mid-cascade deterministically: one round at k=3
    // peels 6 and 7 but 5 (initial degree 3) is still in
    val capped = Graph.kCore(edges, "src", "dst", k = 3, maxRounds = 1)
      .collect().map(x => x.getLong(0)).toSet
    assert(capped == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("modularity: two cliques + bridge score high, random split scores ~0") {
    // two triangles {1,2,3} {4,5,6} + bridge 3-4: m=7
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val good = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y"),
      (6L, "y")).toDF("node", "comm")
    val rg = Graph.modularity(edges, "src", "dst", good, "node", "comm")
      .collect().head
    // in=6, m=7; deg sums: x = 2+2+3=7, y = 7 -> Q = 6/7 - (49+49)/(4*49)
    assert(rg.getLong(0) == 7L && rg.getLong(1) == 2L)
    assert(rg.getDouble(2) == 6.0 / 7.0 - 98.0 / (49.0 * 4.0))
    // everything in ONE community: Q = 1 - 1 = 0 exactly
    val all = (1L to 6L).map(n => (n, "z")).toDF("node", "comm")
    val ra = Graph.modularity(edges, "src", "dst", all, "node", "comm")
      .collect().head
    assert(ra.getDouble(2) == 14.0 / 14.0 - (14.0 * 14.0) / (49.0 * 4.0) - 0.0
      || ra.getDouble(2) == 0.0) // 1 - 196/196 = 0
    // unassigned nodes become singletons: in=0 for them
    val partial = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("node", "comm")
    val rp = Graph.modularity(edges, "src", "dst", partial, "node", "comm")
      .collect().head
    assert(rp.getLong(1) == 4L) // x + three singleton communities
  }

  test("reciprocity: mutual fraction of the simple directed graph") {
    // distinct simple edges: 1->2, 2->1, 1->3, 3->4, 4->3 (dup + self dropped)
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L),
      (5L, 5L), (1L, 2L)).toDF("src", "dst")
    val r = Graph.reciprocity(e, "src", "dst").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L &&
      r.getDouble(2) == 4.0 / 5.0)
    // no mutual pairs
    val dag = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rd = Graph.reciprocity(dag, "src", "dst").collect().head
    assert(rd.getLong(1) == 0L && rd.getDouble(2) == 0.0)
    // only self-loops: zero edges -> NULL ratio
    val self = Seq((7L, 7L)).toDF("src", "dst")
    val rs = Graph.reciprocity(self, "src", "dst").collect().head
    assert(rs.getLong(0) == 0L && rs.isNullAt(2))
  }

  test("assortativity: star is maximally disassortative, hand Pearson, regular graph NULL") {
    // star K1,3: center degree 3, leaves 1 -> r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val rs = Graph.assortativity(star, "src", "dst").collect().head
    assert(rs.getLong(0) == 3L && rs.getDouble(1) == -1.0)
    // cycle: every degree 2 -> zero variance -> NULL
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = Graph.assortativity(cyc, "src", "dst").collect().head
    assert(rc.getLong(0) == 3L && rc.isNullAt(1))
    // path 1-2-3-4: degrees 1,2,2,1; mirrored pairs (x,y):
    // (1,2),(2,1),(2,2),(2,2),(2,1),(1,2): m=6, Sx=Sy=10, Sxx=Syy=18, Sxy=16
    // num=6*16-100=-4, dx=dy=6*18-100=8 -> r=-4/(sqrt8*sqrt8) ~ -0.5
    // (NOT exactly -0.5: sqrt(8)*sqrt(8) != 8 in doubles — the expected
    // value must replay the engine's fixed op order, as the oracles do)
    val pathExpected = -4.0 / (math.sqrt(8.0) * math.sqrt(8.0))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val rp = Graph.assortativity(path, "src", "dst").collect().head
    assert(rp.getLong(0) == 3L && rp.getDouble(1) == pathExpected)
    // direction/dup/self-proof: same value after noise
    val noisy = path.unionByName(
      Seq((2L, 1L), (1L, 1L), (3L, 2L)).toDF("src", "dst"))
    assert(Graph.assortativity(noisy, "src", "dst").collect().head
      .getDouble(1) == pathExpected)
  }
}
