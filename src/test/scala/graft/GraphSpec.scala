package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // star: hub 0 ↔ spokes 1..5, plus a 2-cycle 6 ↔ 7 off to the side
  private def edges = {
    val star = (1L to 5L).flatMap(i => Seq((0L, i), (i, 0L)))
    (star ++ Seq((6L, 7L), (7L, 6L))).toDF("src", "dst")
  }

  test("rank mass is conserved and the hub outranks every spoke") {
    val r = Graph.pagerank(edges, iters = 3).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r.size == 8)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)          // Σ rank = 1
    for (i <- 1L to 5L) assert(r(0L) > r(i), s"hub vs spoke $i")
    // the isolated 2-cycle nodes keep exactly the uniform rank
    assert(math.abs(r(6L) - 0.125) < 1e-6 && math.abs(r(7L) - 0.125) < 1e-6)
    // spokes are symmetric
    assert((1L to 5L).map(r).distinct.size == 1)
  }

  test("dangling mass is redistributed: sinks conserve total rank") {
    // chain 0→1→2 plus a feeder 3→2: nodes 2 is a pure sink; without the
    // dangling term ~a quarter of the mass would leak every round
    val g = Seq((0L, 1L), (1L, 2L), (3L, 2L)).toDF("src", "dst")
    val r = Graph.pagerank(g, iters = 5).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r.size == 4)
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass leaked: ${r.values.sum}")
    // the sink absorbs the most rank; sources hold only teleport + dangling
    assert(r(2L) > r(1L) && r(1L) > r(0L))
    assert(math.abs(r(0L) - r(3L)) < 1e-12)               // symmetric sources
  }

  test("pagerank is deterministic across repartitionings") {
    val a = Graph.pagerank(edges.repartition(7), iters = 3)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    val b = Graph.pagerank(edges.repartition(2), iters = 3)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("triangles: exact census on a known graph, hub skew handled") {
    // K4 on {1,2,3,4} (4 triangles) + a star hub 0 → 10..19 (no triangles
    // through the hub: spokes are not interconnected) + one pendant edge
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    val star = (10L to 19L).map(s => (0L, s))
    val g = (k4 ++ star ++ Seq((20L, 21L))).toDF("src", "dst")
    val r = Graph.triangles(g).collect().head
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_nodes") == 17L)
    assert(r.getAs[Long]("n_edges") == 17L)
    // wedges: K4 gives 4·C(3,2)=12, hub gives C(10,2)=45, pendant 0
    assert(r.getAs[Long]("n_wedges") == 57L)
    assert(r.getAs[Double]("clustering") == math.floor(12.0 / 57 * 10000 + 0.5) / 10000)
    // direction/duplicate invariance: reversed + doubled edges change nothing
    val noisy = g.union(g.select(col("dst").as("src"), col("src").as("dst")))
    val r2 = Graph.triangles(noisy).collect().head
    assert(r2 == r)
  }

  /** Independent synchronous LPA reference (adjacency maps, no Spark). */
  private def lpaRef(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nbrs = es.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    var labels = es.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = labels.map { case (n, old) =>
        nbrs.get(n) match {
          case None => n -> old
          case Some(ns) =>
            val votes = ns.map(labels).groupBy(identity)
              .map { case (l, ls) => (l, ls.size) }
            n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
    }
    labels
  }

  test("label propagation matches an independent reference and splits cliques") {
    // two triangles bridged by one edge: LPA must keep two communities
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val bridge = Seq((3L, 10L))
    val es = (tri ++ bridge).flatMap { case (a, b) => Seq((a, b), (b, a)) }
    for (iters <- Seq(1, 2, 3, 5)) {
      val got = Graph.labelPropagation(es.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == lpaRef(es, iters), s"iters=$iters")
    }
    val after3 = Graph.labelPropagation(es.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the two triangles never share a label across the bridge
    assert(Set(after3(1L), after3(2L), after3(3L))
      .intersect(Set(after3(10L), after3(11L), after3(12L))).isEmpty)
  }

  test("label propagation on a DIRECTED graph: sinks keep their label") {
    // chain 1 -> 2 -> 3 (votes come from OUT-neighbors): node 3 is a
    // pure sink with no out-edges and must KEEP its own label every
    // round — matching the reference fold's no-neighbor branch — rather
    // than silently vanishing from the output
    val es = Seq((1L, 2L), (2L, 3L))
    for (iters <- Seq(1, 2, 4)) {
      val got = Graph.labelPropagation(es.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == lpaRef(es, iters), s"iters=$iters")
      assert(got.keySet == Set(1L, 2L, 3L) && got(3L) == 3L)
    }
  }

  test("label propagation is deterministic across repartitionings") {
    val es = (1L to 40L).flatMap(i =>
      Seq((i, i % 7 + 100L), (i % 7 + 100L, i), (i, (i * 3) % 11 + 200L),
        ((i * 3) % 11 + 200L, i)))
    def run(parts: Int) =
      Graph.labelPropagation(es.toDF("src", "dst").repartition(parts), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(2) == run(19))
  }

  test("query plans keyed joins only — no cartesian beyond the scalar-N broadcast") {
    val plan = SparkEntry.queries("q_pagerank")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("k-core: peel cascades through the pendant chain, keeps the triangle") {
    // triangle 1-2-3 with a pendant chain 3-4-5: the 2-core must peel 5
    // (deg 1), which exposes 4 (deg 1) — a second round — leaving only
    // the triangle, every survivor at core degree 2
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core2 = Graph.kcore(g, k = 2, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the max degree empties the graph
    assert(Graph.kcore(g, k = 4, maxRounds = 10).count() == 0L)
    // self-loops are dropped BEFORE degree counting: a lone self-loop is
    // an empty 1-core, and a self-loop must not pad a node over the peel
    // threshold (node 4 below has real degree 1, not 2)
    assert(Graph.kcore(Seq((9L, 9L)).toDF("src", "dst"), 1, 10).count() == 0L)
    val loopy = g.union(Seq((4L, 4L)).toDF("src", "dst"))
    val core2b = Graph.kcore(loopy, k = 2, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2b == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=1 keeps everything (dedup + symmetrize only)
    val core1 = Graph.kcore(g, k = 1, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core1 == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
  }

  test("k-core capped below the fixpoint equals the same-round unrolled peel") {
    // chain 1-2-3-4-5-6 with k=2 peels one endpoint pair per round;
    // maxRounds=1 must stop after exactly one peel (ends 1 and 6 gone),
    // NOT run to the (empty) fixpoint
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val one = Graph.kcore(chain, k = 2, maxRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }
}
