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

  test("query plans keyed joins only — no cartesian beyond the scalar-N broadcast") {
    val plan = SparkEntry.queries("q_pagerank")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
