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

  test("pagerank is deterministic across repartitionings") {
    val a = Graph.pagerank(edges.repartition(7), iters = 3)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    val b = Graph.pagerank(edges.repartition(2), iters = 3)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("query plans keyed joins only — no cartesian beyond the scalar-N broadcast") {
    val plan = SparkEntry.queries("q_pagerank")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
