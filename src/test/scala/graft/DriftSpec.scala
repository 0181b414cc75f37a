package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("identical snapshots have zero PSI and zero JS in every bin") {
    val df = (1 to 400).map(i => (i % 200) * 5.0).toDF("v")
    val out = Drift.drift(df, df, "v", binWidth = 100.0, maxBin = 9).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("psi_term") == 0.0)
      assert(r.getAs[Double]("js_term") == 0.0)
      assert(r.getAs[Double]("psi") == 0.0)
      assert(r.getAs[Double]("js") == 0.0)
    }
  }

  test("a shifted distribution yields positive totals; bins missing on one side are clamped, not NaN") {
    val ref = (1 to 300).map(_ => 50.0).toDF("v") // all in bin 0
    val cur = (1 to 300).map(_ => 250.0).toDF("v") // all in bin 2
    val rows = Drift.drift(ref, cur, "v", binWidth = 100.0, maxBin = 9).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSet == Set(0, 2))
    rows.foreach { r =>
      assert(!r.getAs[Double]("psi_term").isNaN)
      assert(r.getAs[Double]("psi") > 1.0) // total shift → PSI far beyond 0.25
      // JS is bounded by ln(2) per side; full divergence ≈ ln(2)
      assert(math.abs(r.getAs[Double]("js") - math.log(2)) < 0.01)
    }
  }

  test("probability columns sum to 1 per side") {
    val ref = (1 to 500).map(i => (i % 7) * 37.0).toDF("v")
    val cur = (1 to 400).map(i => (i % 5) * 53.0).toDF("v")
    val rows = Drift.drift(ref, cur, "v", binWidth = 50.0, maxBin = 9).collect()
    def tot(c: String) = rows.map(_.getAs[Double](c)).sum
    assert(math.abs(tot("p_ref") - 1.0) < 1e-3)
    assert(math.abs(tot("p_cur") - 1.0) < 1e-3)
  }
}
