package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profile, Sampling}

class ProfileSamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("profile counts rows/nulls/distincts and min/max in numeric (not lexicographic) order") {
    val df = Seq(
      (Some(2L), Some("b")), (Some(10L), Some("a")), (None, Some("a")), (Some(10L), None)
    ).toDF("k", "s")
    val p = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) == 4L) // n_rows
    assert(p("k").getLong(2) == 1L) // n_null
    assert(p("k").getLong(3) == 2L) // n_distinct (nulls excluded)
    assert(p("k").getString(4) == "2" && p("k").getString(5) == "10") // numeric order
    assert(p("s").getLong(2) == 1L && p("s").getString(4) == "a" && p("s").getString(5) == "b")
  }

  test("approxProfile matches exact counts on small-cardinality data") {
    val df = (1 to 1000).map(i => i % 50).toDF("v")
    val exact = Profile.profile(df, Seq("v")).collect().head
    val approx = Profile.approxProfile(df, Seq("v")).collect().head
    assert(exact.getLong(3) == 50L)
    assert(math.abs(approx.getLong(3) - 50L) <= 3L) // HLL++ rsd default 5%
    assert(approx.getString(4) == exact.getString(4))
  }

  test("prioritySample: exact N, deterministic, and biased toward heavy rows") {
    val df = (1L to 2000L).map(i => (i, if (i <= 100) 1000L else 1L))
      .toDF("id", "w")
    def ids = Sampling.prioritySample(df, col("id"), col("w"), "t:", 100)
      .select("id").as[Long].collect().toSet
    val s1 = ids
    assert(s1.size == 100)
    assert(s1 == ids) // deterministic re-run
    // heavy rows are 1000× weighted: nearly all of the 100 winners
    assert(s1.count(_ <= 100) > 80)
  }

  test("integrity: planted orphan and null FK are counted separately") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk") // 99 dangles
    val clean = Seq(Some(3L)).toDF("fk")
    val out = Profile.integrity(Seq(
      ("child->parent", child, "fk", parent, "pk"),
      ("clean->parent", clean, "fk", parent, "pk"))).collect()
      .map(r => r.getAs[String]("relationship") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null_fk"),
          r.getAs[Long]("n_orphans"), r.getAs[Boolean]("ok"))).toMap
    assert(out("child->parent") == ((4L, 1L, 1L, false)))
    assert(out("clean->parent") == ((1L, 0L, 0L, true)))
  }

  test("winsorized mean resists an outlier; symmetric data is unchanged") {
    import spark.implicits._
    // group "sym": uniform 1..100 (symmetric ⇒ clipping both 5% tails
    // cancels); group "out": 1..99 plus one 10000.0 fat-finger print
    val rows = (1 to 100).map(i => ("sym", i.toDouble)) ++
      (1 to 99).map(i => ("out", i.toDouble)) :+ (("out", 10000.0))
    val df = rows.toDF("g", "v").repartition(5)
    val out = Profile.winsorized(df, "g", "v", 0.05, 0.95).collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_raw"),
          r.getAs[Double]("mean_wins"), r.getAs[Double]("p_lo"),
          r.getAs[Double]("p_hi"))).toMap
    val (nS, rawS, winS, _, _) = out("sym")
    assert(nS == 100L && rawS == 50.5 && winS == 50.5)
    val (nO, rawO, winO, loO, hiO) = out("out")
    assert(nO == 100L)
    assert(rawO > 149)               // the outlier drags the raw mean up ~100
    assert(winO < 55 && winO > 45)   // the clipped mean stays near the bulk
    assert(loO < hiO && hiO < 10000) // p95 is a bulk value, not the outlier
  }
}
