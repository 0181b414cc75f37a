package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Materialize

/** Materializer-strategy overhead sweep (dev tooling): times the
  * iterative-family queries under each `spark.graft.materializer` strategy
  * at sf0.1 — `local` (localCheckpoint, the local[_] default), `persist`
  * (MEMORY_AND_DISK + lineage, the recompute-on-loss cluster path) and
  * `checkpoint` (durable truncation, the deep-iteration cluster path).
  * MaterializeSpec pins that the three are bit-identical; this records
  * what each one COSTS, so the cluster-mode recommendation in SCALE.md is
  * a measured number instead of prose.
  *
  * Usage: graft.MatSweep [sfDir]   (default /root/testdata/sf0.1)
  * Prints a markdown table + one JSON line.
  */
object MatSweep {
  val Queries: Seq[String] =
    Seq("q_dedup_corpus", "q_pagerank", "q_semdedup", "q_dedup_embed_ivf")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      SessionScoped.scratchDir("graft_matsweep_ckpt"))

    def timed(name: String): Double = {
      val s = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s) / 1e9
    }
    // warm scans once so the first strategy doesn't pay first-read costs
    Queries.foreach(timed)

    def f2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val strategies = Seq("local", "persist", "checkpoint")
    val rows = Queries.map { q =>
      q -> strategies.map { s =>
        spark.conf.set(Materialize.ConfKey, s)
        try s -> Seq(timed(q), timed(q)).min
        finally spark.conf.unset(Materialize.ConfKey)
      }
    }
    println(s"# materializer sweep @ $sfDir (best of 2)")
    println("| query | " + strategies.mkString(" | ") + " |")
    println("|---|---|---|---|")
    rows.foreach { case (q, ts) =>
      println(s"| $q | " + ts.map(t => f2(t._2)).mkString(" | ") + " |")
    }
    val json = rows.map { case (q, ts) =>
      s""""$q":{${ts.map { case (s, t) => s""""$s":${f2(t)}""" }.mkString(",")}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"mat_sweep","sf":"$sfDir","queries":$json}""")
    spark.stop()
  }
}
