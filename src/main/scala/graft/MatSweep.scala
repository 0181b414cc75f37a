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

  /** (query, strategy) cells skipped so the sweep terminates. EMPTY since
    * r17: the r16 sweep had to skip the Lloyd families under `persist`
    * (lineage-kept loops make the logical plan a self-referencing DAG;
    * `TreeNode.generateTreeString` expands a DAG as a TREE, so merely
    * DESCRIBING the plan was exponential in loop depth — driver OOM
    * uncapped, >20 min plan walk capped, jstack-confirmed). That footgun
    * is now mechanical, not prose: [[Materialize.loop]] auto-truncates
    * loop lineage every `loopTruncateEvery` (default 2) iterations under
    * persist, so every cell completes and gets a real number. */
  val Skip: Set[(String, String)] = Set.empty

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // lineage-keeping strategies make the iterative loops' logical plan
      // a deep DAG; generateTreeString expands a DAG as a TREE, so the
      // plan STRING is exponential in rounds even though the plan object
      // graph is linear — uncapped, the r16 sweep OOMed the 16g driver
      // just STRINGIFYING the persist-strategy CC plan. Capping the plan
      // string is also the cluster-mode recommendation when running
      // lineage-kept iterative workloads.
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
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
    println(s"# materializer sweep @ $sfDir (best of 2; NaN = strategy failed)")
    println("| query | " + strategies.mkString(" | ") + " |")
    println("|---|---|---|---|")
    // stream each row as it lands so a mid-sweep failure keeps the rows
    // already measured; a strategy that dies (e.g. driver OOM risk paths)
    // records NaN instead of killing the sweep
    val rows = Queries.map { q =>
      val ts = strategies.map { s =>
        if (Skip(q -> s)) s -> Double.NaN
        else {
          spark.conf.set(Materialize.ConfKey, s)
          // NonFatal only: after a real OOM/StackOverflow the JVM is
          // unreliable and later cells would record bogus timings — let
          // fatal errors kill the sweep (streamed rows keep what's done)
          try s -> Seq(timed(q), timed(q)).min
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[matsweep] $q/$s failed: ${e.getClass.getSimpleName}")
            s -> Double.NaN
          }
          finally spark.conf.unset(Materialize.ConfKey)
        }
      }
      println(s"| $q | " + ts.map(t => f2(t._2)).mkString(" | ") + " |")
      q -> ts
    }
    // skipped/failed cells emit JSON null — bare NaN is not valid JSON
    // and breaks downstream parsers of this metric line (ADVICE r16);
    // the human-readable table above keeps NaN for at-a-glance reading
    def jnum(v: Double): String = if (v.isNaN || v.isInfinite) "null" else f2(v)
    val json = rows.map { case (q, ts) =>
      s""""$q":{${ts.map { case (s, t) => s""""$s":${jnum(t)}""" }.mkString(",")}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"mat_sweep","sf":"$sfDir","queries":$json}""")
    spark.stop()
  }
}
