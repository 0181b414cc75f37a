package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). A small warmup pass first
  * amortizes classloading/JIT/codegen so the per-query numbers measure the
  * queries, not JVM startup.
  *
  * Materialization: each query is written to the `noop` sink, which forces
  * every row and column to be fully produced but discards the bytes. A bare
  * `.count()` would let Catalyst prune projection-only query bodies (for
  * q_text_stats / q_token_count / q_fingerprint etc. the timed plan would
  * collapse to scan → count with the md5/aggregate work optimized away).
  * Failed queries are reported in an explicit "errors" list, never timed as
  * if they succeeded. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: exercise scan + shuffle + window + join codepaths once
    try {
      materialize("q_bars_hourly")
      materialize("q_join_revenue")
    } catch { case _: Throwable => () }

    // dev-only subset filter (unset for the driver's full run). An empty or
    // whitespace-only value is treated as unset — Set("") would otherwise
    // silently filter out EVERY query with no signal in the output.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = all.filter(n => only.forall(_.contains(n)))
    only.foreach { _ =>
      System.err.println(
        s"[bench] SPARK_GRAFT_ONLY active: running ${names.size}/${all.size} queries")
    }

    // min of two runs per query: steady-state latency, JIT/codegen noise out
    val runs = names.map { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { materialize(name); true }
          catch { case _: Throwable => false }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      val good = times.filter(_._1).map(_._2)
      (name, if (good.nonEmpty) Some(good.min) else None)
    }
    val ok = runs.collect { case (n, Some(t)) => n -> t }
    val errors = runs.collect { case (n, None) => n }
    // Locale.ROOT pins the decimal separator — "%.3f" under a comma-decimal
    // default locale (de_DE) would emit invalid JSON ("value":0,123).
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = ok.sortBy(_._2)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    // The full per-query JSON goes to a FILE (the round-5 line, even with
    // 3-dp + ascending-sort armor, still overflowed the driver's capture
    // window and parsed as null). Stdout is a short totals-first pointer
    // line that always fits; the complete artifact lives in bench_out.json
    // and is committed with the round.
    val fullJson =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","errors":$errs,"queries":$qs,"total_sec":${f3(total)},"n_queries":${ok.size}}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullJson + "\n")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","total_sec":${f3(total)},"n_queries":${ok.size},"errors":$errs,"file":"$outFile"}""")
    spark.stop()
  }
}
