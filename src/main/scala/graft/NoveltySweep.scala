package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Decontamination
import graft.sources.{ScaleSynth, Tables}

/** Measures what the bloom prescreen buys q_novelty in its REAL regime:
  * admitting NEW data (score side) against an EXISTING corpus (reference
  * side) where most score grams are novel. The verify-gated q_novelty
  * splits one corpus even/odd, so its halves overlap heavily and nearly
  * every gram is bloom-positive — the prescreen can't shrink that join
  * by construction. Here the roles come from a ScaleSynth dir: the
  * reference is the BASE copy (doc_id < KeyStride) and the score side is
  * the synthesized copies, whose alphabet rotation makes their shingle
  * space disjoint from the base — the new-crawl-vs-corpus shape.
  *
  * Usage: graft.NoveltySweep [synthDir] — prints one markdown table and
  * one JSON line with wall seconds and shuffle bytes/records per variant
  * (exact vs bloom), best of 2 runs each.
  */
object NoveltySweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_trend/sf0.1x10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // plan strings of lineage-kept iterative loops are exponential to
      // DESCRIBE (generateTreeString expands a DAG as a tree) — cap so the
      // driver never OOMs stringifying a plan (r16 sweep, SCALE.md)
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter(spark.sparkContext)

    val docs = Tables.documents(spark, dir)
    val ref = docs.filter(col("doc_id") < ScaleSynth.KeyStride)
    val score = docs.filter(col("doc_id") >= ScaleSynth.KeyStride)
    val n = 5

    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    def run(tag: String, mk: () => org.apache.spark.sql.DataFrame)
        : (String, Double, Long, Long) = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val (b, r, _) = meter.delta {
          mk().write.format("noop").mode("overwrite").save()
        }
        ((System.nanoTime() - t0) / 1e9, b, r)
      }
      val best = runs.minBy(_._1)
      (tag, best._1, best._2, best._3)
    }

    // warm the scans once so neither variant pays first-read costs
    docs.write.format("noop").mode("overwrite").save()

    val rows = Seq(
      run("exact", () => Decontamination.noveltyScore(score, ref, n)),
      run("bloom", () => Decontamination.noveltyScoreBloom(score, ref, n)))

    println(s"# novelty sweep @ $dir (score = synth copies, ref = base copy; best of 2)")
    println("| variant | wall s | shuffle MB | shuffle records |")
    println("|---|---|---|---|")
    rows.foreach { case (t, w, b, r) =>
      println(s"| $t | ${f3(w)} | ${f3(b / 1e6)} | $r |")
    }
    val json = rows.map { case (t, w, b, r) =>
      s""""$t":{"wall_sec":${f3(w)},"shuffle_bytes":$b,"shuffle_records":$r}"""
    }.mkString(",")
    println(s"""{"metric":"novelty_sweep","dir":"$dir",$json}""")
    spark.stop()
  }
}
