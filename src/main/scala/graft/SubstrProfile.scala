package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiles the exact-substring window pass on a corpus DOMINATED by large
  * documents (dev tooling; closes the r16 ledger line on the per-window
  * `substr` walk). The question: inside one segment of `shardChars` window
  * starts, every `substr(lp, minLen)` call re-walks the segment from
  * position 0 (UTF8String counts codepoints byte-wise), so the window
  * stage is O(shardChars²) CPU per segment — does that quadratic term
  * DOMINATE wall time at the shipped shardChars=8192, or is the pass
  * bound by the hash/shuffle that follows?
  *
  * Method: synthesize `nDocs` ASCII documents of `docChars` chars (all
  * past the shard threshold, the worst case), then time the FULL window
  * pass (explode → substr → hash60 → count) at shardChars ∈ {512, 2048,
  * 8192}. If the walk dominated, 512 would be ~16× faster than 8192
  * (work per segment ∝ shardChars², segments ∝ 1/shardChars). A flat
  * profile means the quadratic term is below the hash+explode floor and
  * the byte-slice Expression is not worth its codegen surface.
  *
  * Usage: graft.SubstrProfile [nDocs] [docChars] — prints a markdown
  * table + one JSON line (best of 2 per cell).
  */
object SubstrProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(2000)
    val docChars = args.lift(1).map(_.toInt).getOrElse(16384)
    val minLen = 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic ASCII docs with per-doc variation (so window hashes
    // don't collapse to one hot key) and a shared plateau (so some spans
    // actually duplicate, as in real data)
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        concat(
          repeat(concat(lit("w"), pmod(col("id"), lit(97)).cast("string"),
            lit(" token stream segment ")), docChars / 30),
          repeat(lit(" shared plateau run of text"), docChars / 60))
          .substr(lit(1), lit(docChars)).as("text"))
      .localCheckpoint() // freeze the input so every cell scans, not builds

    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timeOnce(shard: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Dedup.substringWindows(docs, minLen, shard)
        .select(col("h")).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val shards = Seq(512, 2048, 8192)
    shards.foreach(timeOnce) // warm
    val rows = shards.map(s => s -> Seq(timeOnce(s), timeOnce(s)).min)
    println(s"# substring window pass @ $nDocs docs x $docChars chars (best of 2)")
    println("| shardChars | window-pass s |")
    println("|---|---|")
    rows.foreach { case (s, t) => println(s"| $s | ${f3(t)} |") }
    val json = rows.map { case (s, t) => s""""$s":${f3(t)}""" }.mkString(",")
    println(s"""{"metric":"substr_profile","n_docs":$nDocs,"doc_chars":$docChars,$json}""")
    spark.stop()
  }
}
