package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ScaleSynth

/** The trend bench ([[BenchTrend]]) is only meaningful if the synthesized
  * N× dirs actually model "more of the same data": disjoint key spaces
  * (linear joins/graphs), disjoint shingle spaces (no artificial cross-copy
  * near-dups), norm-preserving embedding rotations, and a time-extended —
  * not symbol-multiplied — event stream. Pin each of those contracts at
  * sf0.001. */
class ScaleSynthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val base = "/root/testdata/sf0.001"

  test("every scaled fact table has copies x base rows; dims stay fixed") {
    for (t <- ScaleSynth.tables) {
      val n0 = spark.read.parquet(s"$base/$t.parquet").count()
      val n3 = ScaleSynth.scaleTable(spark, base, t, 3).count()
      val expect = if (t == "nation" || t == "region") n0 else 3 * n0
      assert(n3 == expect, s"$t: $n3 != $expect")
    }
  }

  test("key spaces are disjoint across copies and joins still resolve") {
    val li = ScaleSynth.scaleTable(spark, base, "lineitem", 2)
    val ord = ScaleSynth.scaleTable(spark, base, "orders", 2)
    // disjoint: copy 1 keys all sit one stride above copy 0's range
    val mx0 = spark.read.parquet(s"$base/lineitem.parquet")
      .agg(max("l_orderkey")).head.getLong(0)
    assert(li.filter(col("l_orderkey") > mx0 &&
      col("l_orderkey") < ScaleSynth.KeyStride).count() == 0)
    // referential integrity: every scaled lineitem still finds its order
    val orphans = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
    assert(orphans.count() == 0)
  }

  test("documents: cross-copy shingle spaces are disjoint, lengths preserved") {
    val docs = ScaleSynth.scaleTable(spark, base, "documents", 2)
      .withColumn("copy", (col("doc_id") / ScaleSynth.KeyStride).cast("int"))
    // lengths (and so n_chars validity) survive the alphabet rotation
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    // token sets of the two copies share (almost) nothing: rotation by 7
    // maps every letter to a different one, so only tokens without letters
    // could collide
    val toks = docs.select(col("copy"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").rlike("[a-z]")).distinct()
    val shared = toks.filter(col("copy") === 0).select("tok")
      .intersect(toks.filter(col("copy") === 1).select("tok"))
    assert(shared.count() == 0)
  }

  test("documents keepStopwords: markers intact, content rotated, lengths kept") {
    val docs = ScaleSynth.scaleTable(spark, base, "documents", 2,
        keepStopwords = true)
      .withColumn("copy", (col("doc_id") / ScaleSynth.KeyStride).cast("int"))
    // lengths still survive (rotation is per-token, stopwords unchanged)
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    val stopArr = array(
      graft.operators.TextAnalysis.Stopwords.map(lit): _*)
    val toks = docs.select(col("copy"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").rlike("[a-z]"))
    // every copy keeps its English stopword occurrences (the gate markers)
    val stopPerCopy = toks.filter(array_contains(stopArr, col("tok")))
      .groupBy("copy").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stopPerCopy.getOrElse(1, 0L) == stopPerCopy.getOrElse(0, -1L))
    // while CONTENT tokens stay copy-disjoint (the dedup-space contract)
    val content = toks.filter(!array_contains(stopArr, col("tok"))).distinct()
    val shared = content.filter(col("copy") === 0).select("tok")
      .intersect(content.filter(col("copy") === 1).select("tok"))
    assert(shared.count() == 0)
  }

  test("embeddings: rotation preserves norm, copies are not identical") {
    val emb = ScaleSynth.scaleTable(spark, base, "embeddings", 2)
      .withColumn("copy", (col("vec_id") / ScaleSynth.KeyStride).cast("int"))
      .withColumn("id0", col("vec_id") % ScaleSynth.KeyStride)
      .withColumn("norm", round(sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x)), 4))
    val byCopy = emb.groupBy("id0").pivot("copy", Seq(0, 1))
      .agg(first("norm").as("n"), first("embedding").as("e"))
    assert(byCopy.filter(col("0_n") =!= col("1_n")).count() == 0, "norms differ")
    assert(byCopy.filter(col("0_e") === col("1_e")).count() == 0, "identical copies")
  }

  test("events: same symbol set, time-extended history") {
    val ev = ScaleSynth.scaleTable(spark, base, "events", 2)
    val ev0 = graft.sources.Tables.events(spark, base)
    assert(ev.select("user_id").distinct().count() ==
      ev0.select("user_id").distinct().count(), "symbol set must not grow")
    assert(ev.count() == 2 * ev0.count())
    // copy 1 strictly after copy 0 in time (disjoint bar buckets); cast to
    // double so the check is physical-type-agnostic (nanos-long / timestamp)
    val tsNum = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts").cast("double")
      case _ => col("ts").cast("timestamp").cast("double")
    }
    val evd = ev.withColumn("tsd", tsNum)
    val firstCopyMax = evd.filter(col("event_id") < ScaleSynth.KeyStride)
      .agg(max("tsd")).head.getDouble(0)
    val secondCopyMin = evd.filter(col("event_id") >= ScaleSynth.KeyStride)
      .agg(min("tsd")).head.getDouble(0)
    assert(secondCopyMin > firstCopyMax,
      s"copy 1 must start after copy 0 ends ($secondCopyMin <= $firstCopyMax)")
  }

  test("synthesize writes all tables once and the marker makes it idempotent") {
    val out = graft.SessionScoped.scratchDir("graft_synth")
    ScaleSynth.synthesize(spark, base, out, 2)
    for (t <- ScaleSynth.tables)
      assert(new java.io.File(s"$out/$t.parquet").exists(), s"missing $t")
    val marker = java.nio.file.Paths.get(out, "_SYNTH_DONE")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker)
    ScaleSynth.synthesize(spark, base, out, 2) // must no-op
    assert(java.nio.file.Files.getLastModifiedTime(marker) == mtime)
    // a stale marker (older synth version / different params) must NOT
    // be honored: rewrite it with a mismatched stamp and re-synthesize
    java.nio.file.Files.writeString(marker, "v=0 base=stale copies=2\n")
    ScaleSynth.synthesize(spark, base, out, 2)
    assert(java.nio.file.Files.readString(marker).trim ==
      s"v=${ScaleSynth.SynthVersion} base=$base copies=2")
    // a heavy query runs against the synth dir end-to-end
    val df = SparkEntry.queries("q_jaccard_pairs")(spark, out)
    assert(df.count() > 0)
  }
}
