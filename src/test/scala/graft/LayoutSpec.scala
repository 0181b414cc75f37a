package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: bit-interleave correctness, the quadrant-locality
  * property that makes min/max pruning work on both dimensions, and the
  * writer round trip. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zorder2 interleaves bits: a→even positions, b→odd") {
    // a=5 (101₂) → positions 0,4 = 17; b=3 (011₂) → positions 1,3 = 10
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 3).as("z"))
      .head().getLong(0)
    assert(got == 27L)
    // SQL mirror produces the identical key for a grid of values
    val grid = (for (a <- 0 until 8; b <- 0 until 8) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val both = grid.select(col("a"), col("b"),
      Layout.zorder2(col("a"), col("b"), 3).as("z1"),
      expr(Layout.zorder2Sql("a", "b", 3)).as("z2"))
    assert(both.filter(col("z1") =!= col("z2")).count() == 0)
  }

  test("z-order sorts quadrant-contiguously: each quarter is one quadrant") {
    val pts = (for (a <- 0 until 8; b <- 0 until 8) yield (a, b))
    val keyed = pts.toDF("a", "b")
      .withColumn("z", Layout.zorder2(col("a"), col("b"), 3))
      .orderBy("z").collect()
    // 64 points → 4 contiguous runs of 16 = the 4 quadrants of the grid
    keyed.grouped(16).foreach { quad =>
      val as = quad.map(_.getAs[Int]("a"))
      val bs = quad.map(_.getAs[Int]("b"))
      assert(as.max - as.min <= 3 && bs.max - bs.min <= 3,
        s"quadrant spread too wide: a=[${as.min},${as.max}] b=[${bs.min},${bs.max}]")
    }
  }

  test("compact rewrites a many-small-file dir to the byte-targeted count") {
    val dir = graft.SessionScoped.scratchDir("graft_compact")
    val in = s"$dir/in"; val out = s"$dir/out"
    // 40 tiny files
    spark.range(20000).selectExpr("id", "id % 97 AS k")
      .repartition(40).write.parquet(in)
    val p = new org.apache.hadoop.fs.Path(in)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f => f.getPath.getName.endsWith(".parquet"))
    assert(files.length == 40)
    val total = files.map(_.getLen).sum
    // target half the total bytes → exactly 2 output files
    val n = graft.operators.Layout.compact(spark, in, out, targetBytes = total / 2 + 1,
      sortKeys = Seq("k"))
    assert(n == 2)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    assert(outFiles.length == 2)
    // content preserved exactly
    assert(spark.read.parquet(out).count() == 20000)
    assert(spark.read.parquet(out).agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) == (19999L * 20000L) / 2)
  }

  test("writeZOrdered files have tight bounding boxes in both dimensions") {
    val out = graft.SessionScoped.scratchDir("graft_zorder") + "/t"
    val grid = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    Layout.writeZOrdered(grid,
      Layout.zorder2(col("a"), col("b"), 5), out, numFiles = 4)
    val back = spark.read.parquet(out)
    assert(back.count() == 1024L)
    // per-file bounding boxes: a contiguous z-range clusters both dims, so
    // every file covers far less than the full 0..31 extent in each
    val spreads = back
      .groupBy(input_file_name().as("f"))
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .collect()
    assert(spreads.length == 4)
    spreads.foreach { r =>
      assert(r.getAs[Long]("sa") <= 23 && r.getAs[Long]("sb") <= 23,
        s"file bounding box too wide: ${r}")
    }
    // a single-dimension sort would leave the OTHER dimension unclustered:
    // every file would span the full 0..31 in b
    val sorted1d = grid.repartitionByRange(4, col("a"))
    val spread1d = sorted1d
      .groupBy(spark_partition_id().as("p"))
      .agg((max("b") - min("b")).as("sb")).collect()
    assert(spread1d.forall(_.getAs[Long]("sb") == 31L))
  }

  /** JVM-side mirror of TextAnalysis.hash60 (first 15 md5 hex chars as a
    * long) — the single-node spec the distributed rank must equal. */
  private def localHash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("shuffleShards: exact global (hash, key) rank, fixed-size shards") {
    val n = 1000L
    val df = spark.range(n).select(col("id"))
    val got = Layout.shuffleShards(df, col("id"), "t1:", shardSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == n)
    // single-node spec: sort by (hash60("t1:"+id), id), rank positionally
    val expected = (0L until n).map(id => (localHash60("t1:" + id), id))
      .sorted.map(_._2).zipWithIndex
      .map { case (id, rk) => (id, rk.toLong / 64, rk.toLong % 64) }.toSet
    assert(got.toSet == expected)
    // every shard except the last is exactly shardSize rows
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    val last = sizes.keys.max
    assert(sizes(last) == (n % 64).toInt)
    sizes.filter(_._1 != last).values.foreach(sz => assert(sz == 64))
  }

  test("shuffleShards: seeded (salt changes the permutation), bucket-count-invariant") {
    val df = spark.range(500).select(col("id"))
    val a = Layout.shuffleShards(df, col("id"), "sA:", 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a2 = Layout.shuffleShards(df, col("id"), "sA:", 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == a2) // reproducible
    val b = Layout.shuffleShards(df, col("id"), "sB:", 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a != b) // the salt IS the seed
    // nBuckets is an implementation knob: any power of two gives the
    // identical assignment (bucket = hash prefix, so order is unchanged)
    val few = Layout.shuffleShards(df, col("id"), "sA:", 32, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(few == a)
  }

  test("stratifiedShards: every shard carries the global mixture to ±2") {
    // 4 strata at 40/30/20/10% of 1000 rows; shards of 50 → proportional
    // counts 20/15/10/5 per shard, stride interleave guarantees ±2
    val df = spark.range(1000).select(col("id"),
      when(col("id") % 10 < 4, "a").when(col("id") % 10 < 7, "b")
        .when(col("id") % 10 < 9, "c").otherwise("d").as("src"))
    val out = Layout.stratifiedShards(df, col("id"), col("src"), "st:", 50)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 1000)
    // a permutation: every id once, every shard full (1000/50 = 20 shards)
    assert(out.map(_._1).toSet.size == 1000)
    val byShard = out.groupBy(_._3)
    assert(byShard.size == 20 && byShard.values.forall(_.length == 50))
    val expected = Map("a" -> 20, "b" -> 15, "c" -> 10, "d" -> 5)
    byShard.foreach { case (sh, rows) =>
      val mix = rows.groupBy(_._2).view.mapValues(_.length).toMap
      expected.foreach { case (s, e) =>
        val got = mix.getOrElse(s, 0)
        assert(math.abs(got - e) <= 2, s"shard $sh stratum $s: $got vs $e")
      }
    }
    // positions within a shard are 0..49 exactly
    byShard.values.foreach(rows =>
      assert(rows.map(_._4).sorted.sameElements(0L until 50L)))
    // deterministic, and bucket-count-invariant like the plain variant
    val again = Layout.stratifiedShards(df, col("id"), col("src"), "st:", 50,
      nBuckets = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet == out.toSet)
  }

  test("shuffleShards edges: empty input, shardSize=1, shardSize>n") {
    val empty = spark.range(0).select(col("id"))
    assert(Layout.shuffleShards(empty, col("id"), "e:", 8).count() == 0)
    // shardSize=1: shard == global rank, pos always 0
    val one = Layout.shuffleShards(spark.range(20).select(col("id")),
      col("id"), "e:", 1).collect()
    assert(one.map(_.getLong(1)).sorted.sameElements(0L until 20L))
    assert(one.forall(_.getLong(2) == 0L))
    // shardSize > n: everything lands in shard 0, pos is the full rank
    val big = Layout.shuffleShards(spark.range(20).select(col("id")),
      col("id"), "e:", 1000).collect()
    assert(big.forall(_.getLong(1) == 0L))
    assert(big.map(_.getLong(2)).sorted.sameElements(0L until 20L))
  }

  test("exportShards: one jsonl.gz file per shard; manifest matches read-back") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.SessionScoped.scratchDir("graft_export_spec") + "/e"
    Layout.exportShards(docs, col("doc_id"), "xs:", 64, col("text"), out)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // layout contract: shard=N dirs, each with exactly ONE .json.gz file
    val shardDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/shards"))
      .filter(_.isDirectory).map(_.getPath)
    assert(shardDirs.length == math.ceil(docs.count() / 64.0).toInt)
    shardDirs.foreach { d =>
      val dataFiles = fs.listStatus(d)
        .filter(_.getPath.getName.endsWith(".json.gz"))
      assert(dataFiles.length == 1, s"$d has ${dataFiles.length} data files")
    }
    // manifest row counts and position-weighted checksums equal a fresh
    // aggregate of the read-back shards — losslessness including order
    val back = graft.sources.Jsonl.read(spark, s"$out/shards",
      docs.schema.add("pos", org.apache.spark.sql.types.LongType))
    val agg = back.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum((col("pos") + 1) *
          pmod(graft.operators.TextAnalysis.hash60(col("text")), lit(1000003L)))
          .as("checksum"))
    val man = spark.read.parquet(s"$out/manifest")
    val joined = agg.join(man, "shard")
    assert(joined.count() == shardDirs.length)
    assert(joined.filter(col("n_rows") =!= col("m_n_rows") ||
      col("checksum") =!= col("m_checksum")).count() == 0)
    // every shard but the last is exactly shardSize rows
    val sizes = man.orderBy("shard").collect().map(_.getAs[Long]("m_n_rows"))
    assert(sizes.init.forall(_ == 64L) && sizes.last <= 64L)
  }
}
