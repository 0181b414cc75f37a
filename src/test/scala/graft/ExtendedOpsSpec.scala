package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, MediaDecode, MediaSynth, MediaWalk, Multimodal, Similarity, TextAnalysis}

class ExtendedOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup groups identical texts under the smallest doc_id") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val out = Dedup.exact(d).orderBy("canonical_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("shingles: 3-grams, short docs yield empty array not a crash") {
    val out = docs((1L, "a b c d"), (2L, "a b"))
      .select(col("doc_id"), TextAnalysis.shingles(col("text")).as("sh"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](1).isEmpty)
  }

  test("jaccard pairs: identical docs = 1.0; disjoint docs absent") {
    val d = docs(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
    val out = Dedup.jaccardPairs(d, 0.5).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2L, 1.0)))
  }

  test("minhash LSH finds the identical pair and verifies its jaccard") {
    val d = docs(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"), (3L, "q r s t u v w x y z"))
    val out = Dedup.minhashLshPairs(d, 0.5).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2L, 1.0)))
  }

  test("LSH recall audit: exact integer banding, exact dups always caught, " +
      "caught never exceeds true") {
    // pair (1,2): identical -> jaccard 1.0 -> band 20, and identical
    // signatures GUARANTEE a band collision (recall 1.0 provable, not
    // probabilistic). pair (3,4): 12-token docs sharing an 8-token
    // prefix -> 6 shared / 10+10 shingles -> jaccard 6/14, b20 =
    // 120 div 14 = 8. doc 5 is disjoint noise.
    val d = docs(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 c9 c10 c11 c12"),
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 x9 x10 x11 x12"),
      (5L, "q r s t u v w x y z"))
    val out = Dedup.lshRecallAudit(d).collect()
      .map(r => r.getAs[Long]("b20") -> r).toMap
    assert(out.contains(20L) && out.contains(8L))
    assert(out(20L).getAs[Long]("n_true") == 1L)
    assert(out(20L).getAs[Long]("n_caught") == 1L) // identical sigs collide
    assert(out(20L).getAs[Double]("recall") == 1.0)
    assert(out(20L).getAs[Double]("expected_recall") == 1.0)
    assert(out(8L).getAs[Long]("n_true") == 1L)
    // probabilistic catch for the mid-band pair, but NEVER more than true
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_caught") <= r.getAs[Long]("n_true"))
    }
    // the theoretical curve at band 8 midpoint: 1-(1-0.425^2)^8
    val exp8 = math.floor((1.0 - math.pow(1.0 - 0.425 * 0.425, 8)) * 10000 + 0.5) / 10000
    assert(out(8L).getAs[Double]("expected_recall") == exp8)
  }

  test("simhash: identical docs at hamming 0; pairs bounded by threshold") {
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "q r s t u v w x"))
    val out = Dedup.simhashPairs(d, 0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 2L, 0)))
  }

  test("cosine top-k: self excluded, scores ordered, deterministic ranks") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.7f, 0.7f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(emb, 1, 3).orderBy("rk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    assert(out.head.getDouble(2) == 1.0)
    assert(out.last.getDouble(2) == 0.0)
  }

  test("IVF assignment puts every vector in its nearest centroid's cluster") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfAssign(emb, 2).orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 1L)))
  }

  test("SRP-LSH dedup: subset of the brute-force baseline, exact cosines, high recall") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = pairs(Similarity.dedupPairs(emb, 0.4))
    val lsh = pairs(Similarity.dedupPairsLsh(emb, 0.4))
    assert(lsh.subsetOf(brute), "LSH must never invent a pair")
    assert(lsh.size >= (brute.size * 0.6).toInt,
      s"recall collapsed: ${lsh.size}/${brute.size}")
  }

  test("multi-index SimHash emits exactly simhashPairs' pair set") {
    // both are pigeonhole-COMPLETE for hamming <= maxHam (12x5-bit
    // verbatim bands vs 6x10-bit bands + Hamming-1 probes), and the
    // verify is the same exact bit_count — so the results must be
    // row-identical, at 32x the bucket count
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    val exact = pairs(Dedup.simhashPairs(docs, 10))
    val mp = pairs(Dedup.simhashPairsMp(docs, 10))
    assert(exact == mp, s"pair sets differ: ${exact.size} vs ${mp.size}")
    assert(exact.nonEmpty)
  }

  test("simhash classes: one row per component of the pair graph, linear output") {
    // classes must be exactly the connected components of the (complete)
    // pair set: sizes add up, class_id is each component's minimum, and a
    // width-k class is ONE row (the whole point vs Θ(k²) pairs)
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairRows = Dedup.simhashPairsMp(corpus, 10)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference components via tiny driver-side union-find on the spec data
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairRows.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.toSeq.groupBy(find).map { case (_, ms) =>
      (ms.min, ms.size.toLong)
    }.toSet
    val got = Dedup.simhashClasses(corpus, 10)
      .select("class_id", "n_members").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"classes differ: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty && got.forall(_._2 >= 2))
  }

  test("multi-probe LSH: superset of exact-band candidates, subset of brute force") {
    // at the 3-bit floor both tables use 6 bands over the SAME planes,
    // and Hamming-1 probing strictly widens each band's reach — so the
    // MP pair set must contain the exact-band set; exact cosine verify
    // keeps it inside the brute-force truth either way
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.dedupPairs(emb, 0.4))
    val lsh = pairs(Similarity.dedupPairsLsh(emb, 0.4))
    val mp = pairs(Similarity.dedupPairsLshMp(emb, 0.4))
    assert(lsh.subsetOf(mp), "Hamming-1 probing must not lose exact-band pairs")
    assert(mp.subsetOf(brute), "MP-LSH must never invent a pair")
  }

  test("multi-probe LSH holds design recall at max width with 5x fewer planes") {
    // same planted-near-dup corpus as the exact-band max-width spec: at
    // bandBits=24 the MP table runs 36 bands (864 planes) instead of 188
    // (4512) and must still find >=95% of the cos>=0.9 planted pairs
    val s = spark
    import s.implicits._
    def h(tag: String, i: Int, d: Int): Float = {
      val x = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag:$i:$d".getBytes("UTF-8"))
      ((((x(0) & 0xff) << 8) | (x(1) & 0xff)) - 32768) / 32768.0f
    }
    val nBase = 200
    val base = (0 until nBase).map(i => Array.tabulate(64)(d => h("b", i, d)))
    val jit = base.zipWithIndex.map { case (v, i) =>
      val w = Array.tabulate(64)(d => h("j", i, d))
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nw = math.sqrt(w.map(x => x.toDouble * x).sum)
      Array.tabulate(64)(d => (v(d) / nv + 0.25 * w(d) / nw).toFloat)
    }
    val emb = (base ++ jit).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val mp = Similarity.dedupPairsLshMp(emb, 0.9,
        bandBitsOpt = Some(Similarity.LshBandBitsMax))
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until nBase)
      .map(i => (i.toLong, (i + nBase).toLong))
      .filter { case (a, _) =>
        val va = base(a.toInt); val vb = jit(a.toInt)
        val dd = va.zip(vb).map { case (x, y) => x.toDouble * y }.sum
        val na = math.sqrt(va.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(vb.map(x => x.toDouble * x).sum)
        dd / (na * nb) >= 0.9
      }.toSet
    val found = mp.intersect(planted)
    assert(found.size >= math.ceil(planted.size * 0.95).toInt,
      s"MP design-point recall collapsed: ${found.size}/${planted.size}")
  }

  test("SRP-LSH recall holds at the WIDEST band operating point (bandBitsMax)") {
    // The adaptive band width ships operating points the default-sized spec
    // above never exercises (bandsFor returns the 3-bit floor at sf0.001,
    // and the natural sf0.001 corpus has NO cos ≥ 0.9 pair — max pair cos
    // is 0.479). Plant true near-dups: 200 deterministic hash-derived base
    // vectors, each with a jittered copy at cos ≥ 0.9, then force the
    // maximum width. lshBandsFor grows the band count with the width so a
    // design-point pair still collides somewhere with ≥ 99% probability —
    // recall must stay ≈ 1, not decay toward p^bandBits.
    val s = spark
    import s.implicits._
    def h(tag: String, i: Int, d: Int): Float = {
      val x = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag:$i:$d".getBytes("UTF-8"))
      ((((x(0) & 0xff) << 8) | (x(1) & 0xff)) - 32768) / 32768.0f
    }
    val nBase = 200
    val base = (0 until nBase).map(i => Array.tabulate(64)(d => h("b", i, d)))
    val jit = base.zipWithIndex.map { case (v, i) =>
      val w = Array.tabulate(64)(d => h("j", i, d))
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nw = math.sqrt(w.map(x => x.toDouble * x).sum)
      // v' = v/|v| + 0.25·w/|w| → cos(v, v') ≥ 1/sqrt(1.0625²) ≈ 0.94
      Array.tabulate(64)(d => (v(d) / nv + 0.25 * w(d) / nw).toFloat)
    }
    val emb = (base ++ jit).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val lsh = Similarity.dedupPairsLsh(emb, 0.9,
        bandBitsOpt = Some(Similarity.LshBandBitsMax))
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until nBase)
      .map(i => (i.toLong, (i + nBase).toLong))
      .filter { case (a, b) => // keep only pairs genuinely at cos >= 0.9
        val va = base(a.toInt); val vb = jit(a.toInt)
        val dd = va.zip(vb).map { case (x, y) => x.toDouble * y }.sum
        val na = math.sqrt(va.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(vb.map(x => x.toDouble * x).sum)
        dd / (na * nb) >= 0.9
      }.toSet
    assert(planted.size >= nBase / 2, s"jitter too hot: ${planted.size} planted")
    val found = lsh.intersect(planted)
    assert(found.size >= math.ceil(planted.size * 0.95).toInt,
      s"design-point recall collapsed at max width: " +
        s"${found.size}/${planted.size}")
  }

  test("multi-assignment IVF dedup: subset of brute force, strictly better recall than r=1") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.dedupPairs(emb, 0.4))
    val r1 = pairs(Similarity.dedupPairsIvf(emb, 0.4, 8))
    val r2 = pairs(Similarity.dedupPairsIvfMulti(emb, 0.4, 8, r = 2))
    assert(r2.subsetOf(brute), "blocking must never invent a pair")
    assert(r1.subsetOf(r2),
      "r=2 blocks are a superset of r=1 blocks, so found pairs must be too")
    assert(r2.size > r1.size,
      s"multi-assignment should close cross-cluster misses: r1=${r1.size} r2=${r2.size}")
    // emitted pairs are distinct even when co-resident in two clusters
    val rows = Similarity.dedupPairsIvfMulti(emb, 0.4, 8, r = 2)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size, "duplicate pair rows emitted")
  }

  test("ANN broadcast-probe entry points refuse a corpus-sized probe set") {
    val emb = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.cosineTopK(emb, Similarity.MaxBroadcastQueries + 1, 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.cosineTopKQ8(emb, Int.MaxValue, 5)
    }
    intercept[IllegalArgumentException] {
      // nQueries × nprobe is what actually broadcasts
      Similarity.ivfSearchMultiProbe(emb, 8, Similarity.MaxBroadcastQueries, 5, nprobe = 2)
    }
  }

  test("SRP planes are deterministic and balanced-ish") {
    val p1 = Similarity.srpPlanes(18, 64)
    val p2 = Similarity.srpPlanes(18, 64)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    val pos = p1.flatten.count(_ > 0)
    assert(pos > 18 * 64 / 4 && pos < 18 * 64 * 3 / 4, s"degenerate sign balance: $pos")
  }

  test("frame sampling keeps every stride-th stub frame, matches the codec offsets") {
    val d = docs((1L, "hello world"), (2L, "spark"))
    val media = Multimodal.mediaFromDocs(d)
    val frames = Multimodal.frameSample(media, stride = 2)
      .orderBy("doc_id", "frame_idx").collect()
    // 4 stub frames per doc, stride 2 keeps idx 0 and 2
    assert(frames.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"))).toSeq ==
      Seq((1L, 0), (1L, 2), (2L, 0), (2L, 2)))
    // offsets agree with the typed codec ("hello world" = 11 bytes → 0,2,5,8)
    val doc1 = frames.filter(_.getAs[Long]("doc_id") == 1L)
    assert(doc1.map(_.getAs[Long]("frame_offset")).toSeq == Seq(0L, 5L))
    val codec = Multimodal.StubCodec.decode("hello world".getBytes("UTF-8"))
    assert(doc1.map(_.getAs[Long]("frame_offset")).toSet
      .subsetOf(codec.frame_offsets.toSet))
    // the explode never carries the payload: sampled-frame table is metadata-only
    assert(!Multimodal.frameSample(media).columns.contains("payload"))
  }

  test("multimodal: stub codec agrees with the columnar feature path") {
    val d = docs((1L, "hello world"), (2L, "spark"))
    val media = Multimodal.mediaFromDocs(d.withColumn("lang", lit("en")))
    val cols = Multimodal.features(media).orderBy("doc_id").collect()
    val typed = Multimodal.decodeBatches(spark, media.orderBy("doc_id")).collect()
      .sortBy(_.n_bytes)
    assert(cols.map(_.getAs[Long]("n_bytes")).sorted.toSeq == typed.map(_.n_bytes).sorted.toSeq)
    val h = cols.find(_.getLong(0) == 1L).get
    assert(h.getAs[Long]("n_bytes") == 11L)
    assert(h.getAs[String]("frame_offsets") == "0,2,5,8")
    val t = typed.find(_.n_bytes == 11L).get
    assert(t.frame_offsets == Seq(0L, 2L, 5L, 8L))
  }

  test("containment: contained doc scores 1.0 toward its container, not vice versa") {
    // doc 2's shingle set is a strict subset of doc 1's; doc 3 is disjoint
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e"), (3L, "q r s t u"))
    val out = Dedup.containmentPairs(d, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((2L, 1L, 1.0)))
    // at a lower threshold the reverse direction appears with |Sa∩Sb|/|S1|
    val lo = Dedup.containmentPairs(d, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lo == Set((2L, 1L, 1.0), (1L, 2L, 0.5)))
  }

  test("containment is always >= jaccard for the same pair") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val jac = Dedup.jaccardPairs(docs, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val con = Dedup.containmentPairs(docs, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    jac.foreach { case ((a, b), j) =>
      val c = math.max(con.getOrElse((a, b), 0.0), con.getOrElse((b, a), 0.0))
      assert(c >= j - 1e-9, s"pair ($a,$b): containment $c < jaccard $j")
    }
  }

  test("knn classify: majority vote with deterministic tiebreaks") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 9),
      (1L, Array(1.0f, 0.01f), 5),
      (2L, Array(1.0f, 0.02f), 5),
      (3L, Array(0.9f, 0.1f), 7),
      (4L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, 1, 3).collect()
    assert(out.length == 1)
    val r = out.head
    // 3 nearest to probe 0 are {1, 2, 3} -> labels {5, 5, 7} -> majority 5
    assert(r.getInt(1) == 9 && r.getInt(2) == 5 && r.getLong(3) == 2L)
    assert(!r.getBoolean(4))
  }

  test("bm25 matches a hand-computed reference on a tiny corpus") {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val d = docs((1L, "x x y a"), (2L, "x a b c"), (3L, "a b c d"))
    val out = TextAnalysis.bm25(d, Seq("x", "y"), 10)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // N=3, avgdl=4, dl=4 everywhere => denom = tf + k1
    val idfX = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    val idfY = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5))
    val d1 = r4(idfX * (2 * 2.2) / (2 + 1.2) + idfY * (1 * 2.2) / (1 + 1.2))
    val d2 = r4(idfX * (1 * 2.2) / (1 + 1.2))
    assert(out.toSeq == Seq((1L, 2L, d1, 1), (2L, 1L, d2, 2)))
  }

  test("fingerprint is order-sensitive") {
    val out = TextAnalysis.fingerprint(docs((1L, "a b c"), (2L, "c b a")))
      .select("fingerprint").collect().map(_.getLong(0))
    assert(out(0) != out(1))
  }

  test("quality score stays in [0,1] on the real corpus") {
    val st = TextAnalysis.stats(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    assert(st.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("semDedup keeps the farthest-from-centroid member per class, ties to min id") {
    import graft.operators.Similarity
    val s = spark
    import s.implicits._
    def v(weights: (Int, Double)*): Array[Float] = {
      val a = new Array[Float](64)
      weights.foreach { case (d, x) => a(d) = x.toFloat }
      a
    }
    // seeds (vec_id < 2) anchor the two Lloyd clusters: id0 = e0 (class A),
    // id1 = e2 (class B). Class A = four e0 copies + one tilted member —
    // the tilted one ends FARTHEST from the trained centroid (≈ the group
    // mean, e0-dominant), so SemDeDup must keep IT and drop the copies.
    // Class B = two identical vectors (equal cscore → min-id tiebreak).
    // id7 is orthogonal to everything: a singleton, kept.
    val emb = Seq(
      (0L, v(0 -> 1.0)), (1L, v(2 -> 1.0)),
      (2L, v(0 -> 1.0)), (3L, v(0 -> 1.0)), (4L, v(0 -> 1.0)),
      (5L, v(0 -> 0.8, 1 -> 0.6)),
      (6L, v(2 -> 1.0)),
      (7L, v(3 -> 1.0))).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, tau = 0.4, nCentroids = 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("component"), r.getAs[Boolean]("keep"))).toMap
    assert(Seq(0L, 2L, 3L, 4L, 5L).forall(out(_)._1 == 0L), s"got $out")
    assert(out(1L)._1 == 1L && out(6L)._1 == 1L, s"got $out")
    assert(out(7L) == ((7L, true)), s"got $out") // singleton kept
    // farthest-from-centroid wins class A; the identical e0 copies drop
    assert(out(5L)._2, s"got $out")
    Seq(0L, 2L, 3L, 4L).foreach(id => assert(!out(id)._2, s"id $id kept: $out"))
    // min-id tiebreak on the identical pair
    assert(out(1L)._2 && !out(6L)._2, s"got $out")
    // exactly one keeper per component
    val perComp = out.values.groupBy(_._1).map { case (c, vs) =>
      c -> vs.count(_._2) }
    assert(perComp.values.forall(_ == 1), s"got $perComp")
  }
}
