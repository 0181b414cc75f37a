package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaDecode, MediaSynth, MediaWalk, Multimodal}

/** Real-codec contract of [[MediaDecode.decodeBmp]]: javax.imageio must
  * agree with the codegen header walk on valid payloads, and corrupt
  * payloads must FLAG (decoded_ok=false), never crash the scan — the
  * quarantine semantics every media query here relies on. */
class MediaDecodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")

  test("imageio decode agrees with the header walk on every valid BMP") {
    val media = MediaSynth.synthBmp(docs(64))
    val joined = MediaWalk.parseBmp(media)
      .select(col("doc_id"), col("width"), col("height"))
      .join(MediaDecode.decodeBmp(media), Seq("doc_id"))
    assert(joined.count() == 64)
    val bad = joined.filter(!col("decoded_ok") ||
      col("dec_width") =!= col("width") ||
      col("dec_height") =!= col("height")).count()
    assert(bad == 0)
  }

  test("javax.sound decode agrees with the WAV walk and sample math") {
    val media = MediaSynth.synthWav(docs(32))
    val joined = MediaWalk.parseWav(media)
      .select(col("doc_id"), col("channels"), col("sample_rate"), col("data_size"))
      .join(MediaDecode.decodeWav(media), Seq("doc_id"))
    val bad = joined.filter(!col("decoded_ok") ||
      col("a_channels") =!= col("channels") ||
      col("a_rate") =!= col("sample_rate") ||
      col("a_samples") =!= (col("data_size") / 2).cast("long") ||
      col("a_first") =!= 23130L || col("a_peak") =!= 23130L).count()
    assert(bad == 0)
  }

  test("corrupt WAV payloads flag, never throw") {
    val media = MediaSynth.synthWav(docs(4))
    val corrupt = media.withColumn("payload",
      when(col("doc_id") === 0, expr("substring(payload, 1, 10)"))  // truncated
        .when(col("doc_id") === 1,
          expr("concat(X'DEADBEEF', substring(payload, 5))"))       // bad magic
        .otherwise(col("payload")))
    val out = MediaDecode.decodeWav(corrupt).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!out(0L) && !out(1L) && out(2L) && out(3L))
  }

  test("mutation fuzz: byte-flipped payloads never crash either codec") {
    // deterministic mutation sweep (seeded, like MediaWalkSpec's parser
    // fuzz — the r8 version of this found a real ANSI decode crash):
    // every row gets one random byte overwritten; the decoders must
    // flag-or-succeed on all of them, never throw
    val n = 200
    val base = MediaSynth.synthBmp(docs(n))
      .unionByName(MediaSynth.synthWav(docs(n))
        .withColumn("doc_id", col("doc_id") + n))
    val mutated = base.withColumn("payload", expr(
      """concat(
        |  substring(payload, 1, CAST(pmod(hash(doc_id, 1), octet_length(payload)) AS INT)),
        |  unhex(lpad(hex(pmod(hash(doc_id, 2), 256)), 2, '0')),
        |  substring(payload, CAST(pmod(hash(doc_id, 1), octet_length(payload)) AS INT) + 2))
        |""".stripMargin))
    // count() forces both full decode passes; any throw fails the test
    assert(MediaDecode.decodeBmp(mutated).count() == 2L * n)
    assert(MediaDecode.decodeWav(mutated).count() == 2L * n)
  }

  test("corrupt payloads flag, never throw") {
    val media = MediaSynth.synthBmp(docs(6))
    val corrupt = media.withColumn("payload",
      when(col("doc_id") === 0, expr("substring(payload, 1, 20)")) // truncated
        .when(col("doc_id") === 1, lit(Array[Byte]()))             // empty
        .when(col("doc_id") === 2,
          expr("concat(X'FFFF', substring(payload, 3))"))          // bad magic
        .otherwise(col("payload")))
    val out = MediaDecode.decodeBmp(corrupt).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!out(0L) && !out(1L) && !out(2L))
    assert(out(3L) && out(4L) && out(5L))
  }

  test("aHash: identical renders hash equal, families differ, corrupt flags") {
    // doc ids d and d+64 share (family, perturbation) -> identical image
    // -> identical hash; different families must differ somewhere
    val media = MediaDecode.synthBmpPattern(docs(130))
    val h = MediaDecode.imageAHash(media).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(h.values.forall(_._1), "every synthesized BMP must decode")
    assert(h.values.forall(_._2.length == 64))
    for (d <- 0L until 64L) assert(h(d)._2 == h(d + 64)._2,
      s"doc $d and ${d + 64} render identically but hash differently")
    // the 16 families produce at least 8 distinct hash shapes
    assert(h.values.map(_._2).toSet.size >= 8)
    // perturbation siblings (same family) stay within the banded-join
    // reach used by q_image_neardup... or at least differ only mildly
    val fam0 = (0 to 3).map(p => h(0L + 16L * p)._2)
    val hd = fam0.combinations(2).map { case Seq(a, b) =>
      a.zip(b).count { case (x, y) => x != y } }.max
    assert(hd <= 16, s"perturbation siblings drifted too far ($hd bits)")
    // corrupt payload: truncated bytes flag, never throw
    val corrupt = media.limit(1)
      .select(col("doc_id"), expr("substring(payload, 1, 20)").as("payload"))
    val c = MediaDecode.imageAHash(corrupt).head()
    assert(!c.getBoolean(1) && c.getString(2).isEmpty)
  }

  test("pHash: brightness-invariant where aHash is not, corrupt flags") {
    // two hand-built BMPs identical up to a CONSTANT +40 gray shift (no
    // mod-256 wraparound anywhere): the shift lives entirely in the
    // discarded DC coefficient, so the pHashes must be IDENTICAL while
    // aHash's global mean moves with the shift
    def bmp(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 16; y <- 0 until 16) {
        val g = (x * 7 + y * 11) % 180 + shift // <= 219 + 40 < 256: no wrap
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", out)
      out.toByteArray
    }
    val media = Seq((0L, "image/bmp", bmp(0)), (1L, "image/bmp", bmp(40)))
      .toDF("doc_id", "media_type", "payload")
    val p = MediaDecode.imagePHash(media).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(p(0L)._1 && p(1L)._1)
    assert(p(0L)._2.length == 63)
    assert(p(0L)._2 == p(1L)._2, "constant gray shift changed the pHash")
    // ...and it is not degenerate: bits carry signal both ways
    assert(p(0L)._2.contains('1') && p(0L)._2.contains('0'))
    // same two images through aHash: the threshold stays relative to the
    // shifted mean (bits equal) but mean_gray must MOVE — the DC term
    // pHash discards is exactly what aHash keeps
    val a = MediaDecode.imageAHash(media).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("mean_gray")).toMap
    assert(a(1L) == a(0L) + 40)
    // patterned corpus: identical renders hash equal, families differ
    val hp = MediaDecode.imagePHash(
        MediaDecode.synthBmpPattern(docs(128))).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(hp.values.forall(_._1))
    for (d <- 0L until 64L) assert(hp(d)._2 == hp(d + 64)._2)
    assert(hp.values.map(_._2).toSet.size >= 8)
    // corrupt payload: flag, never throw
    val c = MediaDecode.imagePHash(
      media.limit(1).select(col("doc_id"),
        expr("substring(payload, 1, 20)").as("payload"))).head()
    assert(!c.getBoolean(1) && c.getString(2).isEmpty)
  }

  test("audio features over the patterned PCM match the closed form") {
    val s = spark
    import s.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val out = MediaDecode.audioFeatures(MediaSynth.synthWavPattern(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 40 && out.values.forall(_.getBoolean(1)),
      "every patterned WAV must really decode")
    for (d <- 0L until 40L) {
      val n = ((d % 100) + 1) * (1 + d % 2)
      val samples = (0L until n).map(k => ((d % 16) * 371 + k * 97) % 2048 - 1024)
      val zc = samples.sliding(2).count(p => p.size == 2 && p(0) * p(1) < 0)
      val rms = math.sqrt(samples.map(v => v * v).sum.toDouble / n)
      val r = out(d)
      assert(r.getLong(2) == n, s"doc $d n_samples")
      assert(r.getLong(3) == samples.map(math.abs).max, s"doc $d peak")
      assert(r.getLong(4) == zc, s"doc $d zero-crossings")
      assert(r.getLong(5) == math.floor(rms * 10000 + 0.5).toLong, s"doc $d rms")
    }
    // corrupt payload: flags, never throws
    val c = MediaDecode.audioFeatures(
      Seq((0L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")).head()
    assert(!c.getBoolean(1) && c.getLong(2) == -1L)
  }

  test("box-average resize: geometry, ahash-consistent means, corrupt flags") {
    val s = spark
    import s.implicits._
    val docs = (0L until 64L).toDF("doc_id")
    val bmps = MediaDecode.synthBmpPattern(docs)
    val out = MediaDecode.imageResize(bmps, factor = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 64 && out.values.forall(_.getBoolean(1)))
    assert(out.values.forall(r => r.getInt(2) == 8 && r.getInt(3) == 8))
    assert(out.values.forall(_.getString(4).matches("[0-9a-f]{32}")))
    // the resized blocks are the SAME 2x2 box averages imageAHash folds,
    // so the means must agree exactly — a cross-operator pin of the
    // block arithmetic (the full per-pixel pin is the DuckDB oracle)
    val ahashMeans = MediaDecode.imageAHash(bmps).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (d <- 0L until 64L)
      assert(out(d).getLong(5) == ahashMeans(d), s"doc $d mean")
    // all 64 distinct pattern images resize to distinct pixel digests
    assert(out.values.map(_.getString(4)).toSet.size == 64)
    // factor 1 = identity-resolution pass; still geometry 16x16
    val id1 = MediaDecode.imageResize(bmps, factor = 1).head()
    assert(id1.getInt(2) == 16 && id1.getInt(3) == 16)
    // corrupt payload: flags, never throws
    val c = MediaDecode.imageResize(
      Seq((0L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")).head()
    assert(!c.getBoolean(1) && c.getInt(2) == -1)
  }

  test("real PNG/JPEG round trips hold their decode contracts") {
    val s = spark
    import s.implicits._
    val docs = (0L until 80L).toDF("doc_id")
    // PNG is lossless: decoded-pixel aHash equals the BMP path's (same
    // pattern, different container+codec), so the closed-form oracle
    // covers both
    val viaPng = MediaDecode.imageAHash(
        MediaDecode.synthImageReal(docs, "png"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    val viaBmp = MediaDecode.imageAHash(
        MediaDecode.synthBmpPattern(docs))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(viaPng.values.forall(_._1), "every real PNG must decode")
    for (d <- 0L until 80L)
      assert(viaPng(d)._2 == viaBmp(d), s"doc $d: PNG hash != BMP hash")
    // JPEG is lossy but bounded: geometry exact, MAE within contract
    val jpeg = MediaDecode.decodeImageVsPattern(
        MediaDecode.synthImageReal(docs, "jpeg")).collect()
    assert(jpeg.forall(_.getBoolean(1)), "every real JPEG must decode")
    assert(jpeg.forall(r => r.getLong(2) == 16 && r.getLong(3) == 16))
    assert(jpeg.forall(_.getBoolean(4)), "JPEG MAE out of contract")
    // the contract bound derives from the enumerated worst case on THIS
    // JVM's encoder tables: sane magnitude (quantization noise, not a
    // decode bug), and enough headroom that the bound still separates
    // the bug signals it exists to catch (channel swap ≈ tens of levels)
    val worst = MediaDecode.jpegWorstCaseMae
    assert(worst > 0.0 && worst < 20.0,
      s"enumerated JPEG worst-case MAE $worst outside the plausible band")
    assert(worst * MediaDecode.JpegMaeHeadroom < 30.0,
      "derived bound too slack to catch channel-swap-scale corruption")
    // corrupt payload: flags, never throws
    val c = MediaDecode.decodeImageVsPattern(
      Seq((0L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")).head()
    assert(!c.getBoolean(1) && !c.getBoolean(4))
  }
}
