package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{MediaDecode, MediaSynth, MediaWalk, Multimodal}

/** Byte-level pins for the JPEG marker-segment walk.
  *
  * The oracle queries verify synthJpeg ∘ parseJpeg against the shared
  * doc_id generation rule — both sides of that check derive from the same
  * arithmetic, so a shared misunderstanding of the FORMAT would cancel
  * out. This spec parses files built byte-by-byte, independently of
  * synthJpeg, including the adversarial cases the corpus generator never
  * produces: a phantom EOI straddling a byte boundary inside entropy data
  * and an FF00-stuffed byte (both must NOT terminate the scan).
  */
class MediaWalkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def seg(marker: Int, data: Array[Byte]): Array[Byte] =
    Array(0xFF.toByte, marker.toByte,
      ((data.length + 2) >> 8).toByte, ((data.length + 2) & 0xFF).toByte) ++ data

  /** Hand-built baseline JPEG: SOI, APP0(JFIF), APP1 (5 data bytes), DQT,
    * SOF0 (h=123, w=456, 3 components), SOS, 7 entropy bytes, EOI. The
    * entropy span contains 2F FD 9A (hex "2FFD9A" — a misaligned FFD9)
    * and an FF 00 stuffed pair. */
  private def handBuiltJpeg: Array[Byte] = {
    val app0 = seg(0xE0, "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 0x48, 0, 0x48, 0, 0))
    val app1 = seg(0xE1, Array[Byte](1, 2, 3, 4, 5))
    val dqt = seg(0xDB, 0.toByte +: Array.fill(64)(0x10.toByte))
    val sof0 = seg(0xC0, Array[Byte](8, 0, 123, 1, 200.toByte, 3, // 456 = 0x01C8
      1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    val sos = seg(0xDA, Array[Byte](3, 1, 0, 2, 0, 3, 0, 0, 0x3F, 0))
    val entropy = Array[Byte](0x11, 0x2F, 0xFD.toByte, 0x9A.toByte,
      0xFF.toByte, 0x00, 0x22)
    Array(0xFF.toByte, 0xD8.toByte) ++ app0 ++ app1 ++ dqt ++ sof0 ++ sos ++
      entropy ++ Array(0xFF.toByte, 0xD9.toByte)
  }

  private def parseOne(bytes: Array[Byte]) = {
    val s = spark
    import s.implicits._
    MediaWalk.parseJpeg(
      Seq((1L, "image/jpeg", bytes)).toDF("doc_id", "media_type", "payload"))
      .collect().head
  }

  test("hand-built JPEG parses: SOF0 fields, chain walk, aligned EOI scan") {
    val r = parseOne(handBuiltJpeg)
    assert(r.getAs[Boolean]("is_jpeg"))
    assert(r.getAs[Long]("width") == 456L)
    assert(r.getAs[Long]("height") == 123L)
    assert(r.getAs[Long]("n_components") == 3L)
    assert(r.getAs[Long]("n_segments") == 5L)
    assert(r.getAs[String]("marker_types") == "E0,E1,DB,C0,DA")
    assert(r.getAs[Boolean]("marker_ok"))
    // the misaligned 2F[FD9A] phantom and the FF00 stuffing were skipped:
    // the scan closed on the REAL EOI after all 7 entropy bytes
    assert(r.getAs[Long]("entropy_len") == 7L)
    assert(r.getAs[Boolean]("eoi_ok"))
  }

  test("walk stops on a broken marker prefix; scan fails without EOI") {
    val good = handBuiltJpeg
    // zero out APP1's 0xFF prefix (offset = 2 + 18)
    val badMarker = good.clone(); badMarker(20) = 0x00
    val r1 = parseOne(badMarker)
    assert(r1.getAs[Boolean]("is_jpeg") && !r1.getAs[Boolean]("marker_ok"))
    assert(r1.getAs[Long]("n_segments") == 1L) // only APP0 was walked
    // drop the EOI: chain fine, entropy scan finds no end marker
    val truncated = good.dropRight(2)
    val r2 = parseOne(truncated)
    assert(r2.getAs[Boolean]("marker_ok") && !r2.getAs[Boolean]("eoi_ok"))
    assert(r2.getAs[Long]("entropy_len") == -1L)
  }

  /** Hand-built EXIF JPEG in MM (big-endian) byte order: APP1 with
    * 'Exif\0\0', TIFF header, IFD0 with 2 entries — Orientation BEFORE
    * ImageWidth is deliberately not the synth rule's tag set/order
    * coverage: only width + orientation, orientation value 6. */
  private def handBuiltExifJpeg: Array[Byte] = {
    def be16(v: Int) = Array((v >> 8).toByte, (v & 0xFF).toByte)
    def be32(v: Int) = Array((v >> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val ifd = be16(2) ++
      (be16(0x0100) ++ be16(4) ++ be32(1) ++ be32(77)) ++          // width 77
      (be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(6) ++ be16(0)) ++ // orient 6
      be32(0)
    val tiff = "MM".getBytes("US-ASCII") ++ be16(42) ++ be32(8) ++ ifd
    val app1 = seg(0xE1, "Exif".getBytes("US-ASCII") ++
      Array[Byte](0, 0) ++ tiff)
    val sof0 = seg(0xC0, Array[Byte](8, 0, 50, 0, 77, 1, 1, 0x11, 0))
    val sos = seg(0xDA, Array[Byte](1, 1, 0, 0, 0x3F, 0))
    Array(0xFF.toByte, 0xD8.toByte) ++ app1 ++ sof0 ++ sos ++
      Array[Byte](0x25, 0x25, 0x25) ++ Array(0xFF.toByte, 0xD9.toByte)
  }

  test("hand-built big-endian EXIF parses: byte order, tags, SOF0 cross-check") {
    val s = spark
    import s.implicits._
    val r = MediaWalk.parseExif(
      Seq((1L, "image/jpeg", handBuiltExifJpeg))
        .toDF("doc_id", "media_type", "payload"))
      .collect().head
    assert(r.getAs[Boolean]("has_exif"))
    assert(r.getAs[String]("byte_order") == "MM")
    assert(r.getAs[Long]("n_tags") == 2L)
    assert(r.getAs[Long]("orientation") == 6L)
    assert(r.getAs[Long]("exif_width") == 77L)
    assert(r.getAs[Long]("exif_height") == -1L) // no ImageLength tag
    // width matches SOF0 (77) but height tag is absent → no dims_match
    assert(!r.getAs[Boolean]("dims_match"))
    // no 0x8769 pointer tag anywhere in IFD0
    assert(!r.getAs[Boolean]("has_sub_ifd"))
    assert(!r.getAs[Boolean]("sub_ok"))
    assert(r.getAs[Long]("iso") == -1L)
  }

  /** Hand-built MM-order EXIF whose IFD0 carries the ExifIFD pointer
    * (0x8769): 3 entries (width, orientation, pointer), sub-IFD at TIFF
    * offset 50 with 2 entries — ISOSpeedRatings 320 (SHORT) and
    * PixelXDimension 77 (LONG). `subPtr` overrides the pointer value to
    * build the dangling-pointer quarantine case. */
  private def handBuiltExifSubJpeg(subPtr: Int = 50,
      padTiff: Int = 0): Array[Byte] = {
    def be16(v: Int) = Array((v >> 8).toByte, (v & 0xFF).toByte)
    def be32(v: Int) = Array((v >> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val ifd0 = be16(3) ++
      (be16(0x0100) ++ be16(4) ++ be32(1) ++ be32(77)) ++           // width 77
      (be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(6) ++ be16(0)) ++ // orient 6
      (be16(0x8769) ++ be16(4) ++ be32(1) ++ be32(subPtr)) ++       // ExifIFD →
      be32(0)                                           // IFD0 ends at 8+42=50
    val sub = be16(2) ++
      (be16(0x8827) ++ be16(3) ++ be32(1) ++ be16(320) ++ be16(0)) ++ // ISO 320
      (be16(0xA002) ++ be16(4) ++ be32(1) ++ be32(77)) ++ // PixelXDimension 77
      be32(0)
    val tiff = "MM".getBytes("US-ASCII") ++ be16(42) ++ be32(8) ++ ifd0 ++
      sub ++ Array.fill[Byte](padTiff)(0)
    val app1 = seg(0xE1, "Exif".getBytes("US-ASCII") ++
      Array[Byte](0, 0) ++ tiff)
    val sof0 = seg(0xC0, Array[Byte](8, 0, 50, 0, 77, 1, 1, 0x11, 0))
    val sos = seg(0xDA, Array[Byte](1, 1, 0, 0, 0x3F, 0))
    Array(0xFF.toByte, 0xD8.toByte) ++ app1 ++ sof0 ++ sos ++
      Array[Byte](0x25, 0x25, 0x25) ++ Array(0xFF.toByte, 0xD9.toByte)
  }

  test("hand-built sub-IFD follows the 0x8769 pointer; dangling pointer quarantines") {
    val s = spark
    import s.implicits._
    def parse(bytes: Array[Byte]) = MediaWalk.parseExif(
      Seq((1L, "image/jpeg", bytes)).toDF("doc_id", "media_type", "payload"))
      .collect().head
    val ok = parse(handBuiltExifSubJpeg())
    assert(ok.getAs[Boolean]("has_exif") && ok.getAs[Long]("n_tags") == 3L)
    assert(ok.getAs[Boolean]("has_sub_ifd"))
    assert(ok.getAs[Boolean]("sub_ok"))
    assert(ok.getAs[Long]("n_sub_tags") == 2L)
    assert(ok.getAs[Long]("iso") == 320L)
    assert(ok.getAs[Long]("pixel_width") == 77L)
    assert(ok.getAs[Long]("pixel_height") == -1L) // no PixelYDimension tag
    assert(!ok.getAs[Boolean]("pixel_dims_match")) // height tag absent

    // pointer past the APP1's declared extent: the parser must refuse to
    // read the next segment's bytes as a sub-IFD
    val dangling = parse(handBuiltExifSubJpeg(subPtr = 9999))
    assert(dangling.getAs[Boolean]("has_exif"))
    assert(dangling.getAs[Boolean]("has_sub_ifd")) // the pointer tag IS there
    assert(!dangling.getAs[Boolean]("sub_ok"))     // ...but leads nowhere valid
    assert(dangling.getAs[Long]("n_sub_tags") == -1L)
    assert(dangling.getAs[Long]("iso") == -1L)
    assert(dangling.getAs[Long]("pixel_width") == -1L)
    assert(!dangling.getAs[Boolean]("pixel_dims_match"))

    // pointer INSIDE the APP1 but with a count that cannot fit: refused too
    val overrun = parse(handBuiltExifSubJpeg(subPtr = 70))
    assert(!overrun.getAs[Boolean]("sub_ok"))

    // pointer in the declared-but-uncaptured GAP: the APP1 declares more
    // TIFF bytes than the parser's fixed-length capture holds, and the
    // pointer lands past the capture edge — a half-readable count there
    // must be refused, not parsed from a hex fragment (the bound is
    // least(declared, captured))
    val gap = parse(handBuiltExifSubJpeg(subPtr = 103, padTiff = 60))
    assert(gap.getAs[Boolean]("has_exif"))
    assert(gap.getAs[Boolean]("has_sub_ifd"))
    assert(!gap.getAs[Boolean]("sub_ok"))
    assert(gap.getAs[Long]("n_sub_tags") == -1L)
  }

  // ---- MP4 nested-box walk: hand-built layouts the synth rule never
  // produces (mdat BEFORE moov; an unknown 'free' box inside trak ahead
  // of tkhd; a size chain running past end-of-file)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val size = payload.length + 8
    Array((size >> 24).toByte, ((size >> 16) & 0xFF).toByte,
      ((size >> 8) & 0xFF).toByte, (size & 0xFF).toByte) ++
      tpe.getBytes("US-ASCII") ++ payload
  }

  private def be32(v: Long) = Array((v >> 24).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def handBuiltMp4: Array[Byte] = {
    val matrix = be32(0x10000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x10000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L)
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(600) ++ be32(12345) ++ be32(0x10000L) ++
      Array.fill[Byte](10)(0) ++ matrix ++ Array.fill[Byte](24)(0) ++ be32(3))
    val tkhd = box("tkhd", be32(0xF) ++ be32(0) ++ be32(0) ++
      be32(7) ++ be32(0) ++ be32(12345) ++ Array.fill[Byte](8)(0) ++
      Array.fill[Byte](8)(0) ++ matrix ++ be32(640L << 16) ++ be32(360L << 16))
    // an unrelated 'free' box sits BEFORE tkhd inside trak: the level
    // walk must skip it by size, not assume tkhd is the first child
    val trak = box("trak", box("free", Array.fill[Byte](5)(0x55)) ++ tkhd)
    val moov = box("moov", mvhd ++ trak)
    val ftyp = box("ftyp", "mp42".getBytes("US-ASCII") ++ be32(0) ++
      "mp42".getBytes("US-ASCII"))
    val mdat = box("mdat", Array.fill[Byte](9)(0x77))
    ftyp ++ mdat ++ moov // mdat BEFORE moov: legal, synth never does it
  }

  test("hand-built MP4 parses: nested walk, out-of-order boxes, skipped free box") {
    val s = spark
    import s.implicits._
    val r = graft.operators.MediaWalk.parseMp4(
      Seq((1L, "video/mp4", handBuiltMp4)).toDF("doc_id", "media_type", "payload"))
      .collect().head
    assert(r.getAs[Boolean]("is_mp4"))
    assert(r.getAs[String]("major_brand") == "mp42")
    assert(r.getAs[Long]("n_top_boxes") == 3L)
    assert(r.getAs[Boolean]("sizes_ok"))
    assert(r.getAs[Long]("timescale") == 600L)
    assert(r.getAs[Long]("duration_ms") == 12345L)
    assert(r.getAs[Long]("track_id") == 7L)
    assert(r.getAs[Long]("width") == 640L)
    assert(r.getAs[Long]("height") == 360L)
    assert(r.getAs[Long]("mdat_len") == 9L)
  }

  test("MP4 size chain running past end-of-file fails sizes_ok") {
    val s = spark
    import s.implicits._
    val good = handBuiltMp4
    val truncated = good.dropRight(20) // moov's declared size now overruns
    val r = graft.operators.MediaWalk.parseMp4(
      Seq((1L, "video/mp4", truncated)).toDF("doc_id", "media_type", "payload"))
      .collect().head
    assert(r.getAs[Boolean]("is_mp4")) // ftyp intact
    assert(!r.getAs[Boolean]("sizes_ok"))
  }

  test("fuzz: every media parser survives random byte mutations — flags, never throws") {
    // the never-crash-on-corrupt-input contract a 100 TB ingest needs:
    // random substitutions/truncations of VALID payloads (including
    // truncation to zero bytes) must flow through every parser as
    // ok=false / -1-field rows, never as a thrown expression error.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    val docs = (0L until 8L).toDF("doc_id")
    def payloads(df: org.apache.spark.sql.DataFrame): Seq[Array[Byte]] =
      df.select("payload").collect().map(_.getAs[Array[Byte]](0)).toSeq
    def mutantGen(base: Array[Byte]): Gen[Array[Byte]] = for {
      k <- Gen.chooseNum(1, 8)
      subs <- Gen.listOfN(k, Gen.zip(
        Gen.chooseNum(0, base.length - 1), Gen.chooseNum(0, 255)))
      truncate <- Gen.oneOf(true, false)
      newLen <- Gen.chooseNum(0, base.length)
    } yield {
      val m = base.clone()
      subs.foreach { case (pos, b) => m(pos) = b.toByte }
      if (truncate) m.take(newLen) else m
    }
    val cases: Seq[(String, Seq[Array[Byte]],
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame, String)] = Seq(
      ("wav", payloads(MediaSynth.synthWav(docs)), MediaWalk.parseWav, "is_wav"),
      ("bmp", payloads(MediaSynth.synthBmp(docs)), MediaWalk.parseBmp, "is_bmp"),
      ("png", payloads(MediaSynth.synthPng(docs)), MediaWalk.parsePng, "is_png"),
      ("jpeg", payloads(MediaSynth.synthJpeg(docs)), MediaWalk.parseJpeg, "is_jpeg"),
      ("exif", payloads(MediaSynth.synthJpegExif(docs)), MediaWalk.parseExif, "has_exif"),
      ("mp4", payloads(MediaSynth.synthMp4(docs)), MediaWalk.parseMp4, "is_mp4"))
    cases.foreach { case (fmt, bases, parse, flagCol) =>
      val mutants = bases.zipWithIndex.flatMap { case (base, bi) =>
        (0 until 5).map { mi =>
          mutantGen(base).pureApply(Gen.Parameters.default,
            Seed(fmt.hashCode.toLong * 1000 + bi * 10 + mi))
        }
      }
      val rows = parse(mutants.zipWithIndex
          .map { case (bytes, i) => (i.toLong, s"media/$fmt", bytes) }
          .toDF("doc_id", "media_type", "payload"))
        .collect() // a thrown expression error fails the test here
      assert(rows.length == mutants.length, s"$fmt dropped rows")
      // the format flag is a real (non-null) boolean on every mutant
      rows.foreach(r => assert(!r.isNullAt(r.fieldIndex(flagCol)),
        s"$fmt null flag"))
    }
  }

  test("quarantine routes each corruption to its reason, valid rows pass") {
    val s = spark
    import s.implicits._
    val docs = (0L until 100L).toDF("doc_id")
    val reasons = MediaWalk.jpegQuarantine(
      MediaWalk.parseJpeg(MediaSynth.synthJpegCorrupt(docs)))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason"))
      .toMap
    for (id <- 0L until 100L) {
      val expected =
        if (id % 7 == 0) Some("bad_marker")
        else if (id % 11 == 0) Some("bad_magic")
        else if (id % 13 == 0) Some("truncated")
        else None
      assert(reasons.get(id) == expected, s"doc $id")
    }
    // and the uncorrupted synth stream is fully clean
    val clean = MediaWalk.parseJpeg(MediaSynth.synthJpeg(docs))
      .filter(!col("is_jpeg") || !col("marker_ok") || !col("eoi_ok"))
    assert(clean.count() == 0)
  }
}
