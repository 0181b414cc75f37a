package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MatOps

/** Container-format SYNTHESIZERS (split from [[Multimodal]], zero
  * behavior change): valid WAV/BMP/PNG/JPEG/MP4 payloads built entirely
  * from codegen'd column expressions, plus the per-format field
  * derivations their parsers ([[MediaWalk]]) and DuckDB oracles share.
  */
object MediaSynth {
  import Multimodal._
  // ------------------------------------------------- real binary headers
  //
  // Past the stub codec: REAL self-describing container formats (RIFF/WAV
  // and BMP), synthesized AND parsed entirely with codegen'd column
  // expressions (substring/hex/conv/shift — no UDF, no mapPartitions). The
  // payloads are valid files a real codec would accept; the header fields
  // derive deterministically from doc_id, so a DuckDB oracle can verify
  // both the byte layout (header hex) and the parsed values end-to-end.
  // At 100 TB this is the header-sniff pass of a media pipeline: one
  // columnar scan, no decode, projecting pruned typed metadata.

  /** WAV field derivations from doc_id (query + oracle share the rule):
    * mono/stereo by parity, 8–40 kHz sample rate, 16-bit PCM, 1–100
    * blocks of payload. */
  private[operators] def wavFields(id: Column): (Column, Column, Column, Column, Column) = {
    val channels = lit(1L) + pmod(id, lit(2L))
    val rate = lit(8000L) * (lit(1L) + pmod(id, lit(5L)))
    val blockAlign = channels * lit(2L)
    val byteRate = rate * blockAlign
    val dataSize = (pmod(id, lit(100L)) + lit(1L)) * blockAlign
    (channels, rate, blockAlign, byteRate, dataSize)
  }

  /** Synthesize a VALID 44-byte-header PCM WAV per document (RIFF/WAVE/
    * fmt/data chunks, little-endian fields), body = `data_size` filler
    * bytes. Pure codegen: the header is built as a hex string and
    * `unhex`ed once. */
  /** 44-byte RIFF/WAVE/fmt/data header as a hex column (one per doc). */
  private[operators] def wavHeaderHex(id: Column): Column = {
    val (channels, rate, blockAlign, byteRate, dataSize) = wavFields(id)
    concat(
      lit("52494646"), leHex(dataSize + lit(36L), 4),          // 'RIFF', chunk size
      lit("57415645"), lit("666D7420"),                        // 'WAVE', 'fmt '
      leHex(lit(16L), 4), leHex(lit(1L), 2),                   // fmt size, PCM
      leHex(channels, 2), leHex(rate, 4), leHex(byteRate, 4),
      leHex(blockAlign, 2), leHex(lit(16L), 2),                // 16-bit samples
      lit("64617461"), leHex(dataSize, 4))                     // 'data', size
  }

  def synthWav(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val (_, _, _, _, dataSize) = wavFields(id)
    docs.select(id, lit("audio/wav").as("media_type"),
        wavHeaderHex(id).as("_h"), dataSize.cast("int").as("_n"))
      .select(col("doc_id"), col("media_type"),
        unhex(concat(col("_h"), expr("repeat('5A', _n)"))).as("payload"))
  }

  /** The closed-form PCM sample rule shared by [[synthWavPattern]], its
    * real-decode consumers, and the DuckDB oracle:
    * s(d, k) = ((d mod 16)·371 + k·97) mod 2048 − 1024 — varying and
    * sign-changing, so downstream audio features are non-trivial. */
  private[operators] def patSample(id: Column, k: Column): Column =
    pmod(pmod(id, lit(16L)) * lit(371L) + k.cast("long") * lit(97L),
      lit(2048L)) - lit(1024L)

  /** Synthesize a patterned PCM WAV per document: the [[synthWav]]
    * container with [[patSample]] 16-bit LE samples as the body (the
    * audio analog of [[synthBmpPattern]] — a genuinely decodable signal
    * the feature extractors can be oracle-checked against, where the
    * constant-0x5A body of [[synthWav]] would make every feature
    * trivial). Pure codegen: one `transform` over the sample range. */
  def synthWavPattern(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val (_, _, _, _, dataSize) = wavFields(id)
    val n = (dataSize / lit(2L)).cast("int")
    val body = array_join(
      transform(sequence(lit(0), n - lit(1)), k => leHex(patSample(id, k), 2)),
      "")
    docs.select(id, lit("audio/wav").as("media_type"),
        wavHeaderHex(id).as("_h"), body.as("_b"))
      .select(col("doc_id"), col("media_type"),
        unhex(concat(col("_h"), col("_b"))).as("payload"))
  }

  /** BMP field derivations from doc_id: 16–79 px wide, 16–63 px tall,
    * 24 bpp, rows padded to 4 bytes (the BMP stride rule). */
  private[operators] def bmpFields(id: Column): (Column, Column, Column, Column) = {
    val width = lit(16L) + pmod(id, lit(64L))
    val height = lit(16L) + pmod(id, lit(48L))
    val stride = ((width * 3 + lit(3L)) / lit(4L)).cast("long") * lit(4L)
    val imageSize = stride * height
    (width, height, stride, imageSize)
  }

  /** Synthesize a VALID 24-bpp BMP per document (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, 54 bytes), body = zeroed pixel rows at the real
    * 4-byte-aligned stride. */
  def synthBmp(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val (width, height, stride, imageSize) = bmpFields(id)
    val headerHex = concat(
      lit("424D"), leHex(imageSize + lit(54L), 4),             // 'BM', file size
      lit("00000000"), leHex(lit(54L), 4),                     // reserved, pixel offset
      leHex(lit(40L), 4),                                      // info-header size
      leHex(width, 4), leHex(height, 4),
      leHex(lit(1L), 2), leHex(lit(24L), 2),                   // planes, bpp
      leHex(lit(0L), 4), leHex(imageSize, 4),                  // BI_RGB, image size
      leHex(lit(2835L), 4), leHex(lit(2835L), 4),              // 72 dpi x/y
      leHex(lit(0L), 4), leHex(lit(0L), 4))                    // palette counts
    docs.select(id, lit("image/bmp").as("media_type"),
        headerHex.as("_h"), imageSize.cast("int").as("_n"))
      .select(col("doc_id"), col("media_type"),
        unhex(concat(col("_h"), expr("repeat('00', _n)"))).as("payload"))
  }

  /** PNG field derivations from doc_id (query + oracle share the rule):
    * 1–128 px wide, 1–96 tall, bit depth 8, color type ∈ {0,2,6},
    * 1–4 tEXt chunks of varying length, 1–50 byte IDAT. */
  private[operators] def pngFields(id: Column): (Column, Column, Column, Column, Column) = {
    val width = lit(1L) + pmod(id, lit(128L))
    val height = lit(1L) + pmod(id, lit(96L))
    val colorType = element_at(array(lit(0L), lit(2L), lit(6L)),
      (pmod(id, lit(3L)) + 1).cast("int"))
    val nText = lit(1L) + pmod(id, lit(4L))
    val idatLen = lit(1L) + pmod(id, lit(50L))
    (width, height, colorType, nText, idatLen)
  }

  /** Length of tEXt chunk `j` (1-based) for a document: 9–29 bytes,
    * varying with both doc and position so chunk offsets are non-uniform
    * across the corpus (the walk cannot be constant-folded). */
  private[operators] def textLen(id: Column, j: Int): Column =
    lit(9L) + pmod(id + lit(j.toLong), lit(21L))

  /** Synthesize a VALID PNG per document: signature, IHDR, 1–4 tEXt
    * chunks, IDAT filler, IEND — every chunk carrying its REAL CRC-32
    * (computed by codegen `crc32`, the PNG polynomial). The whole file is
    * built as one hex string and `unhex`ed once. */
  def synthPng(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val (width, height, colorType, nText, idatLen) = pngFields(id)
    val ihdrData = concat(beHex(width, 4), beHex(height, 4),
      lit("08"), beHex(colorType, 1), lit("0000"), beHex(pmod(id, lit(2L)), 1))
    val ihdr = concat(beHex(lit(13L), 4), lit("49484452"), ihdrData,
      chunkCrcHex(concat(lit("49484452"), ihdrData)))
    val texts = (1 to 4).map { j =>
      val len = textLen(id, j)
      val data = call_function("repeat", lit("41"), len.cast("int"))
      when(lit(j.toLong) <= nText,
        concat(beHex(len, 4), lit("74455874"), data,
          chunkCrcHex(concat(lit("74455874"), data))))
        .otherwise(lit(""))
    }
    val idatData = call_function("repeat", lit("00"), idatLen.cast("int"))
    val idat = concat(beHex(idatLen, 4), lit("49444154"), idatData,
      chunkCrcHex(concat(lit("49444154"), idatData)))
    val iend = lit("0000000049454E44AE426082") // len 0, 'IEND', fixed CRC
    val hexAll = concat(Seq(lit("89504E470D0A1A0A"), ihdr) ++ texts ++
      Seq(idat, iend): _*)
    docs.select(id, lit("image/png").as("media_type"),
      unhex(hexAll).as("payload"))
  }

  /** Deterministic corruption for the quarantine path (precedence shared
    * with the oracle): doc_id%7=0 → IHDR CRC overwritten (bad_crc);
    * else %11=0 → first signature byte zeroed (bad_magic); else %13=0 →
    * IEND chunk dropped (truncated). Everything else passes unmodified. */
  def synthPngCorrupt(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    // materialize the valid bytes first: the corruption branches reference
    // the payload ~5× and the downstream walk ~50×; composed symbolically
    // with the synth expression tree, projection collapse would multiply
    // them into an OOM-sized plan. A real pipeline parses stored bytes —
    // this barrier reproduces that shape.
    val media = synthPng(docs).materialize
    val h = hex(col("payload"))
    val n2 = length(h) // hex chars = 2 × bytes
    // IHDR CRC sits at bytes 30–33 → hex chars 59–66 (1-based)
    val badCrc = concat(call_function("substring", h, lit(1), lit(58)),
      lit("DEADBEEF"), call_function("substring", h, lit(67), n2))
    val badMagic = concat(lit("00"), call_function("substring", h, lit(3), n2))
    val truncated = call_function("substring", h, lit(1), n2 - 24)
    media.select(col("doc_id"), col("media_type"),
      unhex(when(pmod(id, lit(7L)) === 0, badCrc)
        .when(pmod(id, lit(11L)) === 0, badMagic)
        .when(pmod(id, lit(13L)) === 0, truncated)
        .otherwise(h)).as("payload"))
  }

  /** JPEG field derivations from doc_id (query + oracle share the rule):
    * 1–3 extra APPn segments, 16–270 px wide, 16–200 tall, 1 or 3
    * components, 5–44 bytes of entropy-coded data. */
  private[operators] def jpegFields(id: Column): (Column, Column, Column, Column, Column) = {
    val nApp = lit(1L) + pmod(id, lit(3L))
    val width = lit(16L) + pmod(id, lit(255L))
    val height = lit(16L) + pmod(id, lit(185L))
    val nComp = lit(1L) + pmod(id, lit(2L)) * 2
    val entropyLen = lit(5L) + pmod(id, lit(40L))
    (nApp, width, height, nComp, entropyLen)
  }

  /** Data length of extra APPn segment `j` (1-based): 7–25 bytes, varying
    * with doc and position so segment offsets are non-uniform. */
  private[operators] def appLen(id: Column, j: Int): Column =
    lit(7L) + pmod(id + lit(j.toLong), lit(19L))

  /** Synthesize a VALID baseline JPEG header stream per document: SOI,
    * JFIF APP0, 1–3 APPn segments of varying length, DQT, SOF0 (carrying
    * the real dimensions/components), SOS, entropy filler (0x25 bytes —
    * no 0xFF, so the EOI scan is unambiguous), EOI. */
  /** DQT + SOF0 + SOS + entropy hex — the shared tail of every synthesized
    * JPEG variant. */
  private[operators] def jpegTailHex(width: Column, height: Column, nComp: Column,
      entropyLen: Column): Column = {
    val dqt = concat(lit("FFDB" + "0043" + "00"),
      call_function("repeat", lit("10"), lit(64)))
    val sofComps = when(nComp === 1, lit("011100"))
      .otherwise(lit("011100" + "021100" + "031100"))
    val sof0 = concat(lit("FFC0"), beHex(lit(8L) + nComp * 3, 2), lit("08"),
      beHex(height, 2), beHex(width, 2), beHex(nComp, 1), sofComps)
    val sosComps = when(nComp === 1, lit("0100"))
      .otherwise(lit("0100" + "0200" + "0300"))
    val sos = concat(lit("FFDA"), beHex(lit(6L) + nComp * 2, 2),
      beHex(nComp, 1), sosComps, lit("003F00"))
    val entropy = call_function("repeat", lit("25"), entropyLen.cast("int"))
    concat(dqt, sof0, sos, entropy)
  }

  def synthJpeg(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val (nApp, width, height, nComp, entropyLen) = jpegFields(id)
    // APP0/JFIF: 'JFIF\0', v1.1, dpi units, 72x72, no thumbnail
    val app0 = lit("FFE0" + "0010" + "4A46494600" + "0101" + "00" +
      "0048" + "0048" + "0000")
    val apps = (1 to 3).map { j =>
      val dl = appLen(id, j)
      when(lit(j.toLong) <= nApp,
        concat(lit(s"FFE$j"), beHex(dl + lit(2L), 2),
          call_function("repeat", lit("41"), dl.cast("int"))))
        .otherwise(lit(""))
    }
    val hexAll = concat(Seq(lit("FFD8"), app0) ++ apps ++
      Seq(jpegTailHex(width, height, nComp, entropyLen), lit("FFD9")): _*)
    docs.select(id, lit("image/jpeg").as("media_type"),
      unhex(hexAll).as("payload"))
  }

  /** Synthesize a JPEG whose APP1 is a REAL EXIF block: 'Exif\0\0', a
    * TIFF header in a PER-DOCUMENT byte order ('II' little-endian for
    * even ids, 'MM' big-endian for odd), IFD0 with four entries in
    * ascending tag order — ImageWidth (0x0100, LONG), ImageLength
    * (0x0101, LONG), Orientation (0x0112, SHORT, left-justified in its
    * 4-byte value field per the TIFF rule), and the ExifIFD POINTER
    * (0x8769, LONG) whose value is the byte offset of a SUB-IFD inside
    * the same TIFF stream — the offset indirection real EXIF hangs
    * DateTimeOriginal/ISO/PixelDimensions off. The sub-IFD (at offset
    * 62) carries ISOSpeedRatings (0x8827, SHORT), PixelXDimension
    * (0xA002, LONG) and PixelYDimension (0xA003, LONG); the pixel
    * dimensions equal the SOF0 dimensions, so the parser can cross-check
    * three sources (frame header, IFD0, sub-IFD). */
  def synthJpegExif(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val (_, width, height, nComp, entropyLen) = jpegFields(id)
    val le = pmod(id, lit(2L)) === 0
    val orientation = lit(1L) + pmod(id, lit(8L))
    val iso = lit(100L) + pmod(id, lit(32L)) * 25
    def u16(v: Column) = when(le, leHex(v, 2)).otherwise(beHex(v, 2))
    def u32(v: Column) = when(le, leHex(v, 4)).otherwise(beHex(v, 4))
    def entry(tag: Long, typ: Long, value: Column, short: Boolean) =
      concat(u16(lit(tag)), u16(lit(typ)), u32(lit(1L)),
        if (short) concat(u16(value), lit("0000")) else u32(value))
    // TIFF layout: header 8, IFD0 count 2 + 4×12 + next 4 (ends at 62),
    // sub-IFD at 62: count 2 + 3×12 + next 4 (ends at 104)
    val tiff = concat(
      when(le, lit("49492A00" + "08000000"))        // 'II', 42 LE, IFD0 @ 8
        .otherwise(lit("4D4D002A" + "00000008")),   // 'MM', 42 BE, IFD0 @ 8
      u16(lit(4L)),                                 // 4 IFD0 entries
      entry(0x0100L, 4L, width, short = false),
      entry(0x0101L, 4L, height, short = false),
      entry(0x0112L, 3L, orientation, short = true),
      entry(0x8769L, 4L, lit(62L), short = false),  // ExifIFD pointer
      lit("00000000"),                              // no IFD1
      u16(lit(3L)),                                 // 3 sub-IFD entries
      entry(0x8827L, 3L, iso, short = true),
      entry(0xA002L, 4L, width, short = false),
      entry(0xA003L, 4L, height, short = false),
      lit("00000000"))                              // sub-IFD: no next
    // APP1 data = 'Exif\0\0' (6) + TIFF block (104) = 110; len field = 112
    val app1 = concat(lit("FFE1"), beHex(lit(112L), 2), lit("457869660000"), tiff)
    val hexAll = concat(lit("FFD8"), app1,
      jpegTailHex(width, height, nComp, entropyLen), lit("FFD9"))
    docs.select(id, lit("image/jpeg").as("media_type"),
      unhex(hexAll).as("payload"))
  }

  /** Deterministic corruption for the quarantine path (precedence shared
    * with the oracle): doc_id%7=0 → DQT's 0xFF marker prefix zeroed
    * (bad_marker — the chain breaks mid-walk on a byte PNG's format
    * doesn't even have); else %11=0 → first SOI byte zeroed (bad_magic);
    * else %13=0 → EOI dropped (truncated — the SCAN finds no end marker).
    * Everything else passes unmodified. */
  def synthJpegCorrupt(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val media = synthJpeg(docs).materialize // same plan barrier as PNG
    val h = hex(col("payload"))
    val n2 = length(h)
    val (nApp, _, _, _, _) = jpegFields(id)
    // byte offset (0-based) of DQT's FF prefix = SOI(2) + APP0(18) + APPn's
    val dqtOff = lit(20L) + (1 to 3).map(j =>
      when(lit(j.toLong) <= nApp, appLen(id, j) + lit(4L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val badMarker = concat(
      call_function("substring", h, lit(1), (dqtOff * 2).cast("int")),
      lit("00"),
      call_function("substring", h, (dqtOff * 2 + 3).cast("int"), n2))
    val badMagic = concat(lit("00"), call_function("substring", h, lit(3), n2))
    val truncated = call_function("substring", h, lit(1), n2 - 4)
    media.select(col("doc_id"), col("media_type"),
      unhex(when(pmod(id, lit(7L)) === 0, badMarker)
        .when(pmod(id, lit(11L)) === 0, badMagic)
        .when(pmod(id, lit(13L)) === 0, truncated)
        .otherwise(h)).as("payload"))
  }

  /** MP4 field derivations from doc_id (query + oracle share the rule):
    * 1-61 s duration at timescale 1000, track id 1-30, 160-1439 ×
    * 120-839 px, 10-89 byte mdat. */
  private[operators] def mp4Fields(id: Column): (Column, Column, Column, Column, Column) = {
    val durationMs = lit(1000L) + pmod(id, lit(60000L))
    val trackId = lit(1L) + pmod(id, lit(30L))
    val width = lit(160L) + pmod(id, lit(1280L))
    val height = lit(120L) + pmod(id, lit(720L))
    val mdatLen = lit(10L) + pmod(id, lit(80L))
    (durationMs, trackId, width, height, mdatLen)
  }

  /** Unity transform matrix (9 × 16.16/2.30 fixed, 36 bytes). */
  private[operators] val Mp4Matrix = "00010000" + "00000000" + "00000000" +
    "00000000" + "00010000" + "00000000" +
    "00000000" + "00000000" + "40000000"

  /** Synthesize a VALID minimal ISO-BMFF file per document:
    * ftyp(isom), moov ▸ [ mvhd(timescale 1000, duration),
    * trak ▸ tkhd(track_id, duration, width/height as 16.16 fixed) ],
    * mdat filler. All fields big-endian per the spec. */
  def synthMp4(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val (durationMs, trackId, width, height, mdatLen) = mp4Fields(id)
    val ftyp = lit("00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D")
    val mvhd = concat(lit("0000006C" + "6D766864" + "00000000" +
      "00000000" + "00000000"),                  // v/flags, ctime, mtime
      beHex(lit(1000L), 4), beHex(durationMs, 4),
      lit("00010000" + "0100" + "00000000000000000000"), // rate, vol, rsvd
      lit(Mp4Matrix), lit("0" * 48),             // matrix, 24B predefined
      beHex(trackId + 1, 4))                     // next track id
    val tkhd = concat(lit("0000005C" + "746B6864" + "0000000F" +
      "00000000" + "00000000"),                  // v/flags(enabled), times
      beHex(trackId, 4), lit("00000000"), beHex(durationMs, 4),
      lit("0" * 16 + "0000" + "0000" + "0000" + "0000"), // rsvd, layer...
      lit(Mp4Matrix),
      beHex(width, 2), lit("0000"), beHex(height, 2), lit("0000")) // 16.16
    val trak = concat(lit("00000064" + "7472616B"), tkhd)
    val moov = concat(lit("000000D8" + "6D6F6F76"), mvhd, trak)
    val mdat = concat(beHex(mdatLen + 8, 4), lit("6D646174"),
      call_function("repeat", lit("AB"), mdatLen.cast("int")))
    docs.select(id, lit("video/mp4").as("media_type"),
      unhex(concat(ftyp, moov, mdat)).as("payload"))
  }

}
