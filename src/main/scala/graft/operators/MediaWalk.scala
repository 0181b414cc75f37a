package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MatOps

/** Container-format HEADER WALKS (split from [[Multimodal]], zero
  * behavior change): bounded-unroll pure-codegen parsers for the
  * [[MediaSynth]] containers — fixed-offset WAV/BMP headers, the PNG
  * chunk chain with real CRC-32 verification, the JPEG marker-segment
  * walk with the per-file-endian EXIF TIFF walk, nested ISO-BMFF boxes —
  * plus the quarantine relations and per-modality stats. One columnar
  * scan, no decode: the header-sniff + integrity gate of a 100 TB media
  * pipeline.
  */
object MediaWalk {
  import Multimodal._
  import MediaSynth._
  /** Parse a WAV payload's header — magic check, format fields, and the
    * derived duration — with codegen expressions only. */
  def parseWav(media: DataFrame): DataFrame = {
    val p = col("payload")
    media.select(col("doc_id"),
        (hex(substring(p, 1, 4)) === "52494646" &&
          hex(substring(p, 9, 4)) === "57415645").as("is_wav"),
        leUInt(p, 23, 2).as("channels"),
        leUInt(p, 25, 4).as("sample_rate"),
        leUInt(p, 29, 4).as("byte_rate"),
        leUInt(p, 33, 2).as("block_align"),
        leUInt(p, 35, 2).as("bits_per_sample"),
        leUInt(p, 41, 4).as("data_size"),
        octet_length(p).cast("long").as("n_bytes"),
        hex(substring(p, 1, 44)).as("header_hex"))
      .withColumn("duration_us",
        expr("CAST((data_size * 1000000) DIV byte_rate AS BIGINT)"))
  }

  /** Parse a BMP payload's headers: magic, dimensions, the derived
    * stride, and size cross-checks. */
  def parseBmp(media: DataFrame): DataFrame = {
    val p = col("payload")
    media.select(col("doc_id"),
        (hex(substring(p, 1, 2)) === "424D").as("is_bmp"),
        leUInt(p, 3, 4).as("file_size"),
        leUInt(p, 11, 4).as("pixel_offset"),
        leUInt(p, 19, 4).as("width"),
        leUInt(p, 23, 4).as("height"),
        leUInt(p, 29, 2).as("bpp"),
        leUInt(p, 35, 4).as("image_size"),
        octet_length(p).cast("long").as("n_bytes"),
        hex(substring(p, 1, 54)).as("header_hex"))
      .withColumn("stride",
        expr("CAST(image_size DIV height AS BIGINT)"))
  }

  // ------------------------------------------- PNG: offset-chained walk
  //
  // Unlike WAV/BMP (fixed-offset headers), PNG is a CHUNKED container:
  // 8-byte signature, then [len BE4 | type 4 | data len | crc BE4]* — the
  // offset of chunk i+1 depends on the LENGTH read from chunk i, so the
  // parser must walk the chain. The walk below is a bounded unroll
  // (PngMaxChunks steps) of pure codegen expressions; every chunk's CRC-32
  // is REALLY verified (Spark's codegen `crc32` over type+data is exactly
  // the PNG CRC), and malformed payloads (bad magic / bad CRC / truncated
  // chain) are routed to a quarantine relation — the TextIngest precedent
  // for binary columns. At 100 TB this is the header-sniff + integrity
  // gate of an image pipeline: one columnar scan, no decode.

  /** Unroll bound for the chunk walk: IHDR + up to 4 tEXt + IDAT + IEND. */
  val PngMaxChunks = 8

  /** Walk the PNG chunk chain and parse IHDR — no UDF, no driver loop.
    * Per chunk the stored CRC-32 is checked against `crc32(type||data)`
    * recomputed from the bytes.
    *
    * The walk is a single `aggregate` higher-order function folding a
    * chunk-cursor struct over `sequence(1, PngMaxChunks)`. This shape is
    * load-bearing: a symbolic unroll (withColumn per step) embeds step
    * i's offset expression inside step i+1's several times over, so the
    * plan tree grows EXPONENTIALLY with the unroll depth — at 8 steps the
    * analyzer/optimizer OOMs before a single row moves. The fold's lambda
    * exists once in the plan regardless of depth (linear analysis cost,
    * runtime iteration), which is also what lets the bound grow to
    * hundreds of chunks for real-world files.
    *
    * Output: is_png (signature), IHDR fields, n_chunks (walked until
    * IEND), chunk_types (comma-joined ASCII), total_data_len, crc_ok
    * (every walked chunk's CRC matches), iend_ok (chain ends in a clean
    * IEND exactly at end-of-file). */
  def parsePng(media: DataFrame): DataFrame = {
    val p = col("payload")
    val nBytes = octet_length(p).cast("long")
    val isPng = hex(substring(p, 1, 8)) === "89504E470D0A1A0A"
    def state(off: Column, n: Column, tdl: Column, crcok: Column,
        live: Column, ended: Column, types: Column): Column =
      struct(off.as("off"), n.as("n"), tdl.as("tdl"), crcok.as("crcok"),
        live.as("live"), ended.as("ended"), types.as("types"))
    val init = state(lit(9L), lit(0L), lit(0L), lit(true), isPng,
      lit(false), lit(""))
    val walk = aggregate(
      sequence(lit(1), lit(PngMaxChunks)),
      init,
      (st, _) => {
        val off = st.getField("off")
        val len = beUIntAt(p, off, 4)
        val fits = len >= 0 && off + lit(11L) + len <= nBytes
        val typeHex = hex(call_function("substring", p, (off + 4).cast("int"), lit(4)))
        val body = call_function("substring", p, (off + 4).cast("int"),
          (len + 4).cast("int"))
        val stored = beUIntAt(p, off + 8 + len, 4)
        val isEnd = typeHex === "49454E44"
        when(!st.getField("live"), st)
          .when(!fits, state(off, st.getField("n"), st.getField("tdl"),
            st.getField("crcok"), lit(false), st.getField("ended"),
            st.getField("types")))
          .otherwise(state(
            off + 12 + len,
            st.getField("n") + 1,
            st.getField("tdl") + len,
            st.getField("crcok") && (stored === crc32(body)),
            !isEnd,
            isEnd && (off + 12 + len === nBytes + 1),
            concat(st.getField("types"),
              when(st.getField("n") === 0, "").otherwise(","),
              asciiOrHex(typeHex))))
      })
    media
      .select(col("doc_id"), p, nBytes.as("n_bytes"), isPng.as("is_png"),
        walk.as("w"))
      .select(col("doc_id"), col("is_png"),
        when(col("is_png"), beUIntAt(p, lit(17L), 4)).otherwise(lit(-1L)).as("width"),
        when(col("is_png"), beUIntAt(p, lit(21L), 4)).otherwise(lit(-1L)).as("height"),
        when(col("is_png"), beUIntAt(p, lit(25L), 1)).otherwise(lit(-1L)).as("bit_depth"),
        when(col("is_png"), beUIntAt(p, lit(26L), 1)).otherwise(lit(-1L)).as("color_type"),
        when(col("is_png"), beUIntAt(p, lit(29L), 1)).otherwise(lit(-1L)).as("interlace"),
        col("w.n").as("n_chunks"), col("w.types").as("chunk_types"),
        col("w.tdl").as("total_data_len"), col("w.crcok").as("crc_ok"),
        col("w.ended").as("iend_ok"), col("n_bytes"))
  }

  /** Quarantine relation over a parsed-PNG frame: rows failing the
    * integrity gate, with a precedence-ordered reason (bad_magic >
    * bad_crc > truncated) — the binary-column analog of TextIngest's
    * bad-JSON quarantine. Valid rows never appear here; the main pipeline
    * proceeds on `parsed.filter(ok)`. */
  def pngQuarantine(parsed: DataFrame): DataFrame =
    // barrier before the filter: the quarantine predicate is built from
    // DERIVED columns (walk fold + integrity gates); pushed below the parse
    // projection it would re-substitute the whole fold into the filter
    // condition and evaluate it several more times per row. The parsed
    // frame is metadata-sized (payload dropped), so the barrier is cheap.
    parsed.materialize
      .select(col("doc_id"), col("n_bytes"), col("n_chunks"),
        when(!col("is_png"), "bad_magic")
          .when(!col("crc_ok"), "bad_crc")
          .when(!col("iend_ok"), "truncated")
          .as("reason"))
      .filter(col("reason").isNotNull)

  // ------------------------------------------- JPEG: marker-segment walk
  //
  // The PNG walk generalized to the variable-length MARKER format real
  // image pipelines sniff. Two wrinkles PNG doesn't have: (1) segment
  // lengths live in a 2-byte big-endian field that COUNTS ITSELF (payload
  // bytes = len − 2), and each segment must begin with an 0xFF marker
  // prefix — a chain can break on a bad marker byte, not just a bad
  // length; (2) after SOS the entropy-coded data has NO length field at
  // all — the only way to find EOI is to SCAN for it, which is done here
  // with one codegen byte-aligned regex scan over the hex image, not a fold
  // per byte. Same bounded `aggregate` fold as PNG for the segment chain
  // (the load-bearing plan-size choice, see [[parsePng]]).

  /** Unroll bound for the segment walk: APP0 + up to 3 APPn + DQT + SOF0
    * + SOS, plus one spare. */
  val JpegMaxSegments = 8

  /** Walk the JPEG marker-segment chain — no UDF, no driver loop. Each
    * step checks the 0xFF marker prefix, reads the self-counting BE16
    * length, and hops to the next segment; SOF0's dimensions/components
    * are captured in-flight. After SOS the entropy span is closed by
    * SCANNING for the EOI marker (one byte-aligned regex over the hex image
    * — entropy data carries no length field; this is the structural
    * difference from PNG's fully indexed chain).
    *
    * Output: is_jpeg (SOI magic), width/height/n_components (from SOF0),
    * n_segments, marker_types (comma-joined hex), marker_ok (every walked
    * segment began with 0xFF), entropy_len (scanned), eoi_ok (EOI found
    * exactly at end-of-file), n_bytes. */
  /** The segment-chain fold shared by [[parseJpeg]] and [[parseExif]].
    * State fields: off (cursor), n (segments walked), h/w/nc (SOF0),
    * sosend (first entropy byte), e1 (data offset of the first APP1 —
    * where an EXIF block lives), mok, live, types. */
  private[operators] def jpegWalk(p: Column, nBytes: Column, isJpeg: Column): Column = {
    def state(off: Column, n: Column, h: Column, w: Column, nc: Column,
        sosEnd: Column, e1: Column, mok: Column, live: Column,
        types: Column): Column =
      struct(off.as("off"), n.as("n"), h.as("h"), w.as("w"), nc.as("nc"),
        sosEnd.as("sosend"), e1.as("e1"), mok.as("mok"), live.as("live"),
        types.as("types"))
    val init = state(lit(3L), lit(0L), lit(-1L), lit(-1L), lit(-1L),
      lit(-1L), lit(-1L), lit(true), isJpeg, lit(""))
    aggregate(
      sequence(lit(1), lit(JpegMaxSegments)),
      init,
      (st, _) => {
        val off = st.getField("off")
        val prefix = beUIntAt(p, off, 1)
        val m = beUIntAt(p, off + 1, 1)
        val len = beUIntAt(p, off + 2, 2)
        val isSos = m === 218L // 0xDA
        val isSof = m === 192L // 0xC0
        val isE1 = m === 225L  // 0xE1
        val fits = len >= 2 && off + 2 + len <= nBytes + 1
        val stepped = state(
          off + 2 + len,
          st.getField("n") + 1,
          when(isSof, beUIntAt(p, off + 5, 2)).otherwise(st.getField("h")),
          when(isSof, beUIntAt(p, off + 7, 2)).otherwise(st.getField("w")),
          when(isSof, beUIntAt(p, off + 9, 1)).otherwise(st.getField("nc")),
          when(isSos, off + 2 + len).otherwise(st.getField("sosend")),
          when(isE1 && st.getField("e1") < 0, off + 4)
            .otherwise(st.getField("e1")),
          st.getField("mok"),
          !isSos,
          concat(st.getField("types"),
            when(st.getField("n") === 0, "").otherwise(","), beHex(m, 1)))
        when(!st.getField("live"), st)
          .when(prefix =!= 255L || m < 0,
            state(off, st.getField("n"), st.getField("h"), st.getField("w"),
              st.getField("nc"), st.getField("sosend"), st.getField("e1"),
              lit(false), lit(false), st.getField("types")))
          .when(!fits,
            state(off, st.getField("n"), st.getField("h"), st.getField("w"),
              st.getField("nc"), st.getField("sosend"), st.getField("e1"),
              st.getField("mok"), lit(false), st.getField("types")))
          .otherwise(stepped)
      })
  }

  def parseJpeg(media: DataFrame): DataFrame = {
    val p = col("payload")
    val nBytes = octet_length(p).cast("long")
    val isJpeg = hex(substring(p, 1, 2)) === "FFD8"
    val walk = jpegWalk(p, nBytes, isJpeg)
    val sosEnd = col("w").getField("sosend")
    // EOI scan over the entropy span: hex chars from the first entropy byte
    // onward. The match must respect BYTE alignment — a bare substring
    // search would hit phantom markers straddling byte boundaries (bytes
    // 2F FD 9A hex-print as 2FFD9A, containing a misaligned FFD9) — so the
    // scan is an anchored non-greedy pair-wise regex: the first FFD9 at an
    // even byte offset wins, phantoms inside pairs are invisible.
    val hexAll = hex(p)
    val tail = call_function("substring", hexAll,
      ((sosEnd - 1) * 2 + 1).cast("int"), length(hexAll).cast("int"))
    val entHex = regexp_extract(tail, "^((?:[0-9A-F]{2})*?)FFD9", 1)
    val found = sosEnd > 0 && tail.rlike("^(?:[0-9A-F]{2})*?FFD9")
    val entropyLen = when(found, (length(entHex) / 2).cast("long"))
      .otherwise(lit(-1L))
    media
      .select(col("doc_id"), p, nBytes.as("n_bytes"), isJpeg.as("is_jpeg"),
        walk.as("w"))
      .select(col("doc_id"), col("is_jpeg"),
        col("w.w").as("width"), col("w.h").as("height"),
        col("w.nc").as("n_components"), col("w.n").as("n_segments"),
        col("w.types").as("marker_types"), col("w.mok").as("marker_ok"),
        entropyLen.as("entropy_len"),
        (found && sosEnd + (length(entHex) / 2).cast("long") + 1 === col("n_bytes"))
          .as("eoi_ok"),
        col("n_bytes"))
  }

  /** Unroll bound for IFD0 entries the parser inspects. */
  val ExifMaxTags = 4

  /** Unroll bound for ExifIFD (sub-IFD) entries the parser inspects. */
  val ExifSubMaxTags = 3

  /** Parse the EXIF APP1 block located by the marker walk: 'Exif\0\0',
    * then a TIFF stream whose BYTE ORDER is declared per file ('II'
    * little-endian / 'MM' big-endian) — every subsequent read switches
    * endianness on that flag, the wrinkle fixed-endian formats (WAV
    * little, PNG big) never exercise. IFD0's entries are scanned (bounded
    * unroll) for ImageWidth (0x0100, LONG), ImageLength (0x0101, LONG)
    * and Orientation (0x0112, SHORT — left-justified in its 4-byte value
    * field per the TIFF value-packing rule, so a 2-byte read at the field
    * start is correct in BOTH byte orders).
    *
    * IFD0's ExifIFD pointer tag (0x8769) is FOLLOWED when present: its
    * LONG value is a byte offset inside the same TIFF stream where the
    * sub-IFD lives — the offset indirection real EXIF hangs
    * DateTimeOriginal/ISO/PixelDimension tags off. The pointer is
    * bounds-checked against the APP1 segment's own declared length
    * before any sub-read (a dangling pointer — beyond the APP1 — yields
    * sub_ok=false and -1 fields, never a read of neighboring segments'
    * bytes). Sub-IFD tags read: ISOSpeedRatings (0x8827, SHORT),
    * PixelXDimension (0xA002, LONG), PixelYDimension (0xA003, LONG).
    *
    * Output: doc_id, has_exif, byte_order, n_tags, orientation,
    * exif_width, exif_height, dims_match (EXIF tags vs the SOF0 frame
    * header — the consistency check a real curation pipeline applies
    * before trusting either source), has_sub_ifd, sub_ok, n_sub_tags,
    * iso, pixel_width, pixel_height, pixel_dims_match, n_bytes.
    *
    * Two codegen-bounded stages with a materialize barrier between them
    * (fused, the generated method crossed the JVM's 64 KB limit and the
    * whole stage silently fell back to interpreted eval — 8.2 s at
    * sf0.1): stage 1 runs the marker walk and extracts the candidate
    * TIFF block as ONE short hex string (payload dropped); stage 2 does
    * every endian-switched read as a small substring over that string —
    * one hex conversion per FIELD, not per byte. */
  def parseExif(media: DataFrame): DataFrame = {
    val p = col("payload")
    val nBytes = octet_length(p).cast("long")
    val isJpeg = hex(substring(p, 1, 2)) === "FFD8"
    val walk = jpegWalk(p, nBytes, isJpeg)
    // TIFF block bound: IFD0 (header 8 + count 2 + ExifMaxTags×12 +
    // next-IFD 4) plus a sub-IFD (count 2 + ExifSubMaxTags×12 + next 4)
    val tiffLen = 8 + 2 + ExifMaxTags * 12 + 4 + 2 + ExifSubMaxTags * 12 + 4
    val staged = media
      .select(col("doc_id"), p, nBytes.as("n_bytes"), walk.as("w0"))
      .select(col("doc_id"), col("n_bytes"),
        col("w0.e1").as("_e1"), col("w0.w").as("_sof_w"),
        col("w0.h").as("_sof_h"),
        // the APP1 segment's own declared length (BE16 at e1-2) bounds
        // every sub-IFD pointer check: TIFF stream bytes = len - 2 - 6
        when(col("w0.e1") > 0, beUIntAt(p, col("w0.e1") - 2, 2))
          .otherwise(lit(-1L)).as("_app1_len"),
        when(col("w0.e1") > 0,
          hex(call_function("substring", p, col("w0.e1").cast("int"), lit(6))))
          .as("_exif_hdr"),
        when(col("w0.e1") > 0,
          hex(call_function("substring", p, (col("w0.e1") + 6).cast("int"),
            lit(tiffLen)))).as("_tiff"))
      .materialize
    // stage 2: all reads address the stored _tiff hex string. Each
    // projection stores its intermediates as real columns (le flag, ifd0
    // offset, per-slot tag ids and values) — referenced multiple times
    // downstream and non-cheap, so CollapseProject keeps the stages
    // separate and no single generated method re-inlines the whole read
    // tree (the fused form crossed 64 KB and fell back to interpreted,
    // paying a multi-second failed-compile tax per stage).
    def hx(off: Column, n: Int): Column = call_function("substring",
      col("_tiff"), (off * 2 + 1).cast("int"), lit(2 * n))
    def swapped(off: Column, n: Int): Column =
      concat((n - 1 to 0 by -1).map(i => call_function("substring",
        col("_tiff"), ((off + i) * 2 + 1).cast("int"), lit(2))): _*)
    def u(off: Column, n: Int): Column =
      coalesce(conv(nullif(when(col("_le"), swapped(off, n))
        .otherwise(hx(off, n)), lit("")), 16, 10).cast("long"), lit(-1L))
    val slots = staged
      .withColumn("_has",
        col("_e1") > 0 && col("_exif_hdr") === "457869660000")
      .withColumn("_le", substring(col("_tiff"), 1, 4) === "4949")
      .withColumn("_magic", u(lit(2L), 2) === 42L)
      .withColumn("_ifd0", u(lit(4L), 4))
      .withColumn("_ntags", u(col("_ifd0"), 2))
    val withTags = (0 until ExifMaxTags).foldLeft(slots) { (df, i) =>
      val e = col("_ifd0") + 2 + 12 * i
      df.withColumn(s"_tag$i",
          when(lit(i.toLong) < col("_ntags"), u(e, 2)).otherwise(lit(-1L)))
        .withColumn(s"_v16$i", u(e + 8, 2))
        .withColumn(s"_v32$i", u(e + 8, 4))
    }
    def tagValue(tag: Long, short: Boolean): Column =
      (0 until ExifMaxTags).map { i =>
        when(col(s"_tag$i") === tag,
          if (short) col(s"_v16$i") else col(s"_v32$i"))
      }.reduce(coalesce(_, _))
    // sub-IFD: follow the 0x8769 pointer, but only within the bytes the
    // APP1 itself declares — _tiff is a fixed-length capture that can run
    // past the APP1 into the NEXT segment's bytes, so every sub read is
    // gated on the pointer (and its entry table) fitting inside the
    // declared TIFF stream. A dangling pointer yields sub_ok=false.
    val subbed = withTags
      .withColumn("_tifflen",
        // readable bytes = min(what the APP1 declares, what _tiff actually
        // captured): a pointer into the declared-but-uncaptured gap would
        // otherwise half-read hex off the capture's end (substring
        // truncates, conv parses the fragment) and report sub_ok=true
        // with garbage fields instead of the documented sub_ok=false
        least(col("_app1_len") - 2 - 6, lit(tiffLen.toLong)))
      .withColumn("_sub", coalesce(tagValue(0x8769L, short = false), lit(-1L)))
      .withColumn("_nsub",
        when(col("_sub") >= 8 && col("_sub") + 2 <= col("_tifflen"),
          u(col("_sub"), 2)).otherwise(lit(-1L)))
      .withColumn("_subok",
        col("_nsub") >= 0 && col("_nsub") <= ExifSubMaxTags &&
          col("_sub") + 2 + col("_nsub") * 12 + 4 <= col("_tifflen"))
    val withSub = (0 until ExifSubMaxTags).foldLeft(subbed) { (df, i) =>
      val e = col("_sub") + 2 + 12 * i
      df.withColumn(s"_stag$i",
          when(col("_subok") && lit(i.toLong) < col("_nsub"), u(e, 2))
            .otherwise(lit(-1L)))
        .withColumn(s"_sv16$i", u(e + 8, 2))
        .withColumn(s"_sv32$i", u(e + 8, 4))
    }
    def subValue(tag: Long, short: Boolean): Column =
      (0 until ExifSubMaxTags).map { i =>
        when(col(s"_stag$i") === tag,
          if (short) col(s"_sv16$i") else col(s"_sv32$i"))
      }.reduce(coalesce(_, _))
    val ok = col("_has") && col("_magic")
    val width = tagValue(0x0100L, short = false)
    val height = tagValue(0x0101L, short = false)
    val orientation = tagValue(0x0112L, short = true)
    val hasSub = ok && col("_sub") >= 0
    val subOk = hasSub && col("_subok")
    val iso = subValue(0x8827L, short = true)
    val pixW = subValue(0xA002L, short = false)
    val pixH = subValue(0xA003L, short = false)
    withSub
      .select(col("doc_id"), ok.as("has_exif"),
        when(ok, when(col("_le"), "II").otherwise("MM")).as("byte_order"),
        when(ok, col("_ntags")).otherwise(lit(-1L)).as("n_tags"),
        when(ok, coalesce(orientation, lit(-1L)))
          .otherwise(lit(-1L)).as("orientation"),
        when(ok, coalesce(width, lit(-1L)))
          .otherwise(lit(-1L)).as("exif_width"),
        when(ok, coalesce(height, lit(-1L)))
          .otherwise(lit(-1L)).as("exif_height"),
        (ok && width === col("_sof_w") && height === col("_sof_h"))
          .as("dims_match"),
        hasSub.as("has_sub_ifd"),
        subOk.as("sub_ok"),
        when(subOk, col("_nsub")).otherwise(lit(-1L)).as("n_sub_tags"),
        when(subOk, coalesce(iso, lit(-1L))).otherwise(lit(-1L)).as("iso"),
        when(subOk, coalesce(pixW, lit(-1L)))
          .otherwise(lit(-1L)).as("pixel_width"),
        when(subOk, coalesce(pixH, lit(-1L)))
          .otherwise(lit(-1L)).as("pixel_height"),
        (subOk && pixW === col("_sof_w") && pixH === col("_sof_h"))
          .as("pixel_dims_match"),
        col("n_bytes"))
  }

  /** Quarantine relation over a parsed-JPEG frame, mirroring
    * [[pngQuarantine]]: precedence bad_magic > bad_marker > truncated. */
  def jpegQuarantine(parsed: DataFrame): DataFrame =
    // same derived-column filter barrier as [[pngQuarantine]]
    parsed.materialize
      .select(col("doc_id"), col("n_bytes"),
        col("n_segments").as("n_chunks"),
        when(!col("is_jpeg"), "bad_magic")
          .when(!col("marker_ok"), "bad_marker")
          .when(!col("eoi_ok"), "truncated")
          .as("reason"))
      .filter(col("reason").isNotNull)

  // --------------------------------------- MP4 / ISO-BMFF: nested boxes
  //
  // The last structural wrinkle in the container family: ISO base-media
  // files are NESTED length-prefixed boxes ([size BE4][type 4][payload],
  // size counts the 8-byte header; containers like moov/trak hold child
  // boxes directly). A fold can't recurse, so nesting is expressed as
  // CHAINED bounded folds — level N's walk records the extent of the
  // container, level N+1 walks inside that recorded extent. WAV/BMP were
  // fixed-offset, PNG offset-chained, JPEG marker-scanned, EXIF
  // endian-switched; MP4 adds hierarchy.

  /** Unroll bound per nesting level (top: ftyp/moov/mdat + spare; inner:
    * mvhd/trak + spare). */
  val Mp4MaxBoxes = 4

  /** One level of the box walk: fold over up to [[Mp4MaxBoxes]] boxes in
    * [from, until), recording the extent of `want` (offset AFTER its
    * header, and its end) plus the box count and a size-chain check. */
  private[operators] def boxLevel(p: Column, from: Column, until: Column,
      wantTypeHex: String): Column = {
    def st(off: Column, n: Column, foundOff: Column, foundEnd: Column,
        ok: Column, live: Column): Column =
      struct(off.as("off"), n.as("n"), foundOff.as("foff"),
        foundEnd.as("fend"), ok.as("ok"), live.as("live"))
    aggregate(
      sequence(lit(1), lit(Mp4MaxBoxes)),
      st(from, lit(0L), lit(-1L), lit(-1L), lit(true), from < until),
      (s, _) => {
        val off = s.getField("off")
        val size = beUIntAt(p, off, 4)
        val typeHex = hex(call_function("substring", p, (off + 4).cast("int"), lit(4)))
        val fits = size >= 8 && off + size <= until
        val isWant = typeHex === wantTypeHex
        val next = off + size
        when(!s.getField("live"), s)
          .when(!fits, st(off, s.getField("n"), s.getField("foff"),
            s.getField("fend"), lit(false), lit(false)))
          .otherwise(st(next, s.getField("n") + 1,
            when(isWant && s.getField("foff") < 0, off + 8)
              .otherwise(s.getField("foff")),
            when(isWant && s.getField("fend") < 0, next)
              .otherwise(s.getField("fend")),
            s.getField("ok"), next < until))
      })
  }

  /** Walk the nested box tree and parse mvhd/tkhd — chained bounded
    * folds, one per nesting level, each scoped to the extent its parent
    * level recorded (staged projections; each level's offsets become
    * stored columns so no generated method re-inlines a parent fold).
    *
    * Output: doc_id, is_mp4 (ftyp box first), major_brand, n_top_boxes,
    * sizes_ok (box sizes chain exactly to end-of-file at every level),
    * timescale, duration_ms, track_id, width, height (16.16 integer
    * part), mdat_len, n_bytes. */
  def parseMp4(media: DataFrame): DataFrame = {
    val p = col("payload")
    val nBytes = octet_length(p).cast("long")
    val isMp4 = hex(substring(p, 5, 4)) === "66747970" // box 1 is ftyp
    // level 1: top-level boxes; find moov and mdat
    val top = boxLevel(p, lit(1L), nBytes + 1, "6D6F6F76")
    val topMdat = boxLevel(p, lit(1L), nBytes + 1, "6D646174")
    val s1 = media
      .select(col("doc_id"), p, nBytes.as("n_bytes"), isMp4.as("is_mp4"),
        top.as("t"), topMdat.as("tm"))
      .select(col("doc_id"), p, col("n_bytes"), col("is_mp4"),
        col("t.n").as("n_top_boxes"), col("t.ok").as("_ok1"),
        col("t.foff").as("_moov"), col("t.fend").as("_moov_end"),
        col("tm.foff").as("_mdat"), col("tm.fend").as("_mdat_end"),
        hex(substring(p, 9, 4)).as("_brand_hex")) // ftyp major_brand
      .materialize
    // level 2: inside moov; find mvhd and trak
    val mvhd = boxLevel(p, col("_moov"), col("_moov_end"), "6D766864")
    val trak = boxLevel(p, col("_moov"), col("_moov_end"), "7472616B")
    val s2 = s1
      .select(col("*"), mvhd.as("m"), trak.as("k"))
      .select(col("doc_id"), p, col("n_bytes"), col("is_mp4"),
        col("n_top_boxes"), col("_ok1"), col("_brand_hex"),
        col("_mdat"), col("_mdat_end"),
        col("m.foff").as("_mvhd"), col("m.ok").as("_ok2"),
        col("k.foff").as("_trak"), col("k.fend").as("_trak_end"))
      .materialize
    // level 3: inside trak; find tkhd — then extract leaf fields
    val tkhd = boxLevel(p, col("_trak"), col("_trak_end"), "746B6864")
    val s3 = s2
      .select(col("*"), tkhd.getField("foff").as("_tkhd"),
        tkhd.getField("ok").as("_ok3"))
    val ok = col("is_mp4") && col("_ok1") && col("_ok2") && col("_ok3") &&
      col("_mvhd") > 0 && col("_tkhd") > 0
    def f(base: Column, rel: Int, n: Int): Column = beUIntAt(p, base + rel, n)
    s3.select(col("doc_id"), col("is_mp4"),
      when(ok, asciiOrHex(col("_brand_hex"))).as("major_brand"),
      col("n_top_boxes"),
      (col("_ok1") && col("_ok2") && col("_ok3")).as("sizes_ok"),
      when(ok, f(col("_mvhd"), 12, 4)).otherwise(lit(-1L)).as("timescale"),
      when(ok, f(col("_mvhd"), 16, 4)).otherwise(lit(-1L)).as("duration_ms"),
      when(ok, f(col("_tkhd"), 12, 4)).otherwise(lit(-1L)).as("track_id"),
      when(ok, f(col("_tkhd"), 76, 2)).otherwise(lit(-1L)).as("width"),
      when(ok, f(col("_tkhd"), 80, 2)).otherwise(lit(-1L)).as("height"),
      when(col("_mdat") > 0, col("_mdat_end") - col("_mdat"))
        .otherwise(lit(-1L)).as("mdat_len"),
      col("n_bytes"))
  }

  /** Per-modality corpus stats over the parsed header tables: item count,
    * byte totals, and a modality-native unit total (microseconds of audio
    * / pixels of image) — the "how much of each modality do I have"
    * inventory question, one aggregate per modality. */
  def modalityStats(wav: DataFrame, bmp: DataFrame): DataFrame = {
    val a = wav.select(lit("audio/wav").as("modality"), col("n_bytes"),
      col("duration_us").as("units"))
    val b = bmp.select(lit("image/bmp").as("modality"), col("n_bytes"),
      (col("width") * col("height")).as("units"))
    a.union(b).groupBy(col("modality"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("units")).as("total_units"))
      .withColumn("avg_unit", expr("CAST(total_units DIV n_items AS BIGINT)"))
  }

}
