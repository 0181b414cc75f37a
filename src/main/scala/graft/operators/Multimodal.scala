package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MatOps

/** Multimodal-column plumbing: media as opaque BINARY payloads with typed
  * metadata, processed in batches.
  *
  * The generic decode (arbitrary image/audio codecs) is STUBBED — this
  * container has no media libraries — behind [[StubCodec]], a
  * deterministic fake whose outputs are pure functions of the bytes; BMP
  * has a REAL pixel decoder ([[decodeBmp]], `javax.imageio` from the JDK)
  * on the same plumbing, proving the shape carries a true codec.
  * Everything around the stub is real and the part that matters at
  * 100 TB: binary columns survive parquet round-trips, feature extraction
  * is a per-partition batch pass (the same batch shape a vectorized/Arrow
  * UDF would see), and derived metadata stays in columnar form for
  * pruning.
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Deterministic fake "decoded" features — stands in for a codec.
    * Replace `decode` with a real implementation to productionize; the
    * pipeline shape does not change. */
  object StubCodec {
    final case class Features(
        n_bytes: Long, fake_width: Long, fake_height: Long, channels: Long,
        frame_offsets: Seq[Long])
    def decode(payload: Array[Byte]): Features = {
      val n = payload.length.toLong
      val first = if (payload.isEmpty) 0L else (payload(0) & 0xffL)
      Features(n, n % 640, n % 480, first % 3 + 1,
        Seq(0L, n / 4, n / 2, 3 * n / 4))
    }
  }

  /** Documents → media table (payload = UTF-8 bytes standing in for a
    * decoded-from-storage blob). */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Column-expression feature extraction (codegen path): byte length,
    * content digest, stub decode metadata, fixed-stride frame-sample
    * offsets (comma-joined for engine-portable output). */
  def features(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      (octet_length(col("payload")) % 640).cast("long").as("fake_width"),
      (octet_length(col("payload")) % 480).cast("long").as("fake_height"),
      // first BYTE via hex (ascii() would decode UTF-8 characters and
      // diverge from StubCodec's byte view on any non-ASCII payload)
      (conv(hex(expr("substring(payload, 1, 1)")), 16, 10).cast("int") % 3 + 1)
        .cast("long").as("channels"),
      concat_ws(",",
        lit(0),
        (octet_length(col("payload")).cast("long") / 4).cast("long"),
        (octet_length(col("payload")).cast("long") / 2).cast("long"),
        (octet_length(col("payload")).cast("long") * 3 / 4).cast("long"))
        .as("frame_offsets"))

  /** Per-frame sampling relation: one row per stub-decoded frame offset,
    * keeping every `stride`-th frame — the deterministic frame-sample step
    * of a video pipeline (pick k frames per clip before feature
    * extraction). The explode multiplies ROWS, never bytes: the payload
    * column is not carried through, so at 100 TB the sampled-frame table
    * stays metadata-sized while the binary column is read once. */
  def frameSample(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride > 0, "stride must be positive")
    val n = octet_length(col("payload")).cast("long")
    val offsets = array(lit(0L), (n / 4).cast("long"), (n / 2).cast("long"),
      (n * 3 / 4).cast("long")) // = StubCodec.decode(...).frame_offsets
    media.select(col("doc_id"), n.as("n_bytes"),
        posexplode(offsets).as(Seq("frame_idx", "frame_offset")))
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)
      .select(col("doc_id"), col("frame_idx"), col("frame_offset"), col("n_bytes"))
  }

  /** Typed per-partition batch decode — the shape a real codec UDF takes
    * (one iterator pass per partition, no per-row JVM↔native churn). Used
    * by tests to prove the stub and the columnar path agree. */
  def decodeBatches(spark: SparkSession, media: DataFrame): Dataset[StubCodec.Features] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload")).as[MediaRow]
      .mapPartitions(_.map(r => StubCodec.decode(r.payload)))
  }

  /** One decoded image: success flag + pixel dimensions (-1 on failure —
    * a corrupt payload flags, it never crashes the scan). */
  final case class DecodedImage(doc_id: Long, decoded_ok: Boolean,
      dec_width: Long, dec_height: Long)

  /** REAL decode for one format — BMP via `javax.imageio` (in the JDK,
    * no external codec needed) — replacing [[StubCodec]] on exactly the
    * pipeline shape [[decodeBatches]] documents: a typed per-partition
    * iterator pass over binary payloads. Proves the stubbed plumbing
    * carries a true codec unchanged; q_media_decode cross-checks every
    * decoded (width, height) against the pure-codegen header walk
    * ([[parseBmp]]) under a DuckDB oracle.
    *
    * Scale shape: embarrassingly parallel scan — decode cost is linear
    * in payload bytes, no shuffle, no driver involvement; `mapPartitions`
    * is the documented last-resort tier, justified here because a pixel
    * decoder is genuine per-row imperative logic no Catalyst expression
    * can express. ImageIO's disk cache is disabled per partition — the
    * default writes a temp FILE per image, a pathological pattern at
    * a million payloads per executor. */
  def decodeBmp(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) DecodedImage(id, decoded_ok = false, -1L, -1L)
            else DecodedImage(id, decoded_ok = true,
              img.getWidth.toLong, img.getHeight.toLong)
          } catch { // malformed payload: quarantine-flag, never throw
            case _: Exception => DecodedImage(id, decoded_ok = false, -1L, -1L)
          }
        }
      }.toDF()
  }

  /** Patterned-BMP geometry shared by [[synthBmpPattern]], the aHash
    * pipeline and both DuckDB mirrors: FIXED 16×16 24-bpp — the row
    * stride 16·3 = 48 is already 4-byte aligned, so there are no pad
    * bytes and the pixel-byte offset math is exact on both sides. */
  val PatW = 16
  val PatH = 16

  /** Deterministic pixel byte for the patterned BMP (c: 0=B 1=G 2=R,
    * y counted FROM THE TOP): an image FAMILY base (doc_id % 16, a
    * mod-256 shift whose wraparound genuinely reorders pixels), a fixed
    * texture, and a small bright patch whose width is the PERTURBATION
    * (doc_id div 16 % 4) — so documents in one (family, perturbation)
    * class render identical images, perturbation siblings differ in a
    * couple of top-left blocks, and families differ everywhere. All
    * integer and non-negative; mirrored digit-for-digit in SQL. */
  private def patByte(d: Column, x: Column, y: Column, c: Column): Column = {
    // Column `/` is DOUBLE division — integer-divide via floor+cast
    // (exact for any doc_id below 2^52) to mirror SQL's integer `//`
    val pert = floor(d / lit(16)).cast("long") % 4
    ((d % 16) * lit(40L) + (x * 23 + y * 31 + c * 11) % 97 +
      when(x < pert && y < 2, lit(120L)).otherwise(lit(0L))) % 256
  }

  /** Synthesize a VALID patterned 24-bpp BMP per document (same header
    * fields as [[synthBmp]] at the fixed [[PatW]]×[[PatH]] geometry,
    * body = [[patByteJvm]] pixels bottom-up) as a per-partition byte
    * builder. This replaced an 822-hex-char expression build
    * (concat_ws over a 768-element transform of lpad(hex(...))): the
    * string churn cost ~0.5 ms/row — 2.4 s of the q_image_ahash bench
    * at sf0.1 while the actual decode+hash took 0.45 s — where writing
    * the same bytes into one ByteBuffer is ~50 µs/row. Bytes are
    * field-for-field identical to the old expression output (54-byte
    * LE header; 48-byte stride is 4-aligned so no pad bytes), and the
    * closed-form oracles pin the decode path, so the swap is
    * observationally free. Same mapPartitions tier as
    * [[synthImageReal]]: codec byte-assembly is per-row imperative
    * work no Catalyst expression does efficiently. */
  def synthBmpPattern(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val stride = PatW * 3
      val imageSize = stride * PatH
      it.map { id =>
        val buf = java.nio.ByteBuffer.allocate(54 + imageSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put('B'.toByte).put('M'.toByte)
        buf.putInt(imageSize + 54).putInt(0).putInt(54)
        buf.putInt(40).putInt(PatW).putInt(PatH)
        buf.putShort(1).putShort(24)
        buf.putInt(0).putInt(imageSize)
        buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
        var p = 0
        while (p < imageSize) {
          // bottom-up row r = p / stride, x = (p mod stride) / 3,
          // channel = p mod 3; top-row y = PatH-1-r
          buf.put(patByteJvm(id, (p % stride) / 3,
            PatH - 1 - p / stride, p % 3).toByte)
          p += 1
        }
        MediaRow(id, "image/bmp", buf.array())
      }
    }.toDF()
  }

  /** One perceptual-hash row: decode flag, the 64-bit average-hash as a
    * '0'/'1' string (row-major 8×8 blocks; a string so banding and
    * Hamming stay plain SQL with no int64 sign games), and the global
    * block-mean the bits threshold against. */
  final case class AHashRow(doc_id: Long, decoded_ok: Boolean,
      ahash: String, mean_gray: Long)

  /** Average-hash over REAL-decoded pixels ([[decodeBmp]]'s imageio
    * path): gray = (b+g+r) div 3 per pixel, 8×8 blocks of 2×2 pixels
    * box-averaged with integer division, bit = block mean > global mean
    * of the 64 block means. Every step is exact integer math, so the
    * closed-form DuckDB mirror (which renders [[patByte]] directly and
    * never decodes) pins the WHOLE decode→feature path bit for bit.
    * Same per-partition batch shape as the other real codecs. */
  /** One resized image row: geometry, the md5 digest of the resized
    * gray pixels (comma-joined row-major — the compact oracle-comparable
    * rendering of the pixel block), and their mean. */
  final case class ResizedImage(doc_id: Long, decoded_ok: Boolean,
    out_w: Int, out_h: Int, px_digest: String, mean_gray: Long)

  /** REAL-decode image resize: decode via javax.imageio, then integer
    * box-average downsample by `factor` — OWN math (block gray sum //
    * block area, gray = (r+g+b)/3, trailing non-multiple rows/cols
    * cropped), not AWT's interpolator, so the result is deterministic
    * across JVMs and closed-form mirrorable by the oracle. This is the
    * thumbnail/normalize step of a multimodal ingest pipeline: at scale
    * it runs as the same per-partition imperative codec pass as the
    * decoders, emitting a constant-size descriptor per image (digest +
    * stats), never shuffling pixels. Corrupt payloads flag, never
    * throw — the quarantine contract every codec here shares. */
  def imageResize(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            val ow = if (img == null) 0 else img.getWidth / factor
            val oh = if (img == null) 0 else img.getHeight / factor
            if (img == null || ow < 1 || oh < 1)
              ResizedImage(id, decoded_ok = false, -1, -1, "", -1L)
            else {
              // row-wise bulk getRGB: ONE colour-model conversion per
              // scanline instead of one per source pixel (the per-call
              // conversion dominated the factor²-per-output-pixel loop).
              // The integer math per pixel is unchanged, so the digest
              // below is bit-identical to the per-pixel form.
              val px = new Array[Long](ow * oh)
              val iw = ow * factor
              val row = new Array[Int](iw)
              val acc = new Array[Long](ow)
              var bj = 0
              while (bj < oh) {
                java.util.Arrays.fill(acc, 0L)
                var dy = 0
                while (dy < factor) {
                  img.getRGB(0, bj * factor + dy, iw, 1, row, 0, iw)
                  var x = 0
                  while (x < iw) {
                    val rgb = row(x)
                    acc(x / factor) += (((rgb >> 16) & 255) +
                      ((rgb >> 8) & 255) + (rgb & 255)) / 3
                    x += 1
                  }
                  dy += 1
                }
                var bi = 0
                while (bi < ow) {
                  px(bj * ow + bi) = acc(bi) / (factor.toLong * factor)
                  bi += 1
                }
                bj += 1
              }
              val digest = java.security.MessageDigest.getInstance("MD5")
                .digest(px.mkString(",").getBytes("UTF-8"))
                .map(b => f"${b & 0xff}%02x").mkString
              ResizedImage(id, decoded_ok = true, ow, oh, digest,
                px.sum / (ow * oh))
            }
          } catch {
            case _: Exception =>
              ResizedImage(id, decoded_ok = false, -1, -1, "", -1L)
          }
        }
      }.toDF()
  }

  def imageAHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null || img.getWidth != PatW || img.getHeight != PatH)
              AHashRow(id, decoded_ok = false, "", -1L)
            else {
              val bm = new Array[Long](64)
              var bj = 0
              while (bj < 8) {
                var bi = 0
                while (bi < 8) {
                  var s = 0L
                  var dy = 0
                  while (dy < 2) {
                    var dx = 0
                    while (dx < 2) {
                      val rgb = img.getRGB(bi * 2 + dx, bj * 2 + dy)
                      val r = (rgb >> 16) & 255; val g = (rgb >> 8) & 255
                      val b = rgb & 255
                      s += (b + g + r) / 3
                      dx += 1
                    }
                    dy += 1
                  }
                  bm(bj * 8 + bi) = s / 4
                  bi += 1
                }
                bj += 1
              }
              val mean = bm.sum / 64
              val bits = bm.map(v => if (v > mean) '1' else '0').mkString
              AHashRow(id, decoded_ok = true, bits, mean)
            }
          } catch {
            case _: Exception => AHashRow(id, decoded_ok = false, "", -1L)
          }
        }
      }.toDF()
  }

  /** [[patByte]] in plain JVM ints — the per-partition mirror the real
    * encoders/decoders use; kept adjacent so the two formulas can be
    * eyeballed as one. */
  private[operators] def patByteJvm(d: Long, x: Int, y: Int, c: Int): Int = {
    val pert = (d / 16) % 4
    (((d % 16) * 40 + (x * 23 + y * 31 + c * 11) % 97 +
      (if (x < pert && y < 2) 120 else 0)) % 256).toInt
  }

  /** Synthesize a REAL PNG or JPEG per document: render the [[patByte]]
    * pattern into a BufferedImage and run it through javax.imageio's
    * actual encoder — a genuinely decodable payload, unlike [[synthPng]]/
    * [[synthJpeg]] whose zero-filled IDAT / dummy entropy data exercise
    * the container WALK but no pixel codec. Same per-partition batch
    * shape as the decoders (encode is per-row imperative codec work). */
  def synthImageReal(docs: DataFrame, format: String): DataFrame = {
    require(format == "png" || format == "jpeg",
      s"format must be png|jpeg, got '$format'")
    val spark = docs.sparkSession
    import spark.implicits._
    val mt = s"image/$format"
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(id => MediaRow(id, mt, encodeImage(renderPattern(id), format)))
    }.toDF()
  }

  /** Render doc `id`'s [[patByteJvm]] pattern — the image both the synth
    * encoders and the decode-verify scoring share. */
  private[operators] def renderPattern(id: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      PatW, PatH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < PatH) {
      var x = 0
      while (x < PatW) {
        img.setRGB(x, y, (patByteJvm(id, x, y, 2) << 16) |
          (patByteJvm(id, x, y, 1) << 8) | patByteJvm(id, x, y, 0))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode through javax.imageio's actual codec. JPEG uses explicit
    * quality 0.95: the pattern is per-pixel noise (worst case for JPEG),
    * and the default 0.75 tables push worst-image MAE to 17 gray
    * levels — indistinguishable from a mild decode bug. */
  private[operators] def encodeImage(img: java.awt.image.BufferedImage,
      format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    if (format == "jpeg") {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      w.setOutput(out)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose(); out.close()
    } else javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Mean absolute gray error of a decoded [[PatW]]×[[PatH]] image vs
    * doc `id`'s closed-form pattern. */
  private def maeVsPattern(img: java.awt.image.BufferedImage,
      id: Long): Double = {
    var errSum = 0L
    var y = 0
    while (y < PatH) {
      var x = 0
      while (x < PatW) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)) / 3
        val want = (patByteJvm(id, x, y, 0) + patByteJvm(id, x, y, 1) +
          patByteJvm(id, x, y, 2)) / 3
        errSum += math.abs(gray - want)
        x += 1
      }
      y += 1
    }
    errSum.toDouble / (PatW * PatH)
  }

  /** Worst-case JPEG round-trip MAE over the 64 distinct pattern images
    * (16 families × 4 perturbations — every image ANY SF can render,
    * since the pattern depends on doc_id only through d%16 and d/16%4),
    * measured against the RUNNING JVM's own encoder tables at the same
    * 0.95 quality [[synthImageReal]] uses. Driver-side, 64 tiny images —
    * microseconds next to any query. */
  lazy val jpegWorstCaseMae: Double = {
    javax.imageio.ImageIO.setUseCache(false)
    (0L until 64L).map { d =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(encodeImage(renderPattern(d), "jpeg")))
      maeVsPattern(img, d)
    }.max
  }

  /** Headroom over [[jpegWorstCaseMae]] for the decode contract bound:
    * quantization noise lands AT the enumerated worst case by
    * construction, while the failure modes the boolean exists to catch
    * (channel swap, stride bug, row flip) measure tens of gray levels —
    * several times the bound on any sane encoder. Deriving the bound
    * from the running JVM's own tables adapts it to whatever JRE runs
    * the job — with one honest caveat: the lazy val evaluates on the
    * DRIVER (it feeds [[decodeImageVsPattern]]'s default parameter), so
    * on a cluster whose executors carry a DIFFERENT ImageIO plugin set
    * than the driver, executor-encoded noise may not be bounded by the
    * driver-measured worst case. Homogeneous clusters (the normal Spark
    * deployment) are fine; heterogeneous ones should pass an explicit
    * `maxMae` measured on the executor image. The DEFAULT additionally
    * floors the derived bound at [[JpegMaeAbsFloor]] gray levels so a
    * driver whose own tables happen to be unusually tight never hands
    * executors a bound below the historical cross-JRE worst case — the
    * failure modes the boolean catches sit at tens of gray levels, so
    * the floor costs no detection power. */
  val JpegMaeHeadroom = 1.25

  /** Absolute floor (gray levels) under the derived default `maxMae` —
    * the pre-derivation fixed bound, kept as the cross-JRE safety net. */
  val JpegMaeAbsFloor = 16.0

  /** One real-decoded image scored against the closed-form pattern:
    * decode flag, decoder-reported geometry, and whether the mean
    * absolute gray error vs [[patByte]] stays within `maxMae` — TRUE for
    * a correct lossless codec (MAE 0) and for a sane lossy one (the
    * default bound is the enumerated [[jpegWorstCaseMae]] with
    * [[JpegMaeHeadroom]]; a channel swap, stride bug, or row flip is
    * tens of gray levels). The numeric MAE itself is deliberately NOT a
    * column: it varies with the JVM's JPEG tables, so only the contract
    * boolean is oracle-pinnable. */
  final case class DecodedVsPattern(doc_id: Long, decoded_ok: Boolean,
      dec_width: Long, dec_height: Long, mae_ok: Boolean)

  def decodeImageVsPattern(media: DataFrame,
      maxMae: Double =
        math.max(jpegWorstCaseMae * JpegMaeHeadroom, JpegMaeAbsFloor))
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null || img.getWidth != PatW || img.getHeight != PatH)
              DecodedVsPattern(id, decoded_ok = false, -1L, -1L, mae_ok = false)
            else
              DecodedVsPattern(id, decoded_ok = true,
                img.getWidth.toLong, img.getHeight.toLong,
                mae_ok = maeVsPattern(img, id) <= maxMae)
          } catch {
            case _: Exception =>
              DecodedVsPattern(id, decoded_ok = false, -1L, -1L, mae_ok = false)
          }
        }
      }.toDF()
  }

  /** One decoded audio payload: success flag, format fields as the
    * decoder reports them, and exact sample statistics (-1 on failure —
    * corrupt audio flags, never crashes the scan). */
  final case class DecodedAudio(doc_id: Long, decoded_ok: Boolean,
      a_channels: Long, a_rate: Long, a_samples: Long,
      a_first: Long, a_peak: Long)

  /** REAL audio decode — WAV/PCM via `javax.sound.sampled` (in the JDK,
    * like [[decodeBmp]]'s imageio) on the same typed per-partition batch
    * shape: the codec parses the RIFF container, reports the format, and
    * streams the raw frames, from which exact 16-bit LE sample stats
    * (count, first, peak) are folded — so q_media_decode_wav can pin the
    * whole decode path against closed-form expectations (the synthesized
    * bodies are constant 0x5A bytes ⇒ every sample is 0x5A5A = 23130).
    * Two real codecs (image + audio) now prove the stub plumbing. */
  /** Real-decode a 16-bit LE PCM payload to its interleaved samples
    * (None on anything malformed — the quarantine contract).
    *
    * NEVER trust the declared format for read sizing: the fuzz sweep
    * (MediaDecodeSpec) caught readAllBytes spinning forever on a
    * byte-flipped header — AudioInputStream.read returns 0 (not -1)
    * whenever the request is smaller than the frame size, so a corrupt
    * frameSize > the 8 KB chunk livelocks. Read in explicit
    * frame-aligned chunks, capped by the CONTAINER size (PCM can't
    * exceed the bytes we were handed). */
  private def readPcm16(bytes: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val frameSize = fmt.getFrameSize
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          frameSize <= 0 || frameSize > 4096) {
        ais.close()
        None
      } else {
        val chunk = new Array[Byte](frameSize * math.max(1, 8192 / frameSize))
        val out = new java.io.ByteArrayOutputStream()
        var r = ais.read(chunk)
        while (r > 0 && out.size <= bytes.length) {
          out.write(chunk, 0, r)
          r = ais.read(chunk)
        }
        ais.close()
        val data = out.toByteArray
        val n = data.length / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
          i += 1
        }
        Some((fmt, samples))
      }
    } catch { // malformed payload: quarantine-flag, never throw
      case _: Exception => None
    }

  /** One audio-feature row: sample count, peak |s|, strict sign-change
    * count, and RMS quantized to 1e-4 (floor(x·10⁴ + 0.5) — the repo's
    * oracle-stable float rule; the sum of squares is an exact Long and
    * its double image is exact below 2⁵³, so Spark and the oracle take
    * the SAME IEEE sqrt of the SAME value). */
  final case class AudioFeatureRow(doc_id: Long, decoded_ok: Boolean,
      n_samples: Long, peak: Long, n_zero_cross: Long, rms_q: Long)

  /** REAL-decode audio feature extraction — the feature-extract step of
    * a multimodal ingest pipeline (loudness / activity screens), over
    * the interleaved PCM stream exactly as [[decodeWav]] reads it. Same
    * per-partition codec shape, constant-size descriptor per clip,
    * corrupt payloads flag and never throw. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          readPcm16(bytes) match {
            case None | Some((_, Array())) =>
              AudioFeatureRow(id, decoded_ok = false, -1L, -1L, -1L, -1L)
            case Some((_, samples)) =>
              var peak = 0L
              var zc = 0L
              var sumSq = 0L
              var i = 0
              while (i < samples.length) {
                val s = samples(i).toLong
                val a = math.abs(s)
                if (a > peak) peak = a
                if (i > 0 && samples(i - 1).toLong * s < 0) zc += 1
                sumSq += s * s
                i += 1
              }
              val rms = math.sqrt(sumSq.toDouble / samples.length)
              AudioFeatureRow(id, decoded_ok = true, samples.length.toLong,
                peak, zc, math.floor(rms * 10000 + 0.5).toLong)
          }
        }
      }.toDF()
  }

  def decodeWav(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          readPcm16(bytes) match {
            case None =>
              DecodedAudio(id, decoded_ok = false, -1L, -1L, -1L, -1L, -1L)
            case Some((fmt, samples)) =>
              var peak = 0L
              var i = 0
              while (i < samples.length) {
                val a = math.abs(samples(i).toLong)
                if (a > peak) peak = a
                i += 1
              }
              DecodedAudio(id, decoded_ok = true, fmt.getChannels.toLong,
                fmt.getSampleRate.toLong, samples.length.toLong,
                if (samples.isEmpty) 0L else samples(0).toLong, peak)
          }
        }
      }.toDF()
  }

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

  /** Byte at 1-based offset `off` as an unsigned long (codegen path). */
  private def byteAt(p: Column, off: Int): Column =
    conv(hex(substring(p, off, 1)), 16, 10).cast("long")

  /** Little-endian unsigned int of `n` bytes at 1-based offset `off`. */
  def leUInt(p: Column, off: Int, n: Int): Column =
    (0 until n).map(i => byteAt(p, off + i) * (1L << (8 * i))).reduce(_ + _)

  /** Value (0 ≤ v < 2^(8·n)) → little-endian `n`-byte uppercase hex. */
  def leHex(v: Column, n: Int): Column =
    concat((0 until n).map(i =>
      lpad(hex(shiftright(v.cast("long"), 8 * i).bitwiseAND(lit(255L))), 2, "0")): _*)

  /** WAV field derivations from doc_id (query + oracle share the rule):
    * mono/stereo by parity, 8–40 kHz sample rate, 16-bit PCM, 1–100
    * blocks of payload. */
  private def wavFields(id: Column): (Column, Column, Column, Column, Column) = {
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
  private def wavHeaderHex(id: Column): Column = {
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
  private def patSample(id: Column, k: Column): Column =
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

  /** BMP field derivations from doc_id: 16–79 px wide, 16–63 px tall,
    * 24 bpp, rows padded to 4 bytes (the BMP stride rule). */
  private def bmpFields(id: Column): (Column, Column, Column, Column) = {
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

  /** Big-endian unsigned int of `n` bytes at COLUMN offset `off`
    * (1-based); NULL-safe −1 when the read runs past the payload. */
  private def beUIntAt(p: Column, off: Column, n: Int): Column =
    coalesce(conv(nullif(hex(call_function("substring", p, off.cast("int"), lit(n))),
      lit("")), 16, 10).cast("long"), lit(-1L))

  /** Value (0 ≤ v < 2^(8·n)) → big-endian `n`-byte uppercase hex. */
  def beHex(v: Column, n: Int): Column = lpad(hex(v.cast("long")), 2 * n, "0")

  /** Decode hex-encoded bytes as US-ASCII only when every byte is 7-bit;
    * a high byte surfaces as the raw hex instead. ANSI `decode` THROWS on
    * non-ASCII input (fuzz-found via MediaWalkSpec's mutation property) —
    * a corrupt chunk-type/brand byte must flag, never crash the scan. */
  private def asciiOrHex(hexStr: Column): Column =
    when(hexStr.rlike("^(?:[0-7][0-9A-F])*$"),
      decode(unhex(hexStr), "US-ASCII")).otherwise(hexStr)

  /** CRC-32 of a chunk built as hex (type || data) — PNG stores exactly
    * this CRC, big-endian, after the data. */
  private def chunkCrcHex(typeAndDataHex: Column): Column =
    beHex(crc32(unhex(typeAndDataHex)), 4)

  /** PNG field derivations from doc_id (query + oracle share the rule):
    * 1–128 px wide, 1–96 tall, bit depth 8, color type ∈ {0,2,6},
    * 1–4 tEXt chunks of varying length, 1–50 byte IDAT. */
  private def pngFields(id: Column): (Column, Column, Column, Column, Column) = {
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
  private def textLen(id: Column, j: Int): Column =
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

  /** JPEG field derivations from doc_id (query + oracle share the rule):
    * 1–3 extra APPn segments, 16–270 px wide, 16–200 tall, 1 or 3
    * components, 5–44 bytes of entropy-coded data. */
  private def jpegFields(id: Column): (Column, Column, Column, Column, Column) = {
    val nApp = lit(1L) + pmod(id, lit(3L))
    val width = lit(16L) + pmod(id, lit(255L))
    val height = lit(16L) + pmod(id, lit(185L))
    val nComp = lit(1L) + pmod(id, lit(2L)) * 2
    val entropyLen = lit(5L) + pmod(id, lit(40L))
    (nApp, width, height, nComp, entropyLen)
  }

  /** Data length of extra APPn segment `j` (1-based): 7–25 bytes, varying
    * with doc and position so segment offsets are non-uniform. */
  private def appLen(id: Column, j: Int): Column =
    lit(7L) + pmod(id + lit(j.toLong), lit(19L))

  /** Synthesize a VALID baseline JPEG header stream per document: SOI,
    * JFIF APP0, 1–3 APPn segments of varying length, DQT, SOF0 (carrying
    * the real dimensions/components), SOS, entropy filler (0x25 bytes —
    * no 0xFF, so the EOI scan is unambiguous), EOI. */
  /** DQT + SOF0 + SOS + entropy hex — the shared tail of every synthesized
    * JPEG variant. */
  private def jpegTailHex(width: Column, height: Column, nComp: Column,
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
  private def jpegWalk(p: Column, nBytes: Column, isJpeg: Column): Column = {
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

  /** MP4 field derivations from doc_id (query + oracle share the rule):
    * 1-61 s duration at timescale 1000, track id 1-30, 160-1439 ×
    * 120-839 px, 10-89 byte mdat. */
  private def mp4Fields(id: Column): (Column, Column, Column, Column, Column) = {
    val durationMs = lit(1000L) + pmod(id, lit(60000L))
    val trackId = lit(1L) + pmod(id, lit(30L))
    val width = lit(160L) + pmod(id, lit(1280L))
    val height = lit(120L) + pmod(id, lit(720L))
    val mdatLen = lit(10L) + pmod(id, lit(80L))
    (durationMs, trackId, width, height, mdatLen)
  }

  /** Unity transform matrix (9 × 16.16/2.30 fixed, 36 bytes). */
  private val Mp4Matrix = "00010000" + "00000000" + "00000000" +
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

  /** One level of the box walk: fold over up to [[Mp4MaxBoxes]] boxes in
    * [from, until), recording the extent of `want` (offset AFTER its
    * header, and its end) plus the box count and a size-chain check. */
  private def boxLevel(p: Column, from: Column, until: Column,
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

  /** Interleaved multimodal packing: text chunks and sampled media frames
    * of the SAME document laid out in alternating item order (even item
    * ids = text, odd = frames), then packed into fixed-length sequences by
    * the distributed two-level prefix sum in [[Packing]]. Frames cost a
    * fixed token budget (`tokensPerFrame` — the patch-token cost of a
    * vision encoder); the packer itself is modality-blind. */
  def packInterleaved(docs: DataFrame, chunkSize: Int, stride: Int,
      tokensPerFrame: Int, seqLen: Int, docsPerBucket: Int): DataFrame = {
    val text = Chunking.chunk(docs, chunkSize, stride)
      .select(col("doc_id"), (col("chunk_id") * 2).as("chunk_id"),
        lit("text").as("kind"), col("n_chunk_tokens"))
    val frames = frameSample(mediaFromDocs(docs), stride = 2)
      .select(col("doc_id"),
        (col("frame_idx").cast("long") * 2 + 1).as("chunk_id"),
        lit("frame").as("kind"),
        lit(tokensPerFrame.toLong).as("n_chunk_tokens"))
    Packing.pack(text.union(frames), seqLen, docsPerBucket)
      .select(col("doc_id"), col("chunk_id"), col("kind"),
        col("n_chunk_tokens"), col("global_offset"), col("seq_id"),
        col("seq_offset"), col("spans_seq"))
  }
}
