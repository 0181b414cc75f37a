package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MatOps

/** REAL codec decodes over the multimodal plumbing (split from
  * [[Multimodal]], zero behavior change): `javax.imageio` pixel decodes
  * for BMP/PNG/JPEG, `javax.sound.sampled`-shaped PCM/WAV decode, the
  * patterned-image synthesizers those decoders are verified against,
  * box-average resize, and the perceptual average-hash. Per-partition
  * codec work on opaque binary payloads; outputs are constant-size
  * descriptors, never pixel shuffles.
  */
object MediaDecode {
  import Multimodal._

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
  private[operators] def patByte(d: Column, x: Column, y: Column, c: Column): Column = {
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

  /** Quantized DCT-II cosine table C(i,k) = round(cos(π(2i+1)k/32)·10⁶)
    * over the fixed 16×16 geometry — int64 so the whole pHash transform
    * is exact integer arithmetic (max |term| = 255·10¹²; 256 terms per
    * coefficient < 2⁶³). StrictMath so the values are specified
    * bit-for-bit, and the SAME array renders the oracle's literal VALUES
    * table — one source of truth for both engines. */
  private[graft] lazy val DctC: Array[Array[Long]] =
    Array.tabulate(PatW, PatW)((i, k) =>
      math.round(StrictMath.cos(math.Pi * (2 * i + 1) * k / (2.0 * PatW)) * 1e6))

  /** One perceptual-DCT-hash row: 63 bits ('0'/'1' string, row-major
    * (u,v) over the low-frequency 8×8 block EXCLUDING the DC term) plus
    * the median coefficient the bits threshold against. */
  final case class PHashRow(doc_id: Long, decoded_ok: Boolean,
      phash: String, dct_median: Long)

  /** Perceptual DCT hash (the classic pHash construction) over
    * REAL-decoded pixels: gray = (b+g+r) div 3, 2-D DCT-II via the
    * quantized integer cosine table, keep the low-frequency 8×8
    * coefficient block, EXCLUDE the DC term, threshold each of the 63
    * remaining coefficients against their exact median (the 32nd
    * smallest of 63 — no interpolation). Where [[imageAHash]] thresholds
    * raw block means (brittle to global brightness: a constant gray
    * shift moves every block AND the mean), the DCT hash is invariant to
    * any constant shift by construction — the shift lives entirely in
    * the discarded DC coefficient — which is why near-dup pipelines run
    * pHash next to aHash. Every step is exact integer math; the DuckDB
    * mirror renders [[patByte]] in closed form and replays the identical
    * table, so a hash match pins decode→gray→DCT→median→threshold bit
    * for bit. Same per-partition codec shape and quarantine contract as
    * the other decoders. */
  def imagePHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val c = DctC
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null || img.getWidth != PatW || img.getHeight != PatH)
              PHashRow(id, decoded_ok = false, "", -1L)
            else {
              val gray = Array.ofDim[Long](PatW, PatH)
              var y = 0
              while (y < PatH) {
                var x = 0
                while (x < PatW) {
                  val rgb = img.getRGB(x, y)
                  gray(x)(y) = (((rgb >> 16) & 255) + ((rgb >> 8) & 255) +
                    (rgb & 255)) / 3
                  x += 1
                }
                y += 1
              }
              val coefs = new Array[Long](63)
              var idx = 0
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  if (u != 0 || v != 0) {
                    var s = 0L
                    var x = 0
                    while (x < PatW) {
                      var yy = 0
                      while (yy < PatH) {
                        s += gray(x)(yy) * c(x)(u) * c(yy)(v)
                        yy += 1
                      }
                      x += 1
                    }
                    coefs(idx) = s
                    idx += 1
                  }
                  v += 1
                }
                u += 1
              }
              val sorted = coefs.sorted
              val median = sorted(31) // exact: 32nd smallest of 63
              val bits = coefs.map(v => if (v > median) '1' else '0').mkString
              PHashRow(id, decoded_ok = true, bits, median)
            }
          } catch {
            case _: Exception => PHashRow(id, decoded_ok = false, "", -1L)
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
  private[operators] def maeVsPattern(img: java.awt.image.BufferedImage,
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
    // make the looser-than-derived default visible: on a host whose JPEG
    // tables derive a bound under the cross-JRE floor, decoder errors
    // between the two would pass silently — intentional, but log it so a
    // tightened-table host shows up in the run's output. Only when the
    // bound in EFFECT is the floor (maxMae == JpegMaeAbsFloor) — an
    // explicit caller-passed maxMae is the caller's contract, not the
    // default's, and the message would be wrong for it
    if (maxMae == JpegMaeAbsFloor && jpegWorstCaseMae * JpegMaeHeadroom < JpegMaeAbsFloor)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"decodeImageVsPattern default maxMae is the $JpegMaeAbsFloor-gray " +
          f"cross-JRE floor (derived bound ${jpegWorstCaseMae * JpegMaeHeadroom}%.2f is tighter)")
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
  private[operators] def readPcm16(bytes: Array[Byte])
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

}
