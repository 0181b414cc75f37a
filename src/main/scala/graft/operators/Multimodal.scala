package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MatOps

/** Multimodal-column plumbing: media as opaque BINARY payloads with typed
  * metadata, processed in batches. The media family lives in three
  * sibling files (split at ~1,500 lines, zero behavior change):
  * container synthesizers in [[MediaSynth]], header walks + quarantine
  * in [[MediaWalk]], real codec decodes in [[MediaDecode]]; this file
  * keeps the shared byte/hex primitives, the stub plumbing, and the
  * interleaved packer.
  *
  * The generic decode (arbitrary image/audio codecs) is STUBBED — this
  * container has no media libraries — behind [[StubCodec]], a
  * deterministic fake whose outputs are pure functions of the bytes; BMP
  * has a REAL pixel decoder ([[MediaDecode.decodeBmp]], `javax.imageio`
  * from the JDK) on the same plumbing, proving the shape carries a true
  * codec. Everything around the stub is real and the part that matters at
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

  /** Byte at 1-based offset `off` as an unsigned long (codegen path). */
  private[operators] def byteAt(p: Column, off: Int): Column =
    conv(hex(substring(p, off, 1)), 16, 10).cast("long")

  /** Little-endian unsigned int of `n` bytes at 1-based offset `off`. */
  def leUInt(p: Column, off: Int, n: Int): Column =
    (0 until n).map(i => byteAt(p, off + i) * (1L << (8 * i))).reduce(_ + _)

  /** Value (0 ≤ v < 2^(8·n)) → little-endian `n`-byte uppercase hex. */
  def leHex(v: Column, n: Int): Column =
    concat((0 until n).map(i =>
      lpad(hex(shiftright(v.cast("long"), 8 * i).bitwiseAND(lit(255L))), 2, "0")): _*)

  /** Big-endian unsigned int of `n` bytes at COLUMN offset `off`
    * (1-based); NULL-safe −1 when the read runs past the payload. */
  private[operators] def beUIntAt(p: Column, off: Column, n: Int): Column =
    coalesce(conv(nullif(hex(call_function("substring", p, off.cast("int"), lit(n))),
      lit("")), 16, 10).cast("long"), lit(-1L))

  /** Value (0 ≤ v < 2^(8·n)) → big-endian `n`-byte uppercase hex. */
  def beHex(v: Column, n: Int): Column = lpad(hex(v.cast("long")), 2 * n, "0")

  /** Decode hex-encoded bytes as US-ASCII only when every byte is 7-bit;
    * a high byte surfaces as the raw hex instead. ANSI `decode` THROWS on
    * non-ASCII input (fuzz-found via MediaWalkSpec's mutation property) —
    * a corrupt chunk-type/brand byte must flag, never crash the scan. */
  private[operators] def asciiOrHex(hexStr: Column): Column =
    when(hexStr.rlike("^(?:[0-7][0-9A-F])*$"),
      decode(unhex(hexStr), "US-ASCII")).otherwise(hexStr)

  /** CRC-32 of a chunk built as hex (type || data) — PNG stores exactly
    * this CRC, big-endian, after the data. */
  private[operators] def chunkCrcHex(typeAndDataHex: Column): Column =
    beHex(crc32(unhex(typeAndDataHex)), 4)

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
