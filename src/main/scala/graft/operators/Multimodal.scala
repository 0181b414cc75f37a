package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY payloads with typed
  * metadata, processed in batches.
  *
  * The real decode (image/audio codecs) is STUBBED — this container has no
  * media libraries — behind [[StubCodec]], a deterministic fake whose
  * outputs are pure functions of the bytes. Everything around the stub is
  * real and the part that matters at 100 TB: binary columns survive parquet
  * round-trips, feature extraction is a per-partition batch pass (the same
  * batch shape a vectorized/Arrow UDF would see), and derived metadata
  * stays in columnar form for pruning.
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
}
