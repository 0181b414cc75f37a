package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FreqSketch
import graft.operators.{Dedup, Drift, FuzzyJoin, Graph, Layout, Multimodal, RangeJoin, Resample, Signals, Similarity, Skew, TextAnalysis}
import graft.operators.Materialize.MatOps
import graft.sources.Tables
import graft.OracleSql.withTicksBars

/** Extended pipeline operators (dedup / similarity / text analysis /
  * multimodal / relational), each with its DuckDB oracle.
  *
  * Shared portability rules (see OracleSql): md5-derived integer hashes;
  * int64-safe modular arithmetic; money as floor(x·100+0.5) integer cents
  * so sums are order-independent and bit-exact; floor-based 4dp rounding
  * for any true floating output; left-to-right double folds for dot
  * products. */
object ExtendedEntries {

  private def r(c: Column): Column = floor(c * lit(10000) + lit(0.5)) / lit(10000)
  private def r4(e: String): String = s"floor(($e) * 10000 + 0.5) / 10000"

  /** Exact integer cents — order-independent money aggregation. */
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  // --------------------------------------------------------------- queries

  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir))

  private def qTextStats(s: SparkSession, dir: String): DataFrame = {
    val st = TextAnalysis.stats(Tables.documents(s, dir))
    st.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
      r(col("mean_token_len")).as("mean_token_len"),
      r(col("stopword_ratio")).as("stopword_ratio"),
      r(col("distinct_ratio")).as("distinct_ratio"),
      r(col("quality_score")).as("quality_score"))
  }

  private def qTokenCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(s, dir))

  private def qLangId(s: SparkSession, dir: String): DataFrame = {
    val li = TextAnalysis.langId(Tables.documents(s, dir))
    li.select(col("doc_id"), col("lang_label"),
      r(col("en_stopword_ratio")).as("en_stopword_ratio"), col("lang_pred"))
  }

  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(s, dir))

  private def qJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, dir), 0.7, n = 3, maxDf = 100)

  /** Directional containment (doc-in-doc quote detection) over the same
    * capped shingle index as q_jaccard_pairs. */
  private def qContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, dir), ContainTheta, n = 3,
      maxDf = 100)

  /** Containment threshold (query and oracle read the same value). */
  private val ContainTheta = 0.8

  private def qMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(s, dir), 0.7)

  private def qSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), 10)

  /** Multi-index form ([[Dedup.simhashPairsMp]]): 6 bands of 10 bits +
    * Hamming-1 probes instead of 12 bands of 5 bits — 32x the bucket
    * count at the same exact completeness, so the emitted pairs are
    * IDENTICAL to q_simhash (shared oracle). */
  private def qSimhashMp(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsMp(Tables.documents(s, dir), 10)

  private def qCosineTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(Tables.embeddings(s, dir), 10, 5)

  /** k-NN majority-vote label prediction (50 probes, k=10). */
  private def qKnnClassify(s: SparkSession, dir: String): DataFrame =
    Similarity.knnClassify(Tables.embeddings(s, dir), 50, 10)

  private def qCosineIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfSearch(Tables.embeddings(s, dir), 8, 10, 3)

  /** Multi-probe variant: nprobe=2 — the recall knob of IVF search. */
  private def qCosineIvfProbe(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfSearchMultiProbe(Tables.embeddings(s, dir), 8, 10, 3, nprobe = 2)

  /** Incremental index maintenance gate: the persisted index is built in
    * TWO steps — saved with the even vec_ids only, the odd half appended
    * later against the SAME saved centroids — then searched. Assignment
    * is per-vector deterministic given the centroids, so the grown index
    * must search hash-identically to [[qCosineIvf]]'s single-shot plan
    * (it reuses that oracle verbatim). */
  private def qIvfAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cent = Similarity.ivfTrain(emb, 8)
    val idx = SessionScoped.scratchDir("graft_ivf_append")
    Similarity.saveIvfIndexWith(
      emb.filter(pmod(col("vec_id"), lit(2)) === 0), cent, idx)
    Similarity.appendToIvfIndex(s,
      emb.filter(pmod(col("vec_id"), lit(2)) === 1), idx)
    Similarity.ivfSearchIndexed(s, emb, idx, 10, 3)
  }

  /** ANN quality metric: recall@5 of the nprobe=2 IVF search vs the exact
    * brute-force top-5 on the same 10 queries. */
  private def qIvfRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfRecall(Tables.embeddings(s, dir), 8, 10, 5, nprobe = 2)

  /** Semantic-cluster summary over the trained IVF assignment: per-cluster
    * membership count, mean and min cosine-to-centroid — the cluster-size /
    * cohesion view used to pick C and spot skewed clusters before
    * partitioning a corpus by centroid_id. The mean is exact integer math
    * over the 4dp scores (sum of score·10⁴ as int64), so it is
    * order-independent across partitions. */
  private def qEmbedClusters(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfAssign(emb, Similarity.ivfTrain(emb, 8, 2))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(floor(col("cscore") * 10000 + lit(0.5)).cast("long")).as("s4"),
        min(col("cscore")).as("min_cos"))
      .select(col("centroid_id"), col("n_members"),
        r(col("s4").cast("double") / lit(10000.0) / col("n_members")).as("mean_cos"),
        col("min_cos"))
  }

  /** Power-iteration round count shared by q_embed_pca and its unrolled
    * oracle (fixed rounds, no convergence exit — both sides identical by
    * construction). */
  private val PcaRounds = 6

  /** Top principal direction of the embedding cloud
    * ([[Similarity.topDirection]]): quantized power iteration, loadings
    * + Rayleigh eigenvalue estimate per dimension. */
  private def qEmbedPca(s: SparkSession, dir: String): DataFrame =
    Similarity.topDirection(Tables.embeddings(s, dir), PcaRounds)

  /** Gate-friendly projection: the int8 vector rides as a CSV string (the
    * driver's hash compare is scalar-typed; the library API keeps the
    * typed array). */
  private def qEmbedQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("scale"),
        concat_ws(",", col("qvec")).as("qvec_csv"))

  private def qCosineQ8(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopKQ8(Tables.embeddings(s, dir), 10, 5)

  /** SRP-LSH blocked near-dup pairs (the keyed-shuffle replacement for the
    * all-pairs cross join, which survives only as a spec baseline). */
  private def qDedupEmbedLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.dedupPairsLsh(Tables.embeddings(s, dir))

  /** Multi-probe variant ([[Similarity.dedupPairsLshMp]]): Hamming-≤1
    * bucket probing holds the same design recall with ~5× fewer planes
    * at wide operating points — the cheap-coding end of the LSH
    * trade-off surface. */
  private def qDedupEmbedLshMp(s: SparkSession, dir: String): DataFrame =
    Similarity.dedupPairsLshMp(Tables.embeddings(s, dir))

  /** Scale-path variant: same verify expression, candidates blocked to the
    * probe's IVF cluster. Cluster count SCALES WITH THE CORPUS
    * ([[Similarity.clustersFor]]): a fixed k makes Σ|c|² quadratic in N —
    * caught live by the r8 scale-trend bench (2.2× per-SF at 3× data) and
    * linear again once k grows with N. At every verify SF the formula
    * yields 8, matching the oracle's literal. */
  private def qDedupEmbedIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.dedupPairsIvf(emb, 0.4, Similarity.clustersFor(emb.count()))
  }

  /** Multi-assignment (r=2) variant — closes q_dedup_embed_ivf's
    * cross-cluster blind spot; recall deltas vs the all-pairs baseline are
    * measured in SCALE.md. Adaptive cluster count, as above. */
  private def qDedupEmbedIvf2(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.dedupPairsIvfMulti(emb, 0.4,
      Similarity.clustersFor(emb.count()), r = 2)
  }

  /** Batch-vs-corpus incremental EMBEDDING dedup (the vector sibling of
    * q_dedup_incremental): every 5th vector plays the incoming batch,
    * screened against the standing corpus and smaller-id batch vectors
    * via cross-set SRP band joins — the corpus side is never
    * self-joined, and the MULTI-PROBE layout (the default since r12)
    * codes with ~5× fewer planes at wide widths while the Hamming-≤1
    * probe fan-out lands on the delta-sized batch side only.
    * streaming.StreamEmbedDedup drives the same step per micro-batch
    * with bit-exact parity (StreamDedupSpec). */
  private def qDedupEmbedIncr(s: SparkSession, dir: String): DataFrame =
    Similarity.incrementalEmbed(Tables.embeddings(s, dir),
      pmod(col("vec_id"), lit(5)) === 0, Similarity.LshTau)

  private def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.features(Multimodal.mediaFromDocs(Tables.documents(s, dir)))

  private def qFrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(
      Multimodal.mediaFromDocs(Tables.documents(s, dir)), stride = 2)

  /** Real-container codec pass: synthesize a valid PCM WAV per doc, parse
    * its RIFF header back with codegen expressions. The oracle recomputes
    * every field (and the 44 header bytes) arithmetically from doc_id, so
    * a single bit wrong in either direction of the codec fails the hash. */
  private def qMediaWav(s: SparkSession, dir: String): DataFrame =
    Multimodal.parseWav(Multimodal.synthWav(Tables.documents(s, dir)))

  private def qMediaBmp(s: SparkSession, dir: String): DataFrame =
    Multimodal.parseBmp(Multimodal.synthBmp(Tables.documents(s, dir)))

  /** REAL-codec cross-check ([[Multimodal.decodeBmp]]): javax.imageio
    * pixel-decodes every synthesized BMP in a per-partition batch pass,
    * and must agree with the pure-codegen header walk on (width,
    * height) row by row — the oracle pins the walked fields AND
    * `decode_agrees` as literal TRUE, so one disagreeing (or failing)
    * decode anywhere in the corpus fails the hash. */
  private def qMediaDecode(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthBmp(Tables.documents(s, dir))
    Multimodal.parseBmp(media)
      .select(col("doc_id"), col("width"), col("height"), col("bpp"),
        col("n_bytes"))
      .join(Multimodal.decodeBmp(media), Seq("doc_id"))
      .select(col("doc_id"), col("width"), col("height"), col("bpp"),
        col("n_bytes"),
        (col("decoded_ok") && col("dec_width") === col("width") &&
          col("dec_height") === col("height")).as("decode_agrees"))
  }

  /** REAL PNG round trip ([[Multimodal.synthImageReal]] →
    * [[Multimodal.imageAHash]]): the patByte pattern is rendered and
    * pushed through javax.imageio's ACTUAL PNG encoder, decoded back,
    * and aHashed. PNG is lossless, so the decoded pixels — and
    * therefore the hash and mean — must match the closed-form
    * [[Multimodal.patByte]] oracle bit for bit: one wrong byte in
    * either codec direction fails the hash. (The synthPng/parsePng
    * family pins the container WALK; this pins the pixel codec.) */
  private def qMediaDecodePng(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageAHash(
      Multimodal.synthImageReal(Tables.documents(s, dir), "png"))
      .select(col("doc_id"), col("decoded_ok"), col("ahash"), col("mean_gray"))

  /** REAL JPEG round trip: encode the pattern with the actual JPEG
    * encoder, decode back, and score against the closed form. JPEG is
    * LOSSY, so pixel equality is the wrong contract — the pinned fields
    * are geometry + `mae_ok` (mean absolute gray error within the bound
    * derived from [[Multimodal.jpegWorstCaseMae]] — the enumerated
    * worst case over all 64 pattern images on THIS JVM's encoder tables,
    * times [[Multimodal.JpegMaeHeadroom]] — while a channel swap, stride
    * bug, or row flip is tens of levels). Oracle pins all three as
    * literals. */
  private def qMediaDecodeJpeg(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeImageVsPattern(
      Multimodal.synthImageReal(Tables.documents(s, dir), "jpeg"))
      .select(col("doc_id"), col("decoded_ok"), col("dec_width"),
        col("dec_height"), col("mae_ok"))

  /** Banded-Hamming threshold for image near-dup: 4 bands of 16 bits
    * make the candidate join COMPLETE for hamming ≤ 3 (pigeonhole: 3
    * differing bits cannot touch all 4 bands). */
  private val AhashMaxHamming = 3

  /** Perceptual image hashing over REAL-decoded pixels: synthesize the
    * patterned 16×16 BMPs, decode them with javax.imageio, and compute
    * the 64-bit average-hash ([[Multimodal.imageAHash]]). The oracle
    * renders [[Multimodal.patByte]] in closed form and never decodes —
    * a hash mismatch anywhere means the decode→feature path broke. */
  private def qImageAhash(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageAHash(
      Multimodal.synthBmpPattern(Tables.documents(s, dir)))
      .select(col("doc_id"), col("decoded_ok"), col("ahash"), col("mean_gray"))

  /** REAL-decode 2× box-average resize over the patterned BMPs
    * ([[Multimodal.imageResize]]): the thumbnail/normalize ingest step.
    * The pixel digest pins the ENTIRE decode→resample path against the
    * closed-form pattern oracle — one wrong pixel anywhere moves it. */
  private def qImageResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageResize(
      Multimodal.synthBmpPattern(Tables.documents(s, dir)), factor = 2)
      .select(col("doc_id"), col("decoded_ok"), col("out_w"), col("out_h"),
        col("px_digest"), col("mean_gray"))

  /** Image near-dup classes by banded Hamming join over the aHashes:
    * dedup to DISTINCT hashes first (identical renders collapse to one
    * row with a member count — the output stays class-sized, not
    * pair-sized), then 4×16-bit band blocking + exact Hamming ≤
    * [[AhashMaxHamming]] verify — the simhash shape applied to decoded
    * image content. */
  private def qImageNeardup(s: SparkSession, dir: String): DataFrame = {
    val hashes = Multimodal.imageAHash(
        Multimodal.synthBmpPattern(Tables.documents(s, dir)))
      .filter(col("decoded_ok"))
      .groupBy(col("ahash")).agg(count(lit(1)).as("n_members")).materialize
    val bands = hashes.select(col("ahash"), col("n_members"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("sig", expr("substring(ahash, band * 16 + 1, 16)"))
    val ham = expr(
      """CAST(aggregate(transform(sequence(1, 64),
        |  i -> CASE WHEN substring(hash_a, i, 1) <> substring(hash_b, i, 1)
        |            THEN 1 ELSE 0 END), 0, (a, b) -> a + b) AS BIGINT)""".stripMargin)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.ahash") < col("b.ahash"))
      .select(col("a.ahash").as("hash_a"), col("a.n_members").as("n_a"),
        col("b.ahash").as("hash_b"), col("b.n_members").as("n_b"))
      .distinct()
      .withColumn("hamming", ham)
      .filter(col("hamming") <= AhashMaxHamming)
      .select(col("hash_a"), col("hash_b"), col("hamming"),
        col("n_a"), col("n_b"))
  }

  /** REAL-codec cross-check, audio flavor ([[Multimodal.decodeWav]]):
    * javax.sound decodes every synthesized PCM WAV; format fields must
    * match the codegen header walk and the exact sample statistics must
    * match the closed-form expectation (constant 0x5A body ⇒ every
    * 16-bit LE sample is 23130) — the oracle pins the walked fields AND
    * `decode_agrees` as literal TRUE. */
  private def qMediaDecodeWav(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthWav(Tables.documents(s, dir))
    Multimodal.parseWav(media)
      .select(col("doc_id"), col("channels"), col("sample_rate"),
        col("data_size"))
      .join(Multimodal.decodeWav(media), Seq("doc_id"))
      .select(col("doc_id"), col("channels"), col("sample_rate"),
        col("data_size"), (col("data_size") / 2).cast("long").as("n_samples"),
        (col("decoded_ok") && col("a_channels") === col("channels") &&
          col("a_rate") === col("sample_rate") &&
          col("a_samples") === (col("data_size") / 2).cast("long") &&
          col("a_first") === 23130L && col("a_peak") === 23130L)
          .as("decode_agrees"))
  }

  /** REAL-decode audio features over the patterned PCM WAVs
    * ([[Multimodal.synthWavPattern]] → [[Multimodal.audioFeatures]]):
    * RMS / zero-crossings / peak against the closed-form sample rule —
    * the loudness/activity screen of a multimodal ingest pipeline,
    * feature math pinned per clip by the oracle. */
  private def qAudioFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioFeatures(
      Multimodal.synthWavPattern(Tables.documents(s, dir)))
      .select(col("doc_id"), col("decoded_ok"), col("n_samples"),
        col("peak"), col("n_zero_cross"), col("rms_q"))

  /** Mixed-modality corpus inventory: evens are audio, odds are images. */
  private def qMediaStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Multimodal.modalityStats(
      Multimodal.parseWav(Multimodal.synthWav(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0))),
      Multimodal.parseBmp(Multimodal.synthBmp(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))))
  }

  /** PNG chunk-chain walk: synthesize real multi-chunk PNGs (variable
    * chunk count + lengths, real CRC-32s) and parse them back by walking
    * the offset-chained chunk list in pure codegen. */
  private def qMediaPng(s: SparkSession, dir: String): DataFrame =
    Multimodal.parsePng(Multimodal.synthPng(Tables.documents(s, dir)))

  /** JPEG marker-segment walk: variable-length self-counting segment
    * lengths, SOF0 dimensions captured mid-walk, and the entropy span
    * closed by SCANNING for EOI (no length field exists — the structural
    * wrinkle PNG's indexed chain doesn't have). */
  private def qMediaJpeg(s: SparkSession, dir: String): DataFrame =
    Multimodal.parseJpeg(Multimodal.synthJpeg(Tables.documents(s, dir)))

  /** EXIF TIFF-IFD parse: the APP1 block is located by the marker walk,
    * then read in the PER-FILE byte order its TIFF header declares (II
    * for even doc ids, MM for odd) — endian-switching reads over IFD0's
    * tag entries, cross-checked against the SOF0 frame header. */
  private def qMediaExif(s: SparkSession, dir: String): DataFrame =
    // barrier between synth and parse: the endian-branched synth fused
    // with the marker walk overflows the 64 KB codegen method limit and
    // drops the stage to interpreted eval (a real pipeline parses stored
    // bytes anyway — same shape as synthPngCorrupt's barrier)
    Multimodal.parseExif(
      operators.Materialize(Multimodal.synthJpegExif(Tables.documents(s, dir))))

  /** Nested-container walk: minimal ISO-BMFF (MP4) files — ftyp, moov
    * holding mvhd + trak ▸ tkhd, mdat — parsed by chained bounded folds,
    * one per nesting level, each scoped to the extent its parent level
    * recorded. */
  private def qMediaMp4(s: SparkSession, dir: String): DataFrame =
    Multimodal.parseMp4(
      operators.Materialize(Multimodal.synthMp4(Tables.documents(s, dir))))

  /** Corrupt-payload quarantine across BOTH walked formats: deterministic
    * corruptions (bad magic / bad CRC / bad marker prefix / truncated)
    * routed to one reason-tagged, modality-tagged quarantine relation by
    * the integrity gates of the PNG and JPEG walks. */
  private def qMediaQuarantine(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val png = Multimodal.pngQuarantine(
      Multimodal.parsePng(Multimodal.synthPngCorrupt(docs)))
      .select(col("doc_id"), lit("image/png").as("modality"),
        col("n_bytes"), col("n_chunks"), col("reason"))
    val jpg = Multimodal.jpegQuarantine(
      Multimodal.parseJpeg(Multimodal.synthJpegCorrupt(docs)))
      .select(col("doc_id"), lit("image/jpeg").as("modality"),
        col("n_bytes"), col("n_chunks"), col("reason"))
    png.unionByName(jpg)
  }

  private def qPackInterleaved(s: SparkSession, dir: String): DataFrame =
    Multimodal.packInterleaved(Tables.documents(s, dir), chunkSize = 40,
      stride = 30, tokensPerFrame = 64, seqLen = 512, docsPerBucket = 64)

  /** TPC-H-Q1-style pricing summary; money in integer cents. */
  private def qAggPricing(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val dp = cents(col("l_discount"))  // discount in integer percent-of-100
    val tp = cents(col("l_tax"))
    // revenue/charge per-row products reach ~1e9/~1e11 cents³: sum as
    // DECIMAL(38,0) so large scale factors can't wrap int64 (Spark's
    // non-ANSI sum(long) wraps silently; DuckDB widens to HUGEINT)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sq"),
        sum(cents(col("l_extendedprice"))).as("se"),
        sum(dp).as("sd"),
        sum((cents(col("l_extendedprice")) * (lit(100L) - dp))
          .cast("decimal(38,0)")).as("srev"),
        sum((cents(col("l_extendedprice")) * (lit(100L) - dp) * (lit(100L) + tp))
          .cast("decimal(38,0)")).as("sch"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("sq") / lit(100.0)).as("sum_qty"),
        (col("se") / lit(100.0)).as("sum_base_price"),
        (col("srev").cast("double") / lit(10000.0)).as("sum_disc_price"),
        (col("sch").cast("double") / lit(1000000.0)).as("sum_charge"),
        (col("sq") / lit(100.0) / col("n")).as("avg_qty"),
        (col("se") / lit(100.0) / col("n")).as("avg_price"),
        (col("sd") / lit(100.0) / col("n")).as("avg_disc"),
        col("n").as("count_order"))
  }

  /** Star join: orders ⋈ customer ⋈ nation (dims broadcast), revenue per
    * nation. */
  private def qJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("o_totalprice"))).as("revc"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .select(col("n_name"), (col("revc") / lit(100.0)).as("revenue"),
        col("n_orders"), col("n_customers"))
  }

  /** Gap-based sessionization (30 min inactivity) — the classic streaming
    * windowing pattern expressed over the batch table. */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    val isNew = when(gap.isNull || gap > 1800000000L, 1).otherwise(0)
    Tables.events(s, dir)
      .withColumn("session_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("vc"))
      .select(col("user_id"), col("session_id"), col("session_start"),
        col("session_end"), col("n_events"), (col("vc") / lit(100.0)).as("total_value"))
  }

  /** As-of join: each tick enriched with the prevailing hourly bar
    * (most recent bar at-or-before the tick). */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame =
    operators.AsOfJoin.asof(Tables.ticks(s, dir), Tables.bars(s, dir),
      "symbol", "time", Seq("close", "volume"))
      .select(col("symbol"), col("time"), col("price"),
        col("asof_time"), col("asof_close"), col("asof_volume"))

  /** Forward as-of with tolerance: each tick attaches the NEXT hourly bar
    * (right.time >= tick.time) if it arrives within 2 h of event time. */
  private def qAsofFwd(s: SparkSession, dir: String): DataFrame =
    operators.AsOfJoin.asof(Tables.ticks(s, dir), Tables.bars(s, dir),
      "symbol", "time", Seq("close", "volume"),
      direction = "forward", toleranceUs = 7200000000L)
      .select(col("symbol"), col("time"), col("price"),
        col("asof_time"), col("asof_close"), col("asof_volume"))

  /** Nearest as-of (ties → backward, pandas semantics). */
  private def qAsofNearest(s: SparkSession, dir: String): DataFrame =
    operators.AsOfJoin.asof(Tables.ticks(s, dir), Tables.bars(s, dir),
      "symbol", "time", Seq("close", "volume"), direction = "nearest")
      .select(col("symbol"), col("time"), col("price"),
        col("asof_time"), col("asof_close"), col("asof_volume"))

  /** Incremental bar maintenance: base (¾ of ticks) and delta (¼) are
    * aggregated to mergeable partials independently, then merged — the
    * oracle recomputes from all ticks at once, proving the merge algebra. */
  private def qBarsIncremental(s: SparkSession, dir: String): DataFrame = {
    val ticks = Tables.events(s, dir).select(
      col("user_id").cast("string").as("symbol"),
      col("ts").as("time"),
      col("value").as("price"),
      (col("event_id") % 97 + 1).cast("long").as("volume"),
      col("event_id"))
    val base = ticks.filter(col("event_id") % 4 =!= 0).drop("event_id")
    val delta = ticks.filter(col("event_id") % 4 === 0).drop("event_id")
    operators.Incremental.finalizeBars(operators.Incremental.mergeBars(
      operators.Incremental.partialBars(base),
      operators.Incremental.partialBars(delta)))
  }

  /** Columns profiled by q_profile (query and oracle share the list). */
  private val ProfileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Single-scan table profile over orders (ANALYZE analog). */
  private def qProfile(s: SparkSession, dir: String): DataFrame =
    operators.Profile.profile(Tables.orders(s, dir), ProfileCols)

  /** ROLLUP aggregation (grouping-sets family). */
  private def qRollupRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(sum(cents(col("o_totalprice"))).as("revc"), count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"), col("o_orderstatus"),
        (col("revc") / lit(100.0)).as("revenue"), col("n_orders"))

  /** CUBE — all four grouping combinations in one pass (rollup's sibling;
    * Spark plans both as a single Expand + hash aggregate, so the cost is
    * one scan regardless of the grouping-set count). */
  private def qCubeRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(sum(cents(col("o_totalprice"))).as("revc"), count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"), col("o_orderstatus"),
        (col("revc") / lit(100.0)).as("revenue"), col("n_orders"))

  /** Top-k per key (ORDER BY + LIMIT per group). */
  private def qTopkPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("user_id"), col("rk"), col("event_id"), col("ts"), col("value"))
  }

  /** Which documents to drop: LSH pairs → components → canonical per doc. */
  private def qDedupCorpus(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupCorpus(Tables.documents(s, dir), 0.7)

  /** Sketch aggregates (HLL distinct, approximate percentiles) — the
    * SHIPPED plan, and the one the bench times: sketch cost only. The
    * estimates are engine-specific (no DuckDB mirror) so this query is
    * rows-only at the oracle gate; the full hash-checked error-band
    * verification lives in the verify-only companion [[qSketchesCheck]]
    * (round 6 benched the companion's four exact percentiles + exact
    * distinct as if they were the sketch's cost — the sketch was paying
    * for its oracle). Raw estimate values stay spec-gated in SketchSpec. */
  private def qSketches(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_approx"),
        percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99_approx"))

  /** Verify-only oracle companion for [[qSketches]] (SparkEntry.verifyOnly
    * — runs at the correctness gate, excluded from the bench sweep): exact
    * companion aggregates DuckDB reproduces bit-for-bit plus booleans
    * asserting each estimate sits inside its guaranteed error band — Spark
    * computes the real sketch-vs-exact comparison, the oracle asserts
    * literal TRUE, so a sketch drifting out of contract flips the hash
    * red. Bands: HLL++ rsd 0.05 → 3σ = 15% bound; percentile_approx
    * accuracy 1000 → rank error ε = n/1000, checked against the exact
    * quantiles at rank ±5% (≫ ε here). */
  private def qSketchesCheck(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("au"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50a"),
        percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99a"),
        expr("percentile(value, 0.45)").as("p45x"),
        expr("percentile(value, 0.55)").as("p55x"),
        expr("percentile(value, 0.985)").as("p985x"),
        expr("percentile(value, 0.995)").as("p995x"))
      .select(col("event_type"), col("n"), col("exact_users"),
        (abs(col("au") - col("exact_users")) <=
          col("exact_users") * lit(0.15)).as("users_in_band"),
        col("p50a").between(col("p45x"), col("p55x")).as("p50_in_band"),
        col("p99a").between(col("p985x"), col("p995x")).as("p99_in_band"))

  /** Mergeable-sketch rollup (the 100 TB distinct-count architecture:
    * per-day HLL sketches persisted once, later rollups merge sketches
    * instead of re-scanning raw data) — the SHIPPED plan: sketch + merge
    * cost only, rows-only at the oracle gate (the merged estimate is
    * engine-specific binary). The exact-distinct band check lives in the
    * verify-only companion [[qSketchRollupCheck]]; merge == direct is
    * pinned bit-exactly in SketchSpec. */
  private def qSketchRollup(s: SparkSession, dir: String): DataFrame =
    operators.Sketches.rollupUsers(
      operators.Sketches.dailyUserSketches(Tables.events(s, dir)))
      .select(col("event_type"), col("n_events"), col("n_days"),
        col("approx_users"))

  /** Verify-only oracle companion for [[qSketchRollup]]: exact companions
    * (n_events, n_days — pure relational aggregates DuckDB mirrors) plus a
    * boolean pinning the MERGED estimate inside the sketch's error band vs
    * the exact distinct count. DataSketches HLL at the default lgK=12 has
    * rsd ≈ 1.6%, so the 10% band is ≫ 3σ. The exact-distinct join exists
    * only to power the band check at verify SF. */
  private def qSketchRollupCheck(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val rolled = operators.Sketches.rollupUsers(
      operators.Sketches.dailyUserSketches(ev))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    rolled.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_events"), col("n_days"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * lit(0.10)).as("merged_in_band"))
  }

  /** Heavy-hitters width shared by the q_topk_sketch pair. 16 counters is
    * deliberately far below the test vocabulary (31 tokens) so trims —
    * the part of Misra–Gries with actual error semantics — fire
    * constantly at every SF. */
  private val MgK = 16

  /** Merged token heavy-hitters summary for `dir`'s documents: phase-1
    * per-source MG sketches (the persistable binary column), phase-2
    * associative merge — the same reduce-once/roll-up-forever shape as
    * [[operators.Sketches]]. */
  private def mgTokenSummary(s: SparkSession, dir: String) =
    Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("source"))
      .agg(FreqSketch.mgSketch(col("token"), MgK).as("sk"))
      .agg(FreqSketch.mgMerge(col("sk"), MgK).as("s"))

  /** Mergeable Misra–Gries heavy hitters — the SHIPPED plan: top-10 items
    * of the merged summary with their estimate and the summary's error
    * terms. Rows-only at the oracle gate: MG item estimates are
    * arrival/merge-order dependent (unlike HLL's register-max union), so
    * the hash-gated error contract lives in the verify-only companion
    * [[qTopkSketchCheck]] and the zipf capture property in FreqSketchSpec. */
  private def qTopkSketch(s: SparkSession, dir: String): DataFrame =
    topkPresentation(mgTokenSummary(s, dir))

  /** Verify-only oracle companion for [[qTopkSketch]]: the exact top-10
    * token counts (deterministic count-desc/token tiebreak, mirrored in
    * DuckDB) plus the merge-order-independent MG theorems as booleans —
    *  - `in_contract`: every exact-top item is either provably light
    *    (true ≤ d) or reported in its error band (est ≤ true ≤ est + d);
    *  - `d_in_bound`: d ≤ n/k (every trim removes ≥ k·t mass);
    * and the summary's exact total mass `n_total` (trims never lose n).
    * Any violation flips a hash-checked literal-TRUE column. */
  private def qTopkSketchCheck(s: SparkSession, dir: String): DataFrame =
    mgContractCheck(s, dir, mgTokenSummary(s, dir))

  /** One oracle for BOTH q_topk_sketch_check and q_stream_topk_check:
    * exact top-10 token counts plus literal-TRUE contract booleans. */
  private val mgContractOracleSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |)
      |SELECT token, n, (SELECT count(*) FROM tok) AS n_total,
      |  TRUE AS in_contract, TRUE AS d_in_bound
      |FROM (
      |  SELECT token, count(*) AS n FROM tok
      |  GROUP BY token ORDER BY n DESC, token LIMIT 10
      |)""".stripMargin

  /** The merge-order-independent MG theorems as hash-checked booleans,
    * for ANY summary frame with one `s = struct(items, d, n)` row built
    * over `dir`'s document tokens — shared by the batch two-phase rollup
    * (q_topk_sketch_check) and the streaming per-batch-segment merge
    * (q_stream_topk_check), which therefore share one oracle SQL. */
  private def mgContractCheck(s: SparkSession, dir: String,
      summaryFrame: DataFrame): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val exactTop = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(10)
    val summary = summaryFrame
      .select(col("s.items").as("items"), col("s.d").as("d"), col("s.n").as("sn"))
    exactTop.crossJoin(broadcast(summary))
      .withColumn("est", expr("get(filter(items, x -> x.item = token), 0).est"))
      .select(col("token"), col("n"), col("sn").as("n_total"),
        (col("n") <= col("d") ||
          (col("est").isNotNull && col("est") <= col("n") &&
            col("n") <= col("est") + col("d"))).as("in_contract"),
        (col("d") * lit(MgK) <= col("sn")).as("d_in_bound"))
  }

  /** One stream run per (session, sfDir): q_stream_topk and its _check
    * companion consume the SAME per-batch segments (the run is
    * deterministic, so re-running for the check would reproduce them
    * byte-for-byte while paying the full feed-write + streaming-query
    * cost a second time — and PlanAuditSpec's plan walks a third). */
  // keyed by session UUID, not the session object — a session-keyed map
  // would pin every closed session's state graph for the JVM lifetime
  private val streamTopkRuns =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Replay the document token stream through [[graft.streaming
    * .StreamTopk]] (doc_id-sliced file feed, 3 micro-batches, per-batch
    * MG segments) and return the merged summary — the shared engine of
    * the q_stream_topk pair. */
  private def streamTopkSummary(s: SparkSession, dir: String): DataFrame = {
    val work = streamTopkRuns.computeIfAbsent((SessionScoped.key(s), dir), { _ =>
      val w = SessionScoped.scratchDir("graft_stream_topk")
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      graft.streaming.Feeder.writeTimeSlicedFeed(
        docs.withColumn("_ms", col("doc_id")), "_ms", w, slices = 3)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$w/feed")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val q = graft.streaming.StreamTopk.run(stream, "token", MgK, w)
      q.processAllAvailable(); q.stop()
      w
    })
    graft.streaming.StreamTopk.merged(s, work, MgK)
  }

  /** Top-10 presentation of a one-row MG summary frame — shared by the
    * batch and streamed variants so the rank/est/d/n_total shape lives
    * in one place. */
  private def topkPresentation(summary: DataFrame): DataFrame =
    summary
      .select(posexplode(slice(col("s.items"), 1, 10)).as(Seq("pos", "it")),
        col("s.d").as("d"), col("s.n").as("n_total"))
      .select((col("pos") + 1).as("rank"), col("it.item").as("token"),
        col("it.est").as("est"), col("d"), col("n_total"))

  /** Streaming heavy hitters: the [[qTopkSketch]] presentation over the
    * summary the STREAM accumulated as per-batch O(k) segments. Rows-only
    * at the gate for the same reason as the batch query (estimates are
    * merge-order dependent); the theorems are hash-gated in
    * [[qStreamTopkCheck]], and big-k stream==batch bit-exactness is
    * pinned in StreamTopkSpec. Verify-only: streaming machinery. */
  private def qStreamTopk(s: SparkSession, dir: String): DataFrame =
    topkPresentation(streamTopkSummary(s, dir))

  /** Verify-only oracle companion for [[qStreamTopk]]: the MG error
    * contract holds for the STREAMED summary too — the theorems are
    * merge-tree-independent, so the oracle is the identical exact-top-10
    * SQL the batch companion uses. */
  private def qStreamTopkCheck(s: SparkSession, dir: String): DataFrame =
    mgContractCheck(s, dir, streamTopkSummary(s, dir))

  /** The (base snapshot, changelog) pair shared by q_cdc_apply /
    * q_cdc_diff / q_stream_cdc AND their one shared oracle SQL
    * (cdcOracleSql): the pre-Jan-16 half folded into a per-user base
    * (latest row per user — the state a previous merge job left), the
    * post-cut half as a changelog where an 'error' event DELETES the
    * user's row and anything else upserts it. ONE definition on purpose:
    * a drifted copy would silently break the oracle-sharing invariant. */
  private def cdcFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val base = ev.filter(col("ts") < cut)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
    val changes = ev.filter(col("ts") >= cut)
      .withColumn("op",
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
    (base, changes)
  }

  /** CDC merge over the event stream ([[operators.Cdc]]); total change
    * order (ts desc, event_id desc) is mirrored in the oracle. */
  private def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    val (base, changes) = cdcFrames(s, dir)
    operators.Cdc.applyChangelog(base, changes,
      keyCols = Seq("user_id"), tsCol = "ts", seqCol = "event_id", opCol = "op")
  }

  /** Snapshot diff ([[operators.Cdc.diff]]): the minimal changelog
    * turning the pre-cut base snapshot into the post-merge snapshot —
    * 'U' rows where a user's row changed/appeared, 'D' where it
    * vanished. The round-trip law (apply(base, diff) == merged) is
    * pinned in CdcSpec; here the diff itself is oracle-checked. */
  private def qCdcDiff(s: SparkSession, dir: String): DataFrame = {
    val (base, changes) = cdcFrames(s, dir)
    val merged = operators.Cdc.applyChangelog(base, changes,
      Seq("user_id"), "ts", "event_id", "op")
    operators.Cdc.diff(base, merged, Seq("user_id"), "op")
  }

  /** The STREAMING CDC path, gated like q_stream_indicators: the same
    * post-cut changelog as [[qCdcApply]] is replayed as three
    * time-sliced file-source micro-batches through the REAL foreachBatch
    * merge ([[graft.streaming.StreamCdc]] — generational snapshots,
    * checkpoint, replay-idempotent), and the FINAL SNAPSHOT is
    * hash-checked against the batch query's own DuckDB oracle. Verify-
    * only: the cost is streaming machinery, not a query plan. */
  private def qStreamCdc(s: SparkSession, dir: String): DataFrame = {
    val work = SessionScoped.scratchDir("graft_stream_cdc")
    val (base, changes) = cdcFrames(s, dir)
    // three time-range replay files → three in-(ts)-order micro-batches
    // (the slice-order precondition of Cdc's associativity law)
    graft.streaming.Feeder.writeTimeSlicedFeed(
      changes.withColumn("_ms", unix_millis(col("ts"))), "_ms", work, slices = 3)
    val stream = s.readStream.schema(changes.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val q = graft.streaming.StreamCdc.run(stream, base, work,
      keyCols = Seq("user_id"), tsCol = "ts", seqCol = "event_id", opCol = "op")
    q.processAllAvailable(); q.stop()
    graft.streaming.StreamCdc.snapshot(s, work, base)
  }

  /** The STREAMING sessionization path, gated like q_stream_cdc: the
    * events table replayed as three time-sliced micro-batches plus a
    * watermark-flush sentinel through the REAL `session_window`
    * aggregation + event-time watermark + exactly-once FileSink
    * ([[graft.streaming.StreamSessionize]]), and the final session
    * table is hash-checked against the BATCH query's own DuckDB oracle
    * (stream==batch also pinned per-edge in StreamSessionizeSpec).
    * Verify-only: streaming machinery, not a query plan. */
  private def qStreamSessionize(s: SparkSession, dir: String): DataFrame = {
    val work = SessionScoped.scratchDir("graft_stream_sess")
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"), col("value"))
    graft.streaming.Feeder.writeTimeSlicedFeed(
      ev.withColumn("_ms", unix_millis(col("ts"))), "_ms", work, slices = 3)
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val sentinel = s.range(1).select(
      lit(graft.streaming.StreamSessionize.SentinelUser).as("user_id"),
      timestamp_micros(lit(maxUs + 8640000000000L)).as("ts"), // +100 days
      lit(0.0).as("value"))
    graft.streaming.Feeder.appendFeedFile(sentinel, work, 3)
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val q = graft.streaming.StreamSessionize.run(stream, work)
    q.processAllAvailable(); q.stop()
    graft.streaming.StreamSessionize.report(s, work)
  }

  /** The STREAM-STREAM event-time interval join, gated like the other
    * q_stream_* queries: the events table replayed as three time-sliced
    * micro-batches feeding TWO live sources (non-error actions, error
    * incidents) through the REAL watermarked stream-stream join
    * ([[graft.streaming.StreamJoin]] — keyed state both sides, bounded
    * by the 30-min window), and the full match set is hash-checked
    * against a plain batch-SQL DuckDB oracle. Verify-only: streaming
    * machinery, not a query plan. */
  private def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val work = SessionScoped.scratchDir("graft_stream_join")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    graft.streaming.Feeder.writeTimeSlicedFeed(
      ev.withColumn("_ms", unix_millis(col("ts"))), "_ms", work, slices = 3)
    def stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val q = graft.streaming.StreamJoin.run(
      stream.filter(col("event_type") =!= "error"),
      stream.filter(col("event_type") === "error"),
      "user_id", "event_id", windowUs = 1800000000L, workDir = work)
    q.processAllAvailable(); q.stop()
    graft.streaming.StreamJoin.report(s, work)
  }

  /** LEFT-OUTER sibling of [[qStreamJoin]]: unmatched actions must
    * surface with null matches exactly when watermark eviction proves
    * them unmatched — the state machine's timeout edge. Needs a
    * both-streams watermark sentinel (reserved user −1, filtered from
    * the report): the join's eviction watermark is the MIN across the
    * two sides. Hash-gated against the batch LEFT JOIN oracle. */
  private def qStreamJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val work = SessionScoped.scratchDir("graft_stream_joino")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    graft.streaming.Feeder.writeTimeSlicedFeed(
      ev.withColumn("_ms", unix_millis(col("ts"))), "_ms", work, slices = 3)
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val sentinel = s.range(2).select( // one row for EACH stream's filter
      lit(-1L).as("user_id"), (-col("id") - 1).as("event_id"),
      timestamp_micros(lit(maxUs + 8640000000000L)).as("ts"),
      when(col("id") === 0, lit("error")).otherwise(lit("click"))
        .as("event_type"))
    graft.streaming.Feeder.appendFeedFile(sentinel, work, 3)
    def stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val q = graft.streaming.StreamJoin.run(
      stream.filter(col("event_type") =!= "error"),
      stream.filter(col("event_type") === "error"),
      "user_id", "event_id", windowUs = 1800000000L, workDir = work,
      joinType = "left_outer")
    q.processAllAvailable(); q.stop()
    graft.streaming.StreamJoin.report(s, work).filter(col("user_id") =!= -1L)
  }

  /** Streaming drift parameters shared by q_stream_drift's query and
    * oracle (events.value spans [0, ~490], mean ~50). */
  private val SdBinW = 25.0
  private val SdMaxBin = 10

  /** The STREAMING data-quality gate: post-cut events replayed as three
    * time-sliced micro-batches, each emitting its full per-bin PSI/JS
    * drift table vs the pre-cut reference ([[graft.streaming
    * .StreamDrift]]). Every batch's table is hash-checked against a
    * DuckDB mirror that recomputes the same slice boundaries — so the
    * gate covers the slicing, the binning and the drift math at once.
    * Verify-only: streaming machinery, not a query plan. */
  private def qStreamDrift(s: SparkSession, dir: String): DataFrame = {
    val work = SessionScoped.scratchDir("graft_stream_drift")
    val ev = Tables.events(s, dir)
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val ref = ev.filter(col("ts") < cut).select(col("value"))
    val cur = ev.filter(col("ts") >= cut)
      .select(col("value"), unix_millis(col("ts")).as("_ms"))
    graft.streaming.Feeder.writeTimeSlicedFeed(cur, "_ms", work, slices = 3)
    val stream = s.readStream.schema(ref.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val q = graft.streaming.StreamDrift.run(stream, ref, "value",
      binWidth = SdBinW, maxBin = SdMaxBin, workDir = work)
    q.processAllAvailable(); q.stop()
    graft.streaming.StreamDrift.report(s, work)
  }

  /** Oracle for [[qStreamDrift]]: the q_drift skeleton instantiated once
    * per micro-batch, with the batch's rows reproduced from the SAME
    * (min, span) slicing rule the replay feed uses. */
  private def oStreamDriftSql: String = {
    def slice(i: Int): String =
      s"""(WITH hr AS (
         |  SELECT CAST(least(floor(CAST(value AS DOUBLE) / $SdBinW), $SdMaxBin) AS INTEGER) AS bin,
         |    count(*) AS cnt_ref
         |  FROM ev WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1
         |), hc AS (
         |  SELECT CAST(least(floor(CAST(value AS DOUBLE) / $SdBinW), $SdMaxBin) AS INTEGER) AS bin,
         |    count(*) AS cnt_cur
         |  FROM ev, bnds WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
         |    AND ms >= t0 + $i * span AND ms < t0 + ${i + 1} * span
         |  GROUP BY 1
         |), j AS (
         |  SELECT coalesce(hr.bin, hc.bin) AS bin,
         |    coalesce(cnt_ref, 0) AS cnt_ref, coalesce(cnt_cur, 0) AS cnt_cur
         |  FROM hr FULL OUTER JOIN hc ON hr.bin = hc.bin
         |), t AS (
         |  SELECT CAST(sum(cnt_ref) AS BIGINT) AS tot_ref,
         |    CAST(sum(cnt_cur) AS BIGINT) AS tot_cur FROM j
         |), pq AS (
         |  SELECT bin, cnt_ref, cnt_cur,
         |    CAST(cnt_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE) AS p_ref,
         |    CAST(cnt_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE) AS p_cur
         |  FROM j, t
         |), terms AS (
         |  SELECT *,
         |    floor(((p_cur - p_ref) * ln(
         |      (CASE WHEN p_cur = 0 THEN 1e-6 ELSE p_cur END) /
         |      (CASE WHEN p_ref = 0 THEN 1e-6 ELSE p_ref END))) * 10000 + 0.5) / 10000
         |      AS psi_term,
         |    floor((0.5 * (CASE WHEN p_ref > 0
         |        THEN p_ref * ln(p_ref / ((p_ref + p_cur) / CAST(2 AS DOUBLE))) ELSE 0 END)
         |      + 0.5 * (CASE WHEN p_cur > 0
         |        THEN p_cur * ln(p_cur / ((p_ref + p_cur) / CAST(2 AS DOUBLE))) ELSE 0 END))
         |      * 10000 + 0.5) / 10000 AS js_term
         |  FROM pq
         |), g AS (SELECT sum(psi_term) AS psi, sum(js_term) AS js FROM terms)
         |SELECT bin, cnt_ref, cnt_cur,
         |  floor(p_ref * 10000 + 0.5) / 10000 AS p_ref,
         |  floor(p_cur * 10000 + 0.5) / 10000 AS p_cur,
         |  psi_term, js_term,
         |  floor(psi * 10000 + 0.5) / 10000 AS psi,
         |  floor(js * 10000 + 0.5) / 10000 AS js,
         |  CAST($i AS BIGINT) AS batch_id
         |FROM terms, g)""".stripMargin
    s"""WITH ev AS (
       |  SELECT CAST(ts AS TIMESTAMP) AS ts, value,
       |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events
       |), bnds AS (
       |  SELECT min(ms) AS t0, (max(ms) - min(ms)) // 3 + 1 AS span
       |  FROM ev WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
       |)
       |${(0 until 3).map(slice).mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Two-phase salted aggregation over the most frequent event type —
    * same result as the plain aggregate (asserted in SkewSpec); exists as
    * the skew-mitigation pattern for power-law keys. */
  private def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    Skew.saltedAgg(
      Tables.events(s, dir).select(col("event_type"),
        cents(col("value")).as("vc")),
      "event_type", "vc", 16)
      .select(col("event_type"), (col("total") / lit(100.0)).as("total_value"), col("n"))

  /** Set operators: purchasers who never raised an error (EXCEPT) and
    * users who did both (INTERSECT). */
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
    val onlyBuy = users("purchase").except(users("error"))
      .select(col("user_id"), lit("purchase_no_error").as("cohort"))
    val both = users("purchase").intersect(users("error"))
      .select(col("user_id"), lit("purchase_and_error").as("cohort"))
    onlyBuy.unionByName(both)
  }

  /** Pivot: events per user × event_type as columns. */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot(col("event_type"), Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** Exact interpolated percentiles (vs the approximate sketches in
    * q_sketches). */
  private def qPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        r(expr("percentile(value, 0.5)")).as("p50"),
        r(expr("percentile(value, 0.9)")).as("p90"),
        r(expr("percentile(value, 0.99)")).as("p99"),
        count(lit(1)).as("n"))

  /** Interval-overlap analytics on the binned range join: deterministic
    * 45-minute windows (anchored at every event_id ≡ 0 mod 1000) joined
    * to the events they cover, aggregated per window. The bare range
    * predicate would plan as BroadcastNestedLoopJoin — [[RangeJoin.binned]]
    * turns it into one keyed shuffle on 30-minute buckets. */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("ts"), col("value"))
    val iv = ev.filter(pmod(col("event_id"), lit(1000)) === 0)
      .select(col("event_id").as("interval_id"), col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 45 MINUTES")).as("end_ts"))
    RangeJoin.binned(ev, col("ts"), iv, col("start_ts"), col("end_ts"),
        bucketWidthUs = 30L * 60 * 1000000)
      .groupBy(col("interval_id"), col("start_ts"), col("end_ts"))
      .agg(count(lit(1)).as("n_events"),
        (sum(cents(col("value"))).cast("double") / lit(100.0)).as("sum_value"))
  }

  /** Z-order key assignment over (time-bucket, user-bucket) — the layout
    * key a 100 TB event table is range-partitioned and sorted by at write
    * time so min/max row-group stats prune reads filtered on EITHER
    * dimension ([[Layout]]). Pure int64 bit math, no shuffle. */
  private def qZorder(s: SparkSession, dir: String): DataFrame = {
    val hourIdx = floor(unix_micros(col("ts")) / lit(3600000000.0)).cast("long")
      .bitwiseAND(lit(65535L))
    val ub = pmod(col("user_id"), lit(65536)).cast("long")
    Tables.events(s, dir)
      .select(col("event_id"), hourIdx.as("hour_idx"), ub.as("user_bucket"))
      .withColumn("zkey",
        Layout.zorder2(col("hour_idx"), col("user_bucket"), 16))
  }

  /** Hybrid retrieval: fuse vector similarity with a document-quality
    * prior — rank by 0.7·cosine + 0.3·quality (both 4dp-rounded before the
    * blend so the fusion is float-stable). The quality prior is a narrow
    * (id, score) relation joined to the corpus by id (one keyed shuffle);
    * the query side stays broadcast exactly like [[Similarity.cosineTopK]].
    * The standard RAG-retrieval shape: ANN candidates re-ranked by a
    * metadata prior. */
  private def qHybridSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val quality = TextAnalysis.stats(Tables.documents(s, dir))
      .select(col("doc_id"), r(col("quality_score")).as("quality_score"))
    val corpus = emb.join(quality, col("vec_id") === col("doc_id"))
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    corpus.join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        r(Similarity.cosine(col("qe"), col("embedding"))).as("cos"),
        col("quality_score"))
      .withColumn("hybrid",
        r(lit(0.7) * col("cos") + lit(0.3) * col("quality_score")))
      .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("hybrid").desc, col("doc_id"))))
      .filter(col("rk") <= 10)
  }

  /** Fuzzy entity matching: blocked Jaro-Winkler self-join over part
    * names (prefix-3 + length-band blocking, hot-block cap, JW ≥ 0.85). */
  private def qFuzzyJoin(s: SparkSession, dir: String): DataFrame =
    FuzzyJoin.selfPairs(Tables.part(s, dir), "p_name", tau = 0.85)
      .select(col("name_a"), col("name_b"), r(col("sim")).as("sim"))

  /** PageRank damping factor, shared with the oracle (the teleport term is
    * interpolated as `1 - PrDamping` so both engines parse the identical
    * IEEE double — writing 0.15 literally would NOT match 1.0 − 0.85). */
  private val PrDamping = 0.85

  /** Distinct (custkey·2, suppkey·2+1) trade pairs that share an order —
    * the node-disambiguated bipartite relation both PageRank queries rank. */
  private def tradePairs(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("orderkey"), col("l_suppkey").as("supp"))
    val od = Tables.orders(s, dir)
      .select(col("o_orderkey").as("orderkey"), col("o_custkey").as("cust"))
    li.join(od, "orderkey")
      .select((col("cust") * 2).as("a"), (col("supp") * 2 + 1).as("b")).distinct()
  }

  /** k-core peel threshold and the unrolled oracle's round count.
    * Peeling is confluent and post-fixpoint rounds are no-ops, so the
    * early-exiting Spark loop and the always-8-round oracle agree
    * whether or not the fixpoint lands inside 8 rounds. */
  private val KcoreK = 8
  private val KcoreRounds = 8

  /** k-core backbone of the trade graph ([[Graph.kcore]]): iteratively
    * peel nodes with fewer than KcoreK surviving partners — the graph-
    * cleaning cut between raw degree filtering (one round) and full
    * community structure. */
  private def qKcore(s: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(s, dir)
    Graph.kcore(pairs.select(col("a").as("src"), col("b").as("dst")),
      KcoreK, KcoreRounds)
  }

  /** 3-iteration PageRank over the symmetrized customer↔supplier trade
    * graph. Symmetrizing gives every node an out-edge, so the dangling
    * term in [[Graph.pagerank]] contributes an exact +0.0 here. Ranks
    * surface ×1e6 (ppm) so 4dp rounding keeps resolution at any graph
    * size. */
  private def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(s, dir)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    Graph.pagerank(edges, iters = 3, d = PrDamping)
      .select(col("node"), r(col("rank") * lit(1e6)).as("rank_ppm"))
  }

  /** 3-round synchronous label propagation over the symmetrized trade
    * graph ([[Graph.labelPropagation]]) — community detection, the
    * graph-family member between PageRank (importance) and the
    * connected-components consumer (reachability): most-frequent
    * neighbor label, smallest-label tiebreak, fully deterministic.
    * Output adds each community's size via a label-partitioned count. */
  private def qCommunities(s: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(s, dir)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    Graph.labelPropagation(edges, iters = 3)
      .select(col("node"), col("label").as("community"))
      .withColumn("community_size",
        count(lit(1)).over(Window.partitionBy(col("community"))))
  }

  /** 3-iteration PageRank over the DIRECTED customer→supplier graph (no
    * symmetrization): every supplier node is a sink, so roughly half the
    * total rank is dangling each round — the live fixture proving
    * [[Graph.pagerank]]'s dangling-mass redistribution against the same
    * mechanically unrolled oracle. */
  private def qPagerankDangling(s: SparkSession, dir: String): DataFrame = {
    val edges = tradePairs(s, dir)
      .select(col("a").as("src"), col("b").as("dst"))
    Graph.pagerank(edges, iters = 3, d = PrDamping)
      .select(col("node"), r(col("rank") * lit(1e6)).as("rank_ppm"))
  }

  /** Gap-filled hourly close/volume series: dense per-symbol grid, last
    * observation carried forward (see [[Resample]] for the scale shape). */
  /** Backbone of the supplier co-supply graph: suppliers are linked by the
    * number of distinct parts both supply, and only the TopCoEdges
    * strongest relationships survive — raw bipartite projections of
    * high-cardinality relations saturate toward complete graphs (at sf0.1
    * every supplier pair shares some part), so the census without the
    * backbone cut is Θ(n³). The per-part pair expansion is bounded by the
    * per-part supplier count (TPC-H: single digits); the cut is an
    * orderBy+limit → TakeOrderedAndProject (per-partition heaps, no global
    * sort) with a full (count, a, b) tiebreak for determinism. */
  private def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sv")).distinct()
    val co = ps.as("x").join(ps.as("y"),
        col("x.pk") === col("y.pk") && col("x.sv") < col("y.sv"))
      .groupBy(col("x.sv").as("a"), col("y.sv").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val top = co.orderBy(col("cnt").desc, col("a"), col("b")).limit(TopCoEdges)
      .select(col("a").as("src"), col("b").as("dst"))
    Graph.triangles(top)
  }

  private val TopCoEdges = 5000

  private def qResampleFfill(s: SparkSession, dir: String): DataFrame =
    Resample.ffill(
      Tables.bars(s, dir).select(col("symbol"), col("time"), col("close"), col("volume")),
      "symbol", "time", "1 hour", Seq("close", "volume"))

  /** Long-form OHLC (melt) — the inverse of q_pivot's widening, via the
    * native `unpivot` (one scan, no join, no shuffle). */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.bars(s, dir).unpivot(
      Array(col("symbol"), col("time")),
      Array(col("open"), col("high"), col("low"), col("close")),
      "field", "value")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> qFuzzyJoin,
    "q_pagerank" -> qPagerank,
    "q_communities" -> qCommunities,
    "q_kcore" -> qKcore,
    "q_pagerank_dangling" -> qPagerankDangling,
    "q_triangles" -> qTriangles,
    "q_transitions" -> ((s, dir) =>
      operators.EventAnalytics.transitions(Tables.events(s, dir))),
    "q_paths" -> ((s, dir) =>
      operators.EventAnalytics.topPaths(Tables.events(s, dir), 30, 3, 20)),
    "q_peak_concurrency" -> ((s, dir) =>
      operators.EventAnalytics.peakConcurrency(Tables.events(s, dir), 30)),
    "q_winsorize" -> ((s, dir) =>
      operators.Profile.winsorized(Tables.events(s, dir), "event_type", "value",
        0.05, 0.95)),
    "q_integrity" -> ((s, dir) => operators.Profile.integrity(Seq(
      ("lineitem.l_orderkey -> orders.o_orderkey",
        Tables.lineitem(s, dir), "l_orderkey", Tables.orders(s, dir), "o_orderkey"),
      ("orders.o_custkey -> customer.c_custkey",
        Tables.orders(s, dir), "o_custkey", Tables.customer(s, dir), "c_custkey"),
      ("customer.c_nationkey -> nation.n_nationkey",
        Tables.customer(s, dir), "c_nationkey", Tables.nation(s, dir), "n_nationkey"),
      ("supplier.s_nationkey -> nation.n_nationkey",
        Tables.supplier(s, dir), "s_nationkey", Tables.nation(s, dir), "n_nationkey")))),
    "q_resample_ffill" -> qResampleFfill,
    "q_gaps" -> ((s, dir) => Resample.gaps(
      Tables.bars(s, dir), "symbol", "time", "1 hour")),
    "q_unpivot" -> qUnpivot,
    "q_range_join" -> qRangeJoin,
    "q_zorder" -> qZorder,
    "q_hybrid_search" -> qHybridSearch,
    "q_set_ops" -> qSetOps,
    "q_pivot" -> qPivot,
    "q_percentiles" -> qPercentiles,
    "q_sketches" -> qSketches,
    "q_sketches_check" -> qSketchesCheck,
    "q_sketch_rollup" -> qSketchRollup,
    "q_sketch_rollup_check" -> qSketchRollupCheck,
    "q_topk_sketch" -> qTopkSketch,
    "q_topk_sketch_check" -> qTopkSketchCheck,
    "q_stream_topk" -> qStreamTopk,
    "q_stream_topk_check" -> qStreamTopkCheck,
    "q_salted_agg" -> qSaltedAgg,
    "q_cdc_apply" -> qCdcApply,
    "q_cdc_diff" -> qCdcDiff,
    "q_stream_cdc" -> qStreamCdc,
    "q_stream_drift" -> qStreamDrift,
    "q_stream_sessionize" -> qStreamSessionize,
    "q_stream_join" -> qStreamJoin,
    "q_stream_join_outer" -> qStreamJoinOuter,
    "q_dedup_corpus" -> qDedupCorpus,
    "q_dedup_keep_best" -> ((s, dir) =>
      Dedup.dedupCorpusKeepBest(Tables.documents(s, dir), 0.7)),
    "q_split_safe" -> ((s, dir) =>
      Dedup.leakageSafeSplit(Tables.documents(s, dir), 0.7,
        CorpusEntries.SplitSalt, CorpusEntries.SplitCuts)),
    "q_sample_dedup" -> ((s, dir) =>
      Dedup.dedupWeightedSample(Tables.documents(s, dir), 0.7, "dw1:", 0.5)),
    "q_dup_sources" -> ((s, dir) =>
      Dedup.dupSourceMatrix(Tables.documents(s, dir), 0.7)),
    "q_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(Tables.documents(s, dir), 5)),
    "q_asof_join" -> qAsofJoin,
    "q_asof_fwd" -> qAsofFwd,
    "q_asof_nearest" -> qAsofNearest,
    "q_profile" -> qProfile,
    "q_bars_incremental" -> qBarsIncremental,
    "q_rollup_revenue" -> qRollupRevenue,
    "q_cube_revenue" -> qCubeRevenue,
    "q_topk_per_key" -> qTopkPerKey,
    "q_dedup_exact" -> qDedupExact,
    "q_text_stats" -> qTextStats,
    "q_token_count" -> qTokenCount,
    "q_lang_id" -> qLangId,
    "q_fingerprint" -> qFingerprint,
    "q_jaccard_pairs" -> qJaccardPairs,
    "q_containment" -> qContainment,
    "q_minhash_lsh" -> qMinhashLsh,
    "q_simhash" -> qSimhash,
    "q_simhash_mp" -> qSimhashMp,
    "q_cosine_topk" -> qCosineTopK,
    "q_knn_classify" -> qKnnClassify,
    "q_cosine_ivf" -> qCosineIvf,
    "q_embed_outliers" -> ((s, dir) =>
      Similarity.embedOutliers(Tables.embeddings(s, dir), 8, 2, 0.05)),
    "q_cosine_ivf_probe" -> qCosineIvfProbe,
    "q_ivf_append" -> qIvfAppend,
    "q_ivf_recall" -> qIvfRecall,
    "q_embed_clusters" -> qEmbedClusters,
    "q_embed_pca" -> qEmbedPca,
    "q_embed_quantize" -> qEmbedQuantize,
    "q_cosine_q8" -> qCosineQ8,
    "q_cosine_pq" -> qCosinePq,
    "q_cosine_ivfpq" -> qCosineIvfPq,
    "q_cosine_ivfpq_rerank" -> qCosineIvfPqRerank,
    "q_cosine_ivfpq_sampled" -> qCosineIvfPqSampled,
    "q_embed_drift" -> qEmbedDrift,
    "q_dedup_embed_lsh" -> qDedupEmbedLsh,
    "q_dedup_embed_lsh_mp" -> qDedupEmbedLshMp,
    "q_dedup_embed_ivf" -> qDedupEmbedIvf,
    "q_dedup_embed_ivf2" -> qDedupEmbedIvf2,
    "q_dedup_embed_incremental" -> qDedupEmbedIncr,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_frame_sample" -> qFrameSample,
    "q_media_wav" -> qMediaWav,
    "q_media_bmp" -> qMediaBmp,
    "q_media_decode" -> qMediaDecode,
    "q_media_decode_wav" -> qMediaDecodeWav,
    "q_audio_features" -> qAudioFeatures,
    "q_image_ahash" -> qImageAhash,
    "q_image_resize" -> qImageResize,
    "q_image_neardup" -> qImageNeardup,
    "q_media_decode_png" -> qMediaDecodePng,
    "q_media_decode_jpeg" -> qMediaDecodeJpeg,
    "q_media_stats" -> qMediaStats,
    "q_media_png" -> qMediaPng,
    "q_media_jpeg" -> qMediaJpeg,
    "q_media_exif" -> qMediaExif,
    "q_media_mp4" -> qMediaMp4,
    "q_media_quarantine" -> qMediaQuarantine,
    "q_pack_interleaved" -> qPackInterleaved,
    "q_agg_pricing" -> qAggPricing,
    "q_join_revenue" -> qJoinRevenue,
    "q_sessionize" -> qSessionize,
    "q_funnel" -> ((s, dir) => operators.EventAnalytics.funnel(
      Tables.events(s, dir), FunnelSteps)),
    "q_attribution" -> ((s, dir) => operators.EventAnalytics.attribution(
      Tables.events(s, dir), "purchase")),
    "q_cohort_retention" -> ((s, dir) => operators.EventAnalytics.cohortRetention(
      Tables.events(s, dir))),
    "q_scd2" -> ((s, dir) => operators.EventAnalytics.scd2(
      Tables.events(s, dir), "user_id", "event_type")),
    "q_zscore_outliers" -> ((s, dir) =>
      Signals.zscoreOutliers(Tables.bars(s, dir), 20, 2.0)),
    "q_cusum" -> ((s, dir) => Signals.cusum(Tables.bars(s, dir), 0.5, 5.0)),
    "q_corr_matrix" -> ((s, dir) =>
      Signals.corrMatrix(Tables.bars(s, dir), 10)),
    "q_leadlag" -> ((s, dir) =>
      Signals.leadLagMarket(Tables.bars(s, dir), 2, 10)),
    "q_robust_outliers" -> ((s, dir) =>
      Signals.robustOutliers(Tables.bars(s, dir), 20, 3.0)),
    "q_rolling_ols" -> ((s, dir) =>
      Signals.rollingOls(Tables.bars(s, dir), 20)),
    "q_returns_vol" -> ((s, dir) =>
      Signals.returnsVol(Tables.bars(s, dir), 20)),
    "q_seasonality" -> ((s, dir) =>
      Signals.seasonality(Tables.bars(s, dir))),
    "q_rolling_beta" -> ((s, dir) =>
      Signals.rollingBeta(Tables.bars(s, dir), 20)),
    "q_sma_crossovers" -> ((s, dir) =>
      Signals.smaCrossovers(Tables.bars(s, dir), 10, 20)),
    "q_drawdown" -> ((s, dir) => Signals.drawdown(Tables.bars(s, dir))),
    "q_rolling_corr" -> ((s, dir) => Signals.rollingCorrelation(
      dailyTypeSeries(s, dir), CorrPairs, 20)))

  /** Daily mean value per event type — the dense aligned series feeding
    * the rolling-correlation query. The mean is 4dp-rounded BEFORE the
    * correlation so both engines correlate identical inputs. */
  private def dailyTypeSeries(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type").as("key"),
        date_trunc("day", col("ts")).as("time"))
      .agg(r(avg(col("value"))).as("value"))

  /** Event-type pairs for the rolling-correlation query (query + oracle). */
  private val CorrPairs = Seq(("click", "view"), ("purchase", "view"),
    ("error", "signup"))

  /** Funnel step sequence (query and oracle read the same value). */
  private val FunnelSteps = Seq("view", "click", "purchase")

  // ---------------------------------------------------------------- oracle

  /** DuckDB 60-bit md5 hash (mirrors TextAnalysis.hash60). */
  private def oHash60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** DuckDB little-endian n-byte uppercase hex of a nonnegative integer
    * expression (mirrors Multimodal.leHex). */
  private def oLe(e: String, n: Int): String =
    (0 until n).map(i => s"lpad(hex((($e) // ${1L << (8 * i)}) % 256), 2, '0')")
      .mkString("concat(", ", ", ")")

  /** Distinct (doc_id, 31-bit shingle-hash) index (mirrors Dedup.shingleIndex). */
  private val oShingleIdx: String =
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
       |         ELSE list_transform(range(1, len(toks) - 1),
       |                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) END)) AS sh
       |  FROM tk
       |),
       |shidx AS (SELECT DISTINCT doc_id, ${oHash60("sh")} % 2147483647 AS h FROM sh0),
       |shsz AS (SELECT doc_id, count(*) AS sz FROM shidx GROUP BY doc_id)""".stripMargin

  /** df-capped shingle index + unordered pair intersections (mirrors
    * Dedup.cappedIndex + the jaccard/containment self-join; df cap 100). */
  private val oCappedIdx: String =
    """capped AS (
      |  SELECT doc_id, h FROM (
      |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df FROM shidx
      |  ) WHERE df <= 100
      |),
      |csz AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
      |cinter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** Verified shingle-Jaccard pairs ≥ tau (mirrors Dedup.jaccardPairs). */
  private def oJaccard(tau: Double): String =
    s"""inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM shidx a JOIN shidx b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |jac AS (
       |  SELECT doc_a, doc_b,
       |    ${r4("i / (sa.sz + sb.sz - i)")} AS jaccard,
       |    i / (sa.sz + sb.sz - i) AS jraw
       |  FROM inter JOIN shsz sa ON sa.doc_id = doc_a
       |             JOIN shsz sb ON sb.doc_id = doc_b
       |),
       |jpairs AS (SELECT doc_a, doc_b, jaccard FROM jac WHERE jraw >= $tau)""".stripMargin

  /** MinHash signature + LSH bands (mirrors Dedup.minhashSignatures/bands). */
  /** DuckDB mirror of [[graft.operators.Sampling.splitBy]] over `keyExpr`,
    * generated from the SAME salt/cuts constants the Spark side uses so
    * the two can never drift. */
  private def oSplitCase(keyExpr: String): String = {
    val cuts = CorpusEntries.SplitCuts
    val cum = cuts.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val probe =
      s"substr(md5('${CorpusEntries.SplitSalt}' || CAST($keyExpr AS VARCHAR)), 1, 4)"
    val whens = cuts.init.map(_._1).zip(cum).map { case (name, c) =>
      s"WHEN $probe < '${graft.operators.Sampling.thresholdHex(c)}' THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${cuts.last._1}' END"
  }

  private val oMinhash: String = {
    val sig = (0 until Dedup.MinHashK)
      .map(j => s"min((h * ${Dedup.mhA(j)} + ${Dedup.mhB(j)}) % ${Dedup.MinHashP}) AS mh$j")
      .mkString(", ")
    val bands = (0 until Dedup.MinHashK / 2)
      .map(bd => s"SELECT doc_id, $bd AS band, mh${2 * bd} AS x, mh${2 * bd + 1} AS y FROM sig")
      .mkString("\n  UNION ALL ")
    s"""sig AS (SELECT doc_id, $sig FROM shidx GROUP BY doc_id),
       |bands AS (
       |  $bands
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.x = b.x AND a.y = b.y AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  /** Closed-form aHash pipeline over the patterned BMPs: pixel bytes
    * from the shared generation rule (Multimodal.patByte mirrored
    * digit-for-digit), gray/block/threshold in exact integer math — the
    * `bits` CTE both image-hash oracles build on. The Spark side REALLY
    * decodes the BMP bytes; this never does. */
  private def oAhashBits: String = {
    def ch(c: Int): String =
      s"(((d.doc_id % 16) * 40 + (x.x * 23 + y.y * 31 + ${c * 11}) % 97 + " +
        "CASE WHEN x.x < (d.doc_id // 16) % 4 AND y.y < 2 THEN 120 ELSE 0 END) % 256)"
    s"""px AS MATERIALIZED (
       |  SELECT d.doc_id, x.x, y.y,
       |    (${ch(0)} + ${ch(1)} + ${ch(2)}) // 3 AS gray
       |  FROM documents d, range(0, 16) x(x), range(0, 16) y(y)
       |),
       |bm AS MATERIALIZED (
       |  SELECT doc_id, y // 2 AS bj, x // 2 AS bi,
       |    CAST(sum(gray) // 4 AS BIGINT) AS bm
       |  FROM px GROUP BY 1, 2, 3
       |),
       |mn AS (
       |  SELECT doc_id, CAST(sum(bm) // 64 AS BIGINT) AS mean_gray
       |  FROM bm GROUP BY doc_id
       |),
       |bits AS (
       |  SELECT b.doc_id,
       |    string_agg(CASE WHEN b.bm > m.mean_gray THEN '1' ELSE '0' END, ''
       |      ORDER BY b.bj, b.bi) AS ahash,
       |    m.mean_gray
       |  FROM bm b JOIN mn m USING (doc_id)
       |  GROUP BY b.doc_id, m.mean_gray
       |)""".stripMargin
  }

  /** Left-to-right double dot product (mirrors Similarity.dot). */
  private def oDot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private def oCos(a: String, b: String): String =
    s"(${oDot(a, b)}) / (sqrt(${oDot(a, a)}) * sqrt(${oDot(b, b)}))"

  /** Lloyd-trained IVF assignment oracle (mirrors Similarity.ivfTrain +
    * ivfAssign): seed = first nCent vectors; each round re-assigns by
    * 4dp-rounded cosine (tiebreak lowest centroid id) and recomputes the
    * elementwise mean in exact integer micro-units — the same
    * order-independent arithmetic the Spark side uses, so centroids are
    * bit-identical. Produces a CTE chain ending in
    * `assign(vec_id, centroid_id, embedding)`. */
  private def oIvfAssign(nCent: Int, iters: Int, dim: Int = 64): String = {
    def assignCte(name: String, centTable: String) =
      s"""$name AS (
         |  SELECT vec_id, centroid_id, embedding FROM (
         |    SELECT e.vec_id, c.centroid_id, e.embedding,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${r4(oCos("e.embedding", "c.ce"))} DESC, c.centroid_id) AS arn
         |    FROM embeddings e, $centTable c
         |  ) WHERE arn = 1
         |)""".stripMargin
    val seed =
      s"""cent0 AS (
         |  SELECT vec_id AS centroid_id, embedding AS ce
         |  FROM embeddings WHERE vec_id < $nCent
         |)""".stripMargin
    val steps = (1 to iters).map { t =>
      Seq(
        assignCte(s"a$t", s"cent${t - 1}"),
        s"""m$t AS (
           |  SELECT centroid_id, r.i AS i,
           |    CAST(sum(CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000 + 0.5)
           |      AS BIGINT)) AS BIGINT) AS s,
           |    count(*) AS n
           |  FROM a$t, range(1, ${dim + 1}) r(i) GROUP BY 1, 2
           |)""".stripMargin,
        s"""cent$t AS (
           |  SELECT centroid_id,
           |    list(CAST(CAST(s AS DOUBLE) / (n * 1000000.0) AS FLOAT) ORDER BY i) AS ce
           |  FROM m$t GROUP BY centroid_id
           |)""".stripMargin).mkString(",\n")
    }
    (Seq(seed) ++ steps :+ assignCte("assign", s"cent$iters")).mkString(",\n")
  }

  /** PQ parameters shared by q_cosine_pq's query and oracle — the
    * shipped operating point from [[operators.ProductQuantizer]]'s
    * sweep-chosen defaults (16 subspaces × 4 dims, 64-entry codebooks =
    * 96-bit codes, 2 Lloyd iterations; full frontier table in
    * SCALE.md). The oracle CTE chain is parameterized on all four, so
    * the mirror scales mechanically with the chosen point. */
  private val PqM = operators.ProductQuantizer.DefaultSubspaces
  private val PqSub = operators.ProductQuantizer.DefaultSubDim
  private val PqK = operators.ProductQuantizer.DefaultK
  private val PqIters = 2

  private def qCosinePq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cb = operators.ProductQuantizer.train(emb, PqM, PqSub, PqK, PqIters)
    operators.ProductQuantizer.searchAdc(emb, cb, nQueries = 10, topK = 5,
      subspaces = PqM, subDim = PqSub)
  }

  /** PQ/ADC oracle (mirrors ProductQuantizer exactly — see its scaladoc
    * for the determinism contract): full-vector L2 normalization with an
    * IEEE float cast back, per-subspace L2 Lloyd with integer-micro
    * means, assignment by 4dp-rounded ‖c‖²−2·v·c with lowest-code
    * tiebreak, and an ADC sum of integer-micro subspace dots. */
  private def oPqSql(nQ: Int, topK: Int): String = {
    val d2 = (v: String, c: String) =>
      r4(s"(${oDot(c, c)}) - 2 * (${oDot(v, c)})")
    def assignCte(name: String, m: Int, centTable: String) =
      s"""$name AS (
         |  SELECT vec_id, code, sv FROM (
         |    SELECT s.vec_id, c.code, s.sv,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${d2("s.sv", "c.ce")} ASC, c.code) AS arn
         |    FROM sub$m s, $centTable c
         |  ) WHERE arn = 1
         |)""".stripMargin
    val norm =
      s"""norm AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(CAST(x AS DOUBLE) / sqrt(${oDot("embedding", "embedding")}) AS FLOAT)) AS e
         |  FROM embeddings
         |)""".stripMargin
    val perSubspace = (0 until PqM).map { m =>
      val lo = m * PqSub + 1; val hi = (m + 1) * PqSub
      val seed =
        s"""sub$m AS (SELECT vec_id, e[$lo:$hi] AS sv FROM norm),
           |cent${m}_0 AS (
           |  SELECT vec_id AS code, sv AS ce FROM sub$m WHERE vec_id < $PqK
           |)""".stripMargin
      val steps = (1 to PqIters).map { t =>
        Seq(
          assignCte(s"a${m}_$t", m, s"cent${m}_${t - 1}"),
          s"""mm${m}_$t AS (
             |  SELECT code, r.i AS i,
             |    CAST(sum(CAST(floor(CAST(sv[r.i] AS DOUBLE) * 1000000 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS s2, count(*) AS n
             |  FROM a${m}_$t, range(1, ${PqSub + 1}) r(i) GROUP BY 1, 2
             |)""".stripMargin,
          s"""cent${m}_$t AS (
             |  SELECT code,
             |    list(CAST(CAST(s2 AS DOUBLE) / (n * 1000000.0) AS FLOAT) ORDER BY i) AS ce
             |  FROM mm${m}_$t GROUP BY code
             |)""".stripMargin).mkString(",\n")
      }
      (Seq(seed) ++ steps :+ assignCte(s"cfin$m", m, s"cent${m}_$PqIters"))
        .mkString(",\n")
    }
    val codes = (0 until PqM)
      .map(m => s"SELECT vec_id, $m AS m, code FROM cfin$m")
      .mkString("codes AS (\n", "\n  UNION ALL ", "\n)")
    val codebook = (0 until PqM)
      .map(m => s"SELECT $m AS m, code, ce FROM cent${m}_$PqIters")
      .mkString("codebook AS (\n", "\n  UNION ALL ", "\n)")
    val qsubs = (0 until PqM)
      .map(m => s"SELECT vec_id AS query_id, $m AS m, sv AS qe FROM sub$m WHERE vec_id < $nQ")
      .mkString("qsubs AS (\n", "\n  UNION ALL ", "\n)")
    s"""WITH $norm,
       |${perSubspace.mkString(",\n")},
       |$codes,
       |$codebook,
       |$qsubs,
       |lut AS (
       |  SELECT q.query_id, q.m, c.code,
       |    CAST(floor((${oDot("q.qe", "c.ce")}) * 1000000 + 0.5) AS BIGINT) AS pd
       |  FROM qsubs q JOIN codebook c ON q.m = c.m
       |),
       |scored AS (
       |  SELECT l.query_id, k.vec_id AS neighbor_id,
       |    ${r4("CAST(CAST(sum(pd) AS BIGINT) AS DOUBLE) / 1000000.0")} AS score_pq
       |  FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.code
       |  WHERE k.vec_id != l.query_id
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, score_pq, rk FROM (
       |  SELECT query_id, neighbor_id, score_pq,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_pq DESC, neighbor_id) AS INTEGER) AS rk
       |  FROM scored
       |) WHERE rk <= $topK""".stripMargin
  }

  /** Shared by q_sessionize AND q_stream_sessionize: the streaming
    * session_window path's strongest check is hashing against the batch
    * query's oracle unchanged. */
  private def sessionizeOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    epoch_us(CAST(ts AS TIMESTAMP))
      |      - lag(epoch_us(CAST(ts AS TIMESTAMP)))
      |        OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
      |  FROM events
      |), s AS (
      |  SELECT user_id, event_id, ts, value,
      |    CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM e
      |)
      |SELECT user_id, session_id,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
      |    AS total_value
      |FROM s GROUP BY 1, 2""".stripMargin

  /** Shared by q_cdc_apply AND q_stream_cdc: the streaming merge's
    * strongest check is hashing against the batch oracle unchanged. */
  private def cdcOracleSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    event_type, value FROM events
      |), base AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM ev WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      |  ) WHERE rn = 1
      |), latest AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_id, ts, event_type, value,
      |      CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM ev WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
      |  ) WHERE rn = 1
      |)
      |SELECT b.user_id, b.event_id, b.ts, b.event_type, b.value
      |FROM base b ANTI JOIN latest l ON b.user_id = l.user_id
      |UNION ALL
      |SELECT user_id, event_id, ts, event_type, value
      |FROM latest WHERE op != 'D'""".stripMargin

  /** Embedding-space drift monitor: both snapshot halves IVF-assigned to
    * ONE shared Lloyd codebook, then the per-cluster population shares
    * compared through the SAME PSI/JS machinery as the scalar drift
    * monitor (bin = centroid id). A corpus/model shift shows up as
    * probability mass moving between semantic clusters long before any
    * scalar column moves — the embedding analog of q_drift. */
  private def qEmbedDrift(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cent = Similarity.ivfTrain(emb, 8, 2)
    val asg = Similarity.ivfAssign(emb, cent)
      .select(col("vec_id"), col("centroid_id"))
    Drift.drift(
      asg.filter(pmod(col("vec_id"), lit(2)) === 0),
      asg.filter(pmod(col("vec_id"), lit(2)) === 1),
      "centroid_id", binWidth = 1.0, maxBin = 8)
  }

  /** Shared by q_cosine_ivf AND q_ivf_append: an index grown by appends
    * against fixed centroids must search exactly like one built in a
    * single save. */
  private def ivfSearchOracleSql: String =
    s"""WITH ${oIvfAssign(8, 2)}, q AS (
       |  SELECT vec_id AS query_id, embedding AS qe, centroid_id AS qc
       |  FROM assign WHERE vec_id < 10
       |), s AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id,
       |    ${r4(oCos("q.qe", "a.embedding"))} AS score
       |  FROM assign a, q
       |  WHERE a.centroid_id = q.qc AND a.vec_id != q.query_id
       |), rk AS (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
       |  FROM s
       |)
       |SELECT query_id, neighbor_id, score, rk FROM rk WHERE rk <= 3""".stripMargin

  /** IVFADC parameters shared by q_cosine_ivfpq's query and oracle. */
  private val IvfPqC = 4
  private val IvfPqIvfIters = 2
  private val IvfPqNprobe = operators.ProductQuantizer.DefaultNprobe

  private def qCosineIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val (cent, cbs, codes) = operators.ProductQuantizer.ivfPqIndex(emb,
      nClusters = IvfPqC, ivfIters = IvfPqIvfIters,
      subspaces = PqM, subDim = PqSub, k = PqK, pqIters = PqIters)
    operators.ProductQuantizer.searchIvfPq(emb, cent, cbs, codes,
      nQueries = 10, topK = 5, subspaces = PqM, subDim = PqSub,
      nprobe = IvfPqNprobe)
  }

  /** ADC shortlist size for q_cosine_ivfpq_rerank: 8× topK. */
  private val IvfPqRerankShortlist = 40

  /** IVFADC + EXACT RE-RANK ([[operators.ProductQuantizer
    * .searchIvfPqRerank]]): stage 1 is the same probe-scoped ADC scan as
    * q_cosine_ivfpq but keeps the top-40 shortlist; stage 2 re-scores
    * those candidates with the exact float cosine and emits the exact
    * top-5 — the serving shape for a curation pipeline that ACTS on
    * matches (PqSpec pins the recall floor this stage buys). */
  private def qCosineIvfPqRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val (cent, cbs, codes) = operators.ProductQuantizer.ivfPqIndex(emb,
      nClusters = IvfPqC, ivfIters = IvfPqIvfIters,
      subspaces = PqM, subDim = PqSub, k = PqK, pqIters = PqIters)
    operators.ProductQuantizer.searchIvfPqRerank(emb, cent, cbs, codes,
      nQueries = 10, topK = 5, subspaces = PqM, subDim = PqSub,
      nprobe = IvfPqNprobe, shortlist = IvfPqRerankShortlist)
  }

  /** The TRAIN-ON-SAMPLE IVFADC ([[operators.ProductQuantizer
    * .ivfPqIndexSampled]]): Lloyd runs on the deterministic evens-only
    * half, assignment and encoding cover every vector — the 100 TB
    * shape, where training cost is O(sample) and the corpus pays only
    * the two broadcast assigns. Hash-gated end to end against the
    * sampled-training DuckDB mirror (same generator as q_cosine_ivfpq,
    * sampledTrain = true). */
  private def qCosineIvfPqSampled(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val (cent, cbs, codes) = operators.ProductQuantizer.ivfPqIndexSampled(emb,
      nClusters = IvfPqC, ivfIters = IvfPqIvfIters,
      subspaces = PqM, subDim = PqSub, k = PqK, pqIters = PqIters)
    operators.ProductQuantizer.searchIvfPq(emb, cent, cbs, codes,
      nQueries = 10, topK = 5, subspaces = PqM, subDim = PqSub,
      nprobe = IvfPqNprobe)
  }

  /** IVFADC oracle (mirrors ProductQuantizer.ivfPqIndex + searchIvfPq):
    * cosine IVF Lloyd over the normalized vectors, residuals via exact
    * double-subtract-float-cast, L2 PQ codebooks over the residuals, and
    * the probe-scoped ADC score dot(q,c) + Σ_m dot(q_m, cw) in integer
    * micros. Every sub-contract reuses the idiom already proven by
    * q_cosine_ivf and q_cosine_pq. */
  private def oIvfPqSql(nQ: Int, topK: Int,
      sampledTrain: Boolean = false, rerank: Option[Int] = None): String = {
    val dim = 64
    val rerankTail = oIvfPqTail(nQ, topK, rerank)
    // sampled training (ivfPqIndexSampled mirror): Lloyd inputs come
    // from the evens-only half, seeds widen to < 2C / 2K so the sample
    // still yields C centroids and K codes; assignment/encode stay full
    val trainSrc = if (sampledTrain) "tnorm" else "norm"
    // --- cosine IVF over norm (oIvfAssign pattern, source = norm/e) ---
    def iAssign(name: String, centTable: String, src: String = "norm") =
      s"""$name AS (
         |  SELECT vec_id, centroid_id, e FROM (
         |    SELECT n.vec_id, c.centroid_id, n.e,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${r4(oCos("n.e", "c.ce"))} DESC, c.centroid_id) AS arn
         |    FROM $src n, $centTable c
         |  ) WHERE arn = 1
         |)""".stripMargin
    val ivfSeed =
      s"""icent0 AS (
         |  SELECT vec_id AS centroid_id, e AS ce FROM $trainSrc
         |  WHERE vec_id < ${if (sampledTrain) 2 * IvfPqC else IvfPqC}
         |)""".stripMargin
    val ivfSteps = (1 to IvfPqIvfIters).map { t =>
      Seq(
        iAssign(s"ia$t", s"icent${t - 1}", trainSrc),
        s"""im$t AS (
           |  SELECT centroid_id, r.i AS i,
           |    CAST(sum(CAST(floor(CAST(e[r.i] AS DOUBLE) * 1000000 + 0.5)
           |      AS BIGINT)) AS BIGINT) AS s2, count(*) AS n
           |  FROM ia$t, range(1, ${dim + 1}) r(i) GROUP BY 1, 2
           |)""".stripMargin,
        s"""icent$t AS (
           |  SELECT centroid_id,
           |    list(CAST(CAST(s2 AS DOUBLE) / (n * 1000000.0) AS FLOAT) ORDER BY i) AS ce
           |  FROM im$t GROUP BY centroid_id
           |)""".stripMargin).mkString(",\n")
    }
    val centF = s"icent$IvfPqIvfIters"
    val res =
      s"""res AS (
         |  SELECT a.vec_id, a.centroid_id,
         |    list_transform(range(1, ${dim + 1}),
         |      i -> CAST(CAST(a.e[i] AS DOUBLE) - CAST(c.ce[i] AS DOUBLE) AS FLOAT)) AS rv
         |  FROM ${iAssignedName} a JOIN $centF c ON a.centroid_id = c.centroid_id
         |)""".stripMargin
    // --- residual PQ (oPqSql pattern, source = res/rv) ---
    val d2 = (v: String, c: String) =>
      r4(s"(${oDot(c, c)}) - 2 * (${oDot(v, c)})")
    def pAssign(name: String, m: Int, centTable: String,
        srcSuffix: String = "") =
      s"""$name AS (
         |  SELECT vec_id, code, sv FROM (
         |    SELECT s.vec_id, c.code, s.sv,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${d2("s.sv", "c.ce")} ASC, c.code) AS arn
         |    FROM ${srcSuffix}rsub$m s, $centTable c
         |  ) WHERE arn = 1
         |)""".stripMargin
    val pqTrainPfx = if (sampledTrain) "t" else ""
    val perSubspace = (0 until PqM).map { m =>
      val lo = m * PqSub + 1; val hi = (m + 1) * PqSub
      val trainCte = if (sampledTrain)
        s"""trsub$m AS (SELECT vec_id, sv FROM rsub$m WHERE vec_id % 2 = 0),
           |""".stripMargin
      else ""
      val seed =
        s"""rsub$m AS (SELECT vec_id, rv[$lo:$hi] AS sv FROM res),
           |${trainCte}rcent${m}_0 AS (
           |  SELECT vec_id AS code, sv AS ce FROM ${pqTrainPfx}rsub$m
           |  WHERE vec_id < ${if (sampledTrain) 2 * PqK else PqK}
           |)""".stripMargin
      val steps = (1 to PqIters).map { t =>
        Seq(
          pAssign(s"ra${m}_$t", m, s"rcent${m}_${t - 1}", pqTrainPfx),
          s"""rmm${m}_$t AS (
             |  SELECT code, r.i AS i,
             |    CAST(sum(CAST(floor(CAST(sv[r.i] AS DOUBLE) * 1000000 + 0.5)
             |      AS BIGINT)) AS BIGINT) AS s2, count(*) AS n
             |  FROM ra${m}_$t, range(1, ${PqSub + 1}) r(i) GROUP BY 1, 2
             |)""".stripMargin,
          s"""rcent${m}_$t AS (
             |  SELECT code,
             |    list(CAST(CAST(s2 AS DOUBLE) / (n * 1000000.0) AS FLOAT) ORDER BY i) AS ce
             |  FROM rmm${m}_$t GROUP BY code
             |)""".stripMargin).mkString(",\n")
      }
      (Seq(seed) ++ steps :+ pAssign(s"rfin$m", m, s"rcent${m}_$PqIters"))
        .mkString(",\n")
    }
    val codes = (0 until PqM)
      .map(m => s"SELECT vec_id, $m AS m, code FROM rfin$m")
      .mkString("pcodes AS (\n", "\n  UNION ALL ", "\n)")
    val codebook = (0 until PqM)
      .map(m => s"SELECT $m AS m, code, ce FROM rcent${m}_$PqIters")
      .mkString("pcodebook AS (\n", "\n  UNION ALL ", "\n)")
    val qsubs = (0 until PqM)
      .map { m =>
        val lo = m * PqSub + 1; val hi = (m + 1) * PqSub
        s"SELECT vec_id AS query_id, $m AS m, e[$lo:$hi] AS qe FROM norm WHERE vec_id < $nQ"
      }
      .mkString("qsubs AS (\n", "\n  UNION ALL ", "\n)")
    val tnormCte = if (sampledTrain)
      "tnorm AS (SELECT vec_id, e FROM norm WHERE vec_id % 2 = 0),\n" else ""
    s"""WITH norm AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(CAST(x AS DOUBLE) / sqrt(${oDot("embedding", "embedding")}) AS FLOAT)) AS e
       |  FROM embeddings
       |),
       |$tnormCte$ivfSeed,
       |${ivfSteps.mkString(",\n")},
       |${iAssign(iAssignedName, centF)},
       |$res,
       |${perSubspace.mkString(",\n")},
       |$codes,
       |$codebook,
       |vcode AS (
       |  SELECT p.vec_id, p.m, p.code, a.centroid_id
       |  FROM pcodes p JOIN $iAssignedName a ON p.vec_id = a.vec_id
       |),
       |probes AS (
       |  SELECT query_id, centroid_id FROM (
       |    SELECT n.vec_id AS query_id, c.centroid_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${r4(oCos("n.e", "c.ce"))} DESC, c.centroid_id) AS prn
       |    FROM norm n, $centF c WHERE n.vec_id < $nQ
       |  ) WHERE prn <= $IvfPqNprobe
       |),
       |bt AS (
       |  SELECT p.query_id, p.centroid_id,
       |    CAST(floor((${oDot("n.e", "c.ce")}) * 1000000 + 0.5) AS BIGINT) AS bd
       |  FROM probes p
       |  JOIN norm n ON n.vec_id = p.query_id
       |  JOIN $centF c ON c.centroid_id = p.centroid_id
       |),
       |$qsubs,
       |lut AS (
       |  SELECT q.query_id, q.m, c.code,
       |    CAST(floor((${oDot("q.qe", "c.ce")}) * 1000000 + 0.5) AS BIGINT) AS pd
       |  FROM qsubs q JOIN pcodebook c ON q.m = c.m
       |),
       |scored AS (
       |  SELECT l.query_id, k.vec_id AS neighbor_id, k.centroid_id,
       |    CAST(sum(pd) AS BIGINT) AS rsum
       |  FROM vcode k
       |  JOIN probes p ON p.centroid_id = k.centroid_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.m = k.m AND l.code = k.code
       |  WHERE k.vec_id != p.query_id
       |  GROUP BY 1, 2, 3
       |)$rerankTail""".stripMargin
  }

  /** Final stage of [[oIvfPqSql]]: ADC top-k directly, or (rerank) ADC
    * top-R shortlist → exact-dot re-rank — mirrors
    * ProductQuantizer.searchIvfPqRerank mechanically. */
  private def oIvfPqTail(nQ: Int, topK: Int, rerank: Option[Int]): String = {
    val adcScore = r4("CAST(s.rsum + b.bd AS DOUBLE) / 1000000.0")
    rerank match {
      case None =>
        s"""
           |SELECT query_id, neighbor_id, score_ivfpq, rk FROM (
           |  SELECT s.query_id, s.neighbor_id,
           |    $adcScore AS score_ivfpq,
           |    CAST(row_number() OVER (PARTITION BY s.query_id
           |      ORDER BY $adcScore DESC,
           |        s.neighbor_id) AS INTEGER) AS rk
           |  FROM scored s JOIN bt b
           |    ON b.query_id = s.query_id AND b.centroid_id = s.centroid_id
           |) WHERE rk <= $topK""".stripMargin
      case Some(r) =>
        s""",
           |short AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT s.query_id, s.neighbor_id,
           |      row_number() OVER (PARTITION BY s.query_id
           |        ORDER BY $adcScore DESC, s.neighbor_id) AS srn
           |    FROM scored s JOIN bt b
           |      ON b.query_id = s.query_id AND b.centroid_id = s.centroid_id
           |  ) WHERE srn <= $r
           |)
           |SELECT query_id, neighbor_id, score, rk FROM (
           |  SELECT a.query_id, a.neighbor_id,
           |    ${r4(oDot("qn.e", "nn.e"))} AS score,
           |    CAST(row_number() OVER (PARTITION BY a.query_id
           |      ORDER BY ${r4(oDot("qn.e", "nn.e"))} DESC,
           |        a.neighbor_id) AS INTEGER) AS rk
           |  FROM short a
           |  JOIN norm qn ON qn.vec_id = a.query_id
           |  JOIN norm nn ON nn.vec_id = a.neighbor_id
           |) WHERE rk <= $topK""".stripMargin
    }
  }
  private val iAssignedName = "iassign"

  /** SRP band-row CTE chain shared by the two LSH oracles: the plane
    * matrix is DERIVED in SQL from md5 exactly as Similarity.srpPlanes
    * derives it in Scala (sign = +1 iff the digest's first byte is even
    * — the second hex char of DuckDB's md5() string), so the two engines
    * compute identical planes with no literal matrix to drift. Band
    * width is ADAPTIVE (Similarity.bandsFor — same integer rule in SQL:
    * `min b: 2^b·target ≥ n`) and so is the band COUNT
    * (Similarity.lshBandsFor — mirrored as the literal VALUES table).
    * Plane p belongs to band p∕bb at bit p mod bb, matching srpCoded's
    * consecutive-planes-per-band layout; each dot is the same
    * left-to-right double fold as the engine's ArrayMath.dotF, so every
    * band key is bit-identical. Ends in
    * `bands(vec_id, embedding, band, bkey)`. */
  private def oSrpBandCtes: String =
    oSrpBandCtesWith(Similarity.lshBandsValuesSql,
      Similarity.LshBandBitsMax * Similarity.lshBandsFor(Similarity.LshBandBitsMax))

  private def oSrpBandCtesWith(bandsValues: String, planesMax: Int): String = {
    val dim = Similarity.LshDim
    s"""nn AS (SELECT count(*) AS n FROM embeddings
       |), pr AS (
       |  SELECT coalesce(min(b), ${Similarity.LshBandBitsMax}) AS bb
       |  FROM range(${Similarity.LshBandBits}, ${Similarity.LshBandBitsMax + 1}) t(b), nn
       |  WHERE (CAST(1 AS BIGINT) << b) * ${Similarity.LshTargetBucket} >= n
       |), lt AS (
       |  SELECT v.nb FROM (VALUES $bandsValues) v(b, nb), pr
       |  WHERE v.b = pr.bb
       |), pl AS MATERIALIZED (
       |  SELECT t.p, list_transform(range(0, $dim), d ->
       |    CASE WHEN strpos('02468ace', substr(md5('srp:' ||
       |      CAST(t.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 2, 1)) > 0
       |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS s
       |  FROM range($planesMax) t(p), pr, lt WHERE t.p < pr.bb * lt.nb
       |), dots AS (
       |  SELECT e.vec_id, pl.p,
       |    CASE WHEN list_reduce(list_transform(range(1, ${dim + 1}),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * pl.s[i]), (x, y) -> x + y) >= 0
       |      THEN 1 ELSE 0 END AS bit
       |  FROM embeddings e, pl
       |), bands AS MATERIALIZED (
       |  SELECT d.vec_id, CAST(d.p // pr.bb AS INT) AS band,
       |    CAST(sum(d.bit << (d.p % pr.bb)) AS INT) AS bkey
       |  FROM dots d, pr GROUP BY d.vec_id, d.p // pr.bb, pr.bb
       |)""".stripMargin
  }

  private def oDedupEmbedLsh: String = {
    val tau = Similarity.LshTau
    s"""WITH ${oSrpBandCtes}, cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
       |), v AS (
       |  SELECT cand.vec_a, cand.vec_b,
       |    ${r4(oCos("ea.embedding", "eb.embedding"))} AS cos
       |  FROM cand JOIN embeddings ea ON ea.vec_id = cand.vec_a
       |            JOIN embeddings eb ON eb.vec_id = cand.vec_b
       |)
       |SELECT vec_a, vec_b, cos FROM v WHERE cos >= $tau""".stripMargin
  }

  /** Multi-probe LSH oracle: same md5-derived planes over the MP band
    * table, probe side expanded to the exact key plus every single-bit
    * flip (Hamming ≤ 1), mirroring dedupPairsLshMp key for key. */
  private def oDedupEmbedLshMp: String = {
    val tau = Similarity.LshTau
    val ctes = oSrpBandCtesWith(Similarity.lshBandsMpValuesSql,
      Similarity.LshBandBitsMax * Similarity.lshBandsMpFor(Similarity.LshBandBitsMax))
    s"""WITH $ctes, probes AS (
       |  SELECT bands.vec_id, bands.band,
       |    CASE WHEN j.j < 0 THEN bands.bkey
       |         ELSE CAST(xor(bands.bkey, (1 << j.j)) AS INT) END AS pkey
       |  FROM bands, pr, range(-1, ${Similarity.LshBandBitsMax}) j(j)
       |  WHERE j.j < pr.bb
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM probes a JOIN bands b
       |    ON a.band = b.band AND a.pkey = b.bkey AND a.vec_id < b.vec_id
       |), v AS (
       |  SELECT cand.vec_a, cand.vec_b,
       |    ${r4(oCos("ea.embedding", "eb.embedding"))} AS cos
       |  FROM cand JOIN embeddings ea ON ea.vec_id = cand.vec_a
       |            JOIN embeddings eb ON eb.vec_id = cand.vec_b
       |)
       |SELECT vec_a, vec_b, cos FROM v WHERE cos >= $tau""".stripMargin
  }

  /** Incremental-embed oracle: the MULTI-PROBE layout ([[Similarity
    * .incrementalEmbed]]'s default — same md5-derived planes over the MP
    * band table, batch side expanded to the exact key plus every
    * single-bit flip), cross-set candidates (batch = vec_id % 5 = 0
    * probes corpus ∪ smaller-id batch), exact-cosine verify, first-wins
    * decisions. */
  private def oDedupEmbedIncr: String = {
    val tau = Similarity.LshTau
    val ctes = oSrpBandCtesWith(Similarity.lshBandsMpValuesSql,
      Similarity.LshBandBitsMax * Similarity.lshBandsMpFor(Similarity.LshBandBitsMax))
    s"""WITH $ctes, c AS (
       |  SELECT vec_id, vec_id % 5 = 0 AS isb FROM embeddings
       |), bandsb AS MATERIALIZED (
       |  SELECT bands.vec_id, c.isb, bands.band, bands.bkey
       |  FROM bands JOIN c ON c.vec_id = bands.vec_id
       |), probes AS (
       |  SELECT bandsb.vec_id, bandsb.band,
       |    CASE WHEN j.j < 0 THEN bandsb.bkey
       |         ELSE CAST(xor(bandsb.bkey, (1 << j.j)) AS INT) END AS pkey
       |  FROM bandsb, pr, range(-1, ${Similarity.LshBandBitsMax}) j(j)
       |  WHERE bandsb.isb AND j.j < pr.bb
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, b.isb AS b_isb
       |  FROM probes a JOIN bandsb b
       |    ON a.band = b.band AND a.pkey = b.bkey AND a.vec_id <> b.vec_id
       |    AND (NOT b.isb OR b.vec_id < a.vec_id)
       |), v AS (
       |  SELECT cand.vec_a, cand.vec_b, cand.b_isb,
       |    ${r4(oCos("ea.embedding", "eb.embedding"))} AS cos
       |  FROM cand JOIN embeddings ea ON ea.vec_id = cand.vec_a
       |            JOIN embeddings eb ON eb.vec_id = cand.vec_b
       |), m AS (SELECT * FROM v WHERE cos >= $tau
       |), per AS (
       |  SELECT vec_a AS vec_id,
       |    min(CASE WHEN NOT b_isb THEN vec_b END) AS corpus_match,
       |    min(CASE WHEN b_isb THEN vec_b END) AS batch_match,
       |    CAST(count(CASE WHEN NOT b_isb THEN 1 END) AS BIGINT) AS nc,
       |    CAST(count(CASE WHEN b_isb THEN 1 END) AS BIGINT) AS nb
       |  FROM m GROUP BY vec_a
       |)
       |SELECT c.vec_id,
       |  CASE WHEN per.corpus_match IS NOT NULL THEN 'dup_of_corpus'
       |       WHEN per.batch_match IS NOT NULL THEN 'dup_in_batch'
       |       ELSE 'kept' END AS status,
       |  coalesce(per.corpus_match, per.batch_match) AS match_id,
       |  coalesce(per.nc, 0) AS n_corpus_matches,
       |  coalesce(per.nb, 0) AS n_batch_matches
       |FROM c LEFT JOIN per ON per.vec_id = c.vec_id
       |WHERE c.isb""".stripMargin
  }

  /** Ordered-funnel oracle: layered windows mirror EventAnalytics.funnel
    * (strictly-before = ROWS UNBOUNDED..1 PRECEDING on (ts, event_id)). */
  private def oFunnel(steps: Seq[String]): String = {
    val layers = steps.zipWithIndex.tail.map { case (step, k) =>
      s"""l$k AS (
         |  SELECT *, CASE WHEN event_type = '$step'
         |      AND coalesce(max(hit${k - 1}) OVER w, 0) = 1 THEN 1 ELSE 0 END AS hit$k
         |  FROM l${k - 1}
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |)""".stripMargin
    }
    val maxes = steps.indices.map(k => s"max(hit$k) AS s$k").mkString(", ")
    val rows = steps.zipWithIndex.map { case (step, k) =>
      s"SELECT ${k + 1} AS step, '$step' AS event_type, CAST(sum(s$k) AS BIGINT) AS n_users FROM u"
    }.mkString("\nUNION ALL ")
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
       |  FROM events
       |), l0 AS (
       |  SELECT *, CASE WHEN event_type = '${steps.head}' THEN 1 ELSE 0 END AS hit0
       |  FROM e
       |),
       |${layers.mkString(",\n")},
       |u AS (SELECT user_id, $maxes FROM l${steps.size - 1} GROUP BY user_id)
       |$rows""".stripMargin
  }

  /** Mechanical 3-round unroll of [[Graph.pagerank]]: same 1e12 rank
    * quantization, same interpolated damping constants, and the same
    * per-round dangling-mass CTE (quantized rank sum of nodes absent from
    * `outdeg`, redistributed as d·D/N — on a sink-free graph dq = 0 and
    * the term is an exact IEEE `+ 0.0`). `edgesSql` supplies the
    * `pairs`/`edges` CTEs. */
  private def pagerankUnrollSql(edgesSql: String): String = {
    val rounds = (1 to 3).map { i =>
      s"""d$i AS (
         |  SELECT CAST(COALESCE(sum(CAST(floor(r.rank * 1e12 + 0.5) AS BIGINT)), 0) AS BIGINT) AS dq
         |  FROM r${i - 1} r LEFT JOIN outdeg o ON r.node = o.src
         |  WHERE o.src IS NULL
         |), c$i AS (
         |  SELECT e.dst,
         |    CAST(sum(CAST(floor(r.rank / o.odeg * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS sumq
         |  FROM r${i - 1} r JOIN outdeg o ON r.node = o.src
         |  JOIN edges e ON e.src = o.src
         |  GROUP BY e.dst
         |), r$i AS (
         |  SELECT nodes.node,
         |    floor((${1 - PrDamping} / n.nn + $PrDamping * (COALESCE(c$i.sumq, 0) / 1e12 + d$i.dq / 1e12 / n.nn)) * 1e12 + 0.5) / 1e12 AS rank
         |  FROM nodes CROSS JOIN n CROSS JOIN d$i
         |  LEFT JOIN c$i ON nodes.node = c$i.dst
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesSql, nodes AS (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
       |), n AS (SELECT count(*) AS nn FROM nodes),
       |outdeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
       |r0 AS (
       |  SELECT node, floor(1.0 / n.nn * 1e12 + 0.5) / 1e12 AS rank
       |  FROM nodes CROSS JOIN n
       |),
       |$rounds
       |SELECT node, ${r4("rank * 1e6")} AS rank_ppm FROM r3""".stripMargin
  }

  /** q_simhash_mp is EXACTLY complete like q_simhash (multi-index +
    * Hamming-1 probes relax the pigeonhole without weakening it), so the
    * two share one oracle verbatim. */
  def oracleSql: Map[String, String] = oracleSqlBase +
    ("q_simhash_mp" -> oracleSqlBase("q_simhash"))

  private def oracleSqlBase: Map[String, String] = Map(
    // Sketch queries: the shipped q_sketches / q_sketch_rollup plans are
    // sketch-only (engine-specific estimates, no DuckDB mirror → rows-only
    // at the oracle gate, so the bench measures the sketch, not its
    // oracle). The hash-checked error contract lives in the verify-only
    // _check companions: exact companions + in-band booleans (see
    // qSketchesCheck scaladoc) — the oracle asserts the exact aggregates
    // AND that every estimate honors its error contract (literal TRUE: a
    // sketch out of band flips the hash).
    "q_sketches_check" ->
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS users_in_band, TRUE AS p50_in_band, TRUE AS p99_in_band
        |FROM events GROUP BY event_type""".stripMargin,
    "q_sketch_rollup_check" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_days,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS merged_in_band
        |FROM events GROUP BY event_type""".stripMargin,
    // q_topk_sketch ships sketch-only (Misra-Gries estimates are
    // arrival/merge-order dependent → rows-only); its hash-gated error
    // contract is this companion: exact top-10 token counts + the
    // order-independent MG theorems as literal-TRUE booleans.
    "q_topk_sketch_check" -> mgContractOracleSql,
    // identical oracle on purpose: the MG theorems are merge-tree-
    // independent, so batch rollup and streamed segments share one gate
    "q_stream_topk_check" -> mgContractOracleSql,
    "q_fuzzy_join" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
        |), b AS (
        |  SELECT name, substr(name, 1, 3) AS blk, length(name) AS len,
        |    count(*) OVER (PARTITION BY substr(name, 1, 3)) AS blk_n
        |  FROM names
        |), capped AS (SELECT name, blk, len FROM b WHERE blk_n <= 1000)
        |SELECT a.name AS name_a, c.name AS name_b,
        |  floor(jaro_winkler_similarity(a.name, c.name) * 10000 + 0.5) / 10000 AS sim
        |FROM capped a JOIN capped c
        |  ON a.blk = c.blk AND a.name < c.name AND abs(a.len - c.len) <= 2
        |WHERE jaro_winkler_similarity(a.name, c.name) >= 0.85""".stripMargin,
    // LSH pairs (cand ∩ jaccard >= tau) joined to each side's source;
    // mean over integer 4dp-quantized jaccards, same as the Spark side
    "q_dup_sources" ->
      s"""WITH $oShingleIdx,
         |$oMinhash,
         |${oJaccard(0.7)},
         |edges AS (
         |  SELECT c.doc_a, c.doc_b, j.jaccard
         |  FROM cand c JOIN jpairs j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
         |),
         |lab AS (
         |  SELECT least(da.source, db.source) AS source_x,
         |    greatest(da.source, db.source) AS source_y,
         |    CAST(floor(e.jaccard * 10000 + 0.5) AS BIGINT) AS j4
         |  FROM edges e JOIN documents da ON da.doc_id = e.doc_a
         |               JOIN documents db ON db.doc_id = e.doc_b
         |)
         |SELECT source_x, source_y, CAST(count(*) AS BIGINT) AS n_pairs,
         |  floor(CAST(sum(j4) AS DOUBLE) / count(*) + 0.5) / 10000 AS avg_jaccard
         |FROM lab GROUP BY 1, 2""".stripMargin,

    "q_pmi" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |uni AS (
        |  SELECT unnest(toks) AS token FROM tk
        |), uc AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM uni GROUP BY 1),
        |bg AS (
        |  SELECT unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
        |    ELSE list_transform(range(1, len(toks)),
        |           i -> concat_ws(' ', toks[i], toks[i+1])) END) AS bigram
        |  FROM tk
        |), bc AS (
        |  SELECT bigram, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM bg GROUP BY 1 HAVING count(*) >= 5
        |), tot AS (
        |  SELECT (SELECT count(*) FROM uni) AS n_uni,
        |         (SELECT count(*) FROM bg) AS n_bi
        |)
        |SELECT bc.bigram, bc.n_ab, ua.cnt AS ca, ub.cnt AS cb,
        |  floor(ln((CAST(bc.n_ab AS DOUBLE) / n_bi) /
        |    ((CAST(ua.cnt AS DOUBLE) / n_uni) * (CAST(ub.cnt AS DOUBLE) / n_uni)))
        |    * 10000 + 0.5) / 10000 AS pmi
        |FROM bc
        |JOIN uc ua ON ua.token = string_split(bc.bigram, ' ')[1]
        |JOIN uc ub ON ub.token = string_split(bc.bigram, ' ')[2]
        |, tot""".stripMargin,

    // degree-oriented triangle census, same (deg, id) total order as
    // Graph.triangles so each triangle is counted exactly once
    "q_triangles" ->
      s"""WITH sup AS (
        |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sv FROM lineitem
        |), co AS (
        |  SELECT x.sv AS a, y.sv AS b, count(*) AS cnt
        |  FROM sup x JOIN sup y ON x.pk = y.pk AND x.sv < y.sv
        |  GROUP BY 1, 2
        |), e0 AS (
        |  SELECT a, b FROM co ORDER BY cnt DESC, a, b LIMIT $TopCoEdges
        |), d AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT a AS node FROM e0 UNION ALL SELECT b AS node FROM e0
        |  ) GROUP BY node
        |), o AS (
        |  SELECT
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.a < e0.b)
        |         THEN e0.a ELSE e0.b END AS u,
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e0.a < e0.b)
        |         THEN e0.b ELSE e0.a END AS v
        |  FROM e0 JOIN d da ON da.node = e0.a JOIN d db ON db.node = e0.b
        |), t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM o e1 JOIN o e2 ON e2.u = e1.v
        |       JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(CAST(sum(deg) AS BIGINT) // 2 AS BIGINT) AS n_edges,
        |    CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
        |  FROM d
        |)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  floor(3.0 * n_triangles / nullif(n_wedges, 0) * 10000 + 0.5) / 10000
        |    AS clustering
        |FROM tot, t""".stripMargin,

    // same 30-min session cut as q_sessionize; path = first 3 event types
    // in (ts, event_id) order, top 20 by (count desc, path)
    "q_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |        OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
        |  FROM events
        |), s AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e
        |), p AS (
        |  SELECT user_id, sid,
        |    array_to_string((list(event_type ORDER BY ts, event_id))[1:3], ' > ')
        |      AS path
        |  FROM s GROUP BY user_id, sid
        |)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // same session CTE as q_sessionize, then the sweep: +1 at clipped
    // start / -1 after clipped end per overlapped day, running sum with
    // starts-first tie order, per-day max (tie order within a delta class
    // cannot move the max - see EventAnalytics.peakConcurrency)
    "q_peak_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |        OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
        |  FROM events
        |), s AS (
        |  SELECT user_id, event_id, ts,
        |    sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e
        |), sess AS (
        |  SELECT user_id, sid, min(ts) AS st, max(ts) AS en
        |  FROM s GROUP BY user_id, sid
        |), byday AS (
        |  SELECT unnest(generate_series(CAST(st AS DATE), CAST(en AS DATE),
        |      INTERVAL 1 DAY))::DATE AS day, st, en
        |  FROM sess
        |), clipped AS (
        |  SELECT day,
        |    greatest(st, CAST(day AS TIMESTAMP)) AS cs,
        |    least(en, CAST(day + INTERVAL 1 DAY AS TIMESTAMP)) AS ce
        |  FROM byday
        |), points AS (
        |  SELECT day, cs AS t, 1 AS delta FROM clipped
        |  UNION ALL SELECT day, ce AS t, -1 AS delta FROM clipped
        |), sweep AS (
        |  SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |  FROM points
        |)
        |SELECT day, CAST(max(c) AS BIGINT) AS peak_concurrent,
        |  CAST(count(*) / 2 AS BIGINT) AS n_sessions
        |FROM sweep GROUP BY day""".stripMargin,

    // exact per-group percentile clip, integer-cents means
    "q_winsorize" ->
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS plo,
        |    quantile_cont(value, 0.95) AS phi
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  floor(CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 100.0 / count(*) * 10000 + 0.5) / 10000 AS mean_raw,
        |  floor(CAST(sum(CAST(floor(least(greatest(e.value, b.plo), b.phi) * 100
        |      + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 100.0 / count(*) * 10000 + 0.5) / 10000 AS mean_wins,
        |  floor(min(b.plo) * 10000 + 0.5) / 10000 AS p_lo,
        |  floor(min(b.phi) * 10000 + 0.5) / 10000 AS p_hi
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type""".stripMargin,

    "q_transitions" ->
      """WITH nx AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  floor(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS p
        |FROM c""".stripMargin,

    "q_pagerank" -> pagerankUnrollSql(
      """pairs AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION ALL SELECT b AS src, a AS dst FROM pairs
        |)""".stripMargin),
    "q_pagerank_dangling" -> pagerankUnrollSql(
      """pairs AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), edges AS (SELECT a AS src, b AS dst FROM pairs)""".stripMargin),

    // k-core peel unrolled to exactly KcoreRounds rounds: each round
    // keeps edges whose BOTH endpoints had degree >= k in the previous
    // round's subgraph — post-fixpoint rounds are no-ops, so this equals
    // Graph.kcore's early-exiting loop
    "q_kcore" -> {
      // AS MATERIALIZED is load-bearing: each round references the
      // previous one 3x, and inlined CTEs would re-expand the base scan
      // 3^rounds times ("too many open files" long before any result)
      val rounds = (1 to KcoreRounds).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT src, count(*) AS deg FROM e${i - 1} GROUP BY src),
           |e$i AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN d$i s ON s.src = e.src AND s.deg >= $KcoreK
           |  JOIN d$i t ON t.src = e.dst AND t.deg >= $KcoreK
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |), e0 AS MATERIALIZED (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION SELECT b AS src, a AS dst FROM pairs
         |),
         |$rounds
         |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
         |FROM e$KcoreRounds GROUP BY src""".stripMargin
    },

    // synchronous LPA unrolled: per round, per node, the most frequent
    // neighbor label with smallest-label tiebreak — mirrors
    // Graph.labelPropagation exactly
    "q_communities" -> {
      val rounds = (1 to 3).map { i =>
        s"""c$i AS (
           |  SELECT e.src AS node, l.label, count(*) AS c
           |  FROM edges e JOIN l${i - 1} l ON l.node = e.dst
           |  GROUP BY 1, 2
           |), l$i AS (
           |  SELECT node, label FROM (
           |    SELECT node, label,
           |      row_number() OVER (PARTITION BY node
           |        ORDER BY c DESC, label) AS rn
           |    FROM c$i
           |  ) WHERE rn = 1
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |), edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION ALL SELECT b AS src, a AS dst FROM pairs
         |), l0 AS (
         |  SELECT node, node AS label FROM (
         |    SELECT src AS node FROM edges UNION SELECT dst FROM edges
         |  )
         |),
         |$rounds
         |SELECT node, label AS community,
         |  CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS community_size
         |FROM l3""".stripMargin
    },
    "q_resample_ffill" -> withTicksBars(
      """, span AS (
        |  SELECT symbol, min(time) AS t0, max(time) AS t1 FROM bars GROUP BY symbol
        |), grid AS (
        |  SELECT symbol, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS time
        |  FROM span
        |), j AS (
        |  SELECT g.symbol, g.time, b.close, b.volume
        |  FROM grid g LEFT JOIN bars b ON b.symbol = g.symbol AND b.time = g.time
        |)
        |SELECT symbol, time,
        |  last_value(close IGNORE NULLS) OVER w AS close,
        |  CAST(last_value(volume IGNORE NULLS) OVER w AS BIGINT) AS volume,
        |  CASE WHEN close IS NULL THEN 1 ELSE 0 END AS filled
        |FROM j
        |WINDOW w AS (PARTITION BY symbol ORDER BY time
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),
    // mirrors Resample.gaps: islands key = grid slot ordinal − row_number
    "q_gaps" -> withTicksBars(
      """, span AS (
        |  SELECT symbol, min(time) AS t0, max(time) AS t1 FROM bars GROUP BY symbol
        |), grid AS (
        |  SELECT symbol, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS time
        |  FROM span
        |), gslot AS (
        |  SELECT symbol, time,
        |    row_number() OVER (PARTITION BY symbol ORDER BY time) AS slot
        |  FROM grid
        |), missing AS (
        |  SELECT g.symbol, g.time, g.slot
        |  FROM gslot g LEFT JOIN bars b ON b.symbol = g.symbol AND b.time = g.time
        |  WHERE b.symbol IS NULL
        |), isl AS (
        |  SELECT symbol, time,
        |    slot - row_number() OVER (PARTITION BY symbol ORDER BY time) AS island
        |  FROM missing
        |)
        |SELECT symbol, min(time) AS gap_start, max(time) AS gap_end,
        |  count(*) AS gap_slots
        |FROM isl GROUP BY symbol, island""".stripMargin),

    "q_unpivot" -> withTicksBars(
      """SELECT symbol, time, field, value FROM (
        |  SELECT symbol, time, 'open' AS field, open AS value FROM bars
        |  UNION ALL SELECT symbol, time, 'high', high FROM bars
        |  UNION ALL SELECT symbol, time, 'low', low FROM bars
        |  UNION ALL SELECT symbol, time, 'close', close FROM bars
        |) u""".stripMargin),
    "q_integrity" -> {
      def chk(name: String, child: String, fk: String, parent: String,
          pk: String) =
        s"""SELECT '$name' AS relationship,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_rows,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child WHERE $fk IS NULL)
           |    AS n_null_fk,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child c
           |   WHERE c.$fk IS NOT NULL
           |     AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk))
           |    AS n_orphans,
           |  (SELECT count(*) FROM $child c
           |   WHERE c.$fk IS NOT NULL
           |     AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) = 0
           |    AS ok""".stripMargin
      Seq(
        chk("lineitem.l_orderkey -> orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        chk("orders.o_custkey -> customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"),
        chk("customer.c_nationkey -> nation.n_nationkey",
          "customer", "c_nationkey", "nation", "n_nationkey"),
        chk("supplier.s_nationkey -> nation.n_nationkey",
          "supplier", "s_nationkey", "nation", "n_nationkey"))
        .mkString("\nUNION ALL\n")
    },

    // same market CTE as q_rolling_beta; both return series 1e-4-quantized
    // to integers, hour-shifted equi-join, exact-long Pearson sums
    "q_leadlag" -> withTicksBars(
      """, mkt AS (
        |  SELECT time,
        |    CAST(sum(CAST(floor(close * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      / (count(*) * 100.0) AS mkt_close
        |  FROM bars GROUP BY time
        |), mr AS (
        |  SELECT CAST(floor(epoch(time) / 3600) AS BIGINT) AS mth,
        |    CAST(floor((CASE WHEN mkt_close > 0 AND (lag(mkt_close) OVER wm) > 0
        |      THEN ln(mkt_close / lag(mkt_close) OVER wm) END) * 10000 + 0.5)
        |      AS BIGINT) AS mrq
        |  FROM mkt WINDOW wm AS (ORDER BY time)
        |), mrn AS (SELECT * FROM mr WHERE mrq IS NOT NULL
        |), rt AS (
        |  SELECT symbol, CAST(floor(epoch(time) / 3600) AS BIGINT) AS th,
        |    CAST(floor((CASE WHEN close > 0 AND (lag(close) OVER w) > 0
        |      THEN ln(close / lag(close) OVER w) END) * 10000 + 0.5)
        |      AS BIGINT) AS r
        |  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY time)
        |), rn AS (SELECT * FROM rt WHERE r IS NOT NULL
        |), lagged AS (
        |  SELECT rn.symbol, lg.lag, rn.r, mrn.mrq
        |  FROM rn CROSS JOIN (SELECT unnest([-2, -1, 0, 1, 2]) AS lag) lg
        |       JOIN mrn ON mrn.mth = rn.th + lg.lag
        |), g AS (
        |  SELECT symbol, lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r) AS BIGINT) AS sy, CAST(sum(mrq) AS BIGINT) AS sx,
        |    CAST(sum(r * r) AS BIGINT) AS syy,
        |    CAST(sum(mrq * mrq) AS BIGINT) AS sxx,
        |    CAST(sum(r * mrq) AS BIGINT) AS sxy
        |  FROM lagged GROUP BY 1, 2 HAVING count(*) >= 10
        |)
        |SELECT symbol, lag, n,
        |  floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / nullif(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 0)
        |    * 10000 + 0.5) / 10000 AS corr
        |FROM g""".stripMargin),

    // exact-integer Pearson over 1e-4-quantized log returns, same guarded
    // log and quantization as the Spark side
    "q_corr_matrix" -> withTicksBars(
      """, rr AS (
        |  SELECT symbol, time,
        |    CAST(floor(
        |      CASE WHEN close > 0 AND lag(close) OVER w > 0
        |           THEN ln(close / (lag(close) OVER w)) END * 10000 + 0.5)
        |      AS BIGINT) AS r
        |  FROM bars
        |  WINDOW w AS (PARTITION BY symbol ORDER BY time)
        |), rn AS (SELECT * FROM rr WHERE r IS NOT NULL
        |), g AS (
        |  SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a.r) AS BIGINT) AS sx, CAST(sum(b.r) AS BIGINT) AS sy,
        |    CAST(sum(a.r * a.r) AS BIGINT) AS sxx,
        |    CAST(sum(b.r * b.r) AS BIGINT) AS syy,
        |    CAST(sum(a.r * b.r) AS BIGINT) AS sxy
        |  FROM rn a JOIN rn b ON a.time = b.time AND a.symbol < b.symbol
        |  GROUP BY 1, 2 HAVING count(*) >= 10
        |)
        |SELECT symbol_a, symbol_b, n,
        |  floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / nullif(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 0)
        |    * 10000 + 0.5) / 10000 AS corr
        |FROM g""".stripMargin),

    // CUSUM via the prefix-sum identity: running sum minus its running
    // minimum, same two-layer cumulative windows as the Spark side
    "q_cusum" -> withTicksBars(
      """, dd AS (
        |  SELECT symbol, time, close,
        |    close - lag(close) OVER (PARTITION BY symbol ORDER BY time) AS d
        |  FROM bars
        |), zz AS (
        |  SELECT symbol, time, close,
        |    floor(((d - avg(d) OVER wa) / nullif(stddev_samp(d) OVER wa, 0))
        |      * 10000 + 0.5) / 10000 AS z
        |  FROM dd
        |  WINDOW wa AS (PARTITION BY symbol)
        |), ss AS (
        |  SELECT symbol, time, close, z,
        |    sum(z - 0.5) OVER wc AS sp,
        |    sum(-z - 0.5) OVER wc AS sn
        |  FROM zz
        |  WINDOW wc AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), mm AS (
        |  SELECT symbol, time, close, z,
        |    floor((sp - least(min(sp) OVER wc, 0)) * 10000 + 0.5) / 10000 AS cusum_pos,
        |    floor((sn - least(min(sn) OVER wc, 0)) * 10000 + 0.5) / 10000 AS cusum_neg
        |  FROM ss
        |  WINDOW wc AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, time, close, z, cusum_pos, cusum_neg,
        |  cusum_pos > 5.0 OR cusum_neg > 5.0 AS alarm
        |FROM mm WHERE z IS NOT NULL""".stripMargin),

    "q_zscore_outliers" -> withTicksBars(
      """, w1 AS (
        |  SELECT symbol, time, close,
        |    count(close) OVER wn AS c,
        |    avg(close) OVER wn AS m,
        |    stddev_samp(close) OVER wn AS sd
        |  FROM bars
        |  WINDOW wn AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |), zz AS (
        |  SELECT symbol, time, close,
        |    CASE WHEN c = 20
        |      THEN floor(((close - m) / nullif(sd, 0)) * 10000 + 0.5) / 10000 END AS z
        |  FROM w1
        |)
        |SELECT symbol, time, close, z, abs(z) > 2.0 AS is_outlier
        |FROM zz WHERE z IS NOT NULL""".stripMargin),

    // mirrors Signals.robustOutliers: same sorted-list median/MAD, same
    // 1.4826 consistency factor, threshold on the ROUNDED z
    "q_robust_outliers" -> withTicksBars(
      """, w1 AS (
        |  SELECT symbol, time, close,
        |    count(close) OVER wn AS cnt,
        |    list_sort(list(close) OVER wn) AS l
        |  FROM bars
        |  WINDOW wn AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |), w2 AS (
        |  SELECT *, (l[10] + l[11]) / 2 AS med FROM w1
        |), w3 AS (
        |  SELECT *, list_sort(list_transform(l, v -> abs(v - med))) AS madl FROM w2
        |), w4 AS (
        |  SELECT *, (madl[10] + madl[11]) / 2 AS mad FROM w3
        |), zz AS (
        |  SELECT symbol, time, close,
        |    CASE WHEN mad <> 0
        |      THEN floor(((close - med) / (1.4826 * mad)) * 10000 + 0.5) / 10000
        |    END AS robust_z
        |  FROM w4 WHERE cnt = 20
        |)
        |SELECT symbol, time, close, robust_z, abs(robust_z) > 3.0 AS is_outlier
        |FROM zz""".stripMargin),

    // mirrors Signals.returnsVol (incl. the positive-price guard)
    "q_returns_vol" -> withTicksBars(
      """, w0 AS (
        |  SELECT symbol, time, close,
        |    CASE WHEN close > 0 AND (lag(close) OVER w) > 0
        |      THEN ln(close / lag(close) OVER w) END AS ret
        |  FROM bars
        |  WINDOW w AS (PARTITION BY symbol ORDER BY time)
        |), w1 AS (
        |  SELECT symbol, time, close, ret,
        |    count(ret) OVER wn AS cnt,
        |    stddev_samp(ret) OVER wn AS sd
        |  FROM w0
        |  WINDOW wn AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, time, close,
        |  floor(ret * 10000 + 0.5) / 10000 AS log_ret,
        |  floor((CASE WHEN cnt = 20 THEN sd END) * 10000 + 0.5) / 10000 AS vol_20
        |FROM w1""".stripMargin),

    // mirrors Signals.seasonality: returns quantized at 1e9 before the
    // group mean (group sums are cross-partition, unlike window frames)
    "q_seasonality" -> withTicksBars(
      """, w0 AS (
        |  SELECT symbol, time, volume,
        |    CASE WHEN close > 0 AND (lag(close) OVER w) > 0
        |      THEN ln(close / lag(close) OVER w) END AS ret
        |  FROM bars
        |  WINDOW w AS (PARTITION BY symbol ORDER BY time)
        |)
        |SELECT symbol, CAST(hour(time) AS INTEGER) AS hod,
        |  floor((CAST(sum(CAST(floor(ret * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
        |         / (count(ret) * 1e9)) * 10000 + 0.5) / 10000 AS mean_ret,
        |  CAST(sum(volume) AS BIGINT) AS volume,
        |  count(ret) AS n_rets
        |FROM w0 GROUP BY 1, 2""".stripMargin),

    // mirrors Signals.rollingBeta: cents-quantized equal-weight index,
    // complete-case guaranteed by the cnt gate (see Scaladoc)
    "q_rolling_beta" -> withTicksBars(
      """, mkt AS (
        |  SELECT time,
        |    CAST(sum(CAST(floor(close * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      / (count(*) * 100.0) AS mkt_close
        |  FROM bars GROUP BY time
        |), mr AS (
        |  SELECT time,
        |    CASE WHEN mkt_close > 0 AND (lag(mkt_close) OVER wm) > 0
        |      THEN ln(mkt_close / lag(mkt_close) OVER wm) END AS mret
        |  FROM mkt
        |  WINDOW wm AS (ORDER BY time)
        |), rt AS (
        |  SELECT symbol, time,
        |    CASE WHEN close > 0 AND (lag(close) OVER w) > 0
        |      THEN ln(close / lag(close) OVER w) END AS ret
        |  FROM bars
        |  WINDOW w AS (PARTITION BY symbol ORDER BY time)
        |), j AS (
        |  SELECT rt.symbol, rt.time, rt.ret, mr.mret
        |  FROM rt JOIN mr ON rt.time = mr.time
        |), w1 AS (
        |  SELECT symbol, time,
        |    count(ret) OVER wn AS cnt,
        |    sum(mret) OVER wn AS sx, sum(ret) OVER wn AS sy,
        |    sum(mret * mret) OVER wn AS sxx, sum(mret * ret) OVER wn AS sxy
        |  FROM j
        |  WINDOW wn AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, time,
        |  floor((CASE WHEN cnt = 20 AND (20 * sxx - sx * sx) <> 0
        |    THEN (20 * sxy - sx * sy) / (20 * sxx - sx * sx) END) * 10000 + 0.5) / 10000
        |    AS beta_20
        |FROM w1""".stripMargin),

    // mirrors Signals.rollingOls: absolute row-number x (shift-invariant),
    // decomposable window sums only
    "q_rolling_ols" -> withTicksBars(
      """, w0 AS (
        |  SELECT symbol, time, close AS y,
        |    CAST(row_number() OVER (PARTITION BY symbol ORDER BY time) AS DOUBLE) AS x
        |  FROM bars
        |), w1 AS (
        |  SELECT symbol, time,
        |    count(y) OVER wn AS cnt,
        |    sum(x) OVER wn AS sx, sum(y) OVER wn AS sy,
        |    sum(x * x) OVER wn AS sxx, sum(x * y) OVER wn AS sxy,
        |    sum(y * y) OVER wn AS syy
        |  FROM w0
        |  WINDOW wn AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, time,
        |  floor((CASE WHEN cnt = 20
        |    THEN (20 * sxy - sx * sy) / (20 * sxx - sx * sx) END) * 10000 + 0.5) / 10000
        |    AS slope_20,
        |  floor((CASE WHEN cnt = 20 AND (20 * syy - sy * sy) <> 0
        |    THEN (20 * sxy - sx * sy) * (20 * sxy - sx * sy)
        |         / ((20 * sxx - sx * sx) * (20 * syy - sy * sy)) END) * 10000 + 0.5) / 10000
        |    AS r2_20
        |FROM w1""".stripMargin),

    "q_sma_crossovers" -> withTicksBars(
      """, w1 AS (
        |  SELECT symbol, time,
        |    CASE WHEN count(close) OVER w10 = 10 THEN avg(close) OVER w10 END AS s10,
        |    CASE WHEN count(close) OVER w20 = 20 THEN avg(close) OVER w20 END AS s20
        |  FROM bars
        |  WINDOW w10 AS (PARTITION BY symbol ORDER BY time
        |                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
        |         w20 AS (PARTITION BY symbol ORDER BY time
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |), w2 AS (
        |  SELECT symbol, time,
        |    floor(s10 * 10000 + 0.5) / 10000 AS sma_10,
        |    floor(s20 * 10000 + 0.5) / 10000 AS sma_20,
        |    floor((s10 - s20) * 10000 + 0.5) / 10000 AS spread
        |  FROM w1
        |), w3 AS (
        |  SELECT symbol, time, sma_10, sma_20, spread,
        |    lag(spread) OVER (PARTITION BY symbol ORDER BY time) AS ps
        |  FROM w2
        |)
        |SELECT symbol, time, sma_10, sma_20,
        |  CASE WHEN ps < 0 AND spread >= 0 THEN 'golden_cross'
        |       ELSE 'death_cross' END AS signal
        |FROM w3
        |WHERE spread IS NOT NULL AND ps IS NOT NULL
        |  AND ((ps < 0 AND spread >= 0) OR (ps >= 0 AND spread < 0))""".stripMargin),

    "q_drawdown" -> withTicksBars(
      """, dbase AS (
        |  SELECT symbol, time, close,
        |    max(close) OVER wp AS peak,
        |    row_number() OVER (PARTITION BY symbol ORDER BY time) AS rn
        |  FROM bars
        |  WINDOW wp AS (PARTITION BY symbol ORDER BY time
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT symbol, time, close, peak,
        |  floor(((close - peak) / nullif(peak, 0)) * 10000 + 0.5) / 10000
        |    AS drawdown,
        |  CAST(rn - max(CASE WHEN close >= peak THEN rn END) OVER wc AS BIGINT)
        |    AS underwater_bars
        |FROM dbase
        |WINDOW wc AS (PARTITION BY symbol ORDER BY time
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),

    "q_rolling_corr" ->
      s"""WITH d AS (
         |  SELECT event_type AS key,
         |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS time,
         |    ${r4("avg(value)")} AS value
         |  FROM events GROUP BY 1, 2
         |), p AS (
         |  SELECT key_a, key_b, concat(key_a, '/', key_b) AS pair
         |  FROM (VALUES ${CorrPairs.map(p => s"('${p._1}', '${p._2}')").mkString(", ")})
         |    v(key_a, key_b)
         |), pa AS (
         |  SELECT p.pair, d.time, d.value AS va FROM d JOIN p ON d.key = p.key_a
         |), pb AS (
         |  SELECT p.pair, d.time, d.value AS vb FROM d JOIN p ON d.key = p.key_b
         |), j AS (
         |  SELECT pa.pair, pa.time, va, vb
         |  FROM pa JOIN pb ON pa.pair = pb.pair AND pa.time = pb.time
         |), w AS (
         |  SELECT pair, time,
         |    count(*) OVER wn AS c,
         |    corr(va, vb) OVER wn AS r
         |  FROM j
         |  WINDOW wn AS (PARTITION BY pair ORDER BY time
         |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         |)
         |SELECT pair, time, floor(r * 10000 + 0.5) / 10000 AS corr
         |FROM w WHERE c = 20 AND r IS NOT NULL AND NOT isnan(r)""".stripMargin,

    "q_funnel" -> oFunnel(FunnelSteps),

    // mirrors EventAnalytics.attribution: same (ts, event_id) ordering,
    // same ROWS UNBOUNDED..1 PRECEDING frame, IGNORE NULLS first/last
    "q_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events
        |), w1 AS (
        |  SELECT *,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER w AS first_touch_type,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
        |      OVER w AS first_touch_id,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER w AS last_touch_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
        |      OVER w AS last_touch_id,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
        |      OVER w AS last_touch_ts
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT user_id, event_id AS conversion_id, ts,
        |  first_touch_type, first_touch_id, last_touch_type, last_touch_id,
        |  epoch_ms(ts) - epoch_ms(last_touch_ts) AS gap_ms
        |FROM w1 WHERE event_type = 'purchase'""".stripMargin,

    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |), ch AS (
        |  SELECT *, lag(event_type) OVER w AS prev
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), opened AS (
        |  SELECT user_id, event_type, event_id, ts FROM ch
        |  WHERE prev IS NULL OR prev <> event_type
        |)
        |SELECT user_id, event_type,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM opened WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q_cohort_retention" ->
      """WITH w AS (
        |  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
        |  FROM events
        |), f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1),
        |d AS (SELECT DISTINCT user_id, week FROM w)
        |SELECT f.cohort_week,
        |  CAST(date_diff('day', f.cohort_week, d.week) // 7 AS INTEGER) AS week_offset,
        |  count(DISTINCT d.user_id) AS n_users
        |FROM d JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q_set_ops" ->
      """SELECT user_id, 'purchase_no_error' AS cohort FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error'
        |)
        |UNION ALL
        |SELECT user_id, 'purchase_and_error' AS cohort FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'error'
        |)""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "q_percentiles" ->
      s"""SELECT event_type,
         |  ${r4("quantile_cont(value, 0.5)")} AS p50,
         |  ${r4("quantile_cont(value, 0.9)")} AS p90,
         |  ${r4("quantile_cont(value, 0.99)")} AS p99,
         |  count(*) AS n
         |FROM events GROUP BY event_type""".stripMargin,
    "q_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
        |    AS total_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_dedup_corpus" ->
      s"""WITH RECURSIVE $oShingleIdx,
         |$oMinhash,
         |${oJaccard(0.7)},
         |edges AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand c JOIN jpairs j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
         |),
         |und AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM edges
         |  UNION ALL SELECT doc_b, doc_a FROM edges
         |),
         |reach AS (
         |  SELECT DISTINCT src AS d, src AS r FROM und
         |  UNION
         |  SELECT reach.d, und.dst FROM reach JOIN und ON und.src = reach.r
         |)
         |SELECT d AS doc_id, min(r) AS canonical_id, d != min(r) AS is_duplicate
         |FROM reach GROUP BY d""".stripMargin,

    // same CC as q_dedup_corpus + the q_text_stats quality formula; winner
    // per cluster by (4dp quality DESC, doc_id) row_number
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $oShingleIdx,
         |$oMinhash,
         |${oJaccard(0.7)},
         |edges AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand c JOIN jpairs j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
         |),
         |und AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM edges
         |  UNION ALL SELECT doc_b, doc_a FROM edges
         |),
         |reach AS (
         |  SELECT DISTINCT src AS d, src AS r FROM und
         |  UNION
         |  SELECT reach.d, und.dst FROM reach JOIN und ON und.src = reach.r
         |),
         |cc AS (SELECT d AS doc_id, min(r) AS cluster_id FROM reach GROUP BY d),
         |st AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS toks,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct
         |  FROM documents
         |),
         |sq AS (
         |  SELECT doc_id,
         |    len(list_filter(toks, x -> list_contains(
         |      ['the','a','of','to','in','and','is','on','for','with'], x))) / n_tokens
         |      AS stopword_ratio,
         |    n_distinct / n_tokens AS distinct_ratio,
         |    least(n_tokens / 50.0, 1.0) AS len_score
         |  FROM st
         |),
         |q AS (
         |  SELECT doc_id,
         |    ${r4("0.4 * len_score + 0.4 * distinct_ratio + 0.2 * (1.0 - abs(stopword_ratio - 0.1))")}
         |      AS quality_score
         |  FROM sq
         |),
         |jn AS (
         |  SELECT cc.doc_id, cc.cluster_id, q.quality_score,
         |    row_number() OVER (PARTITION BY cc.cluster_id
         |      ORDER BY q.quality_score DESC, cc.doc_id) AS rn
         |  FROM cc JOIN q USING (doc_id)
         |)
         |SELECT doc_id, cluster_id, quality_score, rn = 1 AS keep FROM jn""".stripMargin,

    // same CC clusters; split cut on the CLUSTER id's salted bucket
    // (thresholds/salt shared with q_split via CorpusEntries constants)
    "q_split_safe" ->
      s"""WITH RECURSIVE $oShingleIdx,
         |$oMinhash,
         |${oJaccard(0.7)},
         |edges AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand c JOIN jpairs j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
         |),
         |und AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM edges
         |  UNION ALL SELECT doc_b, doc_a FROM edges
         |),
         |reach AS (
         |  SELECT DISTINCT src AS d, src AS r FROM und
         |  UNION
         |  SELECT reach.d, und.dst FROM reach JOIN und ON und.src = reach.r
         |),
         |cc AS (SELECT d AS doc_id, min(r) AS cluster_id FROM reach GROUP BY d),
         |jn AS (
         |  SELECT dd.doc_id, coalesce(cc.cluster_id, dd.doc_id) AS cluster_id
         |  FROM documents dd LEFT JOIN cc ON cc.doc_id = dd.doc_id
         |)
         |SELECT doc_id, cluster_id,
         |  ${oSplitCase("cluster_id")} AS split
         |FROM jn""".stripMargin,

    // same CC clusters; keep iff the doc's salted bucket clears the
    // cluster-size-discounted threshold floor(round(rate*65536)/|cluster|)
    "q_sample_dedup" ->
      s"""WITH RECURSIVE $oShingleIdx,
         |$oMinhash,
         |${oJaccard(0.7)},
         |edges AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand c JOIN jpairs j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
         |),
         |und AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM edges
         |  UNION ALL SELECT doc_b, doc_a FROM edges
         |),
         |reach AS (
         |  SELECT DISTINCT src AS d, src AS r FROM und
         |  UNION
         |  SELECT reach.d, und.dst FROM reach JOIN und ON und.src = reach.r
         |),
         |cc AS (SELECT d AS doc_id, min(r) AS cluster_id FROM reach GROUP BY d),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY 1),
         |jn AS (
         |  SELECT dd.doc_id, coalesce(cc.cluster_id, dd.doc_id) AS cluster_id
         |  FROM documents dd LEFT JOIN cc ON cc.doc_id = dd.doc_id
         |),
         |j2 AS (
         |  SELECT jn.doc_id, jn.cluster_id,
         |    coalesce(sz.cluster_size, 1) AS cluster_size
         |  FROM jn LEFT JOIN sz ON sz.cluster_id = jn.cluster_id
         |)
         |SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size
         |FROM j2
         |WHERE CAST(concat('0x',
         |    substr(md5(concat('dw1:', CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT)
         |  < floor(32768.0 / cluster_size)""".stripMargin,

    "q_asof_join" -> OracleSql.withTicksBars(
      """SELECT t.symbol, t.time, t.price,
        |  b.time AS asof_time, b.close AS asof_close, b.volume AS asof_volume
        |FROM ticks t ASOF LEFT JOIN bars b
        |  ON t.symbol = b.symbol AND t.time >= b.time""".stripMargin),

    "q_asof_fwd" -> OracleSql.withTicksBars(
      """SELECT t.symbol, t.time, t.price,
        |  CASE WHEN epoch_us(b.time) - epoch_us(t.time) <= 7200000000
        |    THEN b.time END AS asof_time,
        |  CASE WHEN epoch_us(b.time) - epoch_us(t.time) <= 7200000000
        |    THEN b.close END AS asof_close,
        |  CASE WHEN epoch_us(b.time) - epoch_us(t.time) <= 7200000000
        |    THEN b.volume END AS asof_volume
        |FROM ticks t ASOF LEFT JOIN bars b
        |  ON t.symbol = b.symbol AND t.time <= b.time""".stripMargin),

    "q_asof_nearest" -> OracleSql.withTicksBars(
      """, j AS (
        |  SELECT t.symbol, t.time, t.price,
        |    bb.time AS tb, bb.close AS cb, bb.volume AS vb,
        |    bf.time AS tf, bf.close AS cf, bf.volume AS vf
        |  FROM ticks t
        |  ASOF LEFT JOIN bars bb
        |    ON t.symbol = bb.symbol AND t.time >= bb.time
        |  ASOF LEFT JOIN bars bf
        |    ON t.symbol = bf.symbol AND t.time <= bf.time
        |), pick AS (
        |  SELECT symbol, time, price,
        |    CASE
        |      WHEN tb IS NOT NULL AND tf IS NOT NULL THEN
        |        CASE WHEN epoch_us(time) - epoch_us(tb)
        |               <= epoch_us(tf) - epoch_us(time) THEN 0 ELSE 1 END
        |      WHEN tb IS NOT NULL THEN 0
        |      WHEN tf IS NOT NULL THEN 1
        |      ELSE 2
        |    END AS side,
        |    tb, cb, vb, tf, cf, vf
        |  FROM j
        |)
        |SELECT symbol, time, price,
        |  CASE side WHEN 0 THEN tb WHEN 1 THEN tf END AS asof_time,
        |  CASE side WHEN 0 THEN cb WHEN 1 THEN cf END AS asof_close,
        |  CASE side WHEN 0 THEN vb WHEN 1 THEN vf END AS asof_volume
        |FROM pick""".stripMargin),

    "q_bars_incremental" ->
      """WITH tk AS (
        |  SELECT CAST(user_id AS VARCHAR) AS symbol,
        |    CAST(ts AS TIMESTAMP) AS time,
        |    value AS price, CAST(event_id % 97 + 1 AS BIGINT) AS volume
        |  FROM events
        |), w AS (
        |  SELECT symbol, date_trunc('hour', time) AS btime, time, price, volume,
        |    row_number() OVER (PARTITION BY symbol, date_trunc('hour', time)
        |      ORDER BY time, price) AS rn_a,
        |    row_number() OVER (PARTITION BY symbol, date_trunc('hour', time)
        |      ORDER BY time DESC, price DESC) AS rn_d
        |  FROM tk
        |)
        |SELECT symbol, btime AS time,
        |  max(CASE WHEN rn_a = 1 THEN price END) AS open,
        |  max(price) AS high, min(price) AS low,
        |  max(CASE WHEN rn_d = 1 THEN price END) AS close,
        |  CAST(sum(volume) AS BIGINT) AS volume,
        |  count(*) AS n_ticks
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q_profile" -> ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n"),

    "q_rollup_revenue" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
        |    AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""".stripMargin,

    "q_cube_revenue" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
        |    AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin,

    "q_topk_per_key" ->
      """WITH w1 AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS INTEGER) AS rk
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT user_id, rk, event_id, ts, value FROM w1 WHERE rk <= 3""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS canonical_id,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    "q_text_stats" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS toks,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct
         |  FROM documents
         |), u AS (
         |  SELECT doc_id, n_tokens, n_distinct,
         |    (length(text) - (n_tokens - 1)) / n_tokens AS mean_token_len,
         |    len(list_filter(toks, x -> list_contains(
         |      ['the','a','of','to','in','and','is','on','for','with'], x))) / n_tokens
         |      AS stopword_ratio,
         |    n_distinct / n_tokens AS distinct_ratio,
         |    least(n_tokens / 50.0, 1.0) AS len_score
         |  FROM t
         |)
         |SELECT doc_id, n_tokens, n_distinct,
         |  ${r4("mean_token_len")} AS mean_token_len,
         |  ${r4("stopword_ratio")} AS stopword_ratio,
         |  ${r4("distinct_ratio")} AS distinct_ratio,
         |  ${r4("0.4 * len_score + 0.4 * distinct_ratio + 0.2 * (1.0 - abs(stopword_ratio - 0.1))")}
         |    AS quality_score
         |FROM u""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '^[a-z]+$')))
        |    AS n_alpha_tokens,
        |  CAST(list_reduce(list_transform(string_split(text, ' '),
        |    t -> CAST((length(t) + 3) // 4 AS BIGINT)), (a, b) -> a + b) AS BIGINT)
        |    AS n_bpe_est
        |FROM documents""".stripMargin,

    "q_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang AS lang_label,
         |    len(list_filter(string_split(text, ' '), x -> list_contains(
         |      ['the','a','of','to','in','and','is','on','for','with'], x)))
         |      / len(string_split(text, ' ')) AS ratio
         |  FROM documents
         |)
         |SELECT doc_id, lang_label, ${r4("ratio")} AS en_stopword_ratio,
         |  CASE WHEN ratio >= 0.10 THEN 'en'
         |       WHEN ratio >= 0.05 THEN 'mixed'
         |       ELSE 'other' END AS lang_pred
         |FROM t""".stripMargin,

    "q_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         |SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  CAST(list_reduce(
         |    list_transform(range(1, len(toks) + 1),
         |      i -> (${oHash60("toks[i]")} % 1000000007) * ((i % 97) + 1)),
         |    (a, b) -> (a + b) % 1000000007) % 1000000007 AS BIGINT) AS fingerprint
         |FROM t""".stripMargin,

    // stop-shingle removal mirror of Dedup.jaccardPairs: shingles with
    // df > 100 are dropped BEFORE sizes and intersections, so both engines
    // compute Jaccard over the same capped sets
    "q_jaccard_pairs" ->
      s"""WITH $oShingleIdx,
         |$oCappedIdx
         |SELECT doc_a, doc_b, ${r4("i / (sa.sz + sb.sz - i)")} AS jaccard
         |FROM cinter JOIN csz sa ON sa.doc_id = doc_a
         |            JOIN csz sb ON sb.doc_id = doc_b
         |WHERE i / (sa.sz + sb.sz - i) >= 0.7""".stripMargin,

    // mirrors Dedup.containmentPairs: the same capped index/intersection,
    // each unordered pair fanned to its two directions, |A∩B|/|A| per side
    "q_containment" ->
      s"""WITH $oShingleIdx,
         |$oCappedIdx,
         |j AS (
         |  SELECT doc_a, doc_b, i, sa.sz AS sza, sb.sz AS szb
         |  FROM cinter JOIN csz sa ON sa.doc_id = doc_a
         |              JOIN csz sb ON sb.doc_id = doc_b
         |),
         |d AS (
         |  SELECT doc_a AS contained_id, doc_b AS container_id, i / sza AS craw
         |  FROM j
         |  UNION ALL
         |  SELECT doc_b AS contained_id, doc_a AS container_id, i / szb AS craw
         |  FROM j
         |)
         |SELECT contained_id, container_id, ${r4("craw")} AS containment
         |FROM d WHERE craw >= $ContainTheta""".stripMargin,

    "q_minhash_lsh" ->
      s"""WITH $oShingleIdx,
         |$oMinhash,
         |${oJaccard(0.7)}
         |SELECT c.doc_a, c.doc_b, j.jaccard
         |FROM cand c JOIN jpairs j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b""".stripMargin,

    "q_simhash" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok0 AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(range(1, len(toks) - 1),
        |                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) END)) AS tok
        |  FROM tk
        |), tokh AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |  FROM tok0
        |), bits AS (
        |  SELECT doc_id, r.i AS i,
        |    sum(CASE WHEN (h >> CAST(r.i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM tokh, range(60) r(i) GROUP BY doc_id, r.i
        |), sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v >= 0
        |      THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 10""".stripMargin,

    "q_cosine_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10
         |), s AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ${r4(oCos("qe", "e.embedding"))} AS score
         |  FROM embeddings e, q WHERE e.vec_id != q.query_id
         |), rk AS (
         |  SELECT query_id, neighbor_id, score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, score, rk FROM rk WHERE rk <= 5""".stripMargin,

    // mirrors Similarity.knnClassify: top-10 neighbors per probe by
    // 4dp-rounded cosine, majority vote over neighbor labels (vote-count
    // tiebreak = smallest label)
    "q_knn_classify" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 50
         |), s AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ${r4(oCos("qe", "e.embedding"))} AS score
         |  FROM embeddings e, q WHERE e.vec_id != q.query_id
         |), rk AS (
         |  SELECT query_id, neighbor_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS rk
         |  FROM s
         |), v AS (
         |  SELECT rk.query_id, e.label, count(*) AS votes
         |  FROM rk JOIN embeddings e ON e.vec_id = rk.neighbor_id
         |  WHERE rk.rk <= 10 GROUP BY 1, 2
         |), p AS (
         |  SELECT query_id, label, votes,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY votes DESC, label) AS vrk
         |  FROM v
         |)
         |SELECT p.query_id, t.label AS true_label, p.label AS pred_label,
         |  p.votes, (p.label = t.label) AS correct
         |FROM p JOIN embeddings t ON t.vec_id = p.query_id
         |WHERE p.vrk = 1""".stripMargin,

    // same trained centroids/assignment as the IVF family; bottom-frac by
    // cosine-to-own-centroid per cluster
    "q_embed_outliers" ->
      s"""WITH ${oIvfAssign(8, 2)}, sc AS (
         |  SELECT a.vec_id, a.centroid_id,
         |    ${r4(oCos("a.embedding", "c.ce"))} AS cscore
         |  FROM assign a JOIN cent2 c ON c.centroid_id = a.centroid_id
         |), rk AS (
         |  SELECT vec_id, centroid_id, cscore,
         |    CAST(row_number() OVER (PARTITION BY centroid_id
         |      ORDER BY cscore, vec_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY centroid_id) AS BIGINT) AS cluster_n
         |  FROM sc
         |)
         |SELECT vec_id, centroid_id, cscore, rk, cluster_n,
         |  rk <= ceil(cluster_n * 0.05) AS is_outlier
         |FROM rk""".stripMargin,

    "q_cosine_ivf" -> ivfSearchOracleSql,
    // the append-maintained index must search identically to the
    // single-shot one: hash-gated against q_cosine_ivf's oracle unchanged
    "q_ivf_append" -> ivfSearchOracleSql,

    // quantized power iteration unrolled to exactly PcaRounds rounds:
    // per round the float_dot dᵢ 4+2-dp-quantizes into int64 matvec sums
    // (order-free), the norm folds the dim-sized list sequentially, and
    // v re-rounds through FLOAT32 — each step mirrored op-for-op
    "q_embed_pca" -> {
      val rounds = (1 to PcaRounds).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT e.vec_id,
           |    CAST(floor((${oDot("e.embedding", s"v${i - 1}.v")})
           |      * 1000000 + 0.5) AS BIGINT) AS di6
           |  FROM e, v${i - 1}
           |), s$i AS MATERIALIZED (
           |  SELECT u.pos,
           |    CAST(sum(CAST(floor(CAST(u.x AS DOUBLE) * d.di6 * 100 + 0.5)
           |      AS BIGINT)) AS BIGINT) AS s
           |  FROM u JOIN d$i d USING (vec_id) GROUP BY u.pos
           |), n$i AS (
           |  SELECT sqrt(list_reduce(
           |    list_transform(list(CAST(s AS DOUBLE) ORDER BY pos), z -> z * z),
           |    (a, b) -> a + b)) AS nrm
           |  FROM s$i
           |), v$i AS (
           |  SELECT list(CAST(CAST(s.s AS DOUBLE) / n$i.nrm AS FLOAT)
           |    ORDER BY s.pos) AS v
           |  FROM s$i s, n$i
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
         |dim AS (SELECT min(len(embedding)) AS d FROM e),
         |u AS MATERIALIZED (
         |  SELECT vec_id, unnest(embedding) AS x,
         |    generate_subscripts(embedding, 1) AS pos
         |  FROM e
         |),
         |v0 AS (
         |  SELECT list_transform(range(1, d + 1),
         |    i -> CAST(1.0 / sqrt(CAST(d AS DOUBLE)) AS FLOAT)) AS v
         |  FROM dim
         |),
         |$rounds
         |SELECT CAST(s.pos AS BIGINT) AS pos,
         |  ${r4(s"CAST(v$PcaRounds.v[s.pos] AS DOUBLE)")} AS loading,
         |  ${r4(s"n$PcaRounds.nrm / 100000000.0")} AS lambda
         |FROM s$PcaRounds s, v$PcaRounds, n$PcaRounds""".stripMargin
    },

    "q_embed_clusters" ->
      s"""WITH ${oIvfAssign(8, 2)}, sc AS (
         |  SELECT a.centroid_id,
         |    ${r4(oCos("a.embedding", "c.ce"))} AS cscore
         |  FROM assign a JOIN cent2 c ON a.centroid_id = c.centroid_id
         |)
         |SELECT centroid_id, count(*) AS n_members,
         |  ${r4("CAST(sum(CAST(floor(cscore * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 / count(*)")}
         |    AS mean_cos,
         |  min(cscore) AS min_cos
         |FROM sc GROUP BY 1""".stripMargin,

    "q_embed_quantize" ->
      s"""WITH m AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |  FROM embeddings
         |)
         |SELECT vec_id, mx / 127.0 AS scale,
         |  array_to_string(
         |    CASE WHEN mx = 0 THEN list_transform(embedding, x -> CAST(0 AS INTEGER))
         |         ELSE list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx + 0.5) AS INTEGER))
         |    END, ',') AS qvec_csv
         |FROM m""".stripMargin,

    "q_cosine_pq" -> oPqSql(10, 5),
    "q_cosine_ivfpq" -> oIvfPqSql(10, 5),
    "q_cosine_ivfpq_rerank" -> oIvfPqSql(10, 5,
      rerank = Some(IvfPqRerankShortlist)),
    "q_cosine_ivfpq_sampled" -> oIvfPqSql(10, 5, sampledTrain = true),

    // embedding drift: the scalar drift skeleton (q_drift, CorpusEntries)
    // with bins = shared-codebook IVF cluster ids
    "q_embed_drift" ->
      s"""WITH ${oIvfAssign(8, 2)},
         |hr AS (
         |  SELECT CAST(least(floor(CAST(centroid_id AS DOUBLE) / 1), 8) AS INTEGER) AS bin,
         |    count(*) AS cnt_ref
         |  FROM assign WHERE vec_id % 2 = 0 GROUP BY 1
         |), hc AS (
         |  SELECT CAST(least(floor(CAST(centroid_id AS DOUBLE) / 1), 8) AS INTEGER) AS bin,
         |    count(*) AS cnt_cur
         |  FROM assign WHERE vec_id % 2 = 1 GROUP BY 1
         |), j AS (
         |  SELECT coalesce(hr.bin, hc.bin) AS bin,
         |    coalesce(cnt_ref, 0) AS cnt_ref, coalesce(cnt_cur, 0) AS cnt_cur
         |  FROM hr FULL OUTER JOIN hc ON hr.bin = hc.bin
         |), t AS (
         |  SELECT CAST(sum(cnt_ref) AS BIGINT) AS tot_ref,
         |    CAST(sum(cnt_cur) AS BIGINT) AS tot_cur FROM j
         |), pq AS (
         |  SELECT bin, cnt_ref, cnt_cur,
         |    CAST(cnt_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE) AS p_ref,
         |    CAST(cnt_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE) AS p_cur
         |  FROM j, t
         |), terms AS (
         |  SELECT *,
         |    floor(((p_cur - p_ref) * ln(
         |      (CASE WHEN p_cur = 0 THEN 1e-6 ELSE p_cur END) /
         |      (CASE WHEN p_ref = 0 THEN 1e-6 ELSE p_ref END))) * 10000 + 0.5) / 10000
         |      AS psi_term,
         |    floor((0.5 * (CASE WHEN p_ref > 0
         |        THEN p_ref * ln(p_ref / ((p_ref + p_cur) / CAST(2 AS DOUBLE))) ELSE 0 END)
         |      + 0.5 * (CASE WHEN p_cur > 0
         |        THEN p_cur * ln(p_cur / ((p_ref + p_cur) / CAST(2 AS DOUBLE))) ELSE 0 END))
         |      * 10000 + 0.5) / 10000 AS js_term
         |  FROM pq
         |), g AS (SELECT sum(psi_term) AS psi, sum(js_term) AS js FROM terms)
         |SELECT bin, cnt_ref, cnt_cur,
         |  floor(p_ref * 10000 + 0.5) / 10000 AS p_ref,
         |  floor(p_cur * 10000 + 0.5) / 10000 AS p_cur,
         |  psi_term, js_term,
         |  floor(psi * 10000 + 0.5) / 10000 AS psi,
         |  floor(js * 10000 + 0.5) / 10000 AS js
         |FROM terms, g""".stripMargin,

    // the stream-stream interval join must emit exactly the batch join's
    // match set — hash-gated against plain batch SQL
    "q_stream_join" ->
      """SELECT a.user_id, a.event_id AS left_id, e.event_id AS right_id,
        |  epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP))
        |    AS gap_us
        |FROM events a JOIN events e ON a.user_id = e.user_id
        |  AND e.event_type = 'error' AND a.event_type != 'error'
        |  AND CAST(e.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
        |  AND CAST(e.ts AS TIMESTAMP)
        |    <= CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE""".stripMargin,
    // left-outer variant: unmatched actions surface with NULL matches
    "q_stream_join_outer" ->
      """SELECT a.user_id, a.event_id AS left_id, e.event_id AS right_id,
        |  epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP))
        |    AS gap_us
        |FROM events a LEFT JOIN events e ON a.user_id = e.user_id
        |  AND e.event_type = 'error'
        |  AND CAST(e.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
        |  AND CAST(e.ts AS TIMESTAMP)
        |    <= CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        |WHERE a.event_type != 'error'""".stripMargin,

    "q_cdc_apply" -> cdcOracleSql,
    // the streaming CDC path must merge to the SAME snapshot: hash-gated
    // against the batch query's oracle unchanged
    "q_stream_cdc" -> cdcOracleSql,
    "q_stream_drift" -> oStreamDriftSql,
    "q_cdc_diff" ->
      s"""WITH applied AS ($cdcOracleSql),
         |ev2 AS (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         |    event_type, value FROM events
         |), base2 AS (
         |  SELECT user_id, event_id, ts, event_type, value FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM ev2 WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
         |  ) WHERE rn = 1
         |)
         |SELECT user_id, event_id, ts, event_type, value, 'U' AS op FROM (
         |  SELECT * FROM applied EXCEPT ALL SELECT * FROM base2
         |)
         |UNION ALL
         |SELECT b.user_id, b.event_id, b.ts, b.event_type, b.value, 'D' AS op
         |FROM base2 b ANTI JOIN applied a ON b.user_id = a.user_id""".stripMargin,

    "q_cosine_q8" -> {
      val dim = Similarity.LshDim
      def qdot(a: String, b: String) =
        s"""CAST(list_reduce(list_transform(range(1, ${dim + 1}),
           |      i -> CAST($a[i] AS BIGINT) * $b[i]), (x, y) -> x + y) AS DOUBLE)""".stripMargin
      s"""WITH m AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |  FROM embeddings
         |), qz AS (
         |  SELECT vec_id,
         |    CASE WHEN mx = 0 THEN list_transform(embedding, x -> CAST(0 AS INTEGER))
         |         ELSE list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx + 0.5) AS INTEGER))
         |    END AS qvec
         |  FROM m
         |), q AS (SELECT vec_id AS query_id, qvec AS qq FROM qz WHERE vec_id < 10),
         |s AS (
         |  SELECT q.query_id, z.vec_id AS neighbor_id,
         |    ${r4(s"${qdot("q.qq", "z.qvec")} / sqrt(${qdot("q.qq", "q.qq")} * ${qdot("z.qvec", "z.qvec")})")}
         |      AS score
         |  FROM qz z, q WHERE z.vec_id != q.query_id
         |), sf AS (SELECT * FROM s WHERE score IS NOT NULL AND NOT isnan(score)),
         |rk AS (
         |  SELECT query_id, neighbor_id, score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
         |  FROM sf
         |)
         |SELECT query_id, neighbor_id, score, rk FROM rk WHERE rk <= 5""".stripMargin
    },

    // NB: `cent2` below is oIvfAssign's final centroid table for iters=2
    "q_cosine_ivf_probe" ->
      s"""WITH ${oIvfAssign(8, 2)}, qp AS (
         |  SELECT vec_id AS query_id, centroid_id AS qc FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${r4(oCos("e.embedding", "c.ce"))} DESC, c.centroid_id) AS arn
         |    FROM embeddings e, cent2 c
         |    WHERE e.vec_id < 10
         |  ) WHERE arn <= 2
         |), q AS (
         |  SELECT e.vec_id AS query_id, e.embedding AS qe, qp.qc
         |  FROM embeddings e JOIN qp ON qp.query_id = e.vec_id
         |), s AS (
         |  SELECT q.query_id, a.vec_id AS neighbor_id,
         |    ${r4(oCos("q.qe", "a.embedding"))} AS score
         |  FROM assign a, q
         |  WHERE a.centroid_id = q.qc AND a.vec_id != q.query_id
         |), rk AS (
         |  SELECT query_id, neighbor_id, score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
         |  FROM s
         |)
         |SELECT query_id, neighbor_id, score, rk FROM rk WHERE rk <= 3""".stripMargin,

    // recall@5 of the nprobe=2 IVF ranking vs the exact brute-force top-5
    // (both rankings deterministic: 4dp scores, neighbor_id tiebreak)
    "q_ivf_recall" ->
      s"""WITH ${oIvfAssign(8, 2)}, qp AS (
         |  SELECT vec_id AS query_id, centroid_id AS qc FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${r4(oCos("e.embedding", "c.ce"))} DESC, c.centroid_id) AS arn
         |    FROM embeddings e, cent2 c
         |    WHERE e.vec_id < 10
         |  ) WHERE arn <= 2
         |), q AS (
         |  SELECT e.vec_id AS query_id, e.embedding AS qe, qp.qc
         |  FROM embeddings e JOIN qp ON qp.query_id = e.vec_id
         |), s AS (
         |  SELECT q.query_id, a.vec_id AS neighbor_id,
         |    ${r4(oCos("q.qe", "a.embedding"))} AS score
         |  FROM assign a, q
         |  WHERE a.centroid_id = q.qc AND a.vec_id != q.query_id
         |), ap AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, neighbor_id) AS rk
         |    FROM s
         |  ) WHERE rk <= 5
         |), xq AS (
         |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10
         |), xs AS (
         |  SELECT xq.query_id, e.vec_id AS neighbor_id,
         |    ${r4(oCos("xq.qe", "e.embedding"))} AS score
         |  FROM embeddings e, xq WHERE e.vec_id != xq.query_id
         |), ex AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, neighbor_id) AS rk
         |    FROM xs
         |  ) WHERE rk <= 5
         |)
         |SELECT ex.query_id, 5 AS k, count(ap.neighbor_id) AS hits,
         |  ${r4("count(ap.neighbor_id) / 5.0")} AS recall
         |FROM ex LEFT JOIN ap
         |  ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
         |GROUP BY ex.query_id""".stripMargin,

    // literal 8 == Similarity.clustersFor(N) at every verify SF (N = 199
    // at sf0.001 / 2000 at sf0.01); the query sizes k adaptively so the
    // trend bench's bigger synthetic inputs stay linear
    "q_dedup_embed_ivf" ->
      s"""WITH ${oIvfAssign(8, 2)}, s AS (
         |  SELECT a.centroid_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${r4(oCos("a.embedding", "b.embedding"))} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
         |)
         |SELECT centroid_id, vec_a, vec_b, cos FROM s WHERE cos >= 0.4""".stripMargin,

    // multi-assignment (arn <= 2) blocking: DISTINCT candidate pairs from
    // the replicated per-cluster self-join, verified with exact cosine
    "q_dedup_embed_ivf2" ->
      s"""WITH ${oIvfAssign(8, 2)}, multi AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${r4(oCos("e.embedding", "c.ce"))} DESC, c.centroid_id) AS arn
         |    FROM embeddings e, cent2 c
         |  ) WHERE arn <= 2
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM multi a JOIN multi b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
         |), v AS (
         |  SELECT cand.vec_a, cand.vec_b,
         |    ${r4(oCos("ea.embedding", "eb.embedding"))} AS cos
         |  FROM cand JOIN embeddings ea ON ea.vec_id = cand.vec_a
         |            JOIN embeddings eb ON eb.vec_id = cand.vec_b
         |)
         |SELECT vec_a, vec_b, cos FROM v WHERE cos >= 0.4""".stripMargin,

    "q_dedup_embed_lsh" -> oDedupEmbedLsh,
    "q_dedup_embed_lsh_mp" -> oDedupEmbedLshMp,
    "q_dedup_embed_incremental" -> oDedupEmbedIncr,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha256,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
        |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height,
        |  CAST(CAST(concat('0x', substr(hex(encode(text)), 1, 2)) AS INT) % 3 + 1
        |    AS BIGINT) AS channels,
        |  concat_ws(',', 0,
        |    octet_length(encode(text)) // 4,
        |    octet_length(encode(text)) // 2,
        |    (octet_length(encode(text)) * 3) // 4) AS frame_offsets
        |FROM documents""".stripMargin,

    "q_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, n_bytes, CAST(r.i AS INT) AS frame_idx,
        |    CAST(CASE r.i WHEN 0 THEN 0
        |                  WHEN 1 THEN n_bytes // 4
        |                  WHEN 2 THEN n_bytes // 2
        |                  ELSE (n_bytes * 3) // 4 END AS BIGINT) AS frame_offset
        |  FROM f, range(4) r(i)
        |)
        |SELECT doc_id, frame_idx, frame_offset, n_bytes
        |FROM fr WHERE frame_idx % 2 = 0""".stripMargin,

    "q_media_wav" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    1 + doc_id % 2 AS channels,
         |    8000 * (1 + doc_id % 5) AS rate
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, channels, rate,
         |    channels * 2 AS block_align,
         |    rate * channels * 2 AS byte_rate,
         |    (doc_id % 100 + 1) * channels * 2 AS data_size
         |  FROM f
         |)
         |SELECT doc_id, TRUE AS is_wav,
         |  CAST(channels AS BIGINT) AS channels,
         |  CAST(rate AS BIGINT) AS sample_rate,
         |  CAST(byte_rate AS BIGINT) AS byte_rate,
         |  CAST(block_align AS BIGINT) AS block_align,
         |  CAST(16 AS BIGINT) AS bits_per_sample,
         |  CAST(data_size AS BIGINT) AS data_size,
         |  CAST(44 + data_size AS BIGINT) AS n_bytes,
         |  concat('52494646', ${oLe("data_size + 36", 4)},
         |    '57415645', '666D7420', ${oLe("16", 4)}, ${oLe("1", 2)},
         |    ${oLe("channels", 2)}, ${oLe("rate", 4)},
         |    ${oLe("byte_rate", 4)}, ${oLe("block_align", 2)},
         |    ${oLe("16", 2)}, '64617461', ${oLe("data_size", 4)})
         |    AS header_hex,
         |  CAST((data_size * 1000000) // byte_rate AS BIGINT) AS duration_us
         |FROM g""".stripMargin,

    "q_media_bmp" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    16 + doc_id % 64 AS width,
         |    16 + doc_id % 48 AS height
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, width, height,
         |    ((width * 3 + 3) // 4) * 4 AS stride
         |  FROM f
         |), h AS (
         |  SELECT doc_id, width, height, stride,
         |    stride * height AS image_size
         |  FROM g
         |)
         |SELECT doc_id, TRUE AS is_bmp,
         |  CAST(image_size + 54 AS BIGINT) AS file_size,
         |  CAST(54 AS BIGINT) AS pixel_offset,
         |  CAST(width AS BIGINT) AS width,
         |  CAST(height AS BIGINT) AS height,
         |  CAST(24 AS BIGINT) AS bpp,
         |  CAST(image_size AS BIGINT) AS image_size,
         |  CAST(image_size + 54 AS BIGINT) AS n_bytes,
         |  concat('424D', ${oLe("image_size + 54", 4)}, '00000000',
         |    ${oLe("54", 4)}, ${oLe("40", 4)}, ${oLe("width", 4)},
         |    ${oLe("height", 4)}, ${oLe("1", 2)}, ${oLe("24", 2)},
         |    ${oLe("0", 4)}, ${oLe("image_size", 4)}, ${oLe("2835", 4)},
         |    ${oLe("2835", 4)}, ${oLe("0", 4)}, ${oLe("0", 4)})
         |    AS header_hex,
         |  CAST(stride AS BIGINT) AS stride
         |FROM h""".stripMargin,

    // real-codec cross-check, audio: walked fields re-derived from the
    // generation rule; the Spark side REALLY decodes PCM frames via
    // javax.sound and folds exact sample stats (constant 0x5A body ⇒
    // every 16-bit LE sample is 23130)
    "q_media_decode_wav" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    1 + doc_id % 2 AS channels,
         |    8000 * (1 + doc_id % 5) AS rate
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, channels, rate,
         |    (doc_id % 100 + 1) * channels * 2 AS data_size
         |  FROM f
         |)
         |SELECT doc_id,
         |  CAST(channels AS BIGINT) AS channels,
         |  CAST(rate AS BIGINT) AS sample_rate,
         |  CAST(data_size AS BIGINT) AS data_size,
         |  CAST(data_size // 2 AS BIGINT) AS n_samples,
         |  TRUE AS decode_agrees
         |FROM g""".stripMargin,

    // audio features over the patterned PCM: the closed-form sample rule
    // s(d,k) = ((d%16)*371 + k*97) % 2048 - 1024 re-derived per sample;
    // the Spark side REALLY decodes the WAV via javax.sound and folds the
    // same exact-integer stats (sum of squares is exact below 2^53, so
    // both engines take the same IEEE sqrt of the same value)
    "q_audio_features" ->
      s"""WITH f AS (
         |  SELECT doc_id, (doc_id % 100 + 1) * (1 + doc_id % 2) AS n
         |  FROM documents
         |), v AS (
         |  SELECT doc_id, k,
         |    ((doc_id % 16) * 371 + k * 97) % 2048 - 1024 AS s
         |  FROM (SELECT doc_id, unnest(range(0, n)) AS k FROM f)
         |), w AS (
         |  SELECT doc_id, k, s,
         |    lag(s) OVER (PARTITION BY doc_id ORDER BY k) AS pv
         |  FROM v
         |)
         |SELECT doc_id, TRUE AS decoded_ok,
         |  CAST(count(*) AS BIGINT) AS n_samples,
         |  CAST(max(abs(s)) AS BIGINT) AS peak,
         |  CAST(coalesce(sum(CASE WHEN pv * s < 0 THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_zero_cross,
         |  CAST(floor(sqrt(sum(CAST(s AS DOUBLE) * s) / count(*)) * 10000
         |    + 0.5) AS BIGINT) AS rms_q
         |FROM w GROUP BY doc_id""".stripMargin,

    // real-codec cross-check: walked fields re-derived from the shared
    // generation rule; decode_agrees is the in-band error contract — the
    // Spark side REALLY pixel-decodes via javax.imageio and compares
    "q_media_decode" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    16 + doc_id % 64 AS width,
         |    16 + doc_id % 48 AS height
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, width, height,
         |    ((width * 3 + 3) // 4) * 4 * height AS image_size
         |  FROM f
         |)
         |SELECT doc_id,
         |  CAST(width AS BIGINT) AS width,
         |  CAST(height AS BIGINT) AS height,
         |  CAST(24 AS BIGINT) AS bpp,
         |  CAST(image_size + 54 AS BIGINT) AS n_bytes,
         |  TRUE AS decode_agrees
         |FROM g""".stripMargin,

    // aHash oracle: the pattern formula rendered in closed form — the
    // Spark side REALLY decodes the BMP bytes with javax.imageio, so a
    // hash match pins the whole decode→block-average→threshold path
    "q_image_ahash" ->
      (s"WITH $oAhashBits\n" +
        "SELECT doc_id, TRUE AS decoded_ok, ahash, mean_gray FROM bits"),

    // resize oracle: the bm CTE IS the closed-form 2x box average; the
    // digest compares every resized pixel (row-major), so one wrong
    // pixel anywhere in the real decode→resample path fails the hash
    "q_image_resize" ->
      (s"WITH $oAhashBits\n" +
        """SELECT b.doc_id, TRUE AS decoded_ok,
          |  CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
          |  md5(string_agg(CAST(b.bm AS VARCHAR), ',' ORDER BY b.bj, b.bi))
          |    AS px_digest,
          |  m.mean_gray
          |FROM bm b JOIN mn m USING (doc_id)
          |GROUP BY b.doc_id, m.mean_gray""".stripMargin),

    // REAL PNG encode→decode round trip: lossless, so the decoded-pixel
    // aHash must equal the same closed-form pattern oracle as the BMP
    // path — one wrong byte in either direction of the codec fails it
    "q_media_decode_png" ->
      (s"WITH $oAhashBits\n" +
        "SELECT doc_id, TRUE AS decoded_ok, ahash, mean_gray FROM bits"),

    // REAL JPEG round trip: lossy, so the contract is geometry + the
    // MAE-within-16-gray-levels boolean, all pinned as literals
    "q_media_decode_jpeg" ->
      """SELECT doc_id, TRUE AS decoded_ok,
        |  CAST(16 AS BIGINT) AS dec_width, CAST(16 AS BIGINT) AS dec_height,
        |  TRUE AS mae_ok
        |FROM documents""".stripMargin,

    // near-dup classes over the closed-form hashes with the identical
    // 4x16-bit banding + exact-Hamming verify the Spark plan runs
    "q_image_neardup" -> s"""WITH $oAhashBits,
         |h AS (
         |  SELECT ahash, CAST(count(*) AS BIGINT) AS n_members
         |  FROM bits GROUP BY ahash
         |),
         |bands AS (
         |  SELECT ahash, n_members, b.b AS band,
         |    substr(ahash, CAST(b.b * 16 + 1 AS INTEGER), 16) AS sig
         |  FROM h, range(0, 4) b(b)
         |),
         |cand AS (
         |  SELECT DISTINCT a.ahash AS hash_a, a.n_members AS n_a,
         |    c.ahash AS hash_b, c.n_members AS n_b
         |  FROM bands a JOIN bands c
         |    ON a.band = c.band AND a.sig = c.sig AND a.ahash < c.ahash
         |),
         |sc AS (
         |  SELECT hash_a, hash_b,
         |    CAST(list_reduce(list_transform(range(1, 65),
         |      i -> CASE WHEN substr(hash_a, CAST(i AS INTEGER), 1)
         |                  <> substr(hash_b, CAST(i AS INTEGER), 1)
         |                THEN 1 ELSE 0 END), (x, y) -> x + y) AS BIGINT) AS hamming,
         |    n_a, n_b
         |  FROM cand
         |)
         |SELECT hash_a, hash_b, hamming, n_a, n_b FROM sc
         |WHERE hamming <= $AhashMaxHamming""".stripMargin,

    // PNG walk oracle: expectations re-derived from the shared generation
    // rule (DuckDB has no crc32, so crc_ok/iend_ok are asserted from the
    // rule — the in-band error-contract pattern of the sketch queries; the
    // Spark side REALLY recomputes each CRC from the bytes)
    "q_media_png" ->
      """WITH t AS (
        |  SELECT d.doc_id,
        |    CAST(sum(12 + 9 + (d.doc_id + j.i) % 21) AS BIGINT) AS text_bytes,
        |    CAST(sum(9 + (d.doc_id + j.i) % 21) AS BIGINT) AS text_len,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM documents d, range(1, 5) j(i)
        |  WHERE j.i <= 1 + d.doc_id % 4
        |  GROUP BY d.doc_id
        |)
        |SELECT doc_id, TRUE AS is_png,
        |  CAST(1 + doc_id % 128 AS BIGINT) AS width,
        |  CAST(1 + doc_id % 96 AS BIGINT) AS height,
        |  CAST(8 AS BIGINT) AS bit_depth,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 6 END
        |    AS BIGINT) AS color_type,
        |  CAST(doc_id % 2 AS BIGINT) AS interlace,
        |  CAST(3 + k AS BIGINT) AS n_chunks,
        |  concat('IHDR', repeat(',tEXt', CAST(k AS INT)), ',IDAT,IEND')
        |    AS chunk_types,
        |  CAST(13 + text_len + 1 + doc_id % 50 AS BIGINT) AS total_data_len,
        |  TRUE AS crc_ok, TRUE AS iend_ok,
        |  CAST(8 + 25 + text_bytes + 12 + 1 + doc_id % 50 + 12 AS BIGINT)
        |    AS n_bytes
        |FROM t""".stripMargin,

    // JPEG walk oracle: every field re-derived from the shared generation
    // rule (marker chain + SOF0 + scanned entropy span), like q_media_png
    "q_media_jpeg" ->
      """WITH a AS (
        |  SELECT d.doc_id,
        |    CAST(sum(11 + (d.doc_id + j.i) % 19) AS BIGINT) AS app_bytes,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM documents d, range(1, 4) j(i)
        |  WHERE j.i <= 1 + d.doc_id % 3
        |  GROUP BY d.doc_id
        |), f AS (
        |  SELECT doc_id, app_bytes, k,
        |    1 + (doc_id % 2) * 2 AS ncomp,
        |    5 + doc_id % 40 AS elen
        |  FROM a
        |)
        |SELECT doc_id, TRUE AS is_jpeg,
        |  CAST(16 + doc_id % 255 AS BIGINT) AS width,
        |  CAST(16 + doc_id % 185 AS BIGINT) AS height,
        |  CAST(ncomp AS BIGINT) AS n_components,
        |  CAST(4 + k AS BIGINT) AS n_segments,
        |  concat('E0', CASE CAST(k AS INT) WHEN 1 THEN ',E1'
        |    WHEN 2 THEN ',E1,E2' ELSE ',E1,E2,E3' END, ',DB,C0,DA')
        |    AS marker_types,
        |  TRUE AS marker_ok,
        |  CAST(elen AS BIGINT) AS entropy_len,
        |  TRUE AS eoi_ok,
        |  CAST(109 + app_bytes + 5 * ncomp + elen AS BIGINT) AS n_bytes
        |FROM f""".stripMargin,

    // EXIF oracle: byte order, IFD0 tag values, and the SOF0 cross-check
    // re-derived from the shared generation rule; the Spark side REALLY
    // reads them back endian-switched from the bytes
    // n_bytes: the r7 formula + 54 (TIFF grew 50 → 104 bytes: a 4th IFD0
    // entry carrying the 0x8769 ExifIFD pointer, plus the 42-byte sub-IFD)
    "q_media_exif" ->
      """SELECT doc_id, TRUE AS has_exif,
        |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
        |  CAST(4 AS BIGINT) AS n_tags,
        |  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
        |  CAST(16 + doc_id % 255 AS BIGINT) AS exif_width,
        |  CAST(16 + doc_id % 185 AS BIGINT) AS exif_height,
        |  TRUE AS dims_match,
        |  TRUE AS has_sub_ifd,
        |  TRUE AS sub_ok,
        |  CAST(3 AS BIGINT) AS n_sub_tags,
        |  CAST(100 + (doc_id % 32) * 25 AS BIGINT) AS iso,
        |  CAST(16 + doc_id % 255 AS BIGINT) AS pixel_width,
        |  CAST(16 + doc_id % 185 AS BIGINT) AS pixel_height,
        |  TRUE AS pixel_dims_match,
        |  CAST(205 + 5 * (1 + (doc_id % 2) * 2) + 5 + doc_id % 40 AS BIGINT)
        |    AS n_bytes
        |FROM documents""".stripMargin,

    // MP4 oracle: every parsed field re-derived from the shared
    // generation rule; the Spark side walks the real nested box tree
    "q_media_mp4" ->
      """SELECT doc_id, TRUE AS is_mp4, 'isom' AS major_brand,
        |  CAST(3 AS BIGINT) AS n_top_boxes, TRUE AS sizes_ok,
        |  CAST(1000 AS BIGINT) AS timescale,
        |  CAST(1000 + doc_id % 60000 AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 30 AS BIGINT) AS track_id,
        |  CAST(160 + doc_id % 1280 AS BIGINT) AS width,
        |  CAST(120 + doc_id % 720 AS BIGINT) AS height,
        |  CAST(10 + doc_id % 80 AS BIGINT) AS mdat_len,
        |  CAST(244 + 10 + doc_id % 80 AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    // corruption rule precedence (bad_crc > bad_magic > truncated for PNG,
    // bad_marker > bad_magic > truncated for JPEG) is the SYNTH-side
    // application order; the parse-side reason precedence maps 1:1 because
    // each corruption trips exactly its own gate
    "q_media_quarantine" ->
      """WITH t AS (
        |  SELECT d.doc_id,
        |    CAST(sum(12 + 9 + (d.doc_id + j.i) % 21) AS BIGINT) AS text_bytes,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM documents d, range(1, 5) j(i)
        |  WHERE j.i <= 1 + d.doc_id % 4
        |  GROUP BY d.doc_id
        |), c AS (
        |  SELECT doc_id, k,
        |    8 + 25 + text_bytes + 12 + 1 + doc_id % 50 + 12 AS nb,
        |    CASE WHEN doc_id % 7 = 0 THEN 'bad_crc'
        |         WHEN doc_id % 11 = 0 THEN 'bad_magic'
        |         WHEN doc_id % 13 = 0 THEN 'truncated' END AS reason
        |  FROM t
        |), ja AS (
        |  SELECT d.doc_id,
        |    CAST(sum(11 + (d.doc_id + j.i) % 19) AS BIGINT) AS app_bytes,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM documents d, range(1, 4) j(i)
        |  WHERE j.i <= 1 + d.doc_id % 3
        |  GROUP BY d.doc_id
        |), jc AS (
        |  SELECT doc_id, k,
        |    109 + app_bytes + 5 * (1 + (doc_id % 2) * 2) + 5 + doc_id % 40 AS nb,
        |    CASE WHEN doc_id % 7 = 0 THEN 'bad_marker'
        |         WHEN doc_id % 11 = 0 THEN 'bad_magic'
        |         WHEN doc_id % 13 = 0 THEN 'truncated' END AS reason
        |  FROM ja
        |)
        |SELECT doc_id, 'image/png' AS modality,
        |  CAST(CASE WHEN reason = 'truncated' THEN nb - 12 ELSE nb END
        |    AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN reason = 'bad_magic' THEN 0
        |            WHEN reason = 'truncated' THEN 2 + k
        |            ELSE 3 + k END AS BIGINT) AS n_chunks,
        |  reason
        |FROM c WHERE reason IS NOT NULL
        |UNION ALL
        |SELECT doc_id, 'image/jpeg' AS modality,
        |  CAST(CASE WHEN reason = 'truncated' THEN nb - 2 ELSE nb END
        |    AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN reason = 'bad_magic' THEN 0
        |            WHEN reason = 'bad_marker' THEN 1 + k
        |            ELSE 4 + k END AS BIGINT) AS n_chunks,
        |  reason
        |FROM jc WHERE reason IS NOT NULL""".stripMargin,

    "q_media_stats" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    (doc_id % 100 + 1) * (1 + doc_id % 2) * 2 AS data_size,
        |    8000 * (1 + doc_id % 5) * (1 + doc_id % 2) * 2 AS byte_rate
        |  FROM documents WHERE doc_id % 2 = 0
        |), b AS (
        |  SELECT doc_id, 16 + doc_id % 64 AS width, 16 + doc_id % 48 AS height,
        |    (((16 + doc_id % 64) * 3 + 3) // 4) * 4 * (16 + doc_id % 48)
        |      AS image_size
        |  FROM documents WHERE doc_id % 2 = 1
        |), u AS (
        |  SELECT 'audio/wav' AS modality, 44 + data_size AS n_bytes,
        |    (data_size * 1000000) // byte_rate AS units FROM w
        |  UNION ALL
        |  SELECT 'image/bmp', 54 + image_size, width * height FROM b
        |)
        |SELECT modality, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(units) AS BIGINT) AS total_units,
        |  CAST(sum(units) // count(*) AS BIGINT) AS avg_unit
        |FROM u GROUP BY modality""".stripMargin,

    "q_pack_interleaved" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |st AS (
        |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 30)) AS start
        |  FROM tk
        |), ch AS (
        |  SELECT doc_id, CAST((start - 1) // 30 AS BIGINT) AS chunk_id,
        |    toks[start:least(start + 39, len(toks))] AS ctoks
        |  FROM st
        |), items AS (
        |  SELECT doc_id, chunk_id * 2 AS chunk_id, 'text' AS kind,
        |    CAST(len(ctoks) AS BIGINT) AS n_chunk_tokens
        |  FROM ch
        |  UNION ALL
        |  SELECT doc_id, CAST(fi * 2 + 1 AS BIGINT), 'frame', CAST(64 AS BIGINT)
        |  FROM (SELECT doc_id, unnest([0, 2]) AS fi FROM documents)
        |), o AS (
        |  SELECT doc_id, chunk_id, kind, n_chunk_tokens,
        |    CAST(coalesce(sum(n_chunk_tokens) OVER (
        |      ORDER BY doc_id, chunk_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS global_offset
        |  FROM items
        |)
        |SELECT *,
        |  global_offset // 512 AS seq_id,
        |  global_offset % 512 AS seq_offset,
        |  (global_offset % 512) + n_chunk_tokens > 512 AS spans_seq
        |FROM o""".stripMargin,

    "q_agg_pricing" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ec,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dp,
        |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tp
        |  FROM lineitem
        |), g AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(sum(qc) AS BIGINT) AS sq, CAST(sum(ec) AS BIGINT) AS se,
        |    CAST(sum(dp) AS BIGINT) AS sd,
        |    sum(ec * (100 - dp)) AS srev,
        |    sum(ec * (100 - dp) * (100 + tp)) AS sch,
        |    count(*) AS n
        |  FROM c GROUP BY 1, 2
        |)
        |SELECT l_returnflag, l_linestatus,
        |  sq / 100.0 AS sum_qty, se / 100.0 AS sum_base_price,
        |  CAST(srev AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sch AS DOUBLE) / 1000000.0 AS sum_charge,
        |  sq / 100.0 / n AS avg_qty, se / 100.0 / n AS avg_price,
        |  sd / 100.0 / n AS avg_disc, n AS count_order
        |FROM g""".stripMargin,

    "q_join_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
        |    AS revenue,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_hybrid_search" ->
      s"""WITH ${OracleSql.qualityScoreCte},
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS qe
         |  FROM embeddings WHERE vec_id < 5
         |), sc AS (
         |  SELECT q.query_id, e.vec_id AS doc_id,
         |    ${r4(oCos("q.qe", "e.embedding"))} AS cos, s.quality_score
         |  FROM embeddings e JOIN qscore s ON s.doc_id = e.vec_id, q
         |  WHERE e.vec_id != q.query_id
         |), h AS (
         |  SELECT query_id, doc_id, cos, quality_score,
         |    ${r4("0.7 * cos + 0.3 * quality_score")} AS hybrid
         |  FROM sc
         |), rk AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY hybrid DESC, doc_id) AS INTEGER) AS rk
         |  FROM h
         |)
         |SELECT query_id, doc_id, cos, quality_score, hybrid, rk
         |FROM rk WHERE rk <= 10""".stripMargin,

    "q_zorder" ->
      s"""WITH e AS (
         |  SELECT event_id,
         |    (CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600000000.0) AS BIGINT)
         |      & 65535) AS hour_idx,
         |    user_id % 65536 AS user_bucket
         |  FROM events
         |)
         |SELECT event_id, hour_idx, user_bucket,
         |  ${Layout.zorder2Sql("hour_idx", "user_bucket", 16)} AS zkey
         |FROM e""".stripMargin,

    "q_range_join" ->
      """WITH e AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |), iv AS (
        |  SELECT event_id AS interval_id, ts AS start_ts,
        |    ts + INTERVAL 45 MINUTE AS end_ts
        |  FROM e WHERE event_id % 1000 = 0
        |)
        |SELECT interval_id, start_ts, end_ts, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0
        |    AS sum_value
        |FROM iv JOIN e ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_sessionize" -> sessionizeOracleSql,
    // the streaming session_window path must produce the SAME sessions:
    // hash-gated against the batch query's oracle unchanged
    "q_stream_sessionize" -> sessionizeOracleSql)
}
