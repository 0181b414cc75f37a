package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Shapes:
  *  - brute-force cosine top-k: the correctness baseline — a broadcast join
  *    of the (small) query set against the corpus, one pass, no shuffle of
  *    the big side;
  *  - IVF: assign every vector to its nearest centroid (broadcast of the
  *    centroid table), then search only within the probe's cluster — the
  *    100 TB path, because the corpus is partitioned by centroid id and the
  *    per-query work drops from O(N) to O(N/C).
  *
  * Float discipline for oracle parity: elementwise products are computed in
  * DOUBLE and folded strictly left-to-right (`aggregate` with a 0.0 seed ≡
  * DuckDB `list_reduce`), because float32 folds and engine-chosen
  * summation orders would diverge in the last ulps.
  */
object Similarity {

  /** Left-to-right double dot product of two float arrays (native
    * expression; ≡ aggregate(zip_with(...)) bit-for-bit). */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayMath.dotF(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from precomputed norms — avoids refolding each side's norm per
    * pair in quadratic joins; same doubles as [[cosine]]. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  private def r4(c: Column): Column = floor(c * lit(10000) + lit(0.5)) / lit(10000)

  /** Brute-force cosine top-k: queries = vec_id < nQueries; rank by
    * 4dp-rounded score with vec_id tiebreak (deterministic under float
    * noise). The query side is broadcast; the corpus is scanned once. */
  def cosineTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        r4(cosine(col("qe"), col("embedding"))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rk"))
  }

  /** IVF assignment: nearest of the first nCentroids vectors (cosine,
    * tiebreak lowest centroid id). This is the partitioning key a 100 TB
    * corpus would be written with (`partitionBy(centroid_id)`). */
  def ivfAssign(emb: DataFrame, nCentroids: Int): DataFrame = {
    val cent = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
    val scored = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("centroid_id"),
        r4(cosine(col("embedding"), col("ce"))).as("cscore"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cscore").desc, col("centroid_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("centroid_id"), col("cscore"))
  }

  /** IVF search: probe only the query's own cluster (nprobe=1) — the scale
    * path; recall vs brute force is the standard IVF tradeoff. */
  def ivfSearch(emb: DataFrame, nCentroids: Int, nQueries: Int, k: Int): DataFrame = {
    val assign = ivfAssign(emb, nCentroids)
    val withCluster = emb.join(assign.select("vec_id", "centroid_id"), "vec_id")
    val q = withCluster.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("centroid_id").as("qc"))
    val scored = withCluster.join(broadcast(q),
        col("centroid_id") === col("qc") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        r4(cosine(col("qe"), col("embedding"))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rk"))
  }

  /** Embedding near-dup pairs: cosine ≥ tau, a < b. Normalized vectors are
    * precomputed once; at 100 TB the pair space must be blocked (LSH on
    * random hyperplanes or IVF-cluster-local pairs) — cluster-local version
    * = ivfAssign + per-cluster self-join, same verify expression. */
  /** Cluster-blocked near-dup pairs — the 100 TB path: candidates only
    * within the same IVF cluster, so the pair space is Σ|cluster|² instead
    * of N². Misses cross-cluster pairs by design (standard IVF recall
    * tradeoff; raise nCentroids' coverage with multi-assignment if
    * needed). */
  def dedupPairsIvf(emb: DataFrame, tau: Double, nCentroids: Int): DataFrame = {
    val withCluster = emb
      .join(ivfAssign(emb, nCentroids).select("vec_id", "centroid_id"), "vec_id")
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        norm(col("embedding")).as("nrm"))
    val a = withCluster.select(col("centroid_id"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = withCluster.select(col("centroid_id"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("centroid_id"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("centroid_id"), col("vec_a"), col("vec_b"),
        r4(cosinePre(col("ea"), col("eb"), col("na"), col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
  }

  def dedupPairs(emb: DataFrame, tau: Double): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val a = withNorm.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        r4(cosinePre(col("ea"), col("eb"), col("na"), col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
  }
}
