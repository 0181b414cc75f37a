package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StringSimilarity

/** Blocked fuzzy entity matching (record linkage) over a string column.
  *
  * The naive formulation — `a CROSS JOIN b WHERE jw(a, b) >= τ` — is N²
  * in distinct names and plans as a nested-loop join; at 100 TB it never
  * finishes. The standard scale shape is blocking + verify:
  *
  *   1. dedupe to DISTINCT names first (entity matching is name-level; a
  *      name repeated across millions of rows must be compared once);
  *   2. block: candidates must share the first `blockPrefix` chars AND be
  *      within `lenSlack` of each other's length. Jaro-Winkler is
  *      prefix-weighted, so high-τ matches nearly always share a prefix —
  *      the block key is a plain equi-join key (one keyed shuffle, no
  *      cartesian);
  *   3. cap: blocks holding more than `maxBlock` names are dropped before
  *      the join (the same hot-key guard as the shingle df-cap in
  *      [[Dedup.jaccardPairs]]) — one degenerate prefix ("Customer#…")
  *      otherwise re-creates the quadratic join inside a single block;
  *   4. verify [[graft.functions.JaroWinklerSimilarity]] ≥ τ on the
  *      blocked candidates only.
  *
  * Recall caveat (documented, inherent to prefix blocking): pairs whose
  * first `blockPrefix` chars differ ("crate"/"trace") are not candidates.
  * Production linkage runs several complementary blockers and unions the
  * candidates; one prefix blocker is the single-pass baseline.
  */
object FuzzyJoin {

  /** Self-match pairs `(name_a < name_b, sim)` with JW similarity ≥ tau.
    * Output: name_a, name_b, sim (raw double — callers round for display). */
  def selfPairs(df: DataFrame, nameCol: String, tau: Double,
      blockPrefix: Int = 3, lenSlack: Int = 2, maxBlock: Int = 1000): DataFrame = {
    val names = df.select(col(nameCol).as("name"))
      .filter(col("name").isNotNull)
      .distinct()
      .select(col("name"),
        substring(col("name"), 1, blockPrefix).as("blk"),
        length(col("name")).as("len"))
    // hot-block cap: count names per block, keep blocks ≤ maxBlock
    val capped = names
      .withColumn("blk_n", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(col("blk_n") <= maxBlock)
      .drop("blk_n")
    val a = capped.select(col("name").as("name_a"), col("blk"),
      col("len").as("len_a"))
    val b = capped.select(col("name").as("name_b"), col("blk").as("blk_b"),
      col("len").as("len_b"))
    a.join(b, col("blk") === col("blk_b") &&
        col("name_a") < col("name_b") &&
        abs(col("len_a") - col("len_b")) <= lenSlack)
      .withColumn("sim", StringSimilarity.jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("sim") >= tau)
      .select(col("name_a"), col("name_b"), col("sim"))
  }
}
