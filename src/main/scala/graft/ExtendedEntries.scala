package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extended pipeline operators (dedup / similarity / text analysis /
  * multimodal / graph / streaming / relational), each with its DuckDB
  * oracle — the aggregation point over the per-family entry objects
  * ([[AnnEntries]], [[MediaEntries]], [[TextDedupEntries]],
  * [[GraphEntries]], [[StreamEntries]], [[RelationalEntries]]).
  *
  * Shared portability rules (see OracleSql and [[EntryMath]]):
  * md5-derived integer hashes; int64-safe modular arithmetic; money as
  * floor(x*100+0.5) integer cents so sums are order-independent and
  * bit-exact; floor-based 4dp rounding for any true floating output;
  * left-to-right double folds for dot products. */
object ExtendedEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AnnEntries.queries ++ MediaEntries.queries ++ TextDedupEntries.queries ++
      GraphEntries.queries ++ StreamEntries.queries ++
      RelationalEntries.queries

  def oracleSql: Map[String, String] =
    AnnEntries.oracleSql ++ MediaEntries.oracleSql ++
      TextDedupEntries.oracleSql ++ GraphEntries.oracleSql ++
      StreamEntries.oracleSql ++ RelationalEntries.oracleSql
}
