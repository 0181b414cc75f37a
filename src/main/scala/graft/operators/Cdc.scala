package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog application — the batch MERGE INTO every keyed snapshot
  * table needs: fold a stream of keyed changes (upserts + deletes) into a
  * base snapshot, last-write-wins.
  *
  * Semantics (pinned in CdcSpec):
  *  - the LATEST change per key decides: op 'D' → the key is absent from
  *    the result (even if the base had it); any other op → the change row's
  *    payload replaces (or inserts) the key's row;
  *  - keys untouched by the changelog keep their base row unchanged;
  *  - "latest" is the total order (tsCol desc, seqCol desc) — ties on the
  *    event time are broken by the caller's sequence column (a changelog
  *    offset / event id), so replays and re-partitions are deterministic;
  *  - a delete of an absent key is a no-op; an update of an absent key is
  *    an insert (standard upsert semantics);
  *  - applying two consecutive changelog slices == applying their union,
  *    PROVIDED slice boundaries respect the (ts, seq) order (a later
  *    slice contains only later changes — how changelogs are delivered).
  *    This is what lets a nightly merge be split, replayed, or run as a
  *    micro-batch stream ([[graft.streaming.StreamCdc]]); asserted in
  *    CdcSpec. A mis-ordered slice would re-apply an older change on top
  *    of a newer snapshot row — the snapshot carries no per-row version
  *    to defend with, by design (it has exactly the base schema).
  *
  * Scale shape: one shuffle of the changelog by key for the latest-change
  * window (changelogs are deltas — small next to the snapshot), then one
  * keyed left-anti join against the base. The base is never sorted and
  * never shuffled beyond the join; at 100 TB both sides bucket by the
  * merge key so the join is co-located, and the output overwrites only
  * the partitions that contain touched keys (dynamic partition overwrite,
  * as in [[graft.sinks.TableSetup]]'s backfill).
  */
object Cdc {

  /** Evaluates to `value`, or raises if any merge key is null — the loud
    * runtime guard for the documented non-null-key precondition (null
    * keys have no last-write-wins identity; `===` joins would otherwise
    * silently drop or duplicate them). Attached to NON-KEY expressions
    * only: wrapping a join key would replace the bare attribute Catalyst
    * needs to recognize a bucketed scan's HashPartitioning, silently
    * re-shuffling both snapshots. */
  private def keyGuard(keyCols: Seq[String], who: String,
      value: Column): Column =
    when(keyCols.map(col(_).isNull).reduce(_ || _),
      raise_error(lit(s"Cdc.$who: null merge key (${keyCols.mkString(",")})" +
        " — null keys have no last-write-wins identity; filter or repair" +
        " upstream"))).otherwise(value)

  /** Inverse of [[applyChangelog]]: the MINIMAL changelog transforming
    * snapshot `a` into snapshot `b` — 'U' rows for keys whose payload
    * changed or appeared (B's full row), 'D' rows for keys that vanished
    * (A's row, payload irrelevant to apply). Round-trip law, asserted in
    * CdcSpec: applyChangelog(a, diff(a, b)) == b. Unchanged rows emit
    * nothing, so the diff is delta-sized — this is the snapshot-diff /
    * data-versioning primitive (what changed between two corpus
    * snapshots?) and the changelog BOOTSTRAP (derive one where upstream
    * only ships full snapshots).
    *
    * Preconditions (both are what "snapshot" means and what
    * [[applyChangelog]] produces): one row per key, and non-null key
    * columns — null merge keys have no last-write-wins identity.
    *
    * Shape: ONE full-outer join hash-partitioned on `keyCols` — at
    * 100 TB both snapshots bucket by the merge key, so the join is
    * co-located and shuffle-free. Each side's payload rides through the
    * join exactly once (the 'U' rows need B's row, the 'D' rows A's),
    * and change detection compares the two payload structs null-safely
    * post-join — exact, no digest-collision caveat, and free given the
    * payloads are already co-located. (An earlier version used
    * `exceptAll`, which hash-partitions both snapshots on EVERY column —
    * a plan that can never exploit key bucketing.) */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(a.columns.sameElements(b.columns),
      s"snapshots must share a schema: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    require(!a.columns.contains(opCol), s"snapshot already has a '$opCol' column")
    require(!a.columns.contains("_p"),
      "snapshot already has a '_p' column (reserved by diff)")
    val pay = a.columns.filterNot(keyCols.contains).toSeq
    // prefix-rename both sides: no ambiguous-attribute risk even when a
    // and b derive from the same plan (the common bootstrap case)
    // each side also carries a guarded presence sentinel `_p`: TRUE on
    // every (valid) row, raising on a null merge key BEFORE the join —
    // post-join the null-keyed row would be indistinguishable from an
    // unmatched one and would silently emit a corrupt all-null-key 'U'
    def side(df: DataFrame, pfx: String): DataFrame =
      df.select(df.columns.map(c => col(c).as(pfx + c)) :+
        keyGuard(keyCols, "diff", lit(true)).as(pfx + "_p"): _*)
    val aa = side(a, "_da_")
    val bb = side(b, "_db_")
    // PLAIN equality, not null-safe `<=>`: Catalyst rewrites null-safe
    // join keys to (coalesce(k, 0), isnull(k)), which can never match a
    // bucketed scan's HashPartitioning(k) — both snapshots would
    // re-shuffle and the co-location claim above would be silently false
    // (caught by BucketingSpec's plan pin). Null merge keys are already
    // a documented precondition violation (no last-write-wins identity),
    // so `===` is semantically identical on valid input.
    val joined = aa.join(bb,
      keyCols.map(k => col("_da_" + k) === col("_db_" + k)).reduce(_ && _),
      "full_outer")
    // presence sentinels: the guarded `_p` is non-null iff the side
    // matched (and its evaluation is what fires the null-key guard)
    val aPresent = col("_da__p").isNotNull
    val bPresent = col("_db__p").isNotNull
    def payStruct(pfx: String): Column =
      if (pay.isEmpty) lit(0) else struct(pay.map(c => col(pfx + c)): _*)
    val op = when(!aPresent, lit("U"))                        // appeared
      .when(!bPresent, lit("D"))                              // vanished
      .when(!(payStruct("_da_") <=> payStruct("_db_")), lit("U")) // changed
    val outCols = a.columns.toSeq.map { c =>
      if (keyCols.contains(c)) coalesce(col("_db_" + c), col("_da_" + c)).as(c)
      else when(col(opCol) === "D", col("_da_" + c))
        .otherwise(col("_db_" + c)).as(c)
    }
    joined.withColumn(opCol, op).filter(col(opCol).isNotNull)
      .select(outCols :+ col(opCol): _*)
  }

  /** Apply `changes` to `base`. `changes` must contain every `base`
    * column plus `opCol`; the result has exactly the base schema. */
  def applyChangelog(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], tsCol: String, seqCol: String,
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val missing = (base.columns :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing columns: ${missing.mkString(", ")}")
    // mirror of diff()'s opCol guard: the helper rank column below would
    // otherwise silently clobber (and then leak as data) a real '_rn'
    require(!changes.columns.contains("_rn"),
      "changes already has a '_rn' column (reserved by applyChangelog)")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(seqCol).desc)
    // the rank column doubles as the changes-side null-key guard: a
    // null-keyed change would otherwise both upsert its corrupt row AND
    // leave the base's null-keyed rows "untouched" past the anti-join
    val latest = changes
      .withColumn("_rn", keyGuard(keyCols, "applyChangelog",
        row_number().over(w)))
      .filter(col("_rn") === 1)
    // null-safe: a malformed row with op = NULL must be an UPSERT, not a
    // silent delete (plain =!= evaluates to null, dropping the row from
    // upserts while the anti-join below still removes its base row)
    val upserts = latest.filter(!col(opCol).eqNullSafe(lit("D")))
      .select(base.columns.map(col): _*)
    // base-side guard is a FILTER, not a projection rider: a guard woven
    // into payload columns only fires if those columns are EVALUATED, so
    // a keys-only consumer (or a bare count) would let Catalyst prune the
    // guarded expressions and a null-keyed base row would pass silently.
    // Filter predicates survive column pruning, evaluate on every row,
    // keep the key attributes bare (FilterExec passes partitioning
    // through — bucketed co-location intact), and make the keys-only
    // special case unnecessary.
    val guardedBase =
      base.where(keyGuard(keyCols, "applyChangelog", lit(true)))
    val untouched = guardedBase.join(
      latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    untouched.unionByName(upserts)
  }
}
