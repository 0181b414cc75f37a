package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Pluggable materialization for iterative and multiply-consumed frames
  * (LSH indexes, CC/PageRank rounds, IVF assignments).
  *
  * Strategy is read per-call from the session conf `spark.graft.materializer`:
  *
  *  - `local` (default): `localCheckpoint` — materializes to executor-local
  *    block storage and truncates lineage. Fastest, and the right choice on
  *    local[_] where "executor loss" cannot happen — but NOT fault-tolerant:
  *    on a cluster, losing an executor loses blocks with no lineage left to
  *    recompute them, killing the query.
  *  - `persist`: `persist(MEMORY_AND_DISK)` — keeps lineage, so lost blocks
  *    are recomputed on executor failure (Spark's standard recovery path).
  *    Lazy: materialized by whichever job first consumes the frame. Plans
  *    grow with iteration count, which every caller here bounds (fixpoint
  *    guards / fixed rounds).
  *  - `checkpoint`: reliable `checkpoint()` to the SparkContext checkpoint
  *    dir (caller must `sc.setCheckpointDir` to durable/shared storage,
  *    e.g. HDFS or object store). Truncates lineage AND survives executor
  *    loss — the 1000-executor, 100 TB setting for deep iteration.
  *
  * All three strategies produce bit-identical frames (a materialization
  * boundary never changes values, only where bytes live), pinned by
  * MaterializeSpec on the connected-components loop.
  */
object Materialize {
  val ConfKey = "spark.graft.materializer"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "local"      => df.localCheckpoint()
      case "persist"    => df.persist(StorageLevel.MEMORY_AND_DISK)
      case "checkpoint" => df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be local|persist|checkpoint, got '$other'")
    }

  /** `.materialize` chain syntax — drop-in replacement for the former
    * hard-wired `.localCheckpoint()` call sites. */
  implicit class MatOps(private val df: DataFrame) extends AnyVal {
    def materialize: DataFrame = Materialize(df)
  }
}
