package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Shared checkpoint pinning for the iterative ops ([[Dedup]]'s signature
  * reuse, [[Clusters]]' star rounds): reliable checkpoint when the session
  * has a checkpoint dir (the cluster deployment path — survives executor
  * loss), local checkpoint otherwise (tests / exploratory local sessions).
  *
  * Spark does NOT delete reliable checkpoint files unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default false)
  * AND the RDD is garbage-collected — an iterative algorithm that
  * checkpoints every round would otherwise leak a full edge-set-sized file
  * set per round, unbounded over a long-lived service. [[Pinned.delete]]
  * lets the loop reclaim a SUPERSEDED round's files as soon as the next
  * round is materialized; only the final round's checkpoint (which the
  * returned DataFrame still reads) is left for the session cleaner, so a
  * repeated caller accumulates one file set per call, not one per
  * iteration. Long-lived services should still set `cleanCheckpoints=true`
  * to reclaim those finals.
  *
  * Pinning is ALSO this library's no-leak substitute for a bare
  * `.persist()` on function-internal shared intermediates (r10 verdict):
  * a persist registers in the session cacheManager forever unless someone
  * holds the exact frame and unpersists it — a handle library functions
  * cannot give their callers. A pin never touches the cacheManager
  * (`spark.catalog.clearCache()` has nothing to clear); in the
  * no-checkpoint-dir deployment `localCheckpoint` backs it with RDD-level
  * storage the ContextCleaner reclaims as soon as the returned frame is
  * garbage-collected, so the cache's lifetime is the caller's reference,
  * not the session's.
  */
private[graft] object Checkpoints {

  /** A pinned (materialized, lineage-truncated) frame plus the reliable
    * checkpoint location backing it, when one exists. */
  final case class Pinned(df: DataFrame, path: Option[Path]) {
    /** Delete the backing storage. Call ONLY once every reader of `df`
      * has been superseded — the frame is unreadable afterwards.
      * Reliable-checkpoint pins delete their files; LOCAL-checkpoint pins
      * (no checkpoint dir set) unpersist the backing RDD via [[release]]
      * instead, so an iterative caller reclaims superseded rounds
      * immediately in BOTH deployments rather than accumulating cached
      * RDD generations for the life of the no-checkpoint-dir run. */
    def delete(): Unit = path match {
      case Some(p) =>
        val conf = df.sparkSession.sparkContext.hadoopConfiguration
        p.getFileSystem(conf).delete(p, true)
      case None => release(df)
    }
  }

  /** [[pin]] unless `df` is already persisted — a caller who cached the
    * input has already paid for (and owns) its materialization; pinning
    * on top would write a redundant copy. */
  def pinned(df: DataFrame): DataFrame =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else pin(df).df

  /** Release the RDD storage behind a LOCAL-checkpoint pin once every
    * reader has been superseded — the iterative-maintenance counterpart
    * of [[Pinned.delete]] for the no-checkpoint-dir deployment. No-op
    * when the frame's root is not a [[LogicalRDD]] (reliable checkpoints
    * clean through `delete`; plain frames have nothing pinned). The
    * frame is unreadable afterwards. */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    case _             => ()
  }

  /** Checkpoint `df` eagerly and return it with its backing path. The path
    * is recovered from the checkpointed plan's [[LogicalRDD]]; if a future
    * Spark changes that internal shape we degrade to `None` (no cleanup,
    * never a failure). */
  def pin(df: DataFrame): Pinned = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) {
      val pinned = df.checkpoint()
      val path = pinned.queryExecution.analyzed match {
        case l: LogicalRDD => l.rdd.getCheckpointFile.map(new Path(_))
        case _             => None
      }
      Pinned(pinned, path)
    } else Pinned(df.localCheckpoint(), None)
  }
}
