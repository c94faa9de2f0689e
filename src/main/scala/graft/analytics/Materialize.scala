package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One policy for "materialize this frame eagerly and cut its lineage" —
  * used wherever a frame feeds multiple plan branches whose pruned
  * subtrees defeat ReusedExchange (dedup signature frames, the Align range
  * partitioning), so the expensive construction runs once.
  *
  * Default: eager `localCheckpoint` — blocks live in executor
  * memory-and-disk, are freed by the ContextCleaner when the frame becomes
  * unreachable (no CacheManager registration to leak), and cost no
  * external storage. Caveat: an executor loss fails the query instead of
  * recomputing.
  *
  * Cluster-grade path: set `spark.graft.checkpoint.reliable=true` AND
  * `sparkContext.setCheckpointDir(...)` — frames then checkpoint to the
  * reliable store (persisted first so the eager count and the file write
  * share one computation, the cache released immediately after). On a
  * preemptible 1000-executor cluster this is the right setting; locally
  * the default is.
  */
object Materialize {
  val ReliableConfKey = "spark.graft.checkpoint.reliable"

  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption(ReliableConfKey).contains("true")) {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      val c = p.checkpoint(eager = true)
      p.unpersist(blocking = false)
      c
    } else df.localCheckpoint(true)
}
