package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for short-lived persisted DataFrames (VERDICT.md r2 "cache
  * hygiene"): operators that persist intermediate tables referenced by
  * multiple plan branches (shingle sets, minhash signatures) register them
  * here, and the harness mains ([[Verify]], [[Bench]]) call
  * [[clearPersisted]] after materializing each query — so a long-lived
  * session (or a 57-query bench run) does not accumulate persisted RDDs.
  *
  * Unpersisting is always SAFE, never wrong: a cleared table is lazily
  * recomputed if a later plan still references it.
  */
object Caches {
  private val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and track it for [[clearPersisted]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    persisted += p
    p
  }

  /** Unpersist (non-blocking) and forget every tracked DataFrame. */
  def clearPersisted(): Unit = synchronized {
    persisted.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    persisted.clear()
  }
}
