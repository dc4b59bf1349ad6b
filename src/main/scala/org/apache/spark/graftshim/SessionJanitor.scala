package org.apache.spark.graftshim

import org.apache.spark.{MapOutputTrackerMaster, SparkContext, SparkEnv}
import org.apache.spark.storage.BroadcastBlockId

/** Synchronous inter-query runtime-state cleanup.
  *
  * Spark's own `ContextCleaner` reaps shuffle files / broadcast blocks
  * only when their DRIVER references are garbage-collected, and even
  * then the shuffle half is non-blocking by default
  * (`spark.cleaner.referenceTracking.blocking.shuffle=false`). Under a
  * 128 GiB heap a long suite may not GC for dozens of queries, and a
  * `System.gc()` nudge still returns before the cleaner thread has
  * drained its reference queue — so a 146-query benchmark accumulates
  * every predecessor's shuffle spill on local disk and broadcast
  * blocks in memory, and late-suite queries inflate up to 2x vs their
  * isolated truth (round-10 BENCH-notes: q66 6.1 s in-suite vs 3.05 s
  * isolated).
  *
  * This shim lives under `org.apache.spark` to reach the
  * `private[spark]` cleanup APIs and removes the state *synchronously*:
  * every shuffle id still registered with the `MapOutputTrackerMaster`
  * and every broadcast block still in the block manager is released
  * with `blocking = true` before the method returns. Callers
  * (`graft.Sessions.release`) invoke it only BETWEEN self-contained
  * queries, when no job is running and nothing can still reference the
  * removed state. */
object SessionJanitor {

  /** Drop all registered shuffles and broadcast blocks, blocking until
    * the block manager confirms. Returns (shuffles, broadcasts)
    * removed, for logging/tests. No-op (0, 0) when the cleaner is
    * absent (spark.cleaner.referenceTracking=false). */
  def drainRuntimeState(sc: SparkContext): (Int, Int) = {
    val cleaner = sc.cleaner
    if (cleaner.isEmpty) return (0, 0)
    // Enforce the "between self-contained queries" precondition
    // instead of trusting the caller's comment (ADVICE r11): a drain
    // with jobs in flight or frames still cached would destroy state
    // those consumers re-read, surfacing later as 'Broadcast destroyed'
    // or silent shuffle recomputation — fail HERE, attributably.
    // statusTracker is fed by the async listener bus and can lag a
    // just-finished job (observed right after a streaming query's
    // AvailableNow termination) — poll briefly before declaring a
    // genuine violation.
    val deadline = System.nanoTime() + 2000000000L
    while (sc.statusTracker.getActiveJobIds().nonEmpty &&
        System.nanoTime() < deadline)
      Thread.sleep(10)
    require(sc.statusTracker.getActiveJobIds().isEmpty,
      "SessionJanitor.drainRuntimeState called with active jobs — " +
        "it must only run between self-contained queries")
    require(sc.getPersistentRDDs.isEmpty,
      s"SessionJanitor.drainRuntimeState called with " +
        s"${sc.getPersistentRDDs.size} cached RDDs still registered — " +
        "unpersist/clearCache before draining (ids: " +
        sc.getPersistentRDDs.keys.toSeq.sorted.take(8).mkString(",") + ")")
    val tracker =
      SparkEnv.get.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    val shuffleIds = tracker.shuffleStatuses.keySet.toSeq.sorted
    shuffleIds.foreach { id =>
      cleaner.foreach(_.doCleanupShuffle(id, blocking = true))
    }
    // Broadcast pieces are enumerable from the block manager master;
    // removing by id also drops the driver-side value so the next
    // query starts from a clean heap. (askStorageEndpoints: include
    // blocks only the executors hold.)
    val broadcastIds = sc.env.blockManager.master
      .getMatchingBlockIds(_.isBroadcast, askStorageEndpoints = true)
      .collect { case BroadcastBlockId(id, _) => id }
      .distinct.sorted
    broadcastIds.foreach { id =>
      cleaner.foreach(_.doCleanupBroadcast(id, blocking = true))
    }
    (shuffleIds.size, broadcastIds.size)
  }
}
