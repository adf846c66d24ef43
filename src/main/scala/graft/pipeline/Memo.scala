package graft.pipeline

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for flagship pipeline results.
  *
  * The registry exposes both a full flagship result (q_pipeline_e2e,
  * q_agr_e2e) and derived projections of the same run (q_pipeline_counts,
  * q_agr_counts). In production the run's phase outputs are parquet state
  * tables that every downstream report reads; computing the pipeline once
  * per session and deriving the projections from the materialized result
  * is the same topology in-process. Without this, each registered query
  * re-executes the whole multi-phase run.
  *
  * Lifetime: ONE slot, holding the memo of the most recently used
  * session behind a WeakReference. A WeakHashMap keyed by session would
  * leak here - the cached values are DataFrames whose QueryExecution
  * strongly references their session, and a WeakHashMap entry whose
  * VALUE reaches its KEY is never collected - so sequential sessions in
  * one JVM would each pin their full memoized plans forever. With the
  * single slot, a new session's first call drops the previous session's
  * entries; at most one (possibly dead) session's memo is ever
  * retained. Two live sessions alternating would thrash the memo -
  * acceptable: every harness (Verify, Bench, Smoke) runs one session.
  *
  * The cached DataFrames' plans are rooted at localCheckpoint RDDs, so
  * a cached entry MUST NOT be used after those RDDs are unpersisted -
  * callers that unpersist (Bench between passes) must `clear()` first.
  */
object Memo {
  private var slot: (java.lang.ref.WeakReference[SparkSession], TrieMap[String, Any]) = null

  def once[T](spark: SparkSession, key: String)(build: => T): T = synchronized {
    val perSession =
      if (slot != null && (slot._1.get eq spark)) slot._2
      else {
        val m = TrieMap.empty[String, Any]
        slot = (new java.lang.ref.WeakReference(spark), m)
        m
      }
    perSession.getOrElseUpdate(key, build).asInstanceOf[T]
  }

  /** Drop all cached results (does not unpersist the underlying RDDs -
    * the caller owns that, e.g. via `sc.getPersistentRDDs`). */
  def clear(): Unit = synchronized { slot = null }
}
