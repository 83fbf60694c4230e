package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Test-only accessor for the session's CacheManager (the [[TestBus]]
  * pattern for `private[sql]` state): lets the memo-lifecycle sweep
  * assert ZERO DataFrame-level caches survive `Dedup.clearCaches()` —
  * the runtime face of the "no bare .persist() in src/main" rule.
  * Lives under `org.apache.spark.sql` for package-private visibility —
  * test classpath only, never shipped with the library.
  */
object TestCache {
  private def cm(s: SparkSession) =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager

  /** True iff no DataFrame/Dataset cache is registered. localCheckpoint
    * RDD persists are NOT CacheManager entries and don't count. */
  def isEmpty(s: SparkSession): Boolean = cm(s).isEmpty

  /** Drop every registered cache — the sweep's clean-slate baseline
    * (suite order must not leave another spec's caches behind). */
  def clearAll(s: SparkSession): Unit = cm(s).clearCache()
}
