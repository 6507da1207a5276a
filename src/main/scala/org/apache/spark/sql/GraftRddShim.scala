package org.apache.spark.sql

/** `df.unpersist()` only clears CacheManager entries; a frame produced
  * by `localCheckpoint()` is backed by a block-persisted RDD that
  * CacheManager never sees, so its blocks survive until the JVM GCs
  * the RDD reference and the async ContextCleaner notices. Iterative
  * algorithms that checkpoint per round (ConnectedComponents) would
  * otherwise stack one dead block set per iteration — memory pressure
  * whose GC pauses land on whatever query runs next. This shim digs
  * the underlying RDD out of the LogicalRDD leaf and unpersists it
  * eagerly. Lives in org.apache.spark.sql only for package access.
  */
object GraftRddShim {
  /** Release the block-store storage behind a checkpointed frame.
    * No-op for frames not backed by a LogicalRDD. The frame must not
    * be used again afterwards. */
  def releaseCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
