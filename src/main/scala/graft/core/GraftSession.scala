package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for tests and standalone mains.
  *
  * Mirrors the settings the reference fixes at
  * `src/spark/jobs/spark_stream_processor.py:35-43` (graceful shutdown,
  * explicit shuffle parallelism) but scaled for the target: AQE on,
  * shuffle partitions sized to cores instead of the reference's
  * hard-coded 2, ANSI off for arithmetic parity with the reference's
  * Spark 3.4 defaults (division-by-zero -> null, lenient casts), and a
  * UTC session timezone so timestamp semantics match the DuckDB oracle.
  */
object GraftSession {
  def apply(appName: String = "graft", cores: Int = Runtime.getRuntime.availableProcessors(),
            rocksDbState: Boolean = false): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.streaming.stopGracefullyOnShutdown", "true")
      .config("spark.ui.enabled", "false")
      // Round-16 optimization (guide §6 input split size): the split
      // planner floors split size at openCostInBytes (default 4 MB),
      // so a single multi-MB parquet file fans out to only a handful
      // of scan tasks however many cores are idle (q193's whole cost
      // was ONE 3-task stage on 32 cores). 1 MB reflects the actual
      // open cost on local/NVMe storage; the formula's bytes-per-core
      // term (totalBytes / defaultParallelism) still governs at any
      // real scale, where files are 100 MB+ and maxPartitionBytes is
      // the binding cap — so this floors small-file scans scale-
      // adaptively instead of at a constant 4 MB. Overridable for
      // slow-seek deployments via SPARK_GRAFT_OPENCOST.
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPENCOST", "1048576"))
    // long-running streaming state at scale: RocksDB keeps state off
    // the executor heap and incremental-checkpoints (SURVEY §7
    // known-hard #5); the HDFS-backed default is fine for tests
    val withState = if (rocksDbState)
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    else b
    val spark = withState.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
