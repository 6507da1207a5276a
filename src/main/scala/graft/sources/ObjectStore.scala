package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Object-store glue: the data-presence gate (S14,
  * check_minio_file.py:47-75) and S3A session wiring (S15,
  * spark_stream_processor.py:45-53).
  */
object ObjectStore {

  /** True iff `path` exists and contains at least one file — the
    * Airflow gate's semantics (exit 1 on empty) without listing every
    * object to the driver. */
  def hasData(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) found = it.next().getLen > 0
      found
    }
  }

  /** S3A endpoint/credential wiring, applied at the session (the
    * reference sets the same four keys on hadoopConfiguration).
    * Credentials should come from the environment/instance profile in
    * production — parameters exist for parity with the reference's
    * explicit-key mode. */
  def configureS3A(spark: SparkSession, endpoint: String, accessKey: String, secretKey: String,
                   pathStyle: Boolean = true, ssl: Boolean = false): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.endpoint", endpoint)
    c.set("fs.s3a.access.key", accessKey)
    c.set("fs.s3a.secret.key", secretKey)
    c.set("fs.s3a.path.style.access", pathStyle.toString)
    c.set("fs.s3a.connection.ssl.enabled", ssl.toString)
  }
}
