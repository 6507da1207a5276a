package graft.tools

/** VerifyOne's batch sibling: dump SEVERAL queries' result parquet +
  * one combined oracle_sql.json in a single JVM (iterating new
  * queries against tools/local_oracle.py without paying a Spark
  * startup per query). Usage:
  *   runMain graft.tools.VerifyMany <name1,name2,...> <sfDir> <outDir>
  */
object VerifyMany {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val spark = graft.core.GraftSession("verify-many", 16)
    val list = names.split(",").map(_.trim).filter(_.nonEmpty)
    list.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache() // caller-owned persists (phraseVocab et al.)
    }
    def esc(sql: String): String = "\"" + sql.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val entries = list.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(sql => s""""$n": ${esc(sql)}"""))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      entries.mkString("{", ", ", "}"))
    spark.stop()
  }
}
