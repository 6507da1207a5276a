package graft.tools

/** Dump a single query's result parquet + its oracle SQL for ad-hoc
  * comparison with tools/local_oracle.py. Usage:
  *   runMain graft.tools.VerifyOne <name> <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = graft.core.GraftSession("verify-one", 8)
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      val q = "\"" + sql.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        s"""{"$name": $q}""")
    }
    spark.stop()
  }
}
