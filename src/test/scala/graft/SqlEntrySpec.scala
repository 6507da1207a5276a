package graft

import graft.queries.SqlEntry

/** SURVEY §3.3(b): the SQL-text surface must produce EXACTLY the
  * typed API's rows — same op sequence, same rounding — for each
  * covered query. exceptAll both ways is a bitwise row-multiset
  * comparison (doubles compare by value; an ulp of drift fails). */
class SqlEntrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  for (name <- SqlEntry.texts.keys.toSeq.sorted)
    test(s"$name: spark.sql text matches the typed DataFrame API") {
      SqlEntry.registerViews(spark, dir)
      val typed = SparkEntry.queries(name)(spark, dir)
      val sql = SqlEntry.sql(spark, name).select(typed.columns.map(org.apache.spark.sql.functions.col): _*)
      assert(typed.count() == sql.count() && typed.count() > 0)
      assert(typed.exceptAll(sql).isEmpty && sql.exceptAll(typed).isEmpty,
        s"$name: SQL-text result differs from typed API result")
    }
}
