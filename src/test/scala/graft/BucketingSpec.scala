package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val li = graft.core.Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
    val o = graft.core.Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", buckets = 4)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", buckets = 4)

    // force the merge-join path (tiny test tables would otherwise
    // broadcast — the right call at this size, but not what we're
    // pinning here)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // correctness: same row count as the plain join
      val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() == expected)

      // an aggregation on the bucket key also skips the exchange
      val agg = spark.table("li_bucketed").groupBy($"l_orderkey").agg(sum($"l_quantity"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("ShuffleExchange") && !aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed groupBy on the bucket key must not shuffle:\n$aggPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
