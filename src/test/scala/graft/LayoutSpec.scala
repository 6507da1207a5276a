package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order layout: the write-time clustering that buys read-time
  * min/max pruning on EVERY interleaved dimension. The spec measures
  * the property that matters: how many of the 16 layout buckets a
  * single-dimension point predicate can touch, under z-order vs a
  * linear sort. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave_bits places bit j of each input at positions 2j / 2j+1") {
    assert(ZOrder.eval(0L, 0L) == 0L)
    assert(ZOrder.eval(1L, 0L) == 1L)            // a bit 0 -> z bit 0
    assert(ZOrder.eval(0L, 1L) == 2L)            // b bit 0 -> z bit 1
    assert(ZOrder.eval(3L, 3L) == 15L)           // 11 x 11 -> 1111
    assert(ZOrder.eval(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrder.eval(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // expression path == static eval
    val viaExpr = Seq((5L, 9L)).toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b")).as[Long].head()
    assert(viaExpr == ZOrder.eval(5L, 9L))
    // zvalueN at n=2 reproduces eval's bit layout on the 10-bit grid
    val via2 = Seq((5L, 9L)).toDF("a", "b")
      .select(ZOrder.zvalueN(Seq($"a", $"b"))).as[Long].head()
    assert(via2 == ZOrder.eval(5L, 9L), "n=2 Morton layout must match the pairwise curve")
  }

  test("z-order buckets prune single-dimension predicates that a linear sort cannot") {
    val li = graft.core.Tables.lineitem(spark, sf("sf0.01"))
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val mx = li.agg(max($"l_partkey").as("mp"), max($"l_suppkey").as("ms")).head()
    val (mp, ms) = (mx.getLong(0), mx.getLong(1))
    def bboxes(ordered: org.apache.spark.sql.DataFrame) = ordered
      .withColumn("bucket", ntile(16).over(
        org.apache.spark.sql.expressions.Window.orderBy($"k", $"l_orderkey", $"l_linenumber")))
      .groupBy($"bucket")
      .agg(min($"l_partkey").as("p0"), max($"l_partkey").as("p1"),
        min($"l_suppkey").as("s0"), max($"l_suppkey").as("s1"))
      .collect()
    val zb = bboxes(li.withColumn("k", ZOrder.zvalue(
      ($"l_partkey" * 1024) / lit(mp + 1) cast "long", ($"l_suppkey" * 1024) / lit(ms + 1) cast "long")))
    val lb = bboxes(li.withColumn("k", $"l_partkey"))
    // a point predicate on suppkey touches a bucket iff the value is
    // inside its [s0, s1] box; average the touch count over a spread
    // of probe values
    def touched(bx: Array[org.apache.spark.sql.Row], lo: String, hi: String, v: Long) =
      bx.count(r => r.getAs[Long](lo) <= v && v <= r.getAs[Long](hi))
    val probes = Seq(10L, 30L, 50L, 70L, 90L)
    val zTouch = probes.map(v => touched(zb, "s0", "s1", v)).sum.toDouble / probes.size
    val lTouch = probes.map(v => touched(lb, "s0", "s1", v)).sum.toDouble / probes.size
    assert(lTouch >= 15.0, s"linear layout should span suppkey everywhere, touched $lTouch/16")
    assert(zTouch <= 8.0, s"z-order should bound suppkey per bucket, touched $zTouch/16")
    // and partkey pruning survives (z sacrifices at most 4x vs perfect)
    val pProbes = Seq(100L, 500L, 900L, 1300L, 1700L)
    val zp = pProbes.map(v => touched(zb, "p0", "p1", v)).sum.toDouble / pProbes.size
    assert(zp <= 8.0, s"z-order partkey pruning lost, touched $zp/16")
  }

  test("ZOrder.cluster range-partitions by the curve (file-level boxes match the audit)") {
    val li = graft.core.Tables.lineitem(spark, sf("sf0.01"))
    val clustered = ZOrder.cluster(li, col("l_partkey"), col("l_suppkey"), numFiles = 8)
    // each output partition must hold a contiguous z-range IN THE
    // NORMALIZED curve cluster() actually partitions by: recompute it
    // from the same per-column bounds
    val bounds = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val parts = clustered
      .withColumn("z", ZOrder.zvalue(
        ZOrder.normalized(col("l_partkey"), bounds.getLong(0), bounds.getLong(1)),
        ZOrder.normalized(col("l_suppkey"), bounds.getLong(2), bounds.getLong(3))))
      .withColumn("pid", spark_partition_id())
      .groupBy($"pid").agg(min($"z").as("z0"), max($"z").as("z1"), count(lit(1)).as("n"))
      .collect().sortBy(_.getAs[Long]("z0"))
    assert(parts.map(_.getAs[Long]("n")).sum == li.count())
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("z1") <= b.getAs[Long]("z0"),
        "partitions overlap in z — range partitioning broken")
      case _ =>
    }
  }
}
