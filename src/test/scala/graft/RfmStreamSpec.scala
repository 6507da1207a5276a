package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Rfm
import graft.streaming.StreamPipeline

/** rfmMaintain: the maintained per-user (last_day, frequency,
  * monetary) store must serve q189's segments BIT-IDENTICAL to a
  * batch rebuild — the state is max/sum/decimal-sum, fully
  * order-insensitive, so a shuffled split must converge too. */
class RfmStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def served(store: String) =
    Rfm.segment(spark.read.parquet(store)).collect().map(_.toSeq).toSet

  private def declared() =
    SparkEntry.queries("q189_rfm")(spark, dir).collect().map(_.toSeq).toSet

  test("3-way modulo (interleaved) split serves declared q189 exactly") {
    val ev = graft.core.Tables.events(spark, dir)
    val p = Files.createTempDirectory("graft_rfm3").toString + "/st"
    (0 until 3).foreach { r =>
      StreamPipeline.rfmBatch(ev.filter(col("event_id") % 3 === r), p, r.toLong)
    }
    assert(served(p) == declared(), "maintained RFM must equal declared q189 bitwise")
  }

  test("5-way hash-shuffled split converges identically; replay is a no-op") {
    val ev = graft.core.Tables.events(spark, dir)
    val p = Files.createTempDirectory("graft_rfm5").toString + "/st"
    (0 until 5).foreach { r =>
      StreamPipeline.rfmBatch(ev.filter(pmod(xxhash64(col("event_id")), lit(5)) === r), p, r.toLong)
    }
    assert(served(p) == declared())
    val before = spark.read.parquet(p).collect().toSet
    StreamPipeline.rfmBatch(ev.filter(pmod(xxhash64(col("event_id")), lit(5)) === 4), p, 4L)
    assert(spark.read.parquet(p).collect().toSet == before, "marker replay must be a no-op")
  }
}
