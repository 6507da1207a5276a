package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeTrain

/** BPE training: hand-computed merge sequences on toy corpora,
  * reference merge semantics on repeated adjacent pairs, and the
  * trained tokenizer actually compressing real text. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge order and tiebreaks match the hand computation") {
    // words: aa x2, ab x1
    // step 1: pairs (a,a):2 (a,</w>):2 (a,b):1 (b,</w>):1 — count tie
    //         broken lexicographically: "</w>" < "a", so (a, </w>)
    // step 2: (a, a</w>):2
    // step 3: (a,b):1 vs (b,</w>):1 — "a" < "b", so (a, b)
    val docs = Seq("aa aa ab").toDF("text")
    val got = BpeTrain.train(spark, docs, col("text"), merges = 3)
      .orderBy("step")
      .select("step", "sym_a", "sym_b", "pair_n")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "</w>", 2L), (2L, "a", "a</w>", 2L), (3L, "a", "b", 1L)),
      s"merge sequence diverged: $got")
  }

  test("repeated adjacent pairs all merge in one pass (reference BPE semantics)") {
    // "ananan" = a n a n a n </w>: merging (a,n) must produce
    // an an an </w> (4 tokens) in ONE pass — a single-space replace
    // would consume shared boundary spaces and leave 5
    val n = Seq("ananan").toDF("w")
      .select(BpeTrain.applyMerges(col("w"), Seq(("a", "n"))).as("n"))
      .as[Int].head()
    assert(n == 4, s"expected 4 tokens after merging (a,n) in 'ananan', got $n")
  }

  test("driver and DataFrame training regimes produce identical merge sequences") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def run(gate: Long) = BpeTrain.train(spark, docs, col("text"), merges = 6, driverMaxTypes = gate)
      .orderBy("step").select("step", "sym_a", "sym_b", "pair_n")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(run(1000000L) == run(0L), "regime choice must be invisible to the learned merges")
    // a gate beyond Int range must clamp, not overflow limit() into a
    // negative-argument AnalysisException
    assert(run(Long.MaxValue) == run(0L), "oversized gate clamps to largest collectable")
  }

  test("trained merges compress real text and apply deterministically") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = BpeTrain.train(spark, docs, col("text"), merges = 8)
      .orderBy("step").select("sym_a", "sym_b").as[(String, String)].collect().toSeq
    assert(merges.size == 8)
    val words = BpeTrain.wordTypes(docs, col("text"))
    val counts = words.select(
      sum(col("wn") * (length(col("w")) + 1)).as("chars"),
      sum(col("wn") * BpeTrain.applyMerges(col("w"), merges)).as("bpe"))
      .as[(Long, Long)].head()
    assert(counts._2 < counts._1,
      s"8 merges must shrink the corpus token count: ${counts._2} !< ${counts._1}")
    // merge list is data-derived and total-ordered -> retraining on a
    // different partition layout cannot change it
    val again = BpeTrain.train(spark, docs.repartition(7), col("text"), merges = 8)
      .orderBy("step").select("sym_a", "sym_b").as[(String, String)].collect().toSeq
    assert(again == merges, "training must be partition-invariant")
  }
}
