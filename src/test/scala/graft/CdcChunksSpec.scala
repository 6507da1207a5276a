package graft

import org.apache.spark.sql.functions._

import graft.functions.CdcChunks

/** Content-defined chunking invariants: lossless, bounded, and —
  * the property fixed-size chunking lacks — boundary stability under
  * early edits (chunk-level dedup between document versions). */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(texts: Seq[String], min: Int = 32, max: Int = 256): Seq[Seq[String]] = {
    texts.toDF("text")
      .select(CdcChunks.column(col("text"), minSize = min, maxSize = max).as("c"))
      .as[Seq[String]].collect().toSeq
  }

  private def doc(n: Int, seed: Int): String = {
    // LCG-mixed content: aperiodic, so the 16-byte windows actually
    // vary (periodic text can degenerate to max-size-only cuts)
    var x = seed.toLong * 2654435761L + 11
    (0 until n).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ('a' + (((x >>> 33) % 26).toInt.abs)).toChar
    }.mkString
  }

  test("concat(chunks) == document; sizes within [min, max+3] except last") {
    val texts = Seq(doc(2000, 1), doc(50, 2), "short", "", "ü" * 300)
    chunksOf(texts).zip(texts).foreach { case (cs, t) =>
      assert(cs.mkString == t, "lossless")
      if (cs.nonEmpty) cs.init.foreach { c =>
        val b = c.getBytes("UTF-8").length
        // max may be exceeded by <=3 bytes when the cut snaps forward
        // to the next UTF-8 codepoint start
        assert(b >= 32 && b <= 256 + 3, s"chunk size $b out of bounds")
      }
    }
  }

  test("edit-stability: early insertion leaves later chunks identical") {
    val base = doc(4000, 3)
    val edited = base.substring(0, 10) + "INSERTED-TEXT" + base.substring(10)
    val Seq(a, b) = chunksOf(Seq(base, edited))
    // after resynchronization the chunk streams must share a long
    // common suffix — fixed-size chunking would shift EVERY boundary
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
    assert(common >= a.size / 2, s"only $common of ${a.size} trailing chunks stable")
    assert(a.mkString == base && b.mkString == edited)
  }

  test("deterministic and codegen == interpreted") {
    val t = Seq(doc(1500, 4)).toDF("text")
    val viaPlan = t.select(CdcChunks.column(col("text")).as("c")).as[Seq[String]].head()
    val direct = {
      val arr = CdcChunks.eval(
        org.apache.spark.unsafe.types.UTF8String.fromString(doc(1500, 4)), 16, 64, 32, 256)
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    assert(viaPlan == direct)
  }
}
