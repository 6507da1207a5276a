package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants (SURVEY.md §5.4) for the pure building
  * blocks — no SparkSession needed, so thousands of cases are cheap.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("rolling hash: codegen helper == reference fold, for arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val want = s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * RollingHash.Base + (b & 0xff)) % RollingHash.Mod)
      RollingHash.eval(UTF8String.fromString(s)) == want
    })
  }

  test("rolling hash is prefix-sensitive: h(a+c) != h(b+c) whenever h(a) != h(b)") {
    val gen = for {
      a <- Gen.alphaNumStr; b <- Gen.alphaNumStr; c <- Gen.alphaNumStr
    } yield (a, b, c)
    check(Prop.forAll(gen) { case (a, b, c) =>
      val (ha, hb) = (RollingHash.eval(UTF8String.fromString(a)), RollingHash.eval(UTF8String.fromString(b)))
      // equal-length prefixes with different hashes keep differing after
      // appending the same suffix (polynomial hash is injective per step
      // modulo collisions in the multiplier chain)
      (a.length != b.length || ha == hb) ||
        RollingHash.eval(UTF8String.fromString(a + c)) != RollingHash.eval(UTF8String.fromString(b + c))
    })
  }

  test("sliding-window assignment: every event lands in exactly duration/slide windows") {
    val gen = for {
      epoch <- Gen.chooseNum(0L, 4102444800L) // through 2100
      micro <- Gen.chooseNum(0L, 999999L)
      grid <- Gen.oneOf((900, 300), (3600, 600))
    } yield (epoch, micro, grid)
    check(Prop.forAll(gen) { case (epoch, micro, (dur, slide)) =>
      val tUs = epoch * 1000000L + micro
      // the engine/oracle formula: starts at floor-to-slide minus k*slide
      val starts = (0 until dur / slide).map { k =>
        (tUs / 1000000L) - ((tUs / 1000000L) % slide) - k.toLong * slide
      }
      starts.distinct.size == dur / slide &&
        starts.forall(ws => ws * 1000000L <= tUs && tUs < (ws + dur) * 1000000L) &&
        starts.forall(_ % slide == 0)
    })
  }

  test("jaccard bounds and identity on token sets") {
    val gen = for {
      a <- Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
      b <- Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
    } yield (a.toSet, b.toSet)
    check(Prop.forAll(gen) { case (a, b) =>
      def j(x: Set[String], y: Set[String]): Double =
        if (x.isEmpty && y.isEmpty) Double.NaN
        else x.intersect(y).size.toDouble / (x.size + y.size - x.intersect(y).size)
      val v = j(a, b)
      (a.isEmpty && b.isEmpty) || (v >= 0.0 && v <= 1.0 && (a != b || v == 1.0))
    })
  }

  test("change_percent wire format round-trips") {
    check(Prop.forAll(Gen.chooseNum(-99999L, 99999L)) { cents =>
      val pct = cents.toDouble / 100
      val wire = s"$pct%"
      wire.stripSuffix("%").toDouble == pct
    })
  }

  test("CDC chunks: lossless and codepoint-safe for arbitrary unicode") {
    // mixed ASCII / 2-byte / 3-byte / 4-byte codepoints — the cut
    // snapping must never split a codepoint, and concat must restore
    // the document byte-for-byte
    val uniChar = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "),
      Gen.const("é"), Gen.const("ü"), Gen.const("中"), Gen.const("🙂"), Gen.const("𝔘"))
    val uniStr = Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, uniChar).map(_.mkString))
    check(Prop.forAll(uniStr) { s =>
      val arr = graft.functions.CdcChunks.eval(UTF8String.fromString(s), 8, 16, 12, 64)
      val chunks = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      val lossless = chunks.mkString == s
      val bounded = chunks.dropRight(1).forall { c =>
        val b = c.getBytes("UTF-8").length; b >= 12 && b <= 64 + 3
      }
      lossless && bounded
    })
  }

  test("CDC chunks: boundaries resynchronize after an edit (suffix stability)") {
    val word = Gen.chooseNum(0, 999999).map(n => s"w$n")
    val gen = for {
      ws <- Gen.listOfN(150, word)
      ins <- Gen.alphaNumStr
    } yield (ws.mkString(" "), ins)
    check(Prop.forAll(gen) { case (base, ins) =>
      val edited = ins + base
      def chunks(s: String) = {
        val a = graft.functions.CdcChunks.eval(UTF8String.fromString(s), 16, 32, 24, 512)
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }
      val (a, b) = (chunks(base), chunks(edited))
      // a common trailing chunk exists once both streams pass a shared
      // content-defined cut — guaranteed here because content cuts
      // occur well before the 512-byte cap on 1k-char docs
      a.isEmpty || b.isEmpty || a.last == b.last || a.mkString.length < 600
    })
  }
}
