package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ingest.Tokenize

/** Pins the allocation-free scanners (`countTokens`, char-scan
  * `termFreqs`) to the reference tokenizer `tokens` (lowercase +
  * split [^a-z0-9]+ — the contract every DuckDB oracle mirrors),
  * over ASCII, mixed-unicode, and adversarial-edge inputs. */
class TokenizeSpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], cases: Int = 400)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    for (i <- 0 until cases) {
      val seed = org.scalacheck.rng.Seed(7000L + i)
      body(gen.pureApply(params, seed))
    }
  }

  /** The pre-optimization implementations, kept as the executable spec. */
  private def refCount(text: String): Int = Tokenize.tokens(text).length
  private def refTermFreqs(text: String): Array[(String, Int)] = {
    val m = new java.util.HashMap[String, Int]()
    Tokenize.tokens(text).foreach(t => m.merge(t, 1, (a: Int, b: Int) => a + b))
    val out = new Array[(String, Int)](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(out, (a: (String, Int), b: (String, Int)) => a._1 < b._1)
    out
  }

  private val asciiGen: Gen[String] = for {
    n <- Gen.choose(0, 300)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('.', ',', '-', '_', '!', '<', '>'),
      1 -> Gen.choose(0.toChar, 127.toChar)))
  } yield cs.mkString

  private val unicodeGen: Gen[String] = for {
    n <- Gen.choose(0, 120)
    cs <- Gen.listOfN(n, Gen.frequency(
      4 -> Gen.alphaNumChar, 1 -> Gen.const(' '),
      2 -> Gen.choose(128.toChar, 0x2FFF.toChar),
      1 -> Gen.oneOf('İ', 'K', 'ß', 'À', 'Ａ')))
  } yield cs.mkString

  private val edges = Seq(
    "", " ", "a", "A", "0", "...", "a b", "  a  ", "a1B2c3", "-a-", "a-",
    "-a", "İ", "aİb", "İİ", "aKb", "ß", "ÀÈ", "ａｂ", "aİİb",
    "KKx", "ends with token x", "UPPER lower 123")

  test("countTokens == tokens().length (ascii, unicode, edges)") {
    edges.foreach(s => assert(Tokenize.countTokens(s) == refCount(s), s"input: ${s}"))
    forAll(asciiGen)(s => assert(Tokenize.countTokens(s) == refCount(s), s"input: ${s}"))
    forAll(unicodeGen)(s => assert(Tokenize.countTokens(s) == refCount(s), s"input: ${s}"))
  }

  test("char-scan termFreqs == reference termFreqs (ascii, unicode, edges)") {
    def check(s: String): Unit = {
      val got = Tokenize.termFreqs(s).toSeq
      val want = refTermFreqs(s).toSeq
      assert(got == want, s"input: ${s}")
    }
    edges.foreach(check)
    forAll(asciiGen)(check)
    forAll(unicodeGen)(check)
  }
}
