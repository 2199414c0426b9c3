package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.build.TermLookup

class TermLookupSpec extends AnyFunSuite {

  private def mk(terms: Seq[String]): TermLookup = {
    val blob = terms.mkString("").getBytes("UTF-8")
    val offsets = terms.scanLeft(0)(_ + _.length).toArray
    new TermLookup(blob, offsets)
  }

  test("every stored term resolves to its position; absent terms to -1") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    val terms = (0 until 50000).map { i =>
      val len = 1 + rnd.nextInt(12)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString + i
    }.distinct.sorted
    val lk = mk(terms)
    assert(lk.numTerms == terms.length)
    terms.zipWithIndex.foreach { case (t, i) =>
      assert(lk.id(t) == i, s"term $t")
      assert(lk.term(i) == t)
    }
    assert(lk.id("notaterm!") == -1)
    assert(lk.id("") == -1)
    assert(lk.id(terms.head + "x") == -1)
  }

  test("survives java serialization and rebuilds its table") {
    val terms = Seq("a", "ab", "b", "zz9")
    val lk = mk(terms)
    val bo = new java.io.ByteArrayOutputStream()
    val oo = new java.io.ObjectOutputStream(bo)
    oo.writeObject(lk); oo.close()
    val lk2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bo.toByteArray))
      .readObject().asInstanceOf[TermLookup]
    terms.zipWithIndex.foreach { case (t, i) => assert(lk2.id(t) == i) }
    assert(lk2.id("c") == -1)
  }

  test("fromChunks reassembles contiguous partitions in any order") {
    val terms = ('a' to 'z').map(_.toString)
    def chunk(ids: Range): (Int, Int, Array[Byte], Array[Int]) = {
      val ts = ids.map(terms)
      (ids.head, ids.length, ts.mkString("").getBytes("UTF-8"),
       ts.map(_.length).toArray)
    }
    val lk = TermLookup.fromChunks(
      Array(chunk(10 until 26), chunk(0 until 3), chunk(3 until 10)))
    assert(lk.numTerms == 26)
    terms.zipWithIndex.foreach { case (t, i) => assert(lk.id(t) == i) }
    val bad = intercept[IllegalArgumentException] {
      TermLookup.fromChunks(Array(chunk(0 until 3), chunk(5 until 10)))
    }
    assert(bad.getMessage.contains("contiguous"))
  }
}
