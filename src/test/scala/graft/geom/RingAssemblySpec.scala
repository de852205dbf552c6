package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** The reference's unit table, replicated case-for-case from
  * /root/reference/simplify/simplify_test.go:8-155.
  */
class RingAssemblySpec extends AnyFunSuite {
  private def r(in: Seq[Seq[Long]]) = RingAssembly.reduce(in)

  test("single coord NOOP") {
    assert(r(Seq(Seq(1L))) == Seq(Seq(1L)))
  }
  test("merges lines") {
    assert(r(Seq(Seq(1L, 2L), Seq(2L, 3L))) == Seq(Seq(1L, 2L, 3L)))
  }
  test("remove empty") {
    assert(r(Seq(Seq(), Seq(1L, 2L), Seq(), Seq(2L, 3L), Seq())) == Seq(Seq(1L, 2L, 3L)))
  }
  test("preserve bodies") {
    assert(r(Seq(Seq(1L, 2L, 3L), Seq(3L, 4L, 5L))) == Seq(Seq(1L, 2L, 3L, 4L, 5L)))
  }
  test("merge multiple") {
    assert(r(Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(3L, 4L))) == Seq(Seq(1L, 2L, 3L, 4L)))
  }
  test("merge order") {
    assert(r(Seq(Seq(2L, 3L), Seq(3L, 4L), Seq(1L, 2L))) == Seq(Seq(1L, 2L, 3L, 4L)))
  }
  test("merge circular") {
    assert(r(Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(3L, 1L))) == Seq(Seq(1L, 2L, 3L, 1L)))
  }
  test("inverted") {
    assert(r(Seq(Seq(1L, 2L), Seq(3L, 2L), Seq(3L, 4L))) == Seq(Seq(1L, 2L, 3L, 4L)))
  }
  test("inverted bodies") {
    assert(r(Seq(Seq(1L, 2L, 3L), Seq(5L, 4L, 3L), Seq(5L, 6L, 7L))) ==
      Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)))
  }
  test("separate") {
    assert(r(Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(4L, 5L), Seq(5L, 6L))) ==
      Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
  }
  test("start-start merge") {
    assert(r(Seq(Seq(1L, 2L, 3L), Seq(1L, 4L, 5L))) == Seq(Seq(5L, 4L, 1L, 2L, 3L)))
  }
}

class RingAssemblyProps extends AnyFunSuite {

  /** A closed ring split into random consecutive chunks, randomly reversed
    * and shuffled, must always reassemble into a single closed ring with
    * the same undirected edge multiset (permutation/orientation invariance
    * — the generalization of the reference's MergeOrder/Inverted cases).
    */
  test("property: shuffled reversed ring chunks reassemble to one closed ring") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = 4 + rnd.nextInt(27)
      val ring = (0L until n.toLong) :+ 0L
      val cutCount = 1 + rnd.nextInt(math.min(6, n - 1))
      val cuts = rnd.shuffle((1 until n).toList).take(cutCount)
      val sorted = (0 +: cuts.sorted :+ n).distinct
      val chunks = sorted.sliding(2).map { case Seq(a, b) => ring.slice(a, b + 1).toSeq }.toSeq
      val flipped = chunks.map(c => if (rnd.nextBoolean()) c.reverse else c)
      val shuffled = rnd.shuffle(flipped)

      val out = RingAssembly.reduce(shuffled)
      assert(out.length == 1, s"expected single ring from $shuffled, got $out")
      val m = out.head
      assert(m.head == m.last, s"not closed: $m")
      def edges(s: Seq[Long]) = s.sliding(2).map { case Seq(a, b) => (math.min(a, b), math.max(a, b)) }.toSeq.sorted
      assert(edges(m) == shuffled.flatMap(c => edges(c)).sorted)
    }
  }
}
