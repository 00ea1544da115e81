package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PackBuffer, PackWithLimit}

/** Property-style tests for the capped packer (SURVEY §5 plan):
  * driver-side lifecycle only — no Spark session — so hundreds of
  * random cases run cheaply. Seeded RNG keeps every run identical. */
class PackPropertySpec extends AnyFunSuite with Matchers {

  private val rng = new scala.util.Random(20260812L)

  private def randomItems(): Seq[Array[Byte]] =
    Seq.fill(rng.nextInt(30))(Array.fill(rng.nextInt(40))(7.toByte))

  private def fold(m: PackWithLimit, items: Seq[Array[Byte]]): PackBuffer =
    items.foldLeft(m.zero)(m.reduce)

  test("property: total never reaches the limit and matches the kept items") {
    (1 to 300).foreach { _ =>
      val items = randomItems()
      val limit = rng.nextInt(200) + 1L
      val b = fold(new PackWithLimit(limit), items)
      b.total should be < limit
      b.total shouldBe b.items.map(_.length.toLong).sum
    }
  }

  test("property: merge stays under the limit and preserves the left prefix") {
    (1 to 300).foreach { _ =>
      val l = randomItems()
      val r = randomItems()
      val limit = rng.nextInt(200) + 1L
      val m = new PackWithLimit(limit)
      val lb = fold(m, l)
      val merged = m.merge(lb, fold(m, r))
      merged.total should be < limit
      merged.items.take(lb.items.size).map(_.toSeq) shouldBe lb.items.map(_.toSeq)
    }
  }

  test("property: unbinding limit keeps everything, in order, across any split") {
    (1 to 300).foreach { _ =>
      val items = randomItems()
      val total = items.map(_.length.toLong).sum
      val m = new PackWithLimit(total + 1)
      fold(m, items).items.map(_.toSeq) shouldBe items.map(_.toSeq)
      val (a, c) = items.splitAt(if (items.isEmpty) 0 else rng.nextInt(items.size + 1))
      m.merge(fold(m, a), fold(m, c)).items.map(_.toSeq) shouldBe items.map(_.toSeq)
    }
  }
}
