package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmVector
import graft.streaming.Funnel

/** SURVEY.md §5.3 — scalacheck properties over the pure kernels (fast, no
  * Spark session) plus fixed algebraic identities. Generators are sampled
  * with a fixed seed (no scalatest-scalacheck bridge in the offline cache). */
class PropertiesSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(20)
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(p => f(p._1, p._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(p => f(p._1, p._2, p._3))

  private val words = Gen.nonEmptyListOf(
    Gen.oneOf("key", "agg", "row", "scan", "slow", "fast", "table", "value"))

  test("simhash is deterministic and permutation-sensitive only via votes") {
    forAll(words) { ws =>
      assert(LlmVector.simhash64(ws) == LlmVector.simhash64(ws))
      // simhash is bag-of-words: permutation must not change it
      assert(LlmVector.simhash64(ws) == LlmVector.simhash64(ws.reverse))
    }
  }

  test("hamming distance is a metric on signatures") {
    forAll(Gen.long, Gen.long, Gen.long) { (a, b, c) =>
      assert(LlmVector.hamming64(a, a) == 0)
      assert(LlmVector.hamming64(a, b) == LlmVector.hamming64(b, a))
      assert(LlmVector.hamming64(a, c) <=
        LlmVector.hamming64(a, b) + LlmVector.hamming64(b, c))
    }
  }

  test("cosine kernel: self-similarity 1, symmetry, bounded") {
    val vec = Gen.listOfN(8, Gen.choose(-10.0f, 10.0f))
      .suchThat(_.exists(_ != 0f)).map(_.toArray)
    forAll(vec, vec) { (a, b) =>
      assert(math.abs(LlmVector.cosine(a, a) - 1.0) < 1e-9)
      assert(LlmVector.cosine(a, b) == LlmVector.cosine(b, a)
        || (LlmVector.cosine(a, b) - LlmVector.cosine(b, a)).abs < 1e-12)
      val c = LlmVector.cosine(a, b)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("funnel state machine: counts are order-insensitive, clicks-before respects first purchase") {
    val ev = Gen.zip(Gen.oneOf("click", "view", "purchase"),
      Gen.choose(0L, 1000L))
    forAll(Gen.listOf(ev)) { evs =>
      val st = evs.foldLeft(Funnel.empty) { case (s, (t, es)) =>
        Funnel.update(s, t, es)
      }
      val (_, n, clicks, purchases, before, _, _) = Funnel.finish(1L, st)
      assert(n == evs.length)
      assert(clicks == evs.count(_._1 == "click"))
      assert(purchases == evs.count(_._1 == "purchase"))
      val firstP = evs.filter(_._1 == "purchase").map(_._2).minOption
      val expectedBefore = firstP match {
        case Some(fp) => evs.count(e => e._1 == "click" && e._2 < fp)
        case None => 0
      }
      assert(before == expectedBefore)
      // order-insensitivity (the merge-safety property a distributed
      // aggregate needs)
      val st2 = evs.reverse.foldLeft(Funnel.empty) { case (s, (t, es)) =>
        Funnel.update(s, t, es)
      }
      assert(Funnel.finish(1L, st2) == Funnel.finish(1L, st))
    }
  }

  test("hyperplane signs are deterministic ±1") {
    forAll(Gen.choose(0, 63), Gen.choose(0, 63)) { (p, d) =>
      val s = LlmVector.hyperplaneSign(p, d)
      assert(s == 1 || s == -1)
      assert(s == LlmVector.hyperplaneSign(p, d))
    }
  }
}
