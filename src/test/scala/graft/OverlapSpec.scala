package graft

import org.scalatest.funsuite.AnyFunSuite

/** The concurrency helper behind the view refreshes' overlapped term
  * builds (round-20 optimization): results must come back in INPUT
  * order regardless of completion order (the published union plan must
  * be byte-identical to the sequential build), failures must propagate
  * unwrapped, and empty/singleton inputs must not spawn threads. */
class OverlapSpec extends AnyFunSuite {

  private val overlap = graft.sources.Overlap

  test("results return in input order even when later items finish first") {
    val out = overlap.map(Seq(40, 1, 20, 2), parallelism = 4) { ms =>
      Thread.sleep(ms.toLong); ms * 10
    }
    assert(out == Seq(400, 10, 200, 20))
  }

  test("the original exception propagates, not ExecutionException") {
    val boom = intercept[IllegalStateException] {
      overlap.map(Seq(1, 2, 3)) { i =>
        if (i == 2) throw new IllegalStateException("term build failed")
        i
      }
    }
    assert(boom.getMessage == "term build failed")
  }

  test("singleton and empty inputs run inline") {
    val t = Thread.currentThread().getId
    assert(overlap.map(Seq(7))(_ => Thread.currentThread().getId) == Seq(t))
    assert(overlap.map(Seq.empty[Int])(identity).isEmpty)
  }

  test("flatMap preserves per-item order and flattens in input order") {
    val out = overlap.flatMap(Seq(3, 1, 2), parallelism = 3) { i =>
      Thread.sleep(i * 10L); Seq(i, i * 100)
    }
    assert(out == Seq(3, 300, 1, 100, 2, 200))
  }
}
