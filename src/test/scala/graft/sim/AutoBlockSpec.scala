package graft.sim

/** Unit pins for [[AutoBlock.resolveCells]] — the auto-K derivation
  * that became the default for every embedding API in round 7 (gates
  * pin numCells = 16, so the derivation needs its own coverage; the
  * K > 1 auto REGIME is exercised end-to-end by DedupStressSpec's
  * auto-K run over the 23k-vector corpus). */
class AutoBlockSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("explicit positive numCells wins, count never evaluated") {
    // by-name count: an explicit K must not trigger the count job
    var evaluated = false
    assert(AutoBlock.resolveCells(16, { evaluated = true; 1000000L }) == 16)
    assert(!evaluated, "explicit numCells must not evaluate the corpus count")
  }

  test("auto-K is ceil(n / targetCellSize), clamped to [1, maxAutoCells]") {
    val t = AutoBlock.targetCellSize
    assert(AutoBlock.resolveCells(0, 0L) == 1, "empty corpus -> 1 cell")
    assert(AutoBlock.resolveCells(0, 1L) == 1)
    assert(AutoBlock.resolveCells(0, t) == 1, "exactly one target cell")
    assert(AutoBlock.resolveCells(0, t + 1) == 2, "ceil, not floor")
    assert(AutoBlock.resolveCells(0, 10 * t) == 10)
    assert(AutoBlock.resolveCells(0, 23000L) ==
      ((23000L + t - 1) / t).toInt, "the stress-corpus K")
    // the clamp: a 100 TB corpus must not produce a quadratic-driver K
    assert(AutoBlock.resolveCells(0, Long.MaxValue / 4) == AutoBlock.maxAutoCells)
    assert(AutoBlock.resolveCells(0,
      AutoBlock.maxAutoCells.toLong * t + 1) == AutoBlock.maxAutoCells)
  }

  test("negative numCells is rejected") {
    val e = intercept[IllegalArgumentException] { AutoBlock.resolveCells(-1, 0L) }
    assert(e.getMessage.contains(">= 0"))
  }
}
