package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Hilbert curve's defining invariants, proven with the spec-local
  * inverse transform (never used on a query path): unit-step adjacency,
  * bijectivity, and round-trip exactness. */
class HilbertSpec extends AnyFunSuite {

  test("consecutive curve positions are Manhattan-1 neighbors (the locality " +
       "property Z-order lacks)") {
    var d = 0L
    val (steps, stride) = (100000, 40009L) // prime stride sweeps the range
    var i = 0
    while (i < steps) {
      val (x1, y1) = Hilbert.inverse(d)
      val (x2, y2) = Hilbert.inverse(d + 1)
      val manhattan = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(manhattan === 1L, s"jump at d=$d: ($x1,$y1)->($x2,$y2)")
      d = (d + stride) % (Hilbert.N * Hilbert.N - 1)
      i += 1
    }
  }

  test("index/inverse round-trip is exact across the range") {
    var d = 0L
    for (_ <- 0 until 100000) {
      val (x, y) = Hilbert.inverse(d)
      assert(Hilbert.index(x, y) === d, s"round-trip broke at d=$d ($x,$y)")
      d = (d + 42697L) % (Hilbert.N * Hilbert.N)
    }
    // corners of the grid
    for ((x, y) <- Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))) {
      val d0 = Hilbert.index(x, y)
      assert(Hilbert.inverse(d0) === ((x, y)))
    }
  }

  test("bijective on a full 256-cell subsquare; inputs masked to 16 bits") {
    val seen = collection.mutable.Set.empty[Long]
    for (x <- 0L until 16L; y <- 0L until 16L) {
      val d = Hilbert.index(x, y)
      assert(seen.add(d), s"collision at ($x,$y)")
    }
    assert(Hilbert.index(65536L + 7, 131072L + 9) === Hilbert.index(7, 9),
      "high bits must be masked, not wrapped into the curve")
  }

  test("a curve range is a tighter bounding box than the same-length Z range") {
    // 4096 consecutive Hilbert positions tile exactly one 64x64 square
    // (area 4096); the same-length Z-order run starting mid-quadrant can
    // span a far larger box. This is the file-skipping payoff in numbers.
    val start = Hilbert.index(12345L, 54321L) / 4096 * 4096
    var (minX, maxX, minY, maxY) = (Long.MaxValue, 0L, Long.MaxValue, 0L)
    for (d <- start until start + 4096) {
      val (x, y) = Hilbert.inverse(d)
      minX = math.min(minX, x); maxX = math.max(maxX, x)
      minY = math.min(minY, y); maxY = math.max(maxY, y)
    }
    val area = (maxX - minX + 1) * (maxY - minY + 1)
    assert(area === 4096L,
      s"an aligned 4096-run must tile one 64x64 square, got box area $area")
  }
}
