package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class AsapSpec extends AnyFunSuite {

  test("sma basics") {
    assert(Asap.sma(Vector(1.0, 2.0, 3.0, 4.0), 2) == Vector(1.5, 2.5, 3.5))
    assert(Asap.sma(Vector(1.0, 2.0, 3.0), 1) == Vector(1.0, 2.0, 3.0))
    assert(Asap.sma(Vector(1.0, 2.0, 3.0), 3) == Vector(2.0))
  }

  test("roughness of a constant series is 0; noise is rough") {
    assert(Asap.roughness(Vector.fill(10)(5.0)) == 0.0)
    val rng = new scala.util.Random(7)
    val noisy = Vector.fill(100)(rng.nextGaussian())
    assert(Asap.roughness(noisy) > 0.5)
  }

  test("acf detects the period of a clean sine") {
    val n = 200
    val period = 20
    val xs = (0 until n).map(i => math.sin(2 * math.Pi * i / period)).toVector
    val corr = Asap.acf(xs, n / 2)
    val peaks = Asap.acfPeaks(corr)
    assert(peaks.exists(p => math.abs(p - period) <= 1),
      s"expected a peak near $period, got $peaks")
  }

  test("chooseWindow smooths a noisy sine and reduces roughness") {
    val rng = new scala.util.Random(42)
    val period = 24
    val xs = (0 until 240).map(i =>
      math.sin(2 * math.Pi * i / period) + 0.3 * rng.nextGaussian()).toVector
    val w = Asap.chooseWindow(xs)
    assert(w > 1, "should pick a smoothing window on a periodic noisy series")
    assert(Asap.roughness(Asap.sma(xs, w)) < Asap.roughness(xs))
  }

  test("kurtosis constraint: an isolated spike survives smoothing choice") {
    // flat series + one large spike: kurtosis is huge; a wide window would
    // flatten it and violate the constraint, so ASAP stays conservative
    val xs = (Vector.fill(100)(1.0).updated(50, 50.0))
    val w = Asap.chooseWindow(xs)
    val smoothed = Asap.sma(xs, w)
    assert(smoothed.max > 1.5, s"spike flattened away (w=$w, max=${smoothed.max})")
  }

  test("gapFill interpolates missing buckets linearly") {
    val pts = Vector(Asap.Point(0, 0.0), Asap.Point(300, 30.0), Asap.Point(400, 50.0))
    val filled = Asap.gapFill(pts, 100)
    assert(filled.map(_.timeS) == Vector(0L, 100L, 200L, 300L, 400L))
    assert(filled.map(_.value) == Vector(0.0, 10.0, 20.0, 30.0, 50.0))
    // already-regular series unchanged
    val reg = Vector(Asap.Point(0, 1.0), Asap.Point(100, 2.0))
    assert(Asap.gapFill(reg, 100) == reg)
  }

  test("smooth preserves length bound and is identity on tiny input") {
    val pts = Vector(Asap.Point(0, 1.0), Asap.Point(60, 2.0))
    assert(Asap.smooth(pts) == pts)
    val rng = new scala.util.Random(1)
    val series = (0 until 100).map(i => Asap.Point(i * 60L, rng.nextDouble())).toVector
    val out = Asap.smooth(series)
    assert(out.nonEmpty && out.length <= series.length)
  }
}
