package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TimeWeightSpec extends AnyFunSuite {
  private val us = 1000000L

  test("single point → its value (toolkit average semantics)") {
    assert(TimeWeight.integrateSorted(Vector((5L * us, 42.0)), TimeWeight.Linear) == 42.0)
    assert(TimeWeight.integrateSorted(Vector((5L * us, 42.0)), TimeWeight.Locf) == 42.0)
  }

  test("linear: trapezoidal average of a ramp is the midpoint") {
    // v goes 0→10 linearly over 10s: time-weighted avg = 5
    val pts = Vector((0L, 0.0), (10L * us, 10.0))
    assert(TimeWeight.integrateSorted(pts, TimeWeight.Linear) == 5.0)
  }

  test("locf: left value carried across each gap") {
    // 0..10s at v=2, 10..30s at v=8 → (10*2 + 20*8)/30 = 6
    val pts = Vector((0L, 2.0), (10L * us, 8.0), (30L * us, 5.0))
    assert(TimeWeight.integrateSorted(pts, TimeWeight.Locf) == (10 * 2.0 + 20 * 8.0) / 30)
  }

  test("linear: hand-computed three-point trapezoid") {
    // segments: 10s*(2+8)/2=50, 20s*(8+5)/2=130 → 180/30 = 6
    val pts = Vector((0L, 2.0), (10L * us, 8.0), (30L * us, 5.0))
    assert(TimeWeight.integrateSorted(pts, TimeWeight.Linear) == 6.0)
  }

  test("uneven spacing weights long intervals more") {
    val pts = Vector((0L, 0.0), (1L * us, 100.0), (101L * us, 100.0))
    val avg = TimeWeight.integrateSorted(pts, TimeWeight.Linear)
    assert(avg > 99.0, s"100s at 100 should dominate 1s ramp, got $avg")
  }
}
