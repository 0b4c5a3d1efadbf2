package graft

import org.scalatest.funsuite.AnyFunSuite

class BuildTimesSpec extends AnyFunSuite {
  test("nested timed blocks record EXCLUSIVE time; total ~= outer wall clock") {
    BuildTimes.times.clear()
    BuildTimes.timed("outer") {
      Thread.sleep(30)
      BuildTimes.timed("inner") { Thread.sleep(40) }
      Thread.sleep(10)
    }
    val inner = BuildTimes.times("inner")
    val outer = BuildTimes.times("outer")
    assert(inner >= 0.035, s"inner=$inner")
    // outer's recorded time excludes the nested 40ms — double counting
    // would put it at ~80ms+
    assert(outer >= 0.035 && outer <= 0.075, s"outer=$outer")
    assert(BuildTimes.total >= 0.075 && BuildTimes.total <= 0.15)
    BuildTimes.times.clear()
  }
}
