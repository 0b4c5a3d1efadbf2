package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the bench's isolated build re-measure (round 10): a
  * build registered in BuildTimes but missing a BuildRebuild hook would
  * silently drop out of Bench's `builds_isolated` block — the exact
  * single-shot blind spot the block exists to close. Scans the source
  * tree for `BuildTimes.timed("name")` literals and requires a hook per
  * name, so adding a build without a hook fails HERE with instructions
  * instead of degrading the bench.
  */
class BuildRebuildSpec extends AnyFunSuite {

  test("every BuildTimes.timed build name has a BuildRebuild hook") {
    SparkEntry.queries: Unit // initialize query objects → hooks register
    val srcRoot = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(srcRoot), s"run from repo root: $srcRoot")
    val pat = """BuildTimes\.timed\("([a-z0-9_]+)"\)""".r
    val it = java.nio.file.Files.walk(srcRoot)
    val timedNames = try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .flatMap(p => pat.findAllMatchIn(java.nio.file.Files.readString(p))
          .map(_.group(1)))
        .toSet
    } finally it.close()
    assert(timedNames.nonEmpty, "source scan found no BuildTimes.timed sites")
    val missing = timedNames -- BuildRebuild.names
    assert(missing.isEmpty,
      s"builds without a rebuild hook (register in the owning object, " +
        s"see graft.BuildRebuild): ${missing.toSeq.sorted.mkString(", ")}")
    // and no orphan hooks for builds that no longer exist
    val orphans = BuildRebuild.names -- timedNames
    assert(orphans.isEmpty,
      s"hooks with no matching BuildTimes.timed site: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
