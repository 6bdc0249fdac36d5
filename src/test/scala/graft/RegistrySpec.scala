package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Registry drift guard: docs/REGISTRY.md is generated from the compiled
  * registry, and the generation-time count assert only fires when someone
  * remembers to regenerate. This spec regenerates in memory and diffs
  * against the committed file, so `sbt test` fails the moment a query is
  * registered (or an oracle reshaped) without refreshing the index. */
class RegistrySpec extends AnyFunSuite {

  test("docs/REGISTRY.md matches a fresh render — regenerate with " +
      "sbt \"runMain graft.tools.Registry\" after registry changes") {
    val path = Paths.get("docs/REGISTRY.md")
    assert(Files.exists(path), "docs/REGISTRY.md is missing — generate it")
    val disk = Files.readString(path)
    val fresh = graft.tools.Registry.render()
    if (disk != fresh) {
      val diskLines = disk.split("\n", -1)
      val freshLines = fresh.split("\n", -1)
      val firstDiff = diskLines.zipAll(freshLines, "<missing>", "<missing>")
        .indexWhere { case (a, b) => a != b }
      fail(s"docs/REGISTRY.md is STALE (first divergence at line " +
        s"${firstDiff + 1}: committed '${diskLines.lift(firstDiff).getOrElse("<eof>")}' " +
        s"vs fresh '${freshLines.lift(firstDiff).getOrElse("<eof>")}') — " +
        "run sbt \"runMain graft.tools.Registry\" and commit the result")
    }
  }
}
