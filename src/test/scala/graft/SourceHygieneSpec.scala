package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard against the recurring raw-NUL-byte hazard: a literal 0x00 inside
  * a string literal makes git treat the source file as binary (diff,
  * blame, and grep review all break) and has twice diverged from
  * space-separator oracle SQL (EvalCache r3, Metrics r5). Use the
  * "backslash-u0000" escape instead -- identical behavior, file stays text.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaFiles(root: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = Option(root.listFiles).getOrElse(Array.empty)
      .toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  test("no source file contains a raw NUL byte") {
    val roots = Seq("src/main/scala", "src/test/scala").map(new java.io.File(_))
    val offenders = roots.flatMap(scalaFiles).filter { f =>
      java.nio.file.Files.readAllBytes(f.toPath).contains(0.toByte)
    }
    assert(offenders.isEmpty,
      s"raw NUL bytes in: ${offenders.map(_.getPath).mkString(", ")}")
  }
}
