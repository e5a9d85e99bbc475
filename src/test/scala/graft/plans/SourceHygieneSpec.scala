package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Source-level hygiene gates enforced as tests, not round notes.
  *
  * Every custom Catalyst expression in this engine implements
  * `doGenCode` — an interpreted `CodegenFallback` in a hot path breaks
  * whole-stage codegen for the entire stage containing it, which is a
  * silent 2-10× regression at 100 TB. The grep lives here so a future
  * expression can't quietly take the fallback shortcut.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def mainSources: Seq[Path] = {
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"run from the repo root: $root missing")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
  }

  test("zero CodegenFallback in src/main (every Expression has doGenCode)") {
    val offenders = mainSources.filter { p =>
      new String(Files.readAllBytes(p)).contains("CodegenFallback")
    }
    assert(offenders.isEmpty,
      s"CodegenFallback found in: ${offenders.mkString(", ")} — implement doGenCode instead")
  }

  test("no ??? / TODO / FIXME stubs in src/main") {
    val offenders = mainSources.filter { p =>
      val s = new String(Files.readAllBytes(p))
      s.contains("???") || s.contains("TODO") || s.contains("FIXME")
    }
    assert(offenders.isEmpty,
      s"stub markers found in: ${offenders.mkString(", ")}")
  }
}
