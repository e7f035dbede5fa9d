package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI-diffs COVERAGE_INDEX.md against the COMPILED registries (VERDICT
  * r10 Next #8): the committed index must list exactly the
  * `SparkEntry.queries` key set with correct oracle attribution and
  * existing definition sites — so the human-readable coverage map can
  * never drift from the code it describes. Regenerate with
  * `python3 tools/coverage_index.py` after adding or removing a query. */
class CoverageIndexSpec extends AnyFunSuite {

  private val repoRoot = {
    // tests run from the sbt project root; fall back to walking up to it
    val cwd = new java.io.File(".").getCanonicalFile
    Iterator.iterate(cwd)(_.getParentFile).takeWhile(_ != null)
      .find(d => new java.io.File(d, "build.sbt").exists())
      .getOrElse(cwd)
  }

  private lazy val indexRows: Seq[(String, String, String)] = {
    val f = new java.io.File(repoRoot, "COVERAGE_INDEX.md")
    assert(f.exists(), "COVERAGE_INDEX.md missing — run tools/coverage_index.py")
    val row = """\|\s*(q_\w+)\s*\|\s*(\w+)\s*\|[^|]*\|\s*([^|]+?)\s*\|\s*(\w[\w-]*)\s*\|""".r
    java.nio.file.Files.readString(f.toPath).linesIterator.toSeq.collect {
      case row(q, _, site, oracle) => (q, site, oracle)
    }
  }

  test("index lists exactly the compiled SparkEntry.queries key set") {
    val indexed = indexRows.map(_._1).toSet
    val compiled = SparkEntry.queries.keySet
    val missing = compiled -- indexed
    val stale = indexed -- compiled
    assert(missing.isEmpty && stale.isEmpty,
      s"COVERAGE_INDEX.md is stale — regenerate with tools/coverage_index.py " +
        s"(missing: ${missing.toSeq.sorted.take(5)}, stale: ${stale.toSeq.sorted.take(5)})")
  }

  test("oracle attribution matches SparkEntry.oracleSql membership") {
    indexRows.foreach { case (q, _, oracle) =>
      val expected = if (SparkEntry.oracleSql.contains(q)) "yes" else "rows-only"
      assert(oracle === expected, s"$q oracle attribution drifted")
    }
  }

  test("every definition site points at an existing source file") {
    indexRows.foreach { case (q, site, _) =>
      val path = site.split(":").head
      assert(new java.io.File(repoRoot, path).exists(),
        s"$q points at missing file $path")
    }
  }
}
