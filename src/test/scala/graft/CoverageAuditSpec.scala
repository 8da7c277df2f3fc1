package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Docs/registry drift guard (r4 VERDICT "Next round" #7): COVERAGE.md
  * is the human-readable claims matrix and the registry is the gate —
  * every registry query must be claimed in the matrix, and the
  * queries/oracle maps must stay key-consistent, or a future round can
  * silently ship an operator the coverage story doesn't mention (or
  * claim one the gate no longer checks). Pure file+map checks, no
  * Spark session. */
class CoverageAuditSpec extends AnyFunSuite with Matchers {

  private lazy val coverage = {
    val p = java.nio.file.Paths.get("COVERAGE.md")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("every registry query key appears in COVERAGE.md") {
    // the matrix refers to queries by full key (q34_header_norm) or by
    // short id (q34) — a short id must be a standalone token so q1
    // can't free-ride on q100
    def mentioned(key: String): Boolean = {
      val short = key.takeWhile(_ != '_')
      coverage.contains(key) ||
        ("""(?<![0-9a-z])""" + short + """(?![0-9a-z])""").r
          .findFirstIn(coverage).isDefined
    }
    val missing = SparkEntry.queries.keySet.toSeq.sorted.filterNot(mentioned)
    withClue(s"registry keys absent from COVERAGE.md: $missing — add a " +
      "matrix row (or mention) for each before shipping the operator:") {
      missing shouldBe empty
    }
  }

  test("oracle map and query registry are key-consistent") {
    // an oracle without a query never runs; a query without an oracle
    // silently downgrades to the driver's weaker rows-only check — both
    // must be deliberate, so the default is exact key equality
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    withClue("oracle entries with no query:") { (o -- q) shouldBe empty }
    withClue("queries with no oracle entry:") { (q -- o) shouldBe empty }
  }

  test("query names are gate-safe (lowercase, no spaces, start with q)") {
    // the driver uses names as directory and JSON keys
    SparkEntry.queries.keySet.foreach { k =>
      k should fullyMatch regex "q[0-9]+[a-z]?_[a-z0-9_]+"
    }
  }
}
