package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural pin for SURVEY.md §2 ⇔ SparkEntry coverage (r12 verdict
  * item 2): every §2 inventory row must name a registered query key and
  * every registered key must have a §2 row, in BOTH directions, so an
  * operator can never again ship suite-green but audit-invisible (the
  * r12 stretch four) or get a §2 row with no implementation behind it.
  * Pure file parse + set algebra — no SparkSession.
  */
class SurveySpec extends AnyFunSuite {

  private val RowRe = """^\| ([ABC]\d+) \| `([a-z0-9_]+)` \|""".r

  private lazy val surveyRows: Seq[(String, String)] = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    try {
      val lines = src.getLines().toVector
      val start = lines.indexWhere(_.startsWith("## §2"))
      val end = lines.indexWhere(_.startsWith("## §3"), start)
      require(start >= 0 && end > start, "SURVEY.md §2 section not found")
      lines.slice(start, end).flatMap(l =>
        RowRe.findFirstMatchIn(l).map(m => (m.group(1), m.group(2))))
    } finally src.close()
  }

  test("§2 inventory ids are unique") {
    val dup = surveyRows.groupBy(_._1).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dup.isEmpty, s"duplicate §2 ids: ${dup.mkString(", ")}")
  }

  test("§2 inventory keys are unique") {
    val dup = surveyRows.groupBy(_._2).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dup.isEmpty, s"duplicate §2 keys: ${dup.mkString(", ")}")
  }

  test("every §2 key is a SparkEntry.queries key") {
    val missing = surveyRows.map(_._2).toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty,
      s"§2 rows with no queries entry: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every SparkEntry.queries key has a §2 row") {
    val missing = SparkEntry.queries.keySet -- surveyRows.map(_._2).toSet
    assert(missing.isEmpty,
      s"queries keys with no §2 row: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every SparkEntry.queries key has a DuckDB oracle twin") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries keys with no oracle: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
