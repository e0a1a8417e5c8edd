package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline, expressed as
  * builtin-function compositions (codegen'd, UDF-free) so they run
  * inside WholeStageCodegen at any scale.
  */
object TextFunctions {

  /** Distinct character k-gram shingles of a string column. */
  def shingles(text: String, k: Int): Column = expr(
    s"""CASE WHEN char_length($text) < $k THEN array()
       |ELSE array_distinct(transform(
       |  sequence(0, char_length($text) - $k),
       |  i -> substring($text, i + 1, $k))) END""".stripMargin)

  /** Whitespace tokens. */
  def tokens(text: String): Column = split(col(text), " ")

  /** xxhash64 of each distinct shingle — dedup math downstream moves
    * 8-byte hashes, never document bodies. */
  def shingleHashes(text: String, k: Int): Column = expr(
    s"""CASE WHEN char_length($text) < $k THEN array()
       |ELSE array_distinct(transform(
       |  sequence(0, char_length($text) - $k),
       |  i -> xxhash64(substring($text, i + 1, $k)))) END""".stripMargin)

  /** Count of tokens that appear in `markers`. */
  def markerCount(text: String, markers: Seq[String]): Column = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    expr(s"size(filter(split($text, ' '), t -> t IN ($set)))")
  }
}
