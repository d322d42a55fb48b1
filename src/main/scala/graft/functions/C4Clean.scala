package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C4-style line/page cleaning (Raffel et al. 2020, arXiv:1910.10683
  * §2.2): where [[GopherQuality]] renders a doc-level keep/drop
  * verdict, this TRANSFORMS the document — bad lines are removed, and
  * the page-level rules decide whether anything survives. Pure Column
  * higher-order functions: per-row, zero shuffle, codegen'd.
  *
  * Line rules (a line survives if ALL hold):
  *  - ends in terminal punctuation (. ! ? or a closing quote)
  *  - has at least 3 words
  *  - does not contain the word "javascript" (case-insensitive)
  *
  * Page rules (the whole document drops if ANY holds):
  *  - fewer than 5 surviving lines (C4's "fewer than 5 sentences")
  *  - contains "lorem ipsum" (case-insensitive)
  *  - contains a curly bracket
  */
object C4Clean {

  /** Struct: n_lines (non-empty input lines), n_kept (lines surviving
    * the line rules), doc_keep, and cleaned ('\n'-joined surviving
    * lines; null when doc_keep is false). */
  def clean(c: Column): Column = {
    val lines = filter(transform(split(c, "\n"), l => trim(l)),
      l => length(l) > 0)
    val kept = filter(lines, l =>
      l.rlike("[.!?\"”']$") &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= 3 &&
        !lower(l).contains("javascript"))
    val nKept = size(kept)
    val docKeep = nKept >= 5 &&
      !lower(c).contains("lorem ipsum") &&
      !c.contains("{")
    struct(
      size(lines).cast("long").as("n_lines"),
      nKept.cast("long").as("n_kept"),
      docKeep.as("doc_keep"),
      when(docKeep, array_join(kept, "\n")).otherwise(lit(null)).as("cleaned"))
  }
}
