package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL-compat string functions — reference
  * common/function/src/scalars/string: elt, field, format, insert,
  * locate, regexp_extract, space (SURVEY.md §2.8).
  */
object StringFunctions {

  /** elt(n, s1, s2, ...) -> nth string (1-based), null out of range. */
  def elt(n: Column, args: Column*): Column = element_at(array(args: _*), n.cast("int"))

  /** field(s, s1, s2, ...) -> 1-based index of s in args, 0 if absent. */
  def field(s: Column, args: Column*): Column =
    coalesce(array_position(array(args: _*), s).cast("long"), lit(0L))

  /** format(x, d): number formatted with d decimals and thousands separators. */
  def format(x: Column, d: Int): Column = format_number(x, d)

  /** insert(str, pos, len, newstr) — MySQL INSERT(). */
  def insert(str: Column, pos: Column, len: Column, newstr: Column): Column =
    when(pos < 1 || pos > length(str), str)
      .otherwise(concat(
        substring(str, lit(1), (pos - 1).cast("int")),
        newstr,
        when(pos + len <= length(str), expr_substr(str, pos + len))
          .otherwise(lit(""))))

  private def expr_substr(str: Column, from: Column): Column =
    substring(str, from.cast("int"), length(str).cast("int"))

  /** locate(substr, str[, pos]) -> 1-based position, 0 if absent. */
  def locateF(sub: Column, str: Column): Column =
    locate_helper(sub, str, lit(1))
  private def locate_helper(sub: Column, str: Column, pos: Column): Column =
    when(sub === "", lit(0L))
      .otherwise((instr(substring_from(str, pos), sub) +
        when(instr(substring_from(str, pos), sub) > 0, pos - 1).otherwise(lit(0)))
        .cast("long"))
  private def substring_from(str: Column, pos: Column): Column =
    substring(str, pos.cast("int"), length(str).cast("int"))

  def space(n: Column): Column = repeat(lit(" "), n.cast("int"))
}
