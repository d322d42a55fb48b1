package graft.functions

/** Typed `::` casts over a RAW JSON rendering (strings keep their
  * quotes — see `__json_get_raw` in JsonSql). Two dialects, neither
  * ever raises an ANSI cast error:
  *
  *  - strict (JSON1 `json_get`, reference function/json/json_get.sql):
  *    integers come only from integral numbers or booleans (1.2::int8
  *    is NULL); booleans only from booleans; strings never coerce.
  *  - lenient (JSON2 columns, reference types/json/json2_cast.sql):
  *    numeric strings parse, floats truncate to integers, numbers
  *    become booleans via != 0 — but a JSON *string* never becomes a
  *    boolean ("42"::BOOLEAN is NULL while 42::BOOLEAN is true).
  *
  * Top-level object (not a closure) so Spark task serialization carries
  * no enclosing session state.
  */
object JsonCasts extends Serializable {

  private final val KBool = 0
  private final val KNum = 1
  private final val KStr = 2
  private final val KOther = 3

  /** (kind, payload): payload is the unquoted string / numeric text /
    * "1"|"0" for booleans. */
  private def kind(raw: String): (Int, String) = {
    val t = raw.trim
    if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
      (KStr, t.substring(1, t.length - 1))
    else t.toLowerCase(java.util.Locale.ROOT) match {
      case "true" => (KBool, "1")
      case "false" => (KBool, "0")
      case _ =>
        try { t.toDouble; (KNum, t) }
        catch { case _: NumberFormatException => (KOther, t) }
    }
  }

  private def num(s: String): java.lang.Double =
    try java.lang.Double.valueOf(s.toDouble)
    catch { case _: NumberFormatException => null }

  def toDouble(raw: String, lenient: Boolean): java.lang.Double =
    if (raw == null) null
    else kind(raw) match {
      case (KBool, v) => java.lang.Double.valueOf(v.toDouble)
      case (KNum, v) => num(v)
      case (KStr, v) if lenient => num(v)
      case _ => null
    }

  def toLong(raw: String, lenient: Boolean): java.lang.Long =
    if (raw == null) null
    else kind(raw) match {
      case (KBool, v) => java.lang.Long.valueOf(v.toLong)
      case (KNum, v) =>
        if (lenient) Option(num(v)).map(d => Long.box(d.toLong)).orNull
        else if (v.matches("-?\\d+"))
          try java.lang.Long.valueOf(v.toLong)
          catch { case _: NumberFormatException => null }
        else null
      case (KStr, v) if lenient =>
        Option(num(v)).map(d => Long.box(d.toLong)).orNull
      case _ => null
    }

  def toBool(raw: String, lenient: Boolean): java.lang.Boolean =
    if (raw == null) null
    else kind(raw) match {
      case (KBool, v) => java.lang.Boolean.valueOf(v == "1")
      case (KNum, v) if lenient =>
        Option(num(v)).map(d => Boolean.box(d.doubleValue() != 0.0)).orNull
      case _ => null
    }
}
