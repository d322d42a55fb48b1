package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-time ETL processors — the reference's log pipeline
  * (pipeline/src/etl/processor (18 files), SURVEY.md §2.1). A pipeline is an
  * ordered list of processors applied to a DataFrame of raw log rows;
  * each processor is a narrow, codegen-friendly column transform (UDFs
  * only where a stateful scan is genuinely needed: dissect, csv,
  * urlencoding). Runs identically over a batch frame or a streaming
  * micro-batch — the reference applies the same chain on its write
  * path (servers/src/http/event.rs → pipeline ETL → insert).
  *
  * `vrl` runs through [[MiniVrl]] — an interpreter for the VRL subset
  * the reference's own pipeline tests exercise (paths, variables,
  * del/assignment, object/array construction, map_values closures,
  * bang assertions, scalar helpers), with the reference's one-to-many
  * result contract. Unsupported VRL constructs fail at compile time.
  * All 18 reference processors are covered.
  */
object Processors {

  sealed trait Processor { def apply(df: DataFrame): DataFrame }

  /** Chain of processors; `run` folds them in order. */
  final case class Pipeline(processors: Seq[Processor]) {
    def run(df: DataFrame): DataFrame = processors.foldLeft(df)((d, p) => p(d))
  }

  // ---- dissect (dissect.rs) -------------------------------------------

  private sealed trait DisTok
  private final case class Lit(s: String) extends DisTok
  private final case class Fld(name: String, append: Boolean, skip: Boolean,
      pad: Boolean) extends DisTok

  private def compileDissect(pattern: String): Vector[DisTok] = {
    val rx = "%\\{([^}]*)\\}".r
    val out = Vector.newBuilder[DisTok]
    var last = 0
    for (m <- rx.findAllMatchIn(pattern)) {
      if (m.start > last) out += Lit(pattern.substring(last, m.start))
      var spec = m.group(1)
      val pad = spec.endsWith("->")
      if (pad) spec = spec.dropRight(2)
      val append = spec.startsWith("+")
      val skip = spec.isEmpty || spec.startsWith("?")
      val name = spec.stripPrefix("+").stripPrefix("?")
      out += Fld(name, append, skip, pad)
      last = m.end
    }
    if (last < pattern.length) out += Lit(pattern.substring(last))
    out.result()
  }

  /** `dissect`: positional pattern like `%{ip} - [%{ts}] "%{msg}"`.
    * Supported modifiers: `%{+name}` append (joined with
    * `appendSeparator`), `%{?skip}` / `%{}` ignore, `%{name->}` skip
    * repeated trailing separators. Extracted names become columns;
    * a non-matching row yields nulls. */
  final case class Dissect(field: String, pattern: String,
      appendSeparator: String = " ") extends Processor {
    private val toks = compileDissect(pattern)
    private val names: Seq[String] =
      toks.collect { case f: Fld if !f.skip => f.name }.distinct

    def apply(df: DataFrame): DataFrame = {
      val toksL = toks; val sep = appendSeparator
      val parse = udf { (s: String) =>
        if (s == null) null
        else {
          val vals = scala.collection.mutable.LinkedHashMap.empty[String, String]
          var pos = 0
          var ok = true
          var i = 0
          while (i < toksL.length && ok) {
            toksL(i) match {
              case Lit(l) =>
                if (s.startsWith(l, pos)) {
                  pos += l.length
                  // previous field had ->: absorb repeats of this literal
                  if (i > 0) toksL(i - 1) match {
                    case Fld(_, _, _, true) =>
                      while (s.startsWith(l, pos)) pos += l.length
                    case _ =>
                  }
                } else ok = false
              case Fld(name, append, skip, _) =>
                val end = toksL.lift(i + 1) match {
                  case Some(Lit(l)) =>
                    val idx = s.indexOf(l, pos)
                    if (idx < 0) { ok = false; pos } else idx
                  case _ => s.length
                }
                if (ok && !skip) {
                  val v = s.substring(pos, end)
                  if (append && vals.contains(name))
                    vals(name) = vals(name) + sep + v
                  else vals(name) = v
                }
                pos = end
            }
            i += 1
          }
          if (ok) vals.toMap else null
        }
      }
      val tmp = df.withColumn("__dissect", parse(col(field)))
      names.foldLeft(tmp)((d, n) =>
        d.withColumn(n, col("__dissect").getItem(n))).drop("__dissect")
    }
  }

  // ---- date / epoch (date.rs, epoch.rs) -------------------------------

  /** `date`: try each format in order, first parse wins. */
  final case class DateParse(field: String, formats: Seq[String],
      timezone: String = "UTC", target: Option[String] = None) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val parsed = coalesce(formats.map(f =>
        to_utc_timestamp(try_to_timestamp(col(field), lit(f)), timezone)): _*)
      df.withColumn(target.getOrElse(field), parsed)
    }
  }

  /** `epoch`: integer/string epoch at s/ms/us/ns resolution → timestamp. */
  final case class Epoch(field: String, resolution: String = "ms",
      target: Option[String] = None) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val v = col(field).cast("long")
      val us = resolution.toLowerCase match {
        case "s" | "sec" | "second"       => v * 1000000L
        case "ms" | "milli" | "millisecond" => v * 1000L
        case "us" | "micro" | "microsecond" => v
        case "ns" | "nano" | "nanosecond"   => expr(s"`$field` div 1000")
        case other => throw new IllegalArgumentException(s"epoch resolution: $other")
      }
      df.withColumn(target.getOrElse(field), timestamp_micros(us))
    }
  }

  // ---- string shapers (gsub.rs, join.rs, letter.rs, decolorize.rs) ----

  final case class Gsub(field: String, pattern: String, replacement: String)
      extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(field, regexp_replace(col(field), pattern, replacement))
  }

  /** `join`: array column → separator-joined string. */
  final case class JoinArr(field: String, separator: String) extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(field, array_join(col(field), separator))
  }

  /** `letter`: lower / upper / capital. */
  final case class Letter(field: String, method: String) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val c = method.toLowerCase match {
        case "lower"   => lower(col(field))
        case "upper"   => upper(col(field))
        case "capital" => initcap(col(field))
        case other => throw new IllegalArgumentException(s"letter method: $other")
      }
      df.withColumn(field, c)
    }
  }

  /** `decolorize`: strip ANSI color codes (decolorize.rs:38). */
  final case class Decolorize(field: String) extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(field, regexp_replace(col(field), "\\[[0-9;]*m", ""))
  }

  // ---- regex / digest (regex.rs, digest.rs) ---------------------------

  /** `regex`: named capture groups become `field_group` columns. */
  final case class RegexExtract(field: String, pattern: String) extends Processor {
    private val groupNames: Seq[String] =
      "\\(\\?<([a-zA-Z][a-zA-Z0-9]*)>".r.findAllMatchIn(pattern).map(_.group(1)).toSeq

    def apply(df: DataFrame): DataFrame = {
      val p = pattern
      val names = groupNames
      val ext = udf { (s: String) =>
        if (s == null) null
        else {
          val m = java.util.regex.Pattern.compile(p).matcher(s)
          if (m.find()) names.map(n => n -> Option(m.group(n)).orNull).toMap
          else null
        }
      }
      val tmp = df.withColumn("__re", ext(col(field)))
      names.foldLeft(tmp)((d, n) =>
        d.withColumn(s"${field}_$n", col("__re").getItem(n))).drop("__re")
    }
  }

  /** `digest`: strip volatile fragments (numbers/quoted/bracketed/uuid/
    * ip presets — digest.rs:79-86) leaving the log template; the
    * template hash groups similar messages. */
  final case class Digest(field: String, presets: Seq[String]) extends Processor {
    private val regexes: Seq[String] = presets.map {
      case "numbers"   => "\\d+"
      case "quoted"    => "[\"'“”‘’][^\"'“”‘’]*[\"'“”‘’]"
      case "bracketed" => "[(\\{\\[<][^(){}\\[\\]<>]*[)\\}\\]>]"
      case "uuid"      => "\\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\b"
      case "ip"        => "((\\d{1,3}\\.){3}\\d{1,3}(:\\d+)?|(\\[[0-9a-fA-F:]+\\])(:\\d+)?)"
      case other => throw new IllegalArgumentException(s"digest preset: $other")
    }
    def apply(df: DataFrame): DataFrame =
      df.withColumn(s"${field}_digest",
        regexes.foldLeft(col(field))((c, r) => regexp_replace(c, r, "")))
  }

  // ---- structured extraction (csv.rs, json_parse.rs, json_path.rs) ----

  /** `csv`: one delimited line → target columns (quote-aware scan). */
  final case class CsvParse(field: String, targets: Seq[String],
      separator: String = ",", quote: String = "\"") extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val sep = separator.head; val q = quote.head; val n = targets.length
      val parse = udf { (s: String) =>
        if (s == null) null
        else {
          val out = Array.fill[String](n)(null)
          val cur = new StringBuilder
          var field = 0; var i = 0; var inQ = false
          while (i < s.length && field < n) {
            val ch = s.charAt(i)
            if (inQ) {
              if (ch == q && i + 1 < s.length && s.charAt(i + 1) == q) { cur += q; i += 1 }
              else if (ch == q) inQ = false
              else cur += ch
            } else if (ch == q) inQ = true
            else if (ch == sep) { out(field) = cur.result(); cur.clear(); field += 1 }
            else cur += ch
            i += 1
          }
          if (field < n) out(field) = cur.result()
          out.toSeq
        }
      }
      val tmp = df.withColumn("__csv", parse(col(field)))
      targets.zipWithIndex.foldLeft(tmp) { case (d, (t, i)) =>
        d.withColumn(t, col("__csv").getItem(i))
      }.drop("__csv")
    }
  }

  /** `json_path` (pipeline/src/etl/processor/json_path.rs): JSONPath get
    * into a new column; `resultIndex` selects one element when the match
    * is an array (the reference's result_index). */
  final case class JsonPath(field: String, path: String, target: String,
      resultIndex: Option[Int] = None) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val base = if (path.startsWith("$")) path else s"$$.$path"
      val full = resultIndex.fold(base)(i => s"$base[$i]")
      df.withColumn(target, get_json_object(col(field), full))
    }
  }

  /** `simple_extract` (pipeline/src/etl/processor/simple_extract.rs): walk
    * a dotted key ("a.b.c") one object level per segment; any non-object
    * intermediate or missing key yields null. */
  final case class SimpleExtract(field: String, key: String, target: String)
      extends Processor {
    def apply(df: DataFrame): DataFrame = {
      // each segment is one tree level — escape nothing, mirror the
      // reference's plain split('.')
      val path = "$." + key.split('.').mkString(".")
      df.withColumn(target, get_json_object(col(field), path))
    }
  }

  /** `json_parse`: JSON text → map<string,string> column. */
  final case class JsonParse(field: String, target: Option[String] = None)
      extends Processor {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(target.getOrElse(field), from_json(col(field),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
  }

  /** `cmcd`: CMCD header `k=v,k2,k3="x"` → typed `field_k` columns with
    * the reference's per-key resolution (cmcd.rs:40-117): bs/su are
    * value-less booleans (true when present); br/bl/d/dl/mtp/rtp/tb are
    * integers; pr is a decimal; nor is URL-decoded (kept raw if the
    * decode fails); cid/nrr/ot/sf/sid/st/v are strings with surrounding
    * quotes stripped. */
  final case class Cmcd(field: String, keys: Seq[String]) extends Processor {
    private val IntKeys = Set("br", "bl", "d", "dl", "mtp", "rtp", "tb")
    def apply(df: DataFrame): DataFrame = {
      val ks = keys
      val parse = udf { (s: String) =>
        if (s == null) null
        else s.split(",").iterator.map { part =>
          val eq = part.indexOf('=')
          if (eq < 0) part.trim -> "true"
          else part.substring(0, eq).trim -> part.substring(eq + 1).stripPrefix("\"").stripSuffix("\"")
        }.toMap
      }
      val tmp = df.withColumn("__cmcd", parse(col(field)))
      ks.foldLeft(tmp) { (d, k) =>
        val raw = col("__cmcd").getItem(k)
        val typed = k match {
          // present → true, absent → NULL (cmcd.rs bs_su only emits the
          // field when the key appears in the payload)
          case "bs" | "su" => when(raw.isNotNull, lit(true))
          case ik if IntKeys(ik) => raw.cast("long")
          case "pr" => raw.cast("double")
          case "nor" => coalesce(expr(s"try_url_decode(__cmcd['$k'])"), raw)
          case _ => raw
        }
        d.withColumn(s"${field}_$k", typed)
      }.drop("__cmcd")
    }
  }

  // ---- urlencoding (urlencoding.rs) -----------------------------------

  final case class UrlEncoding(field: String, method: String = "decode")
      extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val c = method.toLowerCase match {
        case "decode" => url_decode(col(field))
        case "encode" => url_encode(col(field))
        case other => throw new IllegalArgumentException(s"urlencoding: $other")
      }
      df.withColumn(field, c)
    }
  }

  // ---- select / filter (select.rs, filter.rs) -------------------------

  /** `select`: keep (include) or drop (exclude) columns. */
  final case class Select(columns: Seq[String], mode: String = "include")
      extends Processor {
    def apply(df: DataFrame): DataFrame = mode.toLowerCase match {
      case "include" => df.select(columns.map(col): _*)
      case "exclude" => df.drop(columns: _*)
      case other => throw new IllegalArgumentException(s"select mode: $other")
    }
  }

  /** `filter`: drop rows whose field matches (or doesn't). */
  final case class Filter(field: String, targets: Seq[String],
      matchOp: String = "in", caseInsensitive: Boolean = true) extends Processor {
    def apply(df: DataFrame): DataFrame = {
      val c = if (caseInsensitive) lower(col(field)) else col(field)
      val ts = if (caseInsensitive) targets.map(_.toLowerCase) else targets
      val hit = matchOp.toLowerCase match {
        case "in"       => c.isin(ts: _*)
        case "not_in"   => !c.isin(ts: _*)
        case "contains" => ts.map(t => c.contains(t)).reduce(_ || _)
        case "prefix"   => ts.map(t => c.startsWith(t)).reduce(_ || _)
        case "regex"    => ts.map(t => c.rlike(t)).reduce(_ || _)
        case other => throw new IllegalArgumentException(s"filter mode: $other")
      }
      // reference filter.rs DROPS matching rows
      df.filter(!coalesce(hit, lit(false)))
    }
  }

  // ---- vrl (vrl_processor.rs) ------------------------------------------

  /** `vrl`: run a [[MiniVrl]] program over a JSON-object column. The
    * program sees the parsed event; its result follows the reference's
    * one-to-many contract (vrl_processor.rs + transformer/greptime.rs):
    * an object yields one row, an array yields one row per element
    * (each element must be an object — the error names index and type),
    * an empty array yields zero rows. The output column holds each
    * resulting event re-serialized as a JSON object string, ready for
    * `JsonParse`/`from_json` downstream. Compilation happens once on
    * the driver; unsupported VRL constructs fail fast at compile. */
  final case class Vrl(field: String, source: String) extends Processor {
    private val prog = MiniVrl.compile(source)
    def apply(df: DataFrame): DataFrame = {
      val p = prog
      val f = udf { (json: String) =>
        if (json == null) Seq.empty[String] else MiniVrl.runToRows(p, json)
      }
      df.withColumn(field, explode(f(col(field))))
    }
  }

  // ---- dispatcher / table_suffix routing (dispatcher.rs, tablesuffix.rs)

  /** One dispatcher rule: rows whose field equals `value` leave the
    * main pipeline, run `pipeline` (when set), and land in the table
    * named by `tableSuffix`. */
  final case class DispatchRule(value: String, tableSuffix: String,
      pipeline: Option[Pipeline] = None)

  /** Pipeline-level routing (reference dispatcher.rs): value-match on
    * one field splits the stream into per-rule routes; rows matching no
    * rule continue in the main pipeline. In Spark each route is a
    * FILTERED VIEW of the same scan (predicate-pushdown keeps this one
    * pass at rest), so dispatching adds no shuffle. */
  final case class Dispatcher(field: String, rules: Seq[DispatchRule]) {
    require(rules.nonEmpty, "dispatcher needs at least one rule")
    /** (tableSuffix, transformed rows) per rule, in rule order. */
    def route(df: DataFrame): Seq[(String, DataFrame)] =
      rules.map { r =>
        val slice = df.filter(col(field) === lit(r.value))
        r.tableSuffix -> r.pipeline.map(_.run(slice)).getOrElse(slice)
      }
    /** Rows matching no rule — stay in the main pipeline/table. */
    def remainder(df: DataFrame): DataFrame =
      df.filter(!coalesce(col(field).isin(rules.map(_.value): _*), lit(false)))
  }

  /** `table_suffix` hook (reference tablesuffix.rs): a [[MiniVrl]]
    * expression evaluated per row over a JSON-object column yields the
    * table-name suffix — emitted as a `__table_suffix` column, the
    * natural write-path partition key (`partitionBy("__table_suffix")`
    * = one table-shard per suffix, no shuffle). Null when the program
    * yields VRL null (row goes to the base table). */
  final case class TableSuffix(field: String, source: String) extends Processor {
    private val prog = MiniVrl.compile(source)
    def apply(df: DataFrame): DataFrame = {
      val p = prog
      val f = udf { (json: String) =>
        if (json == null) null else MiniVrl.runScalar(p, json).orNull
      }
      df.withColumn("__table_suffix", f(col(field)))
    }
  }
}
