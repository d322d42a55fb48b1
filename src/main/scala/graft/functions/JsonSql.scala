package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF1, UDF2}
import org.apache.spark.sql.types._

/** SQL surface of the JSON family (reference
  * common/function/src/scalars/json, pinned by
  * function/json/{json,json_get,json_is}.result and types/json).
  * JSON values travel as normalized JSON STRINGs (the JSON column type
  * is StringType here; the reference's JSONB is an engine-internal
  * encoding with the same observable semantics). The path dialect is
  * the jsonb crate's: dot/colon separators, ["quoted"] and [int]
  * selectors, `[a to last]` ranges, and trailing `?(@ op lit)` filters.
  */
object JsonSql {
  private val mapper = new ObjectMapper()

  private def parse(s: String): JsonNode = mapper.readTree(s)

  // ---- JSON2 shredded-variant emulation (types/json/json2.sql) ------
  // The reference's JSON2 "flat" SST format shreds each flush batch
  // into an arrow struct whose schema is the DEEP UNION of the batch's
  // document shapes; reading re-emits documents against that union, so
  // keys another row introduced surface as explicit nulls. Schema
  // encoding here: object → JSON object, array → 1-element JSON array,
  // scalar leaf (or a type conflict) → JSON `true`.

  /** Deep-union shape of a batch of documents. Null values contribute
    * nothing; a scalar/object conflict degrades the node to a leaf
    * (json2.result: c holds both "s8" and [1] → rendered raw). */
  def shredSchema(texts: Seq[String]): String = {
    def shapeOf(n: JsonNode): JsonNode =
      if (n == null || n.isNull) null
      else if (n.isObject) {
        val o = mapper.createObjectNode()
        val it = n.fieldNames()
        while (it.hasNext) { val k = it.next(); val s = shapeOf(n.get(k)); if (s != null) o.set[JsonNode](k, s) else o.set[JsonNode](k, mapper.nullNode()) }
        o
      } else if (n.isArray) {
        val a = mapper.createArrayNode()
        var elem: JsonNode = null
        var i = 0
        while (i < n.size) { elem = mergeShapes(elem, shapeOf(n.get(i))); i += 1 }
        a.add(if (elem == null) mapper.getNodeFactory.booleanNode(true) else elem)
        a
      } else mapper.getNodeFactory.booleanNode(true)
    var acc: JsonNode = null
    texts.foreach { t =>
      if (t != null) scala.util.Try(parse(t)).foreach(n =>
        acc = mergeShapes(acc, shapeOf(n)))
    }
    if (acc == null) "true" else acc.toString
  }

  private def mergeShapes(a: JsonNode, b: JsonNode): JsonNode = {
    if (a == null || a.isNull) return b
    if (b == null || b.isNull) return a
    if (a.isObject && b.isObject) {
      val o = mapper.createObjectNode()
      val keys = scala.collection.mutable.LinkedHashSet.empty[String]
      val ia = a.fieldNames(); while (ia.hasNext) keys += ia.next()
      val ib = b.fieldNames(); while (ib.hasNext) keys += ib.next()
      keys.foreach(k => o.set[JsonNode](k, mergeShapes(a.get(k), b.get(k))))
      o
    } else if (a.isArray && b.isArray) {
      val arr = mapper.createArrayNode()
      arr.add(mergeShapes(a.get(0), b.get(0)))
      arr
    } else mapper.getNodeFactory.booleanNode(true) // conflict → leaf
  }

  /** Re-emit a document against its batch's union schema: union keys the
    * row lacks surface as explicit nulls; an object whose members are
    * ALL null collapses to null ('{"a":{}}' renders a:null). Returns
    * null for a null/unparseable document. */
  def applyShred(jText: String, schemaText: String): String = {
    if (jText == null) return null
    val v = scala.util.Try(parse(jText)).getOrElse(return null)
    val s = scala.util.Try(parse(schemaText)).getOrElse(return render(v))
    def app(v: JsonNode, s: JsonNode): JsonNode = {
      if (v == null || v.isNull) return null
      if (s == null || s.isNull || s.isBoolean) return v // leaf
      if (s.isArray) {
        if (!v.isArray) return v // conflict: raw
        val out = mapper.createArrayNode()
        var i = 0
        while (i < v.size) {
          val e = app(v.get(i), s.get(0))
          out.add(if (e == null) mapper.nullNode(): JsonNode else e)
          i += 1
        }
        out
      } else { // object schema
        if (!v.isObject) return v // conflict: raw
        val out = mapper.createObjectNode()
        var anyNonNull = false
        val it = s.fieldNames()
        while (it.hasNext) {
          val k = it.next()
          val m = app(v.get(k), s.get(k))
          if (m == null) out.set[JsonNode](k, mapper.nullNode())
          else { out.set[JsonNode](k, m); anyNonNull = true }
        }
        if (anyNonNull) out else null
      }
    }
    val r = app(v, s)
    if (r == null) null else render(r)
  }

  // ---- JSON2 type hints (types/json/json2_type_hints.sql) ----------
  // A hint declares `path TYPE [NOT NULL|NULL] [DEFAULT lit]` inside the
  // column type. At write time each hinted path is validated against its
  // declared type and materialized into the stored document: a missing
  // path takes its DEFAULT, else JSON null (or errors when NOT NULL).
  // Spec wire format between GraftSession and the UDF: JSON array of
  // {"path":["user","age"],"type":"Int64","nullable":true,"default":<v>}.

  /** Validate+materialize `doc` against the hint spec. Throws
    * IllegalArgumentException with the reference's message shapes
    * (datatypes/src/json.rs:231,261). */
  def applyTypeHints(doc: String, spec: String): String = {
    if (doc == null) return null
    val root = try parse(doc) catch {
      case e: Exception => throw new IllegalArgumentException(
        s"Invalid JSON text: $doc", e)
    }
    val hints = parse(spec)
    var out: JsonNode = root
    var hi = 0
    while (hi < hints.size) {
      val h = hints.get(hi)
      val path = (0 until h.get("path").size).map(h.get("path").get(_).asText)
      val tname = h.get("type").asText
      val nullable = h.get("nullable").asBoolean
      val dflt = Option(h.get("default")) // absent key → None
      out = hintOne(out, path.toList, path, tname, nullable, dflt)
      hi += 1
    }
    render(out)
  }

  private def typeOk(n: JsonNode, tname: String): Boolean = tname match {
    case "String" => n.isTextual
    case "Int64" => n.isIntegralNumber ||
      (n.isNumber && n.doubleValue == n.doubleValue.floor &&
        !n.doubleValue.isInfinite && n.canConvertToLong)
    case "UInt64" => (n.isIntegralNumber && n.longValue >= 0) || n.isBigInteger
    case "Float64" => n.isNumber
    case "Boolean" => n.isBoolean
    case _ => false
  }

  private def hintOne(node: JsonNode, rest: List[String], full: Seq[String],
      tname: String, nullable: Boolean, dflt: Option[JsonNode]): JsonNode = {
    val fullPath = full.mkString(".")
    def missing(): JsonNode = dflt match {
      case Some(d) if !d.isNull => d
      case _ =>
        if (nullable) mapper.nullNode()
        else throw new IllegalArgumentException(
          s"Invalid JSON: missing non-null JSON2 type hint path $fullPath")
    }
    rest match {
      case Nil => // leaf position: node is the candidate value
        if (node == null || node.isNull) {
          if (node == null) missing()
          else if (nullable) node
          else throw new IllegalArgumentException(
            s"Invalid JSON: JSON2 type hint path $fullPath is not nullable")
        } else if (typeOk(node, tname)) node
        else throw new IllegalArgumentException(
          s"Invalid JSON: JSON value at $fullPath does not match JSON2 type hint $tname")
      case seg :: tail =>
        val base: com.fasterxml.jackson.databind.node.ObjectNode =
          if (node == null || node.isNull) mapper.createObjectNode()
          else if (node.isObject)
            node.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
          else throw new IllegalArgumentException(
            s"Invalid JSON: JSON2 type hint path $fullPath expects object at " +
              full.take(full.size - rest.size).mkString("."))
        val childIn = if (base.has(seg)) base.get(seg) else null
        val childOut = hintOne(childIn, tail, full, tname, nullable, dflt)
        base.set[JsonNode](seg, childOut)
        base
    }
  }

  /** jsonb-style compact rendering: object keys SORTED, strings with
    * standard JSON escapes plus  /  (types/json/json.result
    * pins both the key order and the escaped line separator). */
  def render(n: JsonNode): String = {
    val sb = new StringBuilder
    def quote(s: String): Unit = {
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 || c == '\u2028' || c == '\u2029' =>
          sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
    def go(n: JsonNode): Unit =
      if (n.isObject) {
        sb.append('{')
        val it = n.fieldNames()
        val keys = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) keys += it.next()
        var first = true
        keys.sorted.foreach { k =>
          if (!first) sb.append(',')
          first = false
          quote(k); sb.append(':'); go(n.get(k))
        }
        sb.append('}')
      } else if (n.isArray) {
        sb.append('[')
        var i = 0
        while (i < n.size) { if (i > 0) sb.append(','); go(n.get(i)); i += 1 }
        sb.append(']')
      } else if (n.isTextual) quote(n.textValue)
      else sb.append(n.toString) // numbers, booleans, null
    go(n)
    sb.toString
  }

  private sealed trait Step
  private case class Key(k: String) extends Step
  private case class Idx(i: Int) extends Step
  private case class Range(from: Int, to: Option[Int]) extends Step // to=None → last
  private case class Filter(op: String, lit: String) extends Step

  /** None = unparseable path. */
  private def parsePath(p0: String): Option[Seq[Step]] = {
    var p = p0.trim
    if (p.startsWith("$")) p = p.substring(1)
    // '', '$', '.' address the whole document (types/json/json2.result)
    val steps = Vector.newBuilder[Step]
    var i = 0
    try {
      while (i < p.length) {
        p.charAt(i) match {
          case '.' | ':' => i += 1
          case '[' =>
            val close = p.indexOf(']', i)
            if (close < 0) return None
            val inner = p.substring(i + 1, close).trim
            if (inner.startsWith("\"") && inner.endsWith("\"") && inner.length >= 2)
              steps += Key(inner.substring(1, inner.length - 1))
            else if (inner.matches("-?\\d+")) steps += Idx(inner.toInt)
            else inner.split("\\s+to\\s+") match {
              case Array(a, b) if a.matches("\\d+") =>
                steps += Range(a.toInt,
                  if (b.trim == "last") None else Some(b.trim.toInt))
              case _ => return None
            }
            i = close + 1
          case '?' =>
            // trailing filter ?(@ op lit)
            if (!p.substring(i).startsWith("?(") || !p.endsWith(")")) return None
            val body = p.substring(i + 2, p.length - 1).trim
            val m = "^@\\s*(==|!=|>=|<=|>|<)\\s*(.+)$".r.findFirstMatchIn(body)
              .getOrElse(return None)
            steps += Filter(m.group(1), m.group(2).trim)
            i = p.length
          case _ =>
            val end = p.indexWhere(c => c == '.' || c == ':' || c == '[' || c == '?', i)
            val stop = if (end < 0) p.length else end
            steps += Key(p.substring(i, stop))
            i = stop
        }
      }
      Some(steps.result())
    } catch { case _: Exception => None }
  }

  private def compare(n: JsonNode, op: String, lit: String): Boolean = {
    val cmp: Option[Int] =
      if (n.isNumber && lit.matches("-?\\d+(\\.\\d+)?"))
        Some(java.lang.Double.compare(n.doubleValue, lit.toDouble))
      else if (n.isTextual) {
        val l = lit.stripPrefix("\"").stripSuffix("\"").stripPrefix("'").stripSuffix("'")
        Some(n.textValue.compareTo(l))
      } else None
    cmp.exists(c => op match {
      case "==" => c == 0
      case "!=" => c != 0
      case ">" => c > 0
      case ">=" => c >= 0
      case "<" => c < 0
      case "<=" => c <= 0
    })
  }

  private def eval(root: JsonNode, steps: Seq[Step]): Seq[JsonNode] =
    steps.foldLeft(Seq(root)) { (nodes, s) =>
      nodes.flatMap { n =>
        s match {
          case Key(k) => if (n.isObject && n.has(k)) Seq(n.get(k)) else Nil
          case Idx(i) => if (n.isArray && i >= 0 && i < n.size) Seq(n.get(i)) else Nil
          case Range(from, to) =>
            if (!n.isArray) Nil
            else {
              val hi = to.map(math.min(_, n.size - 1)).getOrElse(n.size - 1)
              (from to hi).filter(j => j >= 0 && j < n.size).map(n.get)
            }
          case Filter(op, lit) => if (compare(n, op, lit)) Seq(n) else Nil
        }
      }
    }

  /** Rust f64 Display: shortest roundtrip digits, never exponent
    * notation (json_get.result pins 1e100 as 1 followed by 100 zeros). */
  private def fmtF64(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.indexOf('E') < 0) s.stripSuffix(".0")
    else new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
  }

  /** JSONB scalar → string coercion (json_get_string / json_get::string):
    * strings bare, numbers full-precision, containers/bools excluded. */
  private def numText(n: JsonNode): String =
    if (n.isDouble || n.isFloat) fmtF64(n.doubleValue) else n.asText

  private def getAt(j: String, p: String): Option[JsonNode] =
    if (j == null || p == null) None
    else parsePath(p).flatMap(st =>
      scala.util.Try(eval(parse(j), st)).toOption.flatMap(_.headOption))

  /** Fold `parse_json('<literal>')` calls into plain string literals —
    * Spark's inline VALUES table rejects non-foldable expressions, so
    * INSERT ... VALUES(parse_json('{...}'), ...) must pre-evaluate
    * (function/json/json_get.sql). */
  def foldParseJsonLiterals(sql: String): String =
    "(?i)\\bparse_json\\s*\\(\\s*'((?:[^']|'')*)'\\s*\\)".r
      .replaceAllIn(sql, m => {
        val raw = m.group(1).replace("''", "'")
        val norm = try render(parse(raw)) catch {
          case e: Exception => throw new IllegalArgumentException(
            s"Invalid JSON text: $raw", e)
        }
        scala.util.matching.Regex.quoteReplacement(
          "'" + norm.replace("'", "''") + "'")
      })

  def register(spark: SparkSession): Unit = {
    spark.udf.register("__json2_apply", new UDF2[String, String, String] {
      def call(j: String, s: String): String = applyShred(j, s)
    }, StringType)
    spark.udf.register("__json2_hint", new UDF2[String, String, String] {
      def call(j: String, s: String): String = applyTypeHints(j, s)
    }, StringType)
    // parse_json: validate + normalize (shadows Spark's variant builtin
    // inside this dialect; JSON columns are strings here)
    spark.udf.register("parse_json", new UDF1[String, String] {
      def call(s: String): String =
        if (s == null) null
        else {
          val n = try parse(s) catch {
            case e: Exception => throw new IllegalArgumentException(
              s"Invalid JSON text: $s", e)
          }
          if (n == null) throw new IllegalArgumentException(s"Invalid JSON text: $s")
          render(n)
        }
    }, StringType)
    spark.udf.register("json_to_string", new UDF1[String, String] {
      def call(j: String): String =
        if (j == null) null else scala.util.Try(render(parse(j))).getOrElse(null)
    }, StringType)
    spark.udf.register("json_object_keys", new UDF1[String, Array[String]] {
      def call(j: String): Array[String] =
        if (j == null) null
        else scala.util.Try(parse(j)).toOption.filter(_.isObject).map { n =>
          val it = n.fieldNames()
          val b = Array.newBuilder[String]
          while (it.hasNext) b += it.next()
          b.result()
        }.orNull
    }, ArrayType(StringType))
    spark.udf.register("json_path_exists", new UDF2[String, String, java.lang.Boolean] {
      def call(j: String, p: String): java.lang.Boolean =
        if (j == null || p == null) null
        else parsePath(p) match {
          case None => false
          case Some(st) =>
            Boolean.box(scala.util.Try(eval(parse(j), st)).toOption.exists(_.nonEmpty))
        }
    }, BooleanType)
    spark.udf.register("json_path_match", new UDF2[String, String, java.lang.Boolean] {
      def call(j: String, p: String): java.lang.Boolean = {
        if (j == null || p == null) return null
        val m = "^(.*?)\\s*(==|!=|>=|<=|>|<)\\s*(.+)$".r.findFirstMatchIn(p.trim)
          .getOrElse(return null)
        val root = try parse(j) catch { case _: Exception => return null }
        if (root.isNull) return null
        parsePath(m.group(1)) match {
          case None => null
          case Some(st) =>
            Boolean.box(eval(root, st).exists(compare(_, m.group(2), m.group(3).trim)))
        }
      }
    }, BooleanType)

    // json_get returns the JSON value; rendered as a string it shows
    // scalars BARE (strings unquoted, numbers full-precision) and
    // containers as compact JSON (json_get.result `json_get(j,'[3]')::string`)
    spark.udf.register("json_get", new UDF2[String, String, String] {
      // an extracted JSON null is SQL NULL, not the text "null"
      // (types/json/json2.sql json2_variant_null pin)
      def call(j: String, p: String): String = getAt(j, p).filterNot(_.isNull).map { n =>
        if (n.isTextual) n.textValue
        else if (n.isNumber) numText(n)
        else render(n)
      }.orNull
    }, StringType)
    // raw JSON rendering (strings KEEP their quotes) — feeds the typed
    // `::` cast helpers, which must distinguish the JSON string "42"
    // from the number 42 (json2_cast.sql's a_bool column)
    spark.udf.register("__json_get_raw", new UDF2[String, String, String] {
      def call(j: String, p: String): String =
        getAt(j, p).filterNot(_.isNull).map(n => n.toString).orNull
    }, StringType)
    spark.udf.register("json_get_object", new UDF2[String, String, String] {
      def call(j: String, p: String): String =
        getAt(j, p).filter(_.isObject).map(render).orNull
    }, StringType)
    spark.udf.register("json_get_int", new UDF2[String, String, java.lang.Long] {
      def call(j: String, p: String): java.lang.Long = getAt(j, p) match {
        case Some(n) if n.isIntegralNumber => Long.box(n.longValue)
        case Some(n) if n.isBoolean => Long.box(if (n.booleanValue) 1L else 0L)
        case _ => null
      }
    }, LongType)
    spark.udf.register("json_get_float", new UDF2[String, String, java.lang.Double] {
      def call(j: String, p: String): java.lang.Double = getAt(j, p) match {
        case Some(n) if n.isNumber => Double.box(n.doubleValue)
        case Some(n) if n.isBoolean => Double.box(if (n.booleanValue) 1.0 else 0.0)
        case _ => null
      }
    }, DoubleType)
    spark.udf.register("json_get_string", new UDF2[String, String, String] {
      def call(j: String, p: String): String = getAt(j, p) match {
        case Some(n) if n.isTextual => n.textValue
        // scalars coerce to their rendering (json_get.result: numbers
        // AND bools; containers and json-null do not)
        case Some(n) if n.isNumber => numText(n)
        case Some(n) if n.isBoolean => n.asText
        case _ => null
      }
    }, StringType)
    spark.udf.register("json_get_bool", new UDF2[String, String, java.lang.Boolean] {
      def call(j: String, p: String): java.lang.Boolean =
        getAt(j, p).filter(_.isBoolean).map(n => Boolean.box(n.booleanValue)).orNull
    }, BooleanType)

    def is(name: String)(f: JsonNode => Boolean): Unit =
      spark.udf.register(name, new UDF1[String, java.lang.Boolean] {
        def call(j: String): java.lang.Boolean =
          if (j == null) null
          else scala.util.Try(parse(j)).toOption.map(n => Boolean.box(f(n))).orNull
      }, BooleanType)
    is("json_is_object")(_.isObject)
    is("json_is_array")(_.isArray)
    is("json_is_int")(_.isIntegralNumber)
    // as_f64 semantics: every number is a float (json_is.result pins
    // json_is_float(parse_json('1')) = true)
    is("json_is_float")(_.isNumber)
    is("json_is_bool")(_.isBoolean)
    is("json_is_null")(_.isNull)
    is("json_is_string")(_.isTextual)
  }
}
