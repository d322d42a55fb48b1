package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** SQL-surface registration for the function library (reference
  * common/function/src/function_registry.rs:203-252). Column-native
  * functions (vector/json/ip4/math/string/geo-measure) are usable from
  * Scala without registration; this registers UDF-backed names so
  * `spark.sql` queries can call them like the reference's SQL surface.
  */
object Registry {

  def registerAll(spark: SparkSession): Unit = {
    // sketch aggregates (reference aggrs/approximate/{hll,uddsketch}.rs);
    // uddsketch_state/_merge are registered per-parameter-pair by
    // GraftSession.rewriteUddsketch (Spark UDAFs are monomorphic)
    import org.apache.spark.sql.{functions => F, Encoders}
    spark.udf.register("hll", F.udaf(graft.aggregates.Hll.hll, Encoders.STRING))
    spark.udf.register("hll_merge", F.udaf(graft.aggregates.Hll.hllMerge, Encoders.BINARY))
    spark.udf.register("hll_count",
      udf((s: Array[Byte]) => graft.aggregates.Hll.count(s)))
    // JSON-variant `::` casts over the RAW rendering (__json_get_raw —
    // strings keep quotes). Two dialects, never an ANSI cast error:
    //  - strict (JSON1 json_get, function/json/json_get.sql): int from
    //    integral/boolean only; bool from boolean only; strings → NULL
    //  - lenient (JSON2, types/json/json2_cast.sql): numeric strings
    //    parse, floats truncate to int, numbers → bool via != 0
    spark.udf.register("__json_cast_double",
      udf((raw: String, lenient: Boolean) => JsonCasts.toDouble(raw, lenient)))
    spark.udf.register("__json_cast_long",
      udf((raw: String, lenient: Boolean) => JsonCasts.toLong(raw, lenient)))
    spark.udf.register("__json_cast_bool",
      udf((raw: String, lenient: Boolean) => JsonCasts.toBool(raw, lenient)))
    // NULL (not NaN) on a null/empty sketch — the reference's calc
    // yields NULL for a bucket with no samples (flow_step_aggr's p99)
    spark.udf.register("uddsketch_calc",
      udf((q: Double, s: String) =>
        if (s == null) null
        else {
          val v = graft.aggregates.UddSketch.calc(q, s)
          if (v.isNaN) null else java.lang.Double.valueOf(v)
        }))

    // MySQL-compat string/number helpers the reference carries
    // (scalars/string/{insert,format}.rs; function/string/mysql_compat
    // .result pins pos/len edge cases and grouped rendering)
    spark.udf.register("mysql_insert",
      udf((s: String, pos: Int, len: Int, n: String) =>
        if (s == null || n == null) null
        else if (pos < 1 || pos > s.length) s
        else {
          val head = s.substring(0, pos - 1)
          val tailStart = if (len < 0) s.length else math.min(s.length, pos - 1 + len)
          head + n + s.substring(tailStart)
        }))
    spark.udf.register("format",
      udf((x: java.lang.Double, d: Int) =>
        if (x == null) null
        else {
          val digits = math.max(0, d)
          val bd = new java.math.BigDecimal(x)
            .setScale(digits, java.math.RoundingMode.HALF_UP)
          val fmt = new java.text.DecimalFormat(
            if (digits == 0) "#,##0" else "#,##0." + "0" * digits)
          fmt.format(bd)
        }))

    // DataFusion math helpers Spark lacks (datafusion/functions/math)
    spark.udf.register("gcd", udf((a: Long, b: Long) =>
      BigInt(a).gcd(BigInt(b)).toLong))
    spark.udf.register("lcm", udf((a: Long, b: Long) =>
      if (a == 0 || b == 0) 0L
      else (BigInt(a) / BigInt(a).gcd(BigInt(b)) * BigInt(b)).abs.toLong))

    // approx_distinct: bit-compatible DataFusion HLL (aggregates/
    // ApproxDistinct.scala); the type-aware hash is a Catalyst
    // expression so one rewrite serves every column type
    spark.udf.register("__approx_distinct",
      F.udaf(graft.aggregates.ApproxDistinct.agg, Encoders.LONG))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "__ahash64",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.aggregates.Ahash64(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "arrow_typeof",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrowTypeof(exprs.head),
      "built-in")

    // fulltext
    spark.udf.register("matches_term",
      (text: String, term: String) => TextMatch.termMatches(text, term, caseSensitive = true))
    spark.udf.register("matches",
      (text: String, query: String) =>
        if (text == null || query == null) false else TextMatch.compile(query)(text))

    // geo
    spark.udf.register("geohash",
      (lat: Double, lng: Double, p: Int) => GeoFunctions.geohashEncode(lat, lng, p))

    // geohash neighbours (reference geo/geohash.rs:232 order: n,nw,w,sw,s,se,e,ne)
    spark.udf.register("geohash_neighbours",
      new org.apache.spark.sql.api.java.UDF3[AnyRef, AnyRef, AnyRef, Array[String]] {
        def call(lat: AnyRef, lng: AnyRef, p: AnyRef): Array[String] =
          if (lat == null || lng == null || p == null) null
          else GeoFunctions.neighboursOf(
            lat.asInstanceOf[java.lang.Number].doubleValue,
            lng.asInstanceOf[java.lang.Number].doubleValue,
            p.asInstanceOf[java.lang.Number].intValue)
      }, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    spark.udf.register("wkt_point_from_latlng",
      new org.apache.spark.sql.api.java.UDF2[AnyRef, AnyRef, String] {
        def call(lat: AnyRef, lng: AnyRef): String =
          if (lat == null || lng == null) null
          else {
            def fmt(d: Double) = if (d == d.toLong) d.toLong.toString else d.toString
            val la = lat.asInstanceOf[java.lang.Number].doubleValue
            val lo = lng.asInstanceOf[java.lang.Number].doubleValue
            s"POINT(${fmt(lo)} ${fmt(la)})"
          }
      }, org.apache.spark.sql.types.StringType)

    // WKT relations/measure (reference geo/{measure,relation}.rs) —
    // st_distance_sphere_m over WKT rejects non-points like the reference
    spark.udf.register("st_area", (wkt: String) =>
      if (wkt == null) null else java.lang.Double.valueOf(GeoWkt.area(GeoWkt.parse(wkt))))
    spark.udf.register("st_distance", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(GeoWkt.distance(GeoWkt.parse(a), GeoWkt.parse(b))))
    spark.udf.register("st_distance_sphere_m", (a: String, b: String) =>
      if (a == null || b == null) null
      else (GeoWkt.parse(a), GeoWkt.parse(b)) match {
        case (GeoWkt.GPoint(p), GeoWkt.GPoint(q)) =>
          java.lang.Double.valueOf(GeoFunctions.haversineM(p.y, p.x, q.y, q.x))
        case _ => throw new IllegalArgumentException(
          "Great circle distance between non-point objects are not supported for now.")
      })
    spark.udf.register("st_contains", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoWkt.contains(GeoWkt.parse(a), GeoWkt.parse(b))))
    spark.udf.register("st_within", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoWkt.within(GeoWkt.parse(a), GeoWkt.parse(b))))
    spark.udf.register("st_intersects", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoWkt.intersects(GeoWkt.parse(a), GeoWkt.parse(b))))

    // s2 cells (reference geo/s2.rs). Ids are UInt64 -> Decimal(20,0)
    // so values above Long.MaxValue print unsigned like the reference.
    def cellOf(o: AnyRef): Long = o match {
      case d: java.math.BigDecimal => d.toBigInteger.longValue
      case n: java.lang.Number => n.longValue
      case s: String => java.lang.Long.parseUnsignedLong(s)
      case other => throw new IllegalArgumentException(s"bad cell: $other")
    }
    def unsignedDec(id: Long): java.math.BigDecimal =
      new java.math.BigDecimal(java.lang.Long.toUnsignedString(id))
    spark.udf.register("s2_latlng_to_cell",
      new org.apache.spark.sql.api.java.UDF2[AnyRef, AnyRef, java.math.BigDecimal] {
        def call(lat: AnyRef, lng: AnyRef): java.math.BigDecimal =
          if (lat == null || lng == null) null
          else unsignedDec(S2.latLngToCell( // decimal literals arrive as BigDecimal
            lat.asInstanceOf[java.lang.Number].doubleValue,
            lng.asInstanceOf[java.lang.Number].doubleValue))
      }, org.apache.spark.sql.types.DecimalType(20, 0))
    spark.udf.register("s2_cell_level",
      new org.apache.spark.sql.api.java.UDF1[AnyRef, java.lang.Integer] {
        def call(cell: AnyRef): java.lang.Integer =
          if (cell == null) null else Int.box(S2.level(cellOf(cell)))
      }, org.apache.spark.sql.types.IntegerType)
    spark.udf.register("s2_cell_to_token",
      new org.apache.spark.sql.api.java.UDF1[AnyRef, String] {
        def call(cell: AnyRef): String =
          if (cell == null) null else S2.token(cellOf(cell))
      }, org.apache.spark.sql.types.StringType)
    spark.udf.register("s2_cell_parent",
      new org.apache.spark.sql.api.java.UDF2[AnyRef, AnyRef, java.math.BigDecimal] {
        def call(cell: AnyRef, level: AnyRef): java.math.BigDecimal =
          if (cell == null || level == null) null
          else unsignedDec(S2.parent(cellOf(cell), cellOf(level).toInt))
      }, org.apache.spark.sql.types.DecimalType(20, 0))

    // ipv6 (ipv4 variants are Column-native; SQL wrappers for parity)
    spark.udf.register("ipv4_num_to_string", (n: Long) =>
      Seq(n >> 24 & 255, n >> 16 & 255, n >> 8 & 255, n & 255).mkString("."))
    spark.udf.register("ipv4_string_to_num", (s: String) =>
      s.split('.').foldLeft(0L)((acc, p) => acc * 256 + p.toLong))

    registerH3(spark)

    registerVectorSql(spark)
    JsonSql.register(spark)

    // t-digest quantiles (approx_percentile_cont family) — GraftSession's
    // dialect layer macro-expands the WITHIN GROUP spelling onto this
    spark.udf.register("__approx_pct_td",
      F.udaf(graft.aggregates.TDigest.agg,
        Encoders.product[(Double, Double, Double)]))
    // MAD frame statistics for the anomaly_score_mad window macro
    // (function/anomaly.sql); zscore/iqr expand to built-in aggregates
    spark.udf.register("__mad_stats",
      F.udaf(graft.aggregates.AnomalyWindowAggs.madStats, Encoders.DOUBLE))

    // clamp family SQL spellings (function/arithmetic.sql) — the Column
    // API (MathFunctions) is the codegen'd path
    spark.udf.register("clamp", (v: Double, lo: Double, hi: Double) =>
      math.min(math.max(v, lo), hi))
    spark.udf.register("clamp_min", (v: Double, lo: Double) => math.max(v, lo))
    spark.udf.register("clamp_max", (v: Double, hi: Double) => math.min(v, hi))
    // to_unixtime: string/date/timestamp/number → epoch seconds
    // (select/dummy.sql)
    spark.udf.register("to_unixtime",
      new org.apache.spark.sql.api.java.UDF1[AnyRef, java.lang.Long] {
        def call(x: AnyRef): java.lang.Long = x match {
          case null => null
          case n: java.lang.Number => n.longValue()
          case t: java.sql.Timestamp => t.getTime / 1000L
          case t: java.time.Instant => t.getEpochSecond
          case t: java.time.LocalDateTime => t.toEpochSecond(java.time.ZoneOffset.UTC)
          case d: java.sql.Date => d.toLocalDate.toEpochDay * 86400L
          case d: java.time.LocalDate => d.toEpochDay * 86400L
          case s: String =>
            val t = s.trim
            val norm = if (t.contains("T") || t.contains(" ")) t else t + "T00:00:00Z"
            val iso = norm.replace(" ", "T")
            try java.time.Instant.parse(
              if (iso.endsWith("Z") || iso.matches(".*[+-]\\d{2}:?\\d{2}$")) iso
              else iso + "Z").getEpochSecond
            catch {
              case _: Exception =>
                java.time.OffsetDateTime.parse(iso.replaceAll("([+-]\\d{4})$", "$1"),
                  java.time.format.DateTimeFormatter.ofPattern(
                    "yyyy-MM-dd'T'HH:mm:ssZ")).toEpochSecond
            }
          case other => throw new IllegalArgumentException(
            s"to_unixtime: $other")
        }
      }, org.apache.spark.sql.types.LongType)
    // quote_ident — PostgreSQL identifier quoting (system/pg_catalog.sql)
    spark.udf.register("quote_ident", (s: String) =>
      if (s == null) null
      else if (s.matches("[a-z_][a-z0-9_]*")) s
      else "\"" + s.replace("\"", "\"\"") + "\"")
    // IP function SQL spellings (function/ip.sql)
    spark.udf.register("inet_ntoa", (n: Long) =>
      s"${(n >> 24) & 255}.${(n >> 16) & 255}.${(n >> 8) & 255}.${n & 255}")
    spark.udf.register("ipv4_to_cidr", graft.functions.IpFunctions.ipv4ToCidrUdf)
    spark.udf.register("ipv6_to_cidr", graft.functions.IpFunctions.ipv6ToCidrUdf)
    spark.udf.register("ipv6_num_to_string",
      graft.functions.IpFunctions.ipv6NumToStringUdf)
    spark.udf.register("ipv6_string_to_num",
      graft.functions.IpFunctions.ipv6StringToNumUdf)
    spark.udf.register("ipv6_in_range", graft.functions.IpFunctions.ipv6InRangeUdf)
    spark.udf.register("ipv4_in_range", (ip: String, cidr: String) => {
      val Array(base, bitsS) = cidr.split("/")
      def num(s: String): Long = {
        val p = s.split("\\.").map(_.toLong)
        (p(0) << 24) | (p(1) << 16) | (p(2) << 8) | p(3)
      }
      val bits = bitsS.toInt
      val mask = if (bits == 0) 0L else (-1L << (32 - bits)) & 0xFFFFFFFFL
      (num(ip) & mask) == (num(base) & mask)
    })
  }

  /** Numeric trunc — DataFusion dialect semantics. ONLY GraftSession
    * sessions call this: it shadows Spark's builtin trunc, and Spark 4
    * resolves even functions.trunc(...) by name, so a global override
    * would hijack Column-API callers (Verify oracles). date_format's
    * session-tz-aware override lives in GraftSession for the same
    * reason. */
  def registerDialectOverrides(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val reg = spark.sessionState.functionRegistry

    // PG/DataFusion concat: nulls are skipped, non-strings cast
    // (function/string/concat.result: CONCAT('hello', NULL) = 'hello',
    // CONCAT(NULL, NULL) = ''). In this dialect concat is strings-only
    // (array concat is array_concat), so the shadow is total.
    reg.createOrReplaceTempFunction("concat",
      (exprs: Seq[Expression]) =>
        ConcatWs(Literal.create("", StringType) +:
          exprs.map(e => Cast(e, StringType))),
      "built-in")

    // PG/DataFusion ltrim/rtrim(str, trimChars) — Spark's two-arg forms
    // take (trimStr, srcStr), i.e. REVERSED (trim_pad.result pins
    // LTRIM('hello world', 'hel') = 'o world')
    reg.createOrReplaceTempFunction("ltrim",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s) => StringTrimLeft(s, None)
        case Seq(s, t) => StringTrimLeft(s, Some(t))
        case _ => throw new IllegalArgumentException("ltrim expects 1-2 args")
      }, "built-in")
    reg.createOrReplaceTempFunction("rtrim",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s) => StringTrimRight(s, None)
        case Seq(s, t) => StringTrimRight(s, Some(t))
        case _ => throw new IllegalArgumentException("rtrim expects 1-2 args")
      }, "built-in")

    // PG/DataFusion substring: a start below 1 consumes length before
    // the string begins (substring.result: SUBSTRING('hello', -1, 3) =
    // 'h', ('hello', 0, 3) = 'he'); Spark instead counts from the end
    def pgSubstring(exprs: Seq[Expression]): Expression = exprs match {
      case Seq(s, p) => Substring(s, p, Literal(Integer.MAX_VALUE))
      case Seq(s, p0, l0) =>
        val p = Cast(p0, IntegerType); val l = Cast(l0, IntegerType)
        val start = Greatest(Seq(p, Literal(1)))
        val len = Greatest(Seq(Subtract(Add(p, l), start), Literal(0)))
        Substring(s, start, len)
      case _ => throw new IllegalArgumentException("substring expects 2-3 args")
    }
    reg.createOrReplaceTempFunction("substring", pgSubstring, "built-in")
    reg.createOrReplaceTempFunction("substr", pgSubstring, "built-in")

    // PG/DataFusion initcap: words break on every non-alphanumeric
    // (upper_lower.result: 'hello-world_test' -> 'Hello-World_Test');
    // Spark's only breaks on whitespace
    spark.udf.register("initcap", (s: String) =>
      if (s == null) null
      else {
        val sb = new StringBuilder(s.length)
        var prevAlnum = false
        s.foreach { c =>
          val alnum = c.isLetterOrDigit
          sb.append(
            if (alnum && !prevAlnum) c.toUpper
            else if (alnum) c.toLower else c)
          prevAlnum = alnum
        }
        sb.toString
      })

    // arrow-style timestamp rendering for ts→string casts
    // (types/timestamp/timestamp.result: T separator, fraction at the
    // value's natural 0/3/6 digits)
    spark.udf.register("__ts_render",
      new org.apache.spark.sql.api.java.UDF1[AnyRef, String] {
        private def fmt(t: java.time.LocalDateTime): String = {
          val base = f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d" +
            f"T${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
          val n = t.getNano
          if (n == 0) base
          else if (n % 1000000 == 0) base + f".${n / 1000000}%03d"
          else base + f".${n / 1000}%06d"
        }
        def call(x: AnyRef): String = x match {
          case null => null
          case i: java.time.Instant =>
            fmt(java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))
          case l: java.time.LocalDateTime => fmt(l)
          case t: java.sql.Timestamp => fmt(t.toLocalDateTime)
          case other => String.valueOf(other)
        }
      }, org.apache.spark.sql.types.StringType)

    // nanosecond-timestamp rendering: µs-stored value + sub-µs
    // remainder digits → arrow-style string with the fraction trimmed
    // to its natural 0/3/6/9 digit group (types/timestamp/
    // timestamp_types.result: .889268321)
    spark.udf.register("__ns_render",
      new org.apache.spark.sql.api.java.UDF2[AnyRef, Integer, String] {
        def call(x: AnyRef, rem: Integer): String = {
          if (x == null) return null
          val t = x match {
            case i: java.time.Instant =>
              java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
            case l: java.time.LocalDateTime => l
            case ts: java.sql.Timestamp => ts.toLocalDateTime
            case _ => return String.valueOf(x)
          }
          val base = f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d" +
            f"T${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
          val ns = t.getNano.toLong + (if (rem == null) 0L else rem.toLong)
          if (ns == 0) base
          else if (ns % 1000000 == 0) base + f".${ns / 1000000}%03d"
          else if (ns % 1000 == 0) base + f".${ns / 1000}%06d"
          else base + f".$ns%09d"
        }
      }, org.apache.spark.sql.types.StringType)

    // PG strpos(str, sub): 1-based CHARACTER index, 0 when absent
    // (function/string/position.sql; unicode rows count code points)
    spark.udf.register("strpos", (s: String, sub: String) =>
      if (s == null || sub == null) null.asInstanceOf[java.lang.Long]
      else {
        val i = s.indexOf(sub)
        java.lang.Long.valueOf(if (i < 0) 0L else s.codePointCount(0, i) + 1L)
      })

    // PG string_to_array (function/string/string_split.sql): NULL sep →
    // per-character split; '' sep → whole string; empty string → [];
    // consecutive separators preserve empty elements
    spark.udf.register("string_to_array", (s: String, sep: String) =>
      if (s == null) null
      else if (s.isEmpty) Array.empty[String]
      else if (sep == null)
        s.codePoints.toArray.map(cp => new String(Character.toChars(cp)))
      else if (sep.isEmpty) Array(s)
      else s.split(java.util.regex.Pattern.quote(sep), -1))

    // MySQL INSERT(str,pos,len,newstr) — registered under an internal
    // name (INSERT is a statement keyword); dialect() renames calls.
    // Character-based; pos out of [1, len(str)] returns str unchanged;
    // len covering past the end (or negative) replaces through the end
    // (function/string/mysql_compat.sql)
    spark.udf.register("__mysql_insert",
      (str: String, pos: java.lang.Long, len: java.lang.Long, ns: String) => {
        if (str == null || pos == null || len == null || ns == null) null
        else {
          val chars = str.codePoints.toArray
          val n = chars.length
          val p = pos.toInt
          if (p < 1 || p > n) str
          else {
            val head = new String(chars, 0, p - 1)
            val tailFrom = if (len < 0 || p - 1 + len > n) n else (p - 1 + len).toInt
            head + ns + new String(chars, tailFrom, n - tailFrom)
          }
        }
      })

    // PG/DataFusion regexp_replace replaces only the FIRST match when
    // no flags are given (function/string/regex.result:
    // '  extra   spaces  ' \s+ -> ' ' touches only the leading run)
    spark.udf.register("regexp_replace", (s: String, p: String, r: String) =>
      if (s == null || p == null || r == null) null
      else java.util.regex.Pattern.compile(p).matcher(s)
        .replaceFirst(java.util.regex.Matcher.quoteReplacement(r)))

    // DataFusion regexp_extract returns the whole first match (no group
    // index); Spark's 2-arg form defaults to group 1 and rejects
    // group-less patterns. NULL (not '') on no match.
    spark.udf.register("regexp_extract", (s: String, p: String) =>
      if (s == null || p == null) null
      else {
        val m = java.util.regex.Pattern.compile(p).matcher(s)
        if (m.find()) m.group(0) else null
      })

    // PG/DataFusion replace with an empty search interleaves the
    // replacement around every char (replace.result); Spark returns the
    // input unchanged
    spark.udf.register("replace", (s: String, find: String, repl: String) =>
      if (s == null || find == null || repl == null) null
      else if (find.isEmpty) s.map(_.toString).mkString(repl, repl, repl)
      else s.replace(find, repl))

    // numeric trunc-toward-zero with decimal-digit control (DataFusion
    // trunc(x, d); d<0 truncates to tens/hundreds). Shadows Spark's
    // date-trunc builtin, which the corpus never calls by this name.
    spark.udf.register("trunc",
      new org.apache.spark.sql.api.java.UDF2[AnyRef, AnyRef, java.lang.Double] {
        def call(x0: AnyRef, d0: AnyRef): java.lang.Double = {
          if (x0 == null) null
          else {
            val x = x0 match {
              case n: java.lang.Number => n.doubleValue()
              case s: String => s.toDouble
            }
            val d = d0 match {
              case null => 0
              case n: java.lang.Number => n.intValue()
              case s: String => s.toInt
            }
            val p = math.pow(10, d)
            Double.box(
              (if (x >= 0) math.floor(x * p) else math.ceil(x * p)) / p)
          }
        }
      }, org.apache.spark.sql.types.DoubleType)
  }

  /** Minimal chrono/strftime formatter (the %-tokens the corpus uses). */
  object Strftime {
    def format(ts: java.sql.Timestamp, fmt: String): String = {
      val dt = ts.toLocalDateTime
      val sb = new StringBuilder
      var i = 0
      while (i < fmt.length) {
        val c = fmt.charAt(i)
        if (c == '%' && i + 2 < fmt.length && fmt.charAt(i + 1).isDigit &&
          fmt.charAt(i + 2) == 'f') {
          // %3f / %6f / %9f: fixed-width truncated fraction (chrono)
          val w = fmt.charAt(i + 1) - '0'
          sb.append(f"${dt.getNano}%09d".take(w))
          i += 3
        } else if (c == '%' && i + 1 < fmt.length) {
          fmt.charAt(i + 1) match {
            case 'Y' => sb.append(f"${dt.getYear}%04d")
            case 'y' => sb.append(f"${dt.getYear % 100}%02d")
            case 'm' => sb.append(f"${dt.getMonthValue}%02d")
            case 'd' => sb.append(f"${dt.getDayOfMonth}%02d")
            case 'e' => sb.append(f"${dt.getDayOfMonth}%2d")
            case 'H' => sb.append(f"${dt.getHour}%02d")
            case 'M' => sb.append(f"${dt.getMinute}%02d")
            case 'S' => sb.append(f"${dt.getSecond}%02d")
            case 'j' => sb.append(f"${dt.getDayOfYear}%03d")
            case 'f' => sb.append(f"${dt.getNano}%09d")
            case 'a' => sb.append(dt.getDayOfWeek.getDisplayName(
              java.time.format.TextStyle.SHORT, java.util.Locale.US))
            case 'A' => sb.append(dt.getDayOfWeek.getDisplayName(
              java.time.format.TextStyle.FULL, java.util.Locale.US))
            case 'b' => sb.append(dt.getMonth.getDisplayName(
              java.time.format.TextStyle.SHORT, java.util.Locale.US))
            case 'B' => sb.append(dt.getMonth.getDisplayName(
              java.time.format.TextStyle.FULL, java.util.Locale.US))
            case '%' => sb.append('%')
            case o => sb.append('%').append(o)
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
  }

  /** The 21 h3_* functions (reference common/function/src/scalars/geo/h3.rs).
    * Cell arguments accept Int64/UInt64/hex-string like the reference's
    * signature set; resolutions reject negatives like its UInt8 cast.
    */
  private def registerH3(spark: SparkSession): Unit = {
    import org.apache.spark.sql.api.java.{UDF1, UDF2, UDF3}
    import org.apache.spark.sql.types._

    def cellOf(o: AnyRef): Long = o match {
      case null => throw new IllegalArgumentException("H3 error: null cell")
      case d: java.math.BigDecimal => H3.validateCell(d.toBigInteger.longValue)
      case s: String => H3.stringToCell(s)
      case n: java.lang.Number => H3.validateCell(n.longValue)
      case other => throw new IllegalArgumentException(s"H3 error: bad cell $other")
    }
    def intOf(o: AnyRef, what: String): Int = o match {
      case null => throw new IllegalArgumentException(s"H3 error: null $what")
      case d: java.math.BigDecimal => d.intValueExact
      case n: java.lang.Number =>
        val v = n.longValue
        if (v < 0) throw new IllegalArgumentException(s"Cast error: Can't cast value $v to type UInt8")
        v.toInt
      case other => throw new IllegalArgumentException(s"H3 error: bad $what $other")
    }
    def doubleOf(o: AnyRef): java.lang.Double = o match {
      case null => null
      case d: java.math.BigDecimal => Double.box(d.doubleValue)
      case n: java.lang.Number => Double.box(n.doubleValue)
      case other => throw new IllegalArgumentException(s"H3 error: bad coordinate $other")
    }
    def cellsOf(o: AnyRef): Seq[Long] = o match {
      case null => Seq.empty
      case s: String => s.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map(H3.stringToCell)
      case xs: scala.collection.Seq[_] => xs.toSeq.map(x => cellOf(x.asInstanceOf[AnyRef]))
      case other => throw new IllegalArgumentException(s"H3 error: bad cell list $other")
    }

    spark.udf.register("h3_latlng_to_cell",
      new UDF3[AnyRef, AnyRef, AnyRef, java.lang.Long] {
        def call(lat0: AnyRef, lng0: AnyRef, r: AnyRef): java.lang.Long = {
          val lat = doubleOf(lat0); val lng = doubleOf(lng0)
          if (lat == null || lng == null || r == null) null
          else Long.box(H3.latLngToCell(lat, lng, H3.checkResolution(intOf(r, "resolution"))))
        }
      }, LongType)
    spark.udf.register("h3_latlng_to_cell_string",
      new UDF3[AnyRef, AnyRef, AnyRef, String] {
        def call(lat0: AnyRef, lng0: AnyRef, r: AnyRef): String = {
          val lat = doubleOf(lat0); val lng = doubleOf(lng0)
          if (lat == null || lng == null || r == null) null
          else H3.cellToString(H3.latLngToCell(lat, lng, H3.checkResolution(intOf(r, "resolution"))))
        }
      }, StringType)
    spark.udf.register("h3_cell_to_string",
      new UDF1[AnyRef, String] {
        def call(c: AnyRef): String = if (c == null) null else H3.cellToString(cellOf(c))
      }, StringType)
    spark.udf.register("h3_string_to_cell",
      new UDF1[String, java.lang.Long] {
        def call(s: String): java.lang.Long = if (s == null) null else Long.box(H3.stringToCell(s))
      }, LongType)
    spark.udf.register("h3_cell_center_latlng",
      new UDF1[AnyRef, Array[Double]] {
        def call(c: AnyRef): Array[Double] =
          if (c == null) null else { val (lat, lng) = H3.cellToLatLng(cellOf(c)); Array(lat, lng) }
      }, ArrayType(DoubleType))
    spark.udf.register("h3_cell_resolution",
      new UDF1[AnyRef, java.lang.Integer] {
        def call(c: AnyRef): java.lang.Integer = if (c == null) null else Int.box(H3.resolution(cellOf(c)))
      }, IntegerType)
    spark.udf.register("h3_cell_base",
      new UDF1[AnyRef, java.lang.Integer] {
        def call(c: AnyRef): java.lang.Integer =
          if (c == null) null else Int.box(H3.baseCellNumber(cellOf(c)))
      }, IntegerType)
    spark.udf.register("h3_cell_is_pentagon",
      new UDF1[AnyRef, java.lang.Boolean] {
        def call(c: AnyRef): java.lang.Boolean =
          if (c == null) null else Boolean.box(H3.isPentagon(cellOf(c)))
      }, BooleanType)
    spark.udf.register("h3_cell_center_child",
      new UDF2[AnyRef, AnyRef, java.lang.Long] {
        def call(c: AnyRef, r: AnyRef): java.lang.Long =
          if (c == null || r == null) null
          else Long.box(H3.centerChild(cellOf(c), intOf(r, "resolution")))
      }, LongType)
    spark.udf.register("h3_cell_parent",
      new UDF2[AnyRef, AnyRef, java.lang.Long] {
        def call(c: AnyRef, r: AnyRef): java.lang.Long =
          if (c == null || r == null) null
          else Long.box(H3.parent(cellOf(c), intOf(r, "resolution")))
      }, LongType)
    spark.udf.register("h3_cell_to_children",
      new UDF2[AnyRef, AnyRef, Array[Long]] {
        def call(c: AnyRef, r: AnyRef): Array[Long] =
          if (c == null || r == null) null
          else H3.children(cellOf(c), intOf(r, "resolution"))
      }, ArrayType(LongType))
    spark.udf.register("h3_cell_to_children_size",
      new UDF2[AnyRef, AnyRef, java.lang.Long] {
        def call(c: AnyRef, r: AnyRef): java.lang.Long =
          if (c == null || r == null) null
          else Long.box(H3.childrenSize(cellOf(c), intOf(r, "resolution")))
      }, LongType)
    spark.udf.register("h3_cell_to_child_pos",
      new UDF2[AnyRef, AnyRef, java.lang.Long] {
        def call(c: AnyRef, r: AnyRef): java.lang.Long =
          if (c == null || r == null) null
          else Long.box(H3.cellToChildPos(cellOf(c), intOf(r, "resolution")))
      }, LongType)
    spark.udf.register("h3_child_pos_to_cell",
      new UDF3[AnyRef, AnyRef, AnyRef, java.lang.Long] {
        def call(pos: AnyRef, c: AnyRef, r: AnyRef): java.lang.Long =
          if (pos == null || c == null || r == null) null
          else Long.box(H3.childPosToCell(intOf(pos, "position").toLong, cellOf(c), intOf(r, "resolution")))
      }, LongType)
    spark.udf.register("h3_grid_disk",
      new UDF2[AnyRef, AnyRef, Array[Long]] {
        def call(c: AnyRef, k: AnyRef): Array[Long] =
          if (c == null || k == null) null else H3.gridDisk(cellOf(c), intOf(k, "k"))
      }, ArrayType(LongType))
    spark.udf.register("h3_grid_disk_distances",
      new UDF2[AnyRef, AnyRef, Array[Long]] {
        def call(c: AnyRef, k: AnyRef): Array[Long] =
          if (c == null || k == null) null else H3.gridDisk(cellOf(c), intOf(k, "k"))
      }, ArrayType(LongType))
    spark.udf.register("h3_grid_distance",
      new UDF2[AnyRef, AnyRef, java.lang.Integer] {
        def call(a: AnyRef, b: AnyRef): java.lang.Integer =
          if (a == null || b == null) null else Int.box(H3.gridDistance(cellOf(a), cellOf(b)))
      }, IntegerType)
    spark.udf.register("h3_grid_path_cells",
      new UDF2[AnyRef, AnyRef, Array[Long]] {
        def call(a: AnyRef, b: AnyRef): Array[Long] =
          if (a == null || b == null) null else H3.gridPathCells(cellOf(a), cellOf(b))
      }, ArrayType(LongType))
    spark.udf.register("h3_cells_contains",
      new UDF2[AnyRef, AnyRef, java.lang.Boolean] {
        def call(cells: AnyRef, c: AnyRef): java.lang.Boolean =
          if (c == null) null else Boolean.box(H3.cellsContains(cellsOf(cells), cellOf(c)))
      }, BooleanType)
    spark.udf.register("h3_distance_sphere_km",
      new UDF2[AnyRef, AnyRef, java.lang.Double] {
        def call(a: AnyRef, b: AnyRef): java.lang.Double =
          if (a == null || b == null) null
          else Double.box(H3.distanceSphereKm(cellOf(a), cellOf(b)))
      }, DoubleType)
    spark.udf.register("h3_distance_degree",
      new UDF2[AnyRef, AnyRef, java.lang.Double] {
        def call(a: AnyRef, b: AnyRef): java.lang.Double =
          if (a == null || b == null) null
          else Double.box(H3.distanceDegree(cellOf(a), cellOf(b)))
      }, DoubleType)
  }

  /** SQL surface of the vector family (reference scalars/vector dir,
    * function/vector/vector.result). Every vector argument accepts a
    * '[1,2]' string or an array<float> column (the reference
    * auto-parses string literals); math runs in f32 so the rendered
    * values match the reference's f32 results bit-for-bit. */
  private def registerVectorSql(spark: SparkSession): Unit = {
    import org.apache.spark.sql.api.java.{UDF1, UDF2, UDF3}
    import org.apache.spark.sql.types._
    val vecType = ArrayType(FloatType)

    def vecOf(x: AnyRef): Array[Float] = x match {
      case null => null
      case s: String =>
        val t = s.trim.stripPrefix("[").stripSuffix("]").trim
        if (t.isEmpty) Array.empty[Float]
        else t.split(",").map(_.trim.toFloat)
      case a: scala.collection.Seq[_] =>
        a.map(_.asInstanceOf[java.lang.Number].floatValue).toArray
      case a: Array[Float] => a
      case a: Array[_] =>
        a.map(_.asInstanceOf[java.lang.Number].floatValue)
    }
    // Rust f32 Display: shortest roundtrip, no ".0" on integral values
    def fmtF32(f: Float): String =
      if (f.isNaN) "NaN"
      else if (f.isInfinite) (if (f > 0) "inf" else "-inf")
      else if (f == f.toLong && math.abs(f) < 1e7f) f.toLong.toString
      else java.lang.Float.toString(f)
    def render(v: Array[Float]): String =
      if (v == null) null else v.map(fmtF32).mkString("[", ",", "]")
    def zip2(a0: AnyRef, b0: AnyRef)(f: (Float, Float) => Float): Array[Float] = {
      val (a, b) = (vecOf(a0), vecOf(b0))
      if (a == null || b == null) return null
      require(a.length == b.length, s"vectors length not match: ${a.length} vs ${b.length}")
      val out = new Array[Float](a.length)
      var i = 0
      while (i < a.length) { out(i) = f(a(i), b(i)); i += 1 }
      out
    }
    def reg1(name: String, tpe: DataType)(f: Array[Float] => AnyRef): Unit =
      spark.udf.register(name, new UDF1[AnyRef, AnyRef] {
        def call(x: AnyRef): AnyRef = { val v = vecOf(x); if (v == null) null else f(v) }
      }, tpe)
    def reg2(name: String)(f: (Float, Float) => Float): Unit =
      spark.udf.register(name, new UDF2[AnyRef, AnyRef, Array[Float]] {
        def call(a: AnyRef, b: AnyRef): Array[Float] = zip2(a, b)(f)
      }, vecType)

    spark.udf.register("parse_vec", new UDF1[AnyRef, Array[Float]] {
      def call(s: AnyRef): Array[Float] = vecOf(s)
    }, vecType)
    // vector AGGREGATES on the SQL surface (vec_sum/vec_avg/vec_product
    // over '[...]' strings or array<float> — aggrs/vector/*.rs). The
    // session rewrites `vec_sum(x)` → `__vec_sum_agg(parse_vec(x))`.
    spark.udf.register("__vec_sum_agg", graft.aggregates.VectorAggs.vecSumUdaf)
    spark.udf.register("__vec_avg_agg", graft.aggregates.VectorAggs.vecAvgUdaf)
    spark.udf.register("__vec_product_agg", graft.aggregates.VectorAggs.vecProductUdaf)
    // bare-SELECT admin fns (function/admin/flush_compact_table.sql's
    // `SELECT FLUSH_TABLE('t')`) — same no-op 0 as the ADMIN form
    spark.udf.register("flush_table", udf((_: String) => 0L))
    spark.udf.register("compact_table", udf((_: String) => 0L))
    spark.udf.register("flush_region", udf((_: Long) => 0L))
    spark.udf.register("compact_region", udf((_: Long) => 0L))
    reg1("vec_to_string", StringType)(v => render(v))
    reg1("vec_dim", IntegerType)(v => Int.box(v.length))
    reg1("vec_elem_sum", FloatType)(v => Float.box(v.foldLeft(0f)(_ + _)))
    reg1("vec_elem_product", FloatType)(v => Float.box(v.foldLeft(1f)(_ * _)))
    reg1("vec_elem_avg", FloatType)(v =>
      Float.box(if (v.isEmpty) Float.NaN else v.foldLeft(0f)(_ + _) / v.length))
    // vec_norm NORMALIZES (reference vector_norm.rs: v / |v|)
    reg1("vec_norm", vecType) { v =>
      val n = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x)).toFloat
      v.map(_ / n)
    }
    reg2("vec_add")(_ + _)
    reg2("vec_sub")(_ - _)
    reg2("vec_mul")(_ * _)
    reg2("vec_div")(_ / _)
    spark.udf.register("vec_scalar_add", new UDF2[AnyRef, AnyRef, Array[Float]] {
      def call(s: AnyRef, v0: AnyRef): Array[Float] = {
        val v = vecOf(v0)
        if (s == null || v == null) null
        else { val f = s.asInstanceOf[java.lang.Number].floatValue; v.map(_ + f) }
      }
    }, vecType)
    spark.udf.register("vec_scalar_mul", new UDF2[AnyRef, AnyRef, Array[Float]] {
      def call(s: AnyRef, v0: AnyRef): Array[Float] = {
        val v = vecOf(v0)
        if (s == null || v == null) null
        else { val f = s.asInstanceOf[java.lang.Number].floatValue; v.map(_ * f) }
      }
    }, vecType)
    spark.udf.register("vec_kth_elem", new UDF2[AnyRef, AnyRef, java.lang.Float] {
      def call(v0: AnyRef, k0: AnyRef): java.lang.Float = {
        val v = vecOf(v0)
        if (v == null || k0 == null) null
        else {
          val k = k0.asInstanceOf[java.lang.Number].intValue
          if (k < 0 || k >= v.length) null else Float.box(v(k))
        }
      }
    }, FloatType)
    spark.udf.register("vec_subvector", new UDF3[AnyRef, AnyRef, AnyRef, Array[Float]] {
      def call(v0: AnyRef, s0: AnyRef, e0: AnyRef): Array[Float] = {
        val v = vecOf(v0)
        if (v == null || s0 == null || e0 == null) null
        else {
          val s = s0.asInstanceOf[java.lang.Number].intValue
          val e = e0.asInstanceOf[java.lang.Number].intValue
          require(s >= 0 && e >= s && e <= v.length,
            s"invalid subvector range [$s, $e) over ${v.length}")
          java.util.Arrays.copyOfRange(v, s, e)
        }
      }
    }, vecType)
    def dist(name: String)(f: (Array[Float], Array[Float]) => Float): Unit =
      spark.udf.register(name, new UDF2[AnyRef, AnyRef, java.lang.Float] {
        def call(a0: AnyRef, b0: AnyRef): java.lang.Float = {
          val (a, b) = (vecOf(a0), vecOf(b0))
          if (a == null || b == null) null
          else {
            require(a.length == b.length,
              s"vectors length not match: ${a.length} vs ${b.length}")
            Float.box(f(a, b))
          }
        }
      }, FloatType)
    dist("vec_dot_product") { (a, b) =>
      var s = 0f; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    dist("vec_l2sq_distance") { (a, b) =>
      var s = 0f; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    dist("vec_cos_distance") { (a, b) =>
      var dp = 0f; var na = 0f; var nb = 0f; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      // zero vector → distance 1 (vector_distance.result pins 1.0)
      if (na == 0f || nb == 0f) 1f
      else 1f - dp / (math.sqrt(na.toDouble).toFloat * math.sqrt(nb.toDouble).toFloat)
    }
  }
}
