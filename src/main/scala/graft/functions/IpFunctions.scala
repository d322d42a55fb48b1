package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IP address functions — reference common/function/src/scalars/ip
  * (SURVEY.md §2.8). IPv4 paths are pure Column arithmetic (codegen'd);
  * IPv6 uses compact UDFs over java.net.InetAddress.
  */
object IpFunctions {

  /** ipv4_num_to_string / inet_ntoa: 3232235521 -> '192.168.0.1' */
  def ipv4NumToString(c: Column): Column = {
    val n = c.cast("long")
    concat_ws(".",
      (n / 16777216 % 256).cast("long"),
      (n / 65536 % 256).cast("long"),
      (n / 256 % 256).cast("long"),
      (n % 256).cast("long"))
  }

  /** ipv4_string_to_num: '192.168.0.1' -> 3232235521 */
  def ipv4StringToNum(c: Column): Column = {
    val p = split(c, "\\.")
    element_at(p, 1).cast("long") * 16777216 +
      element_at(p, 2).cast("long") * 65536 +
      element_at(p, 3).cast("long") * 256 +
      element_at(p, 4).cast("long")
  }

  /** ipv4_to_cidr('1.2.3.4', 24) -> '1.2.3.0/24' */
  def ipv4ToCidr(ip: Column, prefix: Column): Column = {
    val masked = ipv4StringToNum(ip)
      .bitwiseAND(call_function("shiftleft", lit(-1L), lit(32) - prefix.cast("int"))
        .bitwiseAND(lit(0xFFFFFFFFL)))
    concat(ipv4NumToString(masked), lit("/"), prefix.cast("string"))
  }

  /** ipv4_in_range('1.2.3.4', '1.2.3.0/24') -> true */
  def ipv4InRange(ip: Column, cidr: Column): Column = {
    val parts = split(cidr, "/")
    val base = ipv4StringToNum(element_at(parts, 1))
    val bits = element_at(parts, 2).cast("int")
    val mask = call_function("shiftleft", lit(-1L), lit(32) - bits)
      .bitwiseAND(lit(0xFFFFFFFFL))
    ipv4StringToNum(ip).bitwiseAND(mask) === base.bitwiseAND(mask)
  }

  // ---- IPv6 (UDF-backed; not on any hot analytic path) ----------------

  /** Always 16 bytes: a dotted-quad input (reachable when Catalyst
    * speculatively evaluates a CASE branch on IPv4 rows — function/
    * ip.sql's combined v4/v6 query) widens to the IPv4-mapped form
    * instead of crashing downstream 16-byte indexing. */
  private def v6Bytes(s: String): Array[Byte] =
    java.net.InetAddress.getByName(s).getAddress match {
      case b4 if b4.length == 4 =>
        val b = new Array[Byte](16)
        b(10) = 0xff.toByte; b(11) = 0xff.toByte
        System.arraycopy(b4, 0, b, 12, 4)
        b
      case b16 => b16
    }

  val ipv6StringToNumUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else v6Bytes(s).map(b => f"${b & 0xff}%02x").mkString
    }

  /** Rust-Display-style IPv6 rendering: longest zero run (≥2 groups)
    * compresses to `::`, the v4-mapped form renders `::ffff:a.b.c.d`
    * (function/ip.result pins both). */
  private def v6Format(bytes: Array[Byte]): String = {
    val segs = (0 until 8).map(i =>
      ((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff))
    val mapped = (0 until 10).forall(i => bytes(i) == 0) &&
      (bytes(10) & 0xff) == 0xff && (bytes(11) & 0xff) == 0xff
    if (mapped)
      "::ffff:" + (12 until 16).map(i => bytes(i) & 0xff).mkString(".")
    else {
      // longest zero-segment run
      var bestStart = -1; var bestLen = 0
      var i = 0
      while (i < 8) {
        if (segs(i) == 0) {
          var j = i
          while (j < 8 && segs(j) == 0) j += 1
          if (j - i > bestLen) { bestLen = j - i; bestStart = i }
          i = j
        } else i += 1
      }
      if (bestLen < 2) segs.map(s => f"$s%x").mkString(":")
      else {
        val head = segs.take(bestStart).map(s => f"$s%x").mkString(":")
        val tail = segs.drop(bestStart + bestLen).map(s => f"$s%x").mkString(":")
        s"$head::$tail"
      }
    }
  }

  val ipv6NumToStringUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (hex: String) =>
      if (hex == null) null
      else v6Format(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    }

  /** ipv4_to_cidr auto/specified (reference scalars/ip/cidr.rs): the
    * auto form infers the prefix from missing octets or trailing zero
    * bits (rounded down to 8-bit boundaries). */
  val ipv4ToCidrUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (ip: String, prefix: java.lang.Integer) =>
      if (ip == null) null
      else {
        val dots = ip.count(_ == '.')
        val full = dots match {
          case 0 => ip + ".0.0.0"
          case 1 => ip + ".0.0"
          case 2 => ip + ".0"
          case _ => ip
        }
        val parts = full.split("\\.").map(_.toLong)
        val bits = (parts(0) << 24) | (parts(1) << 16) | (parts(2) << 8) | parts(3)
        val subnet: Int =
          if (prefix != null) prefix.intValue()
          else dots match {
            case 0 => 8
            case 1 => 16
            case 2 => 24
            case _ =>
              val tz = if (bits == 0) 32 else java.lang.Long.numberOfTrailingZeros(bits)
              if (tz % 8 == 0) 32 - math.min(tz, 32) else 32 - (tz / 8) * 8
          }
        val mask = if (subnet == 0) 0L else (-1L << (32 - subnet)) & 0xFFFFFFFFL
        val m = bits & mask
        s"${(m >> 24) & 255}.${(m >> 16) & 255}.${(m >> 8) & 255}.${m & 255}/$subnet"
      }
    }

  /** ipv6_to_cidr auto/specified — the reference's auto rule including
    * its pinned special cases (2001:db8 → /32, ::1 → /128, fe80:: →
    * /16; otherwise last-nonzero-segment position, /64 floor). */
  val ipv6ToCidrUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (ip: String, prefix: java.lang.Integer) =>
      // total on malformed input: a speculatively-evaluated CASE branch
      // may feed IPv4 text here; the row's surviving branch provides
      // the real value, so null (not a crash) is the right result
      if (ip == null) null
      else try {
        val completed =
          if (ip.contains("::")) ip
          else if (ip.endsWith(":")) ip + ":"
          else if (ip.split(":").length < 8) ip + "::"
          else ip
        val bytes = v6Bytes(completed)
        val canonical = v6Format(bytes)
        val segs = (0 until 8).map(i =>
          ((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff))
        val subnet: Int =
          if (prefix != null) prefix.intValue()
          else if (canonical.startsWith("2001:db8:")) 32
          else if (canonical == "::1") 128
          else if (canonical.startsWith("fe80::")) 16
          else {
            var s = 128
            var i = 7
            var done = false
            while (i >= 0 && !done) {
              if (segs(i) != 0) {
                s = if ((segs(i) & 0xff) == 0) i * 16 + 8 else (i + 1) * 16
                done = true
              }
              i -= 1
            }
            if (s < 16) 64 else s
          }
        val masked = new Array[Byte](16)
        var i = 0
        while (i < 16) {
          val bitPos = i * 8
          if (bitPos < subnet) {
            if (bitPos + 8 <= subnet) masked(i) = bytes(i)
            else masked(i) = (bytes(i) & (0xff << (8 - (subnet - bitPos)))).toByte
          }
          i += 1
        }
        s"${v6Format(masked)}/$subnet"
      } catch { case _: java.net.UnknownHostException => null }
    }

  val ipv6InRangeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (ip: String, cidr: String) =>
      if (ip == null || cidr == null) null.asInstanceOf[java.lang.Boolean]
      else try {
        val Array(base, bitsS) = cidr.split("/")
        val bits = bitsS.toInt
        val a = v6Bytes(ip); val b = v6Bytes(base)
        var ok = a.length == b.length
        var i = 0
        while (ok && i * 8 < bits) {
          val rem = bits - i * 8
          val mask = if (rem >= 8) 0xff else (0xff << (8 - rem)) & 0xff
          ok = (a(i) & mask) == (b(i) & mask)
          i += 1
        }
        java.lang.Boolean.valueOf(ok)
      } catch { case _: java.net.UnknownHostException =>
        null.asInstanceOf[java.lang.Boolean] }
    }

  def ipv6StringToNum(c: Column): Column = ipv6StringToNumUdf(c)
  def ipv6NumToString(c: Column): Column = ipv6NumToStringUdf(c)
  def ipv6InRange(ip: Column, cidr: Column): Column = ipv6InRangeUdf(ip, cidr)
}
