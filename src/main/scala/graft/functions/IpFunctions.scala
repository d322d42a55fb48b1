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

  private def v6Bytes(s: String): Array[Byte] =
    java.net.InetAddress.getByName(s).getAddress

  val ipv6StringToNumUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else v6Bytes(s).map(b => f"${b & 0xff}%02x").mkString
    }

  val ipv6NumToStringUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (hex: String) =>
      if (hex == null) null
      else {
        val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        java.net.InetAddress.getByAddress(bytes).getHostAddress
      }
    }

  val ipv6InRangeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (ip: String, cidr: String) =>
      if (ip == null || cidr == null) null.asInstanceOf[java.lang.Boolean]
      else {
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
      }
    }

  def ipv6StringToNum(c: Column): Column = ipv6StringToNumUdf(c)
  def ipv6NumToString(c: Column): Column = ipv6NumToStringUdf(c)
  def ipv6InRange(ip: Column, cidr: Column): Column = ipv6InRangeUdf(ip, cidr)
}
