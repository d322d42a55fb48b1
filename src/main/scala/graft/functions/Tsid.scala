package graft.functions

/** Metric-engine __tsid generation (reference
  * metric-engine/src/row_modifier.rs:182-250): a 64-bit FxHash over the
  * sorted non-null label names seeds a second FxHash over the label
  * values. Byte-exact with the fxhash crate: 8-byte little-endian
  * chunks, then one 4-byte chunk, then single bytes; every string is
  * terminated with a 0xff word.
  *
  * Values are pinned by insert/logical_metric_table.result
  * (host1 -> 13882403126406556045 etc).
  */
object Tsid {

  private final val Seed = 0x517cc1b727220a95L

  final class Fx(private var h: Long = 0L) {
    def add(w: Long): Unit = h = (java.lang.Long.rotateLeft(h, 5) ^ w) * Seed
    def write(b: Array[Byte]): Unit = {
      var i = 0
      while (b.length - i >= 8) {
        var w = 0L
        var j = 7
        while (j >= 0) { w = (w << 8) | (b(i + j) & 0xffL); j -= 1 }
        add(w); i += 8
      }
      if (b.length - i >= 4) {
        var w = 0L
        var j = 3
        while (j >= 0) { w = (w << 8) | (b(i + j) & 0xffL); j -= 1 }
        add(w); i += 4
      }
      while (i < b.length) { add(b(i) & 0xffL); i += 1 }
    }
    def writeStr(s: String): Unit = {
      write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)); add(0xffL)
    }
    def finish: Long = h
  }

  /** tsid over (label name, value) pairs; pairs must already be sorted
    * by name and null values excluded. */
  def tsid(pairs: Seq[(String, String)]): Long = {
    val names = new Fx()
    pairs.foreach(p => names.writeStr(p._1))
    val f = new Fx()
    f.add(names.finish)
    pairs.foreach(p => f.writeStr(p._2))
    f.finish
  }

  /** Unsigned rendering (UInt64 semantics). */
  def unsignedDecimal(id: Long): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Long.toUnsignedString(id))
}
