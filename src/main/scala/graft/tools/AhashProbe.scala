package graft.tools

import graft.multimodal.Multimodal

/** Fixture-viability probe for the Hamming near-dup pipeline
  * (`multimodal_neardup_pipeline`): across the 8 near-dup classes and
  * their 5 variants (base PNG, JPEG re-encode, 1/2/3-cell flips) every
  * within-class pair must land at ahash Hamming <= 3 of the BASE (the
  * CC chain pivots on the base) while every cross-class pair stays
  * > 3 — otherwise the banded pair join can't separate classes and the
  * generator-arithmetic oracle would be wrong.
  *
  * Finding (2026-08-16): the original gradient+checker patterns FAIL
  * this (JPEG re-encode drifts 5-6 bits, cross-class floors at 3), so
  * the fixture paints each class's splitmix64 word as uniform 8-px
  * cells — the decoded average-hash IS the word, within-class distance
  * is exactly the flip count, cross-class ~32. */
object AhashProbe {
  def main(args: Array[String]): Unit = {
    val variants: Seq[(Int, String, Long)] = for {
      c <- 0 until Multimodal.imageClasses
      (name, bytes) <- Seq(
        ("png", Multimodal.nearDupImageFor(c, 0, jpeg = false)),
        ("jpeg", Multimodal.nearDupImageFor(c, 0, jpeg = true)),
        ("f1", Multimodal.nearDupImageFor(c, 1, jpeg = false)),
        ("f2", Multimodal.nearDupImageFor(c, 2, jpeg = false)),
        ("f3", Multimodal.nearDupImageFor(c, 3, jpeg = false)))
    } yield (c, name, Multimodal.decodeImage(bytes).ahash)
    var ok = true
    var minCross = 64
    val idx = variants.zipWithIndex
    for (((c1, n1, h1), i1) <- idx; ((c2, n2, h2), i2) <- idx if i1 < i2) {
      val d = java.lang.Long.bitCount(h1 ^ h2)
      if (c1 == c2) {
        // every variant must reach the BASE within 3 (CC stitches the rest)
        val toBase = n1 == "png" || n2 == "png"
        val want = !toBase || d <= 3
        if (!want) { println(f"PROBE c$c1%d $n1/$n2 ham=$d <<< VIOLATION"); ok = false }
        if (toBase) println(f"PROBE within c$c1%d $n1%-4s vs $n2%-4s ham=$d%2d")
      } else {
        minCross = math.min(minCross, d)
        if (d <= 3) { println(f"PROBE c$c1%d/$n1 vs c$c2%d/$n2 ham=$d <<< VIOLATION"); ok = false }
      }
    }
    println(s"PROBE min cross-class hamming = $minCross")
    println(s"PROBE verdict: ${if (ok) "OK" else "BROKEN"}")
  }
}
