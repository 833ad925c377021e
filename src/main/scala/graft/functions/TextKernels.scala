package graft.functions

import java.util.zip.Deflater
import org.apache.spark.unsafe.types.UTF8String

/** Pure static TEXT kernels called from whole-stage codegen via
  * `StaticInvoke` (the [[StatKernels]] contract: no closure capture,
  * no UDF serialization, safe in corpus-scale hot paths). */
object TextKernels {

  // one native Deflater (and scratch buffer) per executor thread,
  // reset between rows — allocating a native zlib stream per ROW
  // would leak native memory to the Cleaner's mercy at corpus scale
  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, false)
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Rebuild the cleaned single-spaced token stream after repeated-
    * span masking ([[graft.operators.TextDedup.removeRepeatedSpans]]):
    * token positions covered by any interval [s, s+n-1] for a start
    * position `s` in `starts` (SORTED ascending) are dropped; the
    * survivors join with single spaces. Linear two-pointer merge —
    * O(tokens + starts) per document, no quadratic containment scan.
    * Replaces the round-17 coverage WINDOW (running max of starts ≤
    * pos) exactly: kept ⇔ pos > lastStart + n − 1 ⇔ pos not covered. */
  def maskSpans(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      starts: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): UTF8String = {
    val nTok = toks.numElements()
    val nSt = starts.numElements()
    val sb = new java.lang.StringBuilder
    var sp = 0
    var coverEnd = -1L
    var i = 0
    while (i < nTok) {
      while (sp < nSt && starts.getInt(sp) <= i) {
        val e = starts.getInt(sp).toLong + (n - 1)
        if (e > coverEnd) coverEnd = e
        sp += 1
      }
      if (i > coverEnd) {
        if (sb.length > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i).toString)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Number of token positions in [0, nTokens) covered by the union
    * of [s, s+n-1] intervals over the SORTED `starts` — the companion
    * count to [[maskSpans]] (n_removed; kept = nTokens − covered). */
  def coveredCount(nTokens: Int,
      starts: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): Int = {
    val nSt = starts.numElements()
    var covered = 0L
    var curStart = -1L
    var curEnd = -2L
    var i = 0
    while (i < nSt) {
      val s = starts.getInt(i).toLong
      val e = math.min(s + (n - 1), nTokens - 1L)
      if (s > curEnd + 1) {
        if (curEnd >= curStart) covered += curEnd - curStart + 1
        curStart = s; curEnd = e
      } else if (e > curEnd) curEnd = e
      i += 1
    }
    if (curEnd >= curStart && curStart >= 0) covered += curEnd - curStart + 1
    covered.toInt
  }

  /** zlib-compressed-size / raw-size ratio of the UTF-8 bytes — the
    * classic compression-based repetitiveness proxy of web-corpus
    * curation (boilerplate and templated spam compress far below
    * natural prose; short or near-random text sits near or above 1,
    * helped there by the zlib header + adler32 trailer this wrapped
    * stream carries). Level 6 (zlib default); deterministic for a
    * given input within a zlib build, which is why this signal is
    * spec-gated rather than oracle-gated — SQL engines ship no
    * deflate. Empty text → 1.0 by convention (no evidence either
    * way; keeps the downstream threshold monotone). */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = deflaters.get()
    val buf = buffers.get()
    try {
      d.setInput(bytes)
      d.finish()
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.reset()
  }
}
