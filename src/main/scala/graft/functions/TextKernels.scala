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
