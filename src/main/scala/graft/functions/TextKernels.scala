package graft.functions

import java.util.zip.Deflater
import org.apache.spark.unsafe.types.UTF8String

/** Pure static TEXT kernels called from whole-stage codegen via
  * `StaticInvoke` (the [[StatKernels]] contract: no closure capture,
  * no UDF serialization, safe in corpus-scale hot paths). */
object TextKernels {

  /** zlib-compressed-size / raw-size ratio of the UTF-8 bytes — the
    * classic compression-based repetitiveness proxy of web-corpus
    * curation (boilerplate and templated spam compress far below
    * natural prose; near-random noise sits near or above 1). Level 6
    * (zlib default), raw deflate stream; deterministic for a given
    * input within a zlib build, which is why this signal is
    * spec-gated rather than oracle-gated — SQL engines ship no
    * deflate. Empty text → 1.0 by convention (no evidence either
    * way; keeps the downstream threshold monotone). */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total.toDouble / bytes.length
  }
}
