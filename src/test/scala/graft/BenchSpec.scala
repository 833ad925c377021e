package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.BenchAttribution.{RowIn, classify}

/** Fixture pins for the PURE vs_prior per-row attribution (VERDICT
  * r16 #2): every shape the classifier was built against — previously
  * validated only by contended live runs — fails loudly here if a
  * future edit re-opens a closed blind spot. All values are lifted
  * from the committed artifacts they reproduce. */
class BenchSpec extends AnyFunSuite {

  private val floor = 1.537 // the r16 committed soak's per-query p90

  test("r16 q171: soak-quiet by band dispersion, flat shuffle, inflated cpusec => contention-suspect") {
    // the VERDICT r16 finding, values verbatim from the committed
    // artifacts (bench_out.json / bench_prior.json / the three
    // bench_r16_run*.json the soak lists): soak band 0.946/1.085/
    // 1.264 s with prior 0.946 (prior IS the soak median file,
    // sitting at the band's minimum); committed cold 2.98 s at 1.00x
    // shuffle bytes (1.9 MB) and cpusec_ratio 4.92 — the exact
    // r15-q172 SMT-inflation signature. The old `1.3 x prior`
    // quietness anchor rejected the legitimate 1.264 s soak sample
    // (1.264 > 1.3*0.946 = 1.230 by 0.034 s) and the row wore a bare
    // "real work growth" label on same-code code.
    val out = classify(RowIn(priorCold = 0.9465, cold = 2.98,
      taskRatio = Some(7.56), cpusecRatio = Some(4.92),
      shufRatio = Some(1.00), shufMb = 1.9,
      soakVals = Seq(0.9465, 1.0851, 1.2640), noiseFloor = floor,
      anySteal = false)).get
    assert(out.regressed)
    assert(out.cause.startsWith("contention-suspect"),
      s"ROADMAP r16 thread #2's reoccurrence shape must read " +
        s"contention-suspect, got: ${out.cause}")
    assert(out.ambient)
  }

  test("r15 q172: all soak runs quiet, only the committed cold elevated => contention-suspect") {
    // the original VERDICT r15 #1 shape: wall 3.1 -> 21.5 s with CPU
    // counters inflating alongside (contended SMT accrues CPU-seconds
    // at full rate), flat shuffle bytes, every same-code soak run at
    // prior level
    val out = classify(RowIn(priorCold = 3.1, cold = 21.5,
      taskRatio = Some(6.0), cpusecRatio = Some(6.1),
      shufRatio = Some(0.98), shufMb = 120.0,
      soakVals = Seq(2.9, 3.2, 3.4), noiseFloor = floor,
      anySteal = false)).get
    assert(out.regressed && out.ambient)
    assert(out.cause.startsWith("contention-suspect"), out.cause)
    assert(out.cause.contains("cpusec_ratio 6.10 disregarded"),
      s"the disregarded CPU counter must be stated inline: ${out.cause}")
  }

  test("planted q10: shuffle-byte growth overrides a quiet soak => real work growth") {
    // the BENCH_CONTENTION_r16 receipt: a planted distinct/repartition
    // regression moves MORE BYTES (1.66x) — physical evidence no soak
    // row can explain away; the soak (run on unplanted code) is quiet,
    // and the override must still attribute work growth
    val out = classify(RowIn(priorCold = 2.0, cold = 5.0,
      taskRatio = Some(2.4), cpusecRatio = Some(2.5),
      shufRatio = Some(1.66), shufMb = 100.0,
      soakVals = Seq(1.9, 2.0, 2.1), noiseFloor = floor,
      anySteal = false)).get
    assert(out.regressed && !out.ambient)
    assert(out.cause.startsWith("task-inflation-work"), out.cause)
    assert(out.cause.contains("1.66x shuffle bytes"), out.cause)
  }

  test("ambient steal outranks every other attribution") {
    val out = classify(RowIn(priorCold = 1.5, cold = 3.0,
      taskRatio = Some(2.0), cpusecRatio = Some(2.0),
      shufRatio = Some(1.0), shufMb = 20.0,
      soakVals = Seq(1.4, 1.5, 1.6), noiseFloor = floor,
      anySteal = true)).get
    assert(out.regressed && out.ambient)
    assert(out.cause.startsWith("ambient-steal"), out.cause)
  }

  test("genuine regression: the soak corroborates the elevated wall => real work growth") {
    // soak runs executed the SAME (regressed) code and sit at the
    // committed level, far above prior — the band is NOT quiet
    // relative to min(prior, band min), so the counters attribute
    val out = classify(RowIn(priorCold = 1.0, cold = 2.1,
      taskRatio = Some(2.2), cpusecRatio = Some(2.1),
      shufRatio = Some(1.05), shufMb = 40.0,
      soakVals = Seq(2.0, 2.1, 2.2), noiseFloor = floor,
      anySteal = false)).get
    assert(out.regressed && !out.ambient)
    assert(out.cause.startsWith("task-inflation-work"), out.cause)
  }

  test("move gate: within 1.3x or sub-second pairs are not attributed") {
    assert(classify(RowIn(1.0, 1.2, Some(1.2), Some(1.2), Some(1.0), 10.0,
      Seq(1.0, 1.1), floor, anySteal = false)).isEmpty)
    // 3x move but both walls < 1s: scheduling-jitter-bound
    assert(classify(RowIn(0.3, 0.9, Some(3.0), Some(3.0), Some(1.0), 1.0,
      Seq(0.3, 0.4), floor, anySteal = false)).isEmpty)
  }

  test("near-zero prior shuffle states absolute MB, not a nonsense ratio") {
    // the r17 dress run's q38 row: prior shuffled ~0, committed
    // 0.02 MB -> the raw ratio printed "18700000.00x shuffle bytes"
    val out = classify(RowIn(priorCold = 0.67, cold = 1.01,
      taskRatio = Some(1.5), cpusecRatio = Some(1.37),
      shufRatio = Some(1.87e7), shufMb = 0.02,
      soakVals = Nil, noiseFloor = floor, anySteal = false)).get
    assert(out.cause.startsWith("task-inflation-work"), out.cause)
    assert(out.cause.contains("0.0 MB shuffle (prior ~0)") &&
      !out.cause.contains("18700000"), out.cause)
  }

  test("improved rows attribute task-work direction, never ambient") {
    val out = classify(RowIn(priorCold = 10.0, cold = 5.0,
      taskRatio = Some(0.5), cpusecRatio = Some(0.5),
      shufRatio = Some(1.0), shufMb = 30.0,
      soakVals = Nil, noiseFloor = floor, anySteal = false)).get
    assert(!out.regressed && !out.ambient)
    assert(out.cause.startsWith("less-task-work"), out.cause)
  }
}
