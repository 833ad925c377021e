package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators.
  *
  * The reference is batch-only (SURVEY.md §2.10), but the engine's
  * event-shaped operators (sessionization, windowed aggregation) are
  * written once and exposed for both batch DataFrames and streaming
  * Datasets: the batch forms live in the query catalog (q26/q27); the
  * streaming forms here use watermarks + `flatMapGroupsWithState` so
  * state is bounded and evictable on a real cluster.
  */
object StreamOps {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long, sumValue: Double)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Double)

  /** Streaming sessionization: per-user sessions closed after
    * `gapMinutes` of inactivity, emitted on state timeout. Mirrors the
    * batch q26 semantics (gap > 30 min starts a new session). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.sessionStart, s.lastTs, s.nEvents, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                    sumValue = s.sumValue + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.sessionStart, s.lastTs, s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Watermarked tumbling-window aggregation per event type — the
    * streaming form of q27. Works on a streaming or batch DataFrame
    * with (ts: timestamp, event_type, value). */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup — the E4 curation chain's first stage in
    * incremental form: corpus shards arrive as a stream and only the
    * first document per content fingerprint passes. State is one row
    * per distinct fingerprint and `dropDuplicatesWithinWatermark`
    * evicts it once the watermark passes, so the state store stays
    * bounded no matter how long the stream runs — the batch
    * `TextDedup.exactDedup` semantics, minus duplicates that recur
    * beyond the watermark horizon (a documented streaming trade-off,
    * same as any windowed exactly-once dedup). */
  def streamingDedup(docs: DataFrame, ts: String = "ts", text: String = "text",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(text)))
      .withWatermark(ts, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup suppression — the incremental form of the E4
    * chain's MinHash stage. True pairwise near-dup needs a pair join,
    * which unbounded streams can't afford; the streaming-practical
    * design is signature-identity dedup: documents whose full k-value
    * MinHash signature coincides are near-duplicates with high
    * probability (P[sig match] = J^k, so a full match at k=8 implies
    * J ≳ 0.9 w.h.p.), and `dropDuplicatesWithinWatermark` on the
    * signature keeps exactly the first arrival per signature with one
    * state row per distinct signature, evicted at the watermark.
    * Recall is tunable: lower k → looser matches. Batch-side recall
    * beyond signature identity still belongs to
    * `TextDedup.minhashLshPairs` (band collisions + verify). */
  def streamingNearDup(docs: DataFrame, ts: String = "ts", text: String = "text",
      k: Int = 8, shingleWidth: Int = 3,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.TextFunctions._
    docs
      .withColumn("sig", concat_ws("|",
        minhashXx(array_distinct(shingles(tokens(col(text)), shingleWidth)), k)))
      .withWatermark(ts, watermarkDelay)
      .dropDuplicatesWithinWatermark("sig")
  }

  /** Streaming URL-grain dedup — the crawl-FRONTIER form of
    * [[graft.operators.TextExtract.urlDedup]] (dedup BEFORE fetch, no
    * content needed): each arriving URL canonicalizes through the
    * same RFC-3986 §6 codegen rule chain, and
    * `dropDuplicatesWithinWatermark` on the canonical key keeps
    * exactly the first arrival per page with ONE state row per
    * distinct canonical URL, evicted at the watermark. Keep-first is
    * ARRIVAL order — the batch operator's min-id winner has no
    * streaming meaning (the [[streamingDedup]] convention). */
  def streamingUrlDedup(docs: DataFrame, ts: String = "ts",
      url: String = "url", watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("canon_url",
        graft.operators.TextExtract.canonicalizeUrl(col(url)))
      .withWatermark(ts, watermarkDelay)
      .dropDuplicatesWithinWatermark("canon_url")

  case class KeyedDoc(ts: Timestamp, key: String, doc_id: Long, text: String)

  /** Streaming per-key QUOTA — the incremental form of
    * [[graft.operators.TextDedup.capPerKey]] (domain/language
    * balancing on a live corpus feed): at most `cap` documents per key
    * pass, with ONE Long counter state row per key. Keep-first is
    * ARRIVAL order (ties within a micro-batch broken by (ts, doc_id)),
    * the same divergence-from-batch convention as [[streamingDedup]] —
    * the batch operator's deterministic rank-hash order has no
    * streaming meaning. The counter evicts `horizonMinutes` of EVENT
    * time after the key's last arrival (EventTimeTimeout), so state
    * stays bounded and a key's quota RESETS once its horizon passes —
    * the windowed-quota trade-off, documented like every
    * watermark-bounded store here. */
  def streamingCapPerKey(docs: Dataset[KeyedDoc], cap: Int,
      watermarkDelay: String = "10 minutes",
      horizonMinutes: Int = 60): Dataset[KeyedDoc] = {
    import docs.sparkSession.implicits._
    val horizonMs = horizonMinutes * 60 * 1000L
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyedDoc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[KeyedDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val seen = state.getOption.getOrElse(0L)
            val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            val take = sorted.take(math.max(0, cap - seen.toInt))
            state.update(seen + take.size)
            state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max + horizonMs)
            take.iterator
          }
      }
  }

  /** Streaming per-key TOKEN budget — the incremental form of
    * [[graft.operators.TextDedup.capTokensPerKey]] (the data-MIXING
    * budget stage on a live feed): a key's documents pass while the
    * key's token budget lasts, with ONE Long tokens-spent counter per
    * key. Admission is the batch operator's inclusive PREFIX rule in
    * ARRIVAL order (ties within a micro-batch broken by (ts,
    * doc_id), the [[streamingCapPerKey]] convention standing in for
    * the batch hash-rank order): the running token total counts
    * EVERY arriving document and a document passes iff the total
    * through it stays within budget — so the first overflow closes
    * the key, exactly `capTokensPerKey`'s q88-gated cumulative-sum
    * filter. Token counts replicate `TextFunctions.tokens`
    * (locale-independent lowercase alnum runs, `Locale.ROOT` — Spark
    * `lower()` parity) so batch and stream agree on cost. State evicts
    * `horizonMinutes` of EVENT time after the key's last arrival
    * (EventTimeTimeout) — bounded state, budget RESETS past the
    * horizon: the windowed-quota trade-off, documented like every
    * watermark-bounded store here. */
  def streamingCapTokensPerKey(docs: Dataset[KeyedDoc], budget: Long,
      watermarkDelay: String = "10 minutes",
      horizonMinutes: Int = 60): Dataset[KeyedDoc] = {
    import docs.sparkSession.implicits._
    val horizonMs = horizonMinutes * 60 * 1000L
    def toks(d: KeyedDoc): Long =
      d.text.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").count(_.nonEmpty).toLong
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyedDoc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[KeyedDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var spent = state.getOption.getOrElse(0L)
            val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            // inclusive prefix: every doc's tokens count toward the
            // running total, admitted iff the total through it fits —
            // the batch operator's cumulative-sum filter verbatim
            val kept = sorted.filter { d =>
              spent += toks(d)
              spent <= budget
            }
            state.update(spent)
            state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max + horizonMs)
            kept.iterator
          }
      }
  }

  /** Streaming E5 MIXING leg — rate sampling then token budgets on a
    * live feed, the streaming subset of
    * [[graft.operators.Pipelines.dataMix]]: per-key mixing rates
    * apply as a stream-static broadcast join + codegen threshold
    * filter (the batch [[graft.operators.TextDedup.sampleByRate]]
    * operator unchanged — it is stateless, so it streams as-is),
    * then [[streamingCapTokensPerKey]] enforces per-key token
    * budgets with one counter state row per key. The packing
    * manifest stays batch — global token offsets have no meaning on
    * an unbounded feed (documented, like near-dup recall in
    * [[streamingCuration]]). Input columns: (ts, key, doc_id,
    * text). */
  def streamingMixing(docs: DataFrame, rates: DataFrame, budget: Long,
      seed: Int = 0, watermarkDelay: String = "10 minutes",
      horizonMinutes: Int = 60): Dataset[KeyedDoc] = {
    import docs.sparkSession.implicits._
    val sampled = graft.operators.TextDedup
      .sampleByRate(docs, "key", rates, seed = seed)
      .select(col("ts"), col("key"), col("doc_id"), col("text"))
      .as[KeyedDoc]
    streamingCapTokensPerKey(sampled, budget, watermarkDelay, horizonMinutes)
  }

  /** Streaming benchmark DECONTAMINATION — the incremental form of
    * [[graft.operators.TextDedup.contaminationOverlap]]: evaluation
    * sets are corpus-small and STATIC, so their distinct gram hashes
    * fold once into a driver Bloom sketch
    * ([[graft.functions.BloomContains]], a plan constant) and every
    * live document scores its overlap in a STATELESS projection —
    * distinct shingles per row, per-gram Bloom probes, drop when
    * `overlap_frac > maxOverlap`. No state store, no watermark, no
    * shuffle. Two documented divergences from the batch operator:
    * Bloom false positives make the filter CONSERVATIVE (a clean doc
    * is wrongly dropped with probability ≈ 1−(1−fpp)^grams — tune
    * `fpp` down, the sketch is the only memory cost), and the
    * per-row array probe runs interpreted (fine at stream rates; the
    * batch path keeps the exact relational join). */
  def streamingDecontaminate(docs: DataFrame, benchmark: DataFrame,
      n: Int = 3, maxOverlap: Double = 0.0, fpp: Double = 0.001,
      text: String = "text", benchText: String = "text"): DataFrame = {
    import graft.functions.TextFunctions._
    import graft.functions.BloomContains
    val benchKeys = graft.operators.TextDedup
      .shingleRows(benchmark, n, "doc_id", benchText)
      .filter(col("s") =!= "")
      .select(xxhash64(col("s")).as("__k")).distinct()
    val bf = benchKeys.stat.bloomFilter("__k",
      math.max(benchKeys.count(), 1L), fpp)
    // drop the "" gram a zero-token document produces (shingles'
    // short-doc branch) BEFORE probing — otherwise the size guard
    // below is dead and an empty doc could fall to a Bloom false
    // positive, which the batch operator (bench side filters "")
    // can never do
    val grams = filter(array_distinct(shingles(tokens(col(text)), n)),
      s => s =!= "")
    val hits = size(filter(grams,
      s => BloomContains.bloomContains(xxhash64(s), bf)))
    val frac = when(size(grams) > 0,
      hits.cast("double") / size(grams).cast("double")).otherwise(0.0)
    docs.withColumn("overlap_frac", frac)
      .filter(col("overlap_frac") <= maxOverlap)
      .drop("overlap_frac")
  }

  /** Streaming INCREMENTAL NEAR-DUP against a frozen reference index —
    * the live-feed form of
    * [[graft.operators.TextDedup.nearDupAgainstIndex]] (q123/q128): a
    * crawl STREAM drops documents that near-duplicate a previous
    * snapshot. The reference index is the same at-rest pair the batch
    * operator reads — the (id, band) relation plus the per-doc shingle
    * SETS (one row per reference doc: aggregate the (id, s) relation
    * with collect_set once, batch-side) — and both join STREAM-STATIC
    * (stateless; Structured Streaming re-plans the static side per
    * micro-batch, so materialize the index relations at rest, the
    * q128 bucketed-table contract). Stream side: each document's
    * MinHash bands come from ONE projection over its shingle array
    * (the md5 slot/band layout is bit-identical to the batch
    * `bandRows`, spec-gated batch≡stream), `explode_outer` keeps
    * band-less (empty) docs, band collisions verify by exact
    * array-intersect Jaccard against the reference shingle set, and
    * one windowed per-doc aggregation (the only state, watermark-
    * evicted) folds the verdicts: kept = no reference twin at
    * `minJaccard`. Returns (doc_id, text, kept) per closed window. */
  def streamingNearDupAgainstIndex(docs: DataFrame, refBands: DataFrame,
      refShingleSets: DataFrame, minJaccard: Double = 0.5, k: Int = 8,
      bands: Int = 4, shingleWidth: Int = 3, ts: String = "ts",
      id: String = "doc_id", text: String = "text",
      windowLen: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.TextFunctions._
    require(k % bands == 0 && k <= 8, "md5 layout: k ≤ 8, bands | k")
    require(minJaccard > 0.0, "minJaccard must be > 0")
    val rowsPerBand = k / bands
    // hash each distinct shingle ONCE, then take per-slot minima —
    // the same md5 16-bit substring slots as the batch bandRows
    val sh = array_distinct(shingles(tokens(col(text)), shingleWidth))
    val hs = transform(col("__sh"), x => md5(x))
    val slot = (i: Int) => array_min(transform(col("__hs"),
      h => substring(h, i * 4 + 1, 4)))
    val bandArr = array((0 until bands).map { b =>
      concat_ws("#", lit(b.toString) +:
        (0 until rowsPerBand).map(r => slot(b * rowsPerBand + r)): _*)
    }: _*)
    val refB = refBands.select(col("band"),
      col(id).as("__ref_id"), lit(true).as("__hit"))
    val refS = refShingleSets.select(col(id).as("__ref_id"),
      col("sh").as("__ref_sh"))
    docs.withWatermark(ts, watermarkDelay)
      .withColumn("__sh", sh)
      .withColumn("__hs", hs)
      .select(col(ts), col(id), col(text), col("__sh"),
        explode_outer(when(size(col("__sh")) > 0, bandArr)).as("band"))
      .join(refB, Seq("band"), "left")
      .join(refS, Seq("__ref_id"), "left")
      // coalesce: a band collision whose ref_id exists in refBands but
      // not refShingleSets (drifted index halves) leaves __ref_sh NULL
      // and the when-branch yields NULL, not the otherwise — without
      // the coalesce a doc whose only rows are such collisions gets
      // kept = NULL instead of a boolean verdict (ADVICE r9)
      .withColumn("__j", coalesce(when(col("__hit").isNotNull,
        size(array_intersect(col("__sh"), col("__ref_sh"))).cast("double") /
          size(array_union(col("__sh"), col("__ref_sh")))), lit(0.0)))
      .groupBy(window(col(ts), windowLen), col(id), col(text))
      .agg(max(col("__j") >= minJaccard).as("__dropped"))
      .select(col(id), col(text), (!col("__dropped")).as("kept"))
  }

  /** Streaming INCREMENTAL CONTAINMENT dedup against a frozen
    * winnowed-fingerprint index — the live-feed form of
    * [[graft.operators.TextDedup.containmentAgainstIndex]] (q142): a
    * crawl STREAM drops documents whose copied-passage containment
    * against any reference document meets the threshold. The
    * reference index is the [[graft.operators.TextDedup.winnowIndex]]
    * pair — the (id, h) fingerprint relation plus doc-grain sizes —
    * read at rest and joined STREAM-STATIC (stateless per
    * micro-batch, the q128 bucketed-table contract).
    *
    * Stream-side winnowing is ONE pure array-algebra column (the
    * SWA'03 selection as a list comprehension — grams via
    * slice/transform, per-window `array_min`): positions drop because
    * the containment measure only consumes the distinct selected HASH
    * SET, and window ties pick a position, never a different hash —
    * so the stream's set equals the batch
    * [[graft.operators.TextDedup.winnowFingerprints]] set exactly
    * (spec-gated). Two chained watermark-bounded aggregations fold
    * the verdict: shared-hash counts per (doc, ref), then the per-doc
    * max over the containment rule — same-window chained stateful
    * aggregations, Spark's supported shape. Zero-token documents
    * have no fingerprints and are always kept (the batch convention:
    * absent from the fp relation ⇒ never dropped).
    *
    * Returns (doc_id, text, kept) per closed window. */
  def streamingContainmentAgainstIndex(docs: DataFrame, refFp: DataFrame,
      refSizes: DataFrame, k: Int = 4, window: Int = 4,
      minShared: Long = 2, minContainment: Double = 0.8,
      md5Hashes: Boolean = true,
      ts: String = "ts", id: String = "doc_id", text: String = "text",
      windowLen: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.TextFunctions._
    require(k >= 1 && window >= 1, "k and window must be positive")
    require(minShared >= 1, "minShared must be >= 1")
    // the stream's hash family MUST match the index's build-time
    // choice or the h-join silently matches nothing (hex string vs
    // long) and every doc streams out kept — catch the drift eagerly
    require(refFp.schema("h").dataType ==
      (if (md5Hashes) org.apache.spark.sql.types.StringType
       else org.apache.spark.sql.types.LongType),
      s"refFp.h is ${refFp.schema("h").dataType}; md5Hashes=$md5Hashes " +
        "expects the index built with the same hash family " +
        "(TextDedup.winnowIndex(md5Hashes = ...))")
    val tk = tokens(col(text))
    // grams: full k-gram slides for len >= k, the whole token stream
    // as ONE gram for shorter non-empty docs (the batch gram rule)
    val ng = when(size(tk) >= k, size(tk) - (k - 1)).otherwise(lit(1))
    val grams = transform(sequence(lit(0), ng - 1),
      i => concat_ws(" ", slice(tk, i + 1, lit(k))))
    val hs = transform(grams,
      g => if (md5Hashes) md5(g).cast("string") else xxhash64(g))
    // selection windows: start positions 0..ng-w (full) or the one
    // truncated whole-doc window; `slice` truncates at the array end
    val nw = greatest(ng - (window - 1), lit(1))
    val sel = array_distinct(transform(sequence(lit(0), nw - 1),
      j => array_min(slice(hs, j + 1, lit(window)))))
    val refF = refFp.select(col("h"), col(id).as("__ref_id"))
    val refS = refSizes.select(col(id).as("__ref_id"),
      col("nfp").as("__nfp_ref"))
    // both static joins run BEFORE the aggregations (streaming forbids
    // joins after an aggregation); __nfp_ref rides into the first
    // grouping key — functionally dependent on __ref_id, so it never
    // splits a group
    docs.withWatermark(ts, watermarkDelay)
      .withColumn("__sel", when(size(tk) > 0, sel).otherwise(array()
        .cast(if (md5Hashes) "array<string>" else "array<bigint>")))
      .withColumn("__nfp", size(col("__sel")))
      .select(col(ts), col(id), col(text), col("__nfp"),
        explode_outer(col("__sel")).as("h"))
      .join(refF, Seq("h"), "left")
      .join(refS, Seq("__ref_id"), "left")
      .groupBy(org.apache.spark.sql.functions.window(col(ts), windowLen),
        col(id), col(text), col("__nfp"), col("__ref_id"), col("__nfp_ref"))
      .agg(count(col("__ref_id")).as("__shared"))
      .withColumn("__dropped",
        coalesce(col("__ref_id").isNotNull &&
          col("__shared") >= minShared &&
          round(col("__shared") / least(col("__nfp"), col("__nfp_ref")) +
            lit(1e-9), 6) >= minContainment, lit(false)))
      .groupBy(col("window"), col(id), col(text))
      .agg(max(col("__dropped")).as("__drop"))
      .select(col(id), col(text), (!col("__drop")).as("kept"))
  }

  /** Streaming PARAGRAPH-grain dedup — the incremental form of
    * [[graft.operators.TextDedup.paragraphDedup]], enabled by that
    * operator's aggregation shape: the keep-first decision needs ONE
    * state row per distinct paragraph (`min_by` in batch ≡
    * `dropDuplicatesWithinWatermark` on the paragraph here — the
    * row_number window form had no streaming analogue). Documents
    * explode to (ts, id, pos, para) rows, the first ARRIVAL per
    * paragraph survives (streaming keep-first is arrival order, not
    * the batch (id, pos) order — same divergence as
    * [[streamingDedup]]), and survivors reassemble per document in a
    * tumbling `windowLen` window that closes — and emits — when the
    * watermark passes. Two documented divergences from batch: the
    * arrival-order winner, and documents losing EVERY paragraph vanish
    * instead of surviving with empty text (there is no doc-universe
    * relation to left-join in a stream; the downstream quality floor
    * owned that drop anyway). Paragraph state is evicted at the
    * watermark like every dedup store here. */
  /** Streaming PERPLEXITY scoring — the incremental form of
    * [[graft.operators.TextRetrieval.unigramCrossEntropy]] and the
    * apply leg of the q112 filter loop: the reference unigram model
    * (token → tf, plus the N/V scalars) is fit ONCE on a static
    * corpus and every live document scores against it through a
    * STREAM-STATIC join — Structured Streaming plans the static side
    * as an ordinary batch relation under each micro-batch, so the
    * join itself is stateless (no store, no watermark needed for it).
    * The per-document mean is one aggregation keyed by (window, doc);
    * the watermark bounds that state and closes windows for append
    * output. Unseen tokens take the add-one smoothing floor (tf = 0),
    * exactly the batch model's behavior on held-out text. */
  def streamingPerplexity(docs: DataFrame, unigram: DataFrame,
      nTotal: Long, vocab: Long,
      ts: String = "ts", id: String = "doc_id", text: String = "text",
      windowLen: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.TextFunctions._
    val tok = docs.withWatermark(ts, watermarkDelay)
      .select(col(ts), col(id), explode(tokens(col(text))).as("tk"))
    val scored = tok
      .join(unigram.select(col("tk"), col("tf")), Seq("tk"), "left")
      .withColumn("nll", -log((coalesce(col("tf"), lit(0L)) + lit(1.0)) /
        lit((nTotal + vocab).toDouble)))
    scored.groupBy(window(col(ts), windowLen), col(id))
      .agg(count(lit(1)).as("n_tokens"), avg(col("nll")).as("xent"))
      .select(col(id), col("n_tokens"), col("xent"))
  }

  /** Streaming RANGE join — live points against a STATIC interval
    * table ([[graft.operators.Events.rangeJoin]]'s binning, the
    * attribution-window serving shape): each arriving point computes
    * its single bin statelessly and inner-joins the pre-exploded
    * (key, bin)-keyed interval relation, exact containment filtered
    * after — a stateless stream-static equi-join, no watermark or
    * state store at all. Intervals must be bin-exploded ONCE
    * batch-side (the at-rest form of the operator's fan-out); pass
    * the same `binWidth`. */
  def streamingRangeJoin(points: DataFrame, binnedIntervals: DataFrame,
      binWidth: Long, key: String = "user_id", t: String = "us",
      lo: String = "iv_lo", hi: String = "iv_hi"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    points.withColumn("__bin", expr(s"$t div ${binWidth}L"))
      .join(binnedIntervals, Seq(key, "__bin"))
      .filter(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("__bin")
  }

  /** Stream-static AS-OF join (VERDICT r10 #5) — each arriving left
    * event matched to the latest static right row with right.time ≤
    * event time, per key: the [[graft.operators.Events.asofJoin]]
    * semantics with the LEFT side live. The batch form's union +
    * running window needs the whole timeline ordered and so has no
    * bounded-state streaming translation; instead the static side is
    * pre-transformed ONCE batch-side into bin-exploded VALIDITY
    * intervals ([[graft.operators.Events.asofValidityIntervals]] →
    * [[graft.operators.Events.binIntervals]] — intervals partition
    * each key's timeline, so the as-of match IS the one interval
    * containing the event), and the stream pays exactly
    * [[streamingRangeJoin]]: a stateless stream-static equi-join on
    * (key, bin) + containment — no watermark, no state store, no
    * per-key state growth. INNER semantics: an event before its key's
    * first right row (or past `horizon`) emits nothing — the
    * batch-LEFT-join's null rows have no stateless streaming
    * analogue, callers needing them left-join the output back.
    * Matched right columns come back `iv_`-prefixed. */
  def streamingAsofJoin(events: DataFrame, binnedValidity: DataFrame,
      binWidth: Long, key: String = "user_id",
      t: String = "us"): DataFrame =
    streamingRangeJoin(events, binnedValidity, binWidth, key, t)

  /** Stream-static tokenizer-FERTILITY verdicts — the incremental
    * APPLY half of [[graft.operators.TextRetrieval.fertilityFilter]]:
    * the trained-BPE fertility relation `nSub` (word, n_sub —
    * vocabulary-grain, typically q143's at-rest table) and the
    * corpus-percentile `threshold` both fit ONCE batch-side (a
    * percentile is a property of the reference corpus, the q144
    * split); each arriving doc pays one stateless stream-static join
    * + one windowed doc-grain aggregation. Out-of-vocabulary words
    * take the fallback fertility `length(word)` (every char its own
    * piece — the byte-fallback convention), so verdicts are total.
    * Emits (id, words, toks, fertility, kept). */
  def streamingFertilityVerdicts(docs: DataFrame, nSub: DataFrame,
      threshold: Double, ts: String = "ts", id: String = "doc_id",
      text: String = "text", windowLen: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.TextFunctions._
    val tok = docs.withWatermark(ts, watermarkDelay)
      .select(col(ts), col(id), explode(tokens(col(text))).as("word"))
    val scored = tok
      .join(nSub.select(col("word"), col("n_sub")), Seq("word"), "left")
      .withColumn("n_sub", coalesce(col("n_sub"), length(col("word")).cast("long")))
    scored.groupBy(window(col(ts), windowLen), col(id))
      .agg(sum(col("n_sub")).as("toks"), count(lit(1)).as("words"))
      .select(col(id), col("words"), col("toks"),
        round(col("toks").cast("double") / col("words") + 1e-7, 4).as("fertility"))
      .withColumn("kept", col("fertility") <= lit(threshold))
  }

  /** Stream-static DSIR scoring — the incremental APPLY half of
    * [[graft.operators.TextRetrieval.dsirSelect]]: λ fits ONCE on a
    * static reference corpus ([[graft.operators.TextRetrieval
    * .dsirLambda]] — bucket-bounded, total over the bucket space, so
    * stream features whose bucket never occurred in the reference get
    * exactly the smoothed prior), and each arriving document scores
    * through a stateless stream-static join + one windowed per-doc
    * aggregation (the [[streamingPerplexity]] shape). Selection stays
    * a batch decision (Gumbel top-k needs the full candidate set);
    * streaming emits the per-document weight for threshold-style
    * gating. */
  def streamingDsirWeights(docs: DataFrame, lam: DataFrame,
      hexChars: Int = 2, ts: String = "ts", id: String = "doc_id",
      text: String = "text", windowLen: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.operators.TextRetrieval.{dsirBucket, dsirFeatures}
    docs.withWatermark(ts, watermarkDelay)
      .select(col(ts), col(id), explode(dsirFeatures(col(text))).as("f"))
      .select(col(ts), col(id), dsirBucket(col("f"), hexChars).as("b"))
      .join(lam, Seq("b"))
      .groupBy(window(col(ts), windowLen), col(id))
      .agg(count(lit(1)).as("n_feats"), sum("lam").as("weight"))
      .select(col(id), col("n_feats"), col("weight"))
  }

  /** Streaming quality-classifier apply: score a live document feed
    * under a STATICALLY-fitted Naive Bayes model
    * ([[graft.operators.TextRetrieval.qualityClassifierFit]] — run it
    * batch-side, pass its two relations here). The weight relation is
    * total over the bucket space, so every stream-side feature joins
    * (unseen-in-train buckets get the smoothed prior, never dropped);
    * the join is stream-static (stateless), the only state is the
    * windowed per-doc aggregation, and the sigmoid + decision are a
    * stateless projection after it. The prior is a 1-row relation —
    * read once on the driver and baked as a literal (the IVF
    * literal-baked-centroid idiom). Zero-token documents emit no row
    * (nothing arrives to aggregate); the batch form scores them at
    * the prior. */
  def streamingQualityScores(docs: DataFrame, weights: DataFrame,
      prior: DataFrame, hexChars: Int = 3, ts: String = "ts",
      id: String = "doc_id", text: String = "text",
      windowLen: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.operators.TextRetrieval.{dsirBucket, dsirFeatures}
    // fail with the CAUSE, not an opaque NPE at query definition: an
    // empty training corpus fits a NULL prior (log of null counts)
    val priorRow = prior.head()
    require(!priorRow.isNullAt(0),
      "quality-classifier prior is NULL — the training corpus was empty " +
        "(qualityClassifierFit needs at least one labeled training doc)")
    val bias = priorRow.getDouble(0)
    // materialize the fitted weights ONCE at query definition: the
    // stream-static join re-evaluates the static sub-plan per
    // micro-batch, which for a raw fit plan means re-tokenizing the
    // whole training corpus every batch. The relation is bucket-
    // bounded (16^hexChars rows) — checkpoint it and broadcast.
    val wMat = broadcast(weights.localCheckpoint(true))
    docs.withWatermark(ts, watermarkDelay)
      .select(col(ts), col(id), explode(dsirFeatures(col(text))).as("f"))
      .select(col(ts), col(id), dsirBucket(col("f"), hexChars).as("b"))
      .join(wMat, Seq("b"))
      .groupBy(window(col(ts), windowLen), col(id))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("__s0"))
      .select(col(id), col("n_feats"),
        round(lit(1.0) / (lit(1.0) + exp(-(col("__s0") + lit(bias)))) +
          lit(1e-9), 6).as("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }

  /** Streaming SEMANTIC DECONTAMINATION — the live-feed form of
    * [[graft.operators.Similarity.semDecontaminate]]: score every
    * streamed embedding against a frozen benchmark panel and mark
    * τ-similar rows dropped. Fully STATELESS: cell assignment is the
    * literal-baked argmin COLUMN ([[graft.operators.Similarity
    * .cellColumn]] — centroids fit batch-side, the IVF contract), the
    * per-cell panel relation (≤ nCells rows, build it batch-side with
    * [[graft.operators.Similarity.semDecontPanel]]) joins
    * stream-static broadcast after a localCheckpoint (the
    * streamingQualityScores convention — a raw static plan would
    * re-derive the panel every micro-batch), and the verdict is a
    * pure exists() over the cell's candidate vectors — no watermark,
    * no aggregation, no state store. Rows landing in a cell no
    * benchmark vector probes join nothing and keep (the coalesce).
    * Returns (id, cell, kept) per input row, the batch operator's
    * schema. */
  def streamingSemDecontaminate(docs: DataFrame, centroids: DataFrame,
      panel: DataFrame, tau: Double, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    import graft.operators.Similarity
    val cents = Similarity.collectCentroids(centroids)
    val pMat = broadcast(panel.localCheckpoint(true))
    docs.withColumn("cell", Similarity.cellColumn(cents, col(vec)))
      .join(pMat, Seq("cell"), "left")
      .withColumn("kept", !coalesce(
        exists(col("q_vecs"), b =>
          round(Similarity.cosine(col(vec), b) + lit(1e-9), 6) >= tau),
        lit(false)))
      .select(col(id), col("cell"), col("kept"))
  }

  def streamingParagraphDedup(docs: DataFrame, ts: String = "ts", sep: String = "\n",
      id: String = "doc_id", text: String = "text",
      watermarkDelay: String = "10 minutes", windowLen: String = "1 minute"): DataFrame = {
    val paras = docs
      .withWatermark(ts, watermarkDelay)
      .select(col(ts), col(id), posexplode(split(col(text),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "para")))
      .filter(length(col("para")) > 0)
      .dropDuplicatesWithinWatermark("para")
    paras
      .groupBy(window(col(ts), windowLen), col(id))
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(pos, para))), x -> x.para)"),
        sep).as(text))
      .select(col("window").getField("end").as(ts), col(id), col(text))
  }

  /** Streaming E4 curation leg — the full incremental corpus pass:
    * exact dedup ([[streamingDedup]]) → signature near-dup
    * ([[streamingNearDup]]) → language filter → quality floor →
    * optional PII scrub → per-document token statistics. The two
    * stateful stages keep one watermark-evicted row per distinct
    * fingerprint/signature; everything after them is a STATELESS
    * codegen projection ([[graft.functions.TextFunctions]] — langId,
    * qualityScore, piiScrub, token counts are pure column algebra), so
    * the leg adds no state beyond the dedup stores and no shuffle at
    * all past the dedup keys. Same output contract as the batch
    * `Pipelines.textCuration` (lang, quality, ws_tokens,
    * bpeish_tokens on the shipped text); batch-grade pairwise
    * near-dup recall stays a batch job, as [[streamingNearDup]]
    * documents. */
  def streamingCuration(docs: DataFrame, ts: String = "ts", text: String = "text",
      langs: Seq[String] = Seq("en"), minQuality: Double = 0.3,
      k: Int = 8, shingleWidth: Int = 3, scrubPii: Boolean = false,
      watermarkDelay: String = "10 minutes",
      paragraphSep: Option[String] = None, paragraphWindow: String = "1 minute",
      id: String = "doc_id"): DataFrame = {
    import graft.functions.TextFunctions._
    // ONE watermark declaration for the whole leg (redefining it
    // mid-stream is disallowed); the stateful stages chain under it —
    // Spark 4 allows multiple stateful operators per query
    val exact = docs
      .withWatermark(ts, watermarkDelay)
      .withColumn("fp", fingerprint(col(text)))
      .dropDuplicatesWithinWatermark("fp").drop("fp")
    // optional paragraph-grain boilerplate stage, mirroring the batch
    // chain's position (between whole-document dedup and near-dup):
    // one state row per distinct paragraph + a windowed reassembly
    // whose window.end re-enters as the event-time column for the
    // signature store downstream. NOTE: the reassembly aggregation
    // narrows the relation to (ts, id, text) — the batch contract.
    val afterPara = paragraphSep match {
      case Some(sep) =>
        exact
          .select(col(ts), col(id), posexplode(split(col(text),
            java.util.regex.Pattern.quote(sep))).as(Seq("pos", "para")))
          .filter(length(col("para")) > 0)
          .dropDuplicatesWithinWatermark("para")
          .groupBy(window(col(ts), paragraphWindow), col(id))
          .agg(array_join(expr(
            "transform(array_sort(collect_list(struct(pos, para))), x -> x.para)"),
            sep).as(text))
          // window_time keeps the EVENT-TIME attribute (a bare
          // window.end is a plain timestamp and the downstream
          // signature store would reject the chain)
          .select(window_time(col("window")).as(ts), col(id), col(text))
      case None => exact
    }
    val deduped = afterPara
      .withColumn("sig", concat_ws("|",
        minhashXx(array_distinct(shingles(tokens(col(text)), shingleWidth)), k)))
      .dropDuplicatesWithinWatermark("sig").drop("sig")
    val scored = deduped
      .withColumn("lang", langId(tokens(col(text))))
      .filter(col("lang").isin(langs: _*))
      .withColumn("quality", qualityScore(col(text)))
      .filter(col("quality") >= minQuality)
    val scrubbed =
      if (scrubPii) scored.withColumn(text, piiScrub(col(text)))
      else scored
    scrubbed
      .withColumn("ws_tokens", wsTokenCount(col(text)))
      .withColumn("bpeish_tokens", bpeishTokenCount(col(text)))
  }

  /** Streaming E7 — the RAW-CRAWL leg (q138's streaming twin): HTML →
    * text extraction composed ahead of the full [[streamingCuration]]
    * chain. The extraction is
    * [[graft.operators.TextExtract.extractHtmlTextCol]] — a pure
    * stateless column projection (regexp/array algebra, no explode, no
    * shuffle, no watermark constraint), so the leg's state remains
    * exactly the curation chain's two dedup stores; a live crawl feed
    * goes from raw markup to curated token-counted documents in one
    * streaming query. Batch-grade near-dup recall stays a batch job,
    * as [[streamingNearDup]] documents. Input: (ts, id, `html`);
    * output: the [[streamingCuration]] contract over the EXTRACTED
    * text. */
  def streamingRawCrawlCuration(docs: DataFrame, ts: String = "ts",
      html: String = "html", langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3, k: Int = 8, shingleWidth: Int = 3,
      scrubPii: Boolean = false, watermarkDelay: String = "10 minutes",
      paragraphSep: Option[String] = None, paragraphWindow: String = "1 minute",
      id: String = "doc_id"): DataFrame = {
    val extracted = docs
      .withColumn("text",
        graft.operators.TextExtract.extractHtmlTextCol(col(html)))
      .drop(html)
    streamingCuration(extracted, ts = ts, langs = langs,
      minQuality = minQuality, k = k, shingleWidth = shingleWidth,
      scrubPii = scrubPii, watermarkDelay = watermarkDelay,
      paragraphSep = paragraphSep, paragraphWindow = paragraphWindow, id = id)
  }

  /** Checkpointed parquet file sink — the production shape for a
    * streaming ETL leg: append mode, exactly-once via the checkpoint
    * WAL + the file-sink manifest, partitioned output directory. The
    * same sink works for any of the operators above. */
  def parquetSink(df: DataFrame, path: String, checkpointDir: String,
      partitionBy: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** Stream-side CCNet bucket assignment — the incremental APPLY half
    * of [[graft.operators.TextRetrieval.ccnetBuckets]]: the reference
    * LM ([[graft.operators.TextRetrieval.unigramLmFit]] — the SAME
    * fit the batch scorer uses, so they cannot drift) and the
    * per-language tercile thresholds fit ONCE on static corpora; each
    * arriving document scores through a stateless stream-static left
    * join (unseen tokens take the add-one floor) and one
    * watermark-evicted windowed per-doc aggregation (the
    * [[streamingPerplexity]] shape), then takes its bucket from the
    * static language-bounded threshold relation. Threshold FITTING
    * stays a batch decision — percentiles need the full corpus.
    *
    * The batch doc score (paragraph-token-mass-weighted mean) equals
    * the plain per-token mean over the whole document, so the
    * stream-side score needs no paragraph split and matches the batch
    * score exactly (StreamOpsSpec gates it).
    *
    * `thresholds` must carry (lang, t_head, t_mid). */
  def streamingCcnetBuckets(docs: DataFrame, freq: DataFrame,
      nTotal: Long, vocab: Long, thresholds: DataFrame,
      ts: String = "ts", id: String = "doc_id", text: String = "text",
      lang: String = "lang",
      windowLen: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import graft.functions.TextFunctions._
    val tok = docs.withWatermark(ts, watermarkDelay)
      .select(col(ts), col(id), col(lang).as("lang"),
        explode(tokens(col(text))).as("tk"))
    val scored = tok
      .join(freq.select(col("tk"), col("tf")), Seq("tk"), "left")
      .withColumn("nll", -log((coalesce(col("tf"), lit(0L)) + lit(1.0)) /
        lit((nTotal + vocab).toDouble)))
    scored.groupBy(window(col(ts), windowLen), col(id), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum("nll") / count(lit(1)) + lit(1e-7), 4).as("xent"))
      .join(broadcast(thresholds), Seq("lang"))
      .withColumn("bucket", when(col("xent") <= col("t_head"), "head")
        .when(col("xent") <= col("t_mid"), "middle").otherwise("tail"))
      .select(col(id), col("lang"), col("n_tokens"), col("xent"), col("bucket"))
  }

  /** Streaming ANN SERVE over the at-rest kNN graph — the live-query
    * form of [[graft.operators.Similarity.graphSearchTopK]] (q149/
    * q150), the last index family without a streaming twin (VERDICT
    * r11 #7): a stream of query vectors beam-searches the STATIC
    * graph/corpus pair (at rest: the vec_id-bucketed warehouse
    * tables) and appends per-query top-k rows to the caller's sink.
    *
    * Shape: the beam search is LOOP-structured — each round is a keyed
    * top-k aggregation over the expanded frontier — so it is not one
    * incremental streaming plan (rounds+2 chained stateful
    * aggregations per window is outside the supported chained
    * windowed-agg shape). ANN serving is also STATELESS by nature:
    * no verdict depends on any other query or any earlier batch. The
    * twin therefore runs each micro-batch through the BATCH operator
    * against the static relations (`foreachBatch`, Spark's documented
    * shape for exactly this delegation) — zero state store, no
    * watermark, nothing grows; per-query work stays O(rounds·beam·k),
    * corpus-size-independent, and the static side keeps its bucketed
    * co-location. Batch ≡ stream is spec-gated on q149's fixture,
    * including across SPLIT micro-batches (statelessness receipt). */
  /** STREAMING cluster maintenance — the
    * [[graft.operators.TextDedup.componentsUpsert]] twin: near-dup
    * PAIRS arrive as a stream and every micro-batch folds into the
    * accumulated component labeling (stored labels ∪ batch re-closed
    * via star contraction), so after any prefix of batches the
    * labeling equals the one-shot closure over every pair seen so far
    * (batch ≡ stream, StreamOpsSpec-gated). `sink` receives the FULL
    * updated labeling after each batch (complete-relation semantics: a
    * cross-batch merge can RELABEL old members, which append-mode rows
    * cannot express).
    *
    * State & restarts: the accumulated labeling lives in this query's
    * driver (RDD-checkpointed per batch, the SUPERSEDED generation
    * explicitly unpersisted so storage holds exactly one labeling, not
    * one per batch). It does NOT survive a query restart — offsets
    * resume but pre-restart batches are not replayed — so a durable
    * deployment persists each sink output (it IS the full state) and
    * passes the last one back as `initial` on restart; `initial` rows
    * re-enter the closure as stored star edges, exactly like a batch
    * [[graft.operators.TextDedup.componentsUpsert]]. */
  def streamingComponentsUpsert(pairs: DataFrame,
      initial: Option[DataFrame] = None,
      idA: String = "id_a", idB: String = "id_b")(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    // unpersist a LogicalRDD-backed checkpoint's blocks (no-op on any
    // other plan shape)
    def releaseState(df: DataFrame): Unit =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false)
        case _ => ()
      }
    var labels: Option[DataFrame] = initial.map(_.localCheckpoint(true))
    pairs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint(true)
        if (!b.isEmpty) {
          // duplicateComponents/componentsUpsert return an EAGERLY
          // checkpointed labeling (and release their own internal
          // state), so `computed` is already materialized: release
          // everything else this batch pinned — the superseded
          // labeling and the batch checkpoint (ADVICE r14: these
          // previously waited for a driver GC, so block-manager
          // storage grew per batch; now it holds exactly ONE labeling
          // between batches).
          val computed = labels match {
            case None =>
              graft.operators.TextDedup.duplicateComponents(b, idA = idA, idB = idB)
            case Some(l) =>
              graft.operators.TextDedup.componentsUpsert(l, b, idA, idB)
          }
          labels.foreach(releaseState)
          releaseState(b)
          labels = Some(computed)
          sink(computed)
        } else releaseState(b) // an empty batch must not pin its checkpoint
      }
      .outputMode(OutputMode.Append())
      .start()
  }

  def streamingGraphServe(queries: DataFrame, graph: DataFrame,
      corpus: DataFrame, k: Int, beam: Int = 8, rounds: Int = 2,
      entries: Int = 4, seed: Int = 47, id: String = "vec_id",
      vec: String = "embedding")(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // pin the micro-batch: the search references the query
        // relation in every round (init + per-round scoring joins)
        val q = batch.localCheckpoint(true)
        if (!q.isEmpty)
          sink(graft.operators.Similarity.graphSearchTopK(
            graph, corpus, q, k, beam, rounds, entries, seed, id, vec))
      }
      .outputMode(OutputMode.Append())
      .start()
}
