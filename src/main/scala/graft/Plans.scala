package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for selected catalog
  * queries and flags plan smells (missing parquet pushdown, unexpected
  * sort-merge joins on broadcastable sides, codegen gaps). Run:
  * `sbt "runMain graft.Plans [queryName ...]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = graft.model.SessionTuning.tuned(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the auditor inspects STATIC physical plans: with AQE on,
      // executedPlan is an AdaptiveSparkPlanExec shell whose inputPlan
      // predates EnsureRequirements — no exchange nodes exist yet, so
      // every exchange-shaped smell (broadcast boundedness) would be
      // dead code. Production sessions keep AQE; only the audit
      // session turns it off.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // Default = the ENTIRE catalog minus documented exclusions
    // (VERDICT r9 #2): the auditor is the mechanical scale gate, and a
    // query it skips is exactly where the next q36-class surprise
    // hides. Every exclusion carries its reason in `excluded` and is
    // printed, so the audit record shows the skip was a decision.
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted ++
        Seq("bucketed_demo", "bucketed_neardup_demo", "bucketed_winnow_demo",
          "partitioned_ivf_demo", "bucketed_graph_demo")
    var audited = 0; var clean = 0; val smelly =
      scala.collection.mutable.ListBuffer.empty[String]
    // observed ≡ declared loop closure (VERDICT r12 #6 / r13 #4):
    // queries whose executed plan actually contains an unpartitioned
    // WindowExec, collected so the summary can assert set equality
    // with `intendedGlobalWindow` — an undeclared observation is
    // already a per-query smell; a STALE declaration (declared but no
    // longer observed) would otherwise rot the allowlist and mask a
    // future reintroduction under different semantics.
    val observedGlobal = scala.collection.mutable.Set.empty[String]
    // AUDIT ARTIFACT (VERDICT r10 #6): the per-query one-line verdicts
    // also land in docs/PLAN_AUDIT.md when the DEFAULT full sweep runs,
    // so rounds diff the audit and a new smell is a visible delta —
    // stdout alone left the record inside a scrolled-away log.
    val artifact = scala.collection.mutable.ListBuffer.empty[String]
    // exclusions apply only to the DEFAULT sweep: an explicitly named
    // query is an explicit request — audit it even if excluded (the
    // developer inspecting q126's plan after a bpeMerges change)
    names.foreach { name =>
      if (args.isEmpty && excluded.contains(name)) {
        println(s"[audit] $name: EXCLUDED — ${excluded(name)}")
        artifact += s"| $name | excluded | ${excluded(name).take(120)} |"
      }
      else
      if (name == "bucketed_demo") bucketedDemo(spark, dir)
      else if (name == "bucketed_neardup_demo") bucketedNearDupDemo(spark, dir)
      else if (name == "bucketed_winnow_demo") bucketedWinnowDemo(spark, dir)
      else if (name == "partitioned_ivf_demo") partitionedIvfDemo(spark, dir)
      else if (name == "bucketed_graph_demo") bucketedGraphDemo(spark, dir)
      else {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(s"\n========== $name ==========")
        println(plan)
        val smjIntended = intendedSmj.contains(name)
        val globalWins = unpartitionedWindows(df)
        if (globalWins.nonEmpty) observedGlobal += name
        val smells = Seq(
          "no parquet filter pushdown" ->
            (plan.contains("PushedFilters: []") && plan.contains("Filter (")),
          "cartesian product" -> plan.contains("CartesianProduct"),
          "sort-merge join" -> (plan.contains("SortMergeJoin") && !smjIntended),
          // dedup keep-first must be min_by aggregation, never a window
          // keyed on content (a viral key = a single-task sort)
          "content-keyed window" -> (windowFree(name) && plan.contains("Window")),
          // a GLOBAL (unpartitioned) window is a single-task sort at
          // corpus scale — it must be DECLARED bounded (gene-/contrast-
          // grain by construction) in `intendedGlobalWindow`, not
          // ambient (VERDICT r9 #3)
          "undeclared global window" ->
            (globalWins.nonEmpty && !intendedGlobalWindow.contains(name)),
          // a broadcast side must be BOUNDED: broadcasting a base-table
          // scan with no pushed filter is the q38-r6 OOM shape (the
          // whole corpus on the build side)
          "unbounded-relation broadcast" ->
            (!intendedBroadcast.contains(name) && hasUnfilteredBroadcastScan(df)))
          .collect { case (s, true) => s }
        val note = (if (smjIntended && plan.contains("SortMergeJoin"))
          s" (intended SMJ: ${intendedSmj(name)})" else "") +
          (if (intendedBroadcast.contains(name) && hasUnfilteredBroadcastScan(df))
            s" (intended broadcast: ${intendedBroadcast(name)})" else "") +
          (if (globalWins.nonEmpty && intendedGlobalWindow.contains(name))
            s" (intended global window ×${globalWins.size}: ${intendedGlobalWindow(name)})"
           else "")
        audited += 1
        if (smells.isEmpty) clean += 1 else smelly += name
        println(s"[audit] $name: " +
          (if (smells.isEmpty) s"clean$note" else s"SMELLS: ${smells.mkString(", ")}"))
        artifact += s"| $name | " +
          (if (smells.isEmpty) "clean" else s"SMELLS: ${smells.mkString(", ")}") +
          s" |${note.trim match { case "" => " |"; case n => s" $n |" }}"
      }
    }
    // set-equality assertion: every observed global window is declared
    // (per-query smell) AND every declaration is still observed (stale
    // declarations fail the audit too). Only meaningful on the full
    // default sweep — a partial run simply doesn't execute the
    // declared queries.
    val staleDeclared =
      if (args.isEmpty) intendedGlobalWindow.keySet -- observedGlobal else Set.empty[String]
    val undeclaredObserved = observedGlobal.toSet -- intendedGlobalWindow.keySet
    val windowLoop =
      if (args.nonEmpty) "partial run — window set equality not checked"
      else if (staleDeclared.isEmpty && undeclaredObserved.isEmpty)
        s"observed ≡ declared (${observedGlobal.size} queries)"
      else s"MISMATCH: stale declarations=${staleDeclared.mkString(",")} " +
        s"undeclared observed=${undeclaredObserved.mkString(",")}"
    if (staleDeclared.nonEmpty) smelly ++= staleDeclared.toSeq.sorted
    println(s"[audit] global windows: $windowLoop")
    println(s"\n[audit-summary] audited=$audited clean=$clean " +
      s"excluded=${names.count(excluded.contains)} " +
      s"smells=${smelly.size}${if (smelly.nonEmpty) " " + smelly.mkString(",") else ""}")
    if (args.isEmpty) {
      val hdr = Seq(
        "# Plan audit — full catalog (regenerated by `runMain graft.Plans`)",
        "",
        "One line per catalog query: the auditor's verdict (clean / smells)",
        "plus any DECLARED intents (intended SMJ / broadcast / global window",
        "— each with its boundedness argument). The demo rows carry their",
        "measured exchange/file counts on stdout; this table records the",
        "query verdicts so a new smell shows up as a git diff, not a",
        "scrolled-away log line.",
        "",
        s"Summary: audited=$audited clean=$clean " +
          s"excluded=${names.count(excluded.contains)} smells=${smelly.size}" +
          (if (smelly.nonEmpty) s" (${smelly.mkString(", ")})" else ""),
        "",
        s"Global-window loop closure (VERDICT r13 #4): $windowLoop —",
        "every unpartitioned WindowExec observed in an executed plan must",
        "be a declared bounded intent, and every declaration must still be",
        "observed (stale entries fail the audit, so the allowlist cannot",
        "rot and mask a reintroduced unbounded window).",
        "",
        "| query | verdict | declared intents |",
        "|---|---|---|")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("docs/PLAN_AUDIT.md"),
        (hdr ++ artifact).mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[audit] artifact written: docs/PLAN_AUDIT.md (${artifact.size} rows)")
    }
    spark.stop()
  }

  /** Catalog queries the auditor skips, each with the reason on
    * record — an exclusion is a decision, not a gap. */
  private val excluded = Map(
    "q126_bpe_merges" ->
      ("bpeMerges executes its merge rounds during DataFrame construction, " +
       "so the auditable plan is just the collected merge table " +
       "(LocalTableScan) — the most expensive construction in the catalog " +
       "for a vacuous check; q127's final plan has real joins and IS audited"),
    "q175_components_upsert" ->
      ("the star-contraction closure iterates during DataFrame construction " +
       "(per-round actions + localCheckpoint), so the auditable plan is the " +
       "final label projection over checkpointed edges — vacuous; each " +
       "round's plan is keyed aggregations + joins by construction, and " +
       "q92/q122/q129 audit the same machinery embedded in real chains"),
    "q176_components_at_rest" ->
      ("q175's closure-during-construction shape over the STORED labeling " +
       "(the upsert also iterates during construction), so the auditable " +
       "plan is the same vacuous label projection; the at-rest read path " +
       "itself is the bucketed-table machinery the demos measure"))

  /** Physical WindowExec nodes with an EMPTY partition spec (the
    * `WindowExec: No Partition Defined` class): each is a single-task
    * global sort unless the windowed relation is bounded by
    * construction. Returns one short window-expression digest per
    * node so the audit line shows WHAT is globally sorted. */
  private def unpartitionedWindows(
      df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        w.windowExpression.map(_.sql).mkString(";").take(60)
    }

  /** Unpartitioned (global) windows that are the intended plan: the
    * windowed relation is BOUNDED by construction (gene-, sample-, or
    * partition-grain — row count independent of corpus size), so the
    * single task is a constant-size sort, not a scale cliff. The
    * recurring case is the STITCH window of the range-partition +
    * stitched-prefix-sum pattern (BH adjust, token packing, shard
    * manifests): the partition-local windows are keyed by `__pid`,
    * and the one global window runs over EXACTLY ONE ROW PER SHUFFLE
    * PARTITION — that one-row-per-pid offset relation is the entire
    * point of the pattern (docs/SCALING.md §windows). Any corpus-grain
    * global window still gets flagged. */
  private val intendedGlobalWindow: Map[String, String] = Map(
    "q03_top_sd" ->
      "global top-N rank over the per-gene SD relation — gene-grain (one row per gene), contract-bounded",
    "q52_percent_rank" ->
      "percent_rank over the per-gene SD relation — gene-grain, contract-bounded",
    "q41_replicate_renumber" ->
      "dense_rank over (dataset, replicate) — sample-grain, contract-bounded at hundreds of rows",
    "q10_bh_adjust" ->
      "BH machinery: __pid-keyed local ranks + __pid-grain stitch windows (one row per shuffle partition)",
    "q55_decide_tests" ->
      "the q10 BH stitch windows — __pid-grain offsets, one row per shuffle partition",
    "q70_e3_chain" ->
      "the chain's BH stages — __pid-keyed local ranks + one-row-per-pid stitch windows",
    "q71_annotated_toptable" ->
      "topTable's BH adjust — __pid-keyed local ranks + one-row-per-pid stitch windows",
    "q72_bind_meta_de" ->
      "both merged DE legs' BH adjusts — __pid-keyed local ranks + one-row-per-pid stitch windows",
    "q24_ks" ->
      "KS ECDF: __pid-keyed cumulative sums + the __pid-grain stitch (one row per shuffle partition); value axis is data-grain but range-partitioned first",
    "q47_perm_fdr" ->
      "n_ge_obs count over the (gene, perm) stat relation — gene x nperm rows, both contract-bounded; per-perm label ranks are sample-grain",
    "q91_packing_manifest" ->
      "token-packing prefix sums: __pid-keyed local sums + the one-row-per-pid stitch window",
    "q102_shard_manifest" ->
      "shard carving: __pid-keyed local ranks + the one-row-per-pid stitch window",
    "q135_real_token_packing" ->
      "the q91 packing windows over real-tokenizer counts — __pid-keyed + one-row-per-pid stitch",
    "q93_data_mix" ->
      "domain-keyed cumulative token sums (domain-bounded) + the q91 stitch pattern for the budget cut")

  /** SMJs that are the intended plan (docs/SCALING.md): both sides are
    * data- or gene-grain on matching keys, so forcing broadcast would
    * be wrong at cluster scale — AQE demotes them to broadcast at
    * runtime whenever the built side turns out small. Any OTHER query
    * growing an SMJ still gets flagged. */
  /** Queries whose plan must contain NO window operator at all: their
    * keep-first decisions are partial-aggregatable `min_by`/`min(
    * struct)` forms precisely so no content-grain key ever becomes a
    * single-task window sort (VERDICT r5 #2). q86 keeps its windows by
    * design — they are salted/bounded, not content-keyed. */
  private val windowFree = Set("q30_exact_dedup", "q85_paragraph_dedup")

  /** True when some BroadcastExchange build side is an UNBOUNDED
    * relation: it contains a parquet scan with no data/partition
    * filter AND no aggregation between the scan and the broadcast.
    * Bounded panels (`vec_id < 200`) have pushed filters; scalar
    * totals (q109's `broadcast(totals)`) and other aggregates are
    * bounded by their grouping keys regardless of what they scan;
    * literal relations and collected-and-baked centroid/LUT tables
    * have no file scan at all. Requires the audit session to run with
    * AQE OFF — under AQE the static plan has no exchange nodes and
    * this check would silently pass everything (caught in round 7 by
    * driving it against the q38-r6 full-corpus broadcast). */
  private def hasUnfilteredBroadcastScan(df: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    df.queryExecution.executedPlan.collect {
      case b: BroadcastExchangeExec =>
        val hasAgg = b.exists { case _: BaseAggregateExec => true; case _ => false }
        !hasAgg && b.collectLeaves().exists {
          case s: FileSourceScanExec =>
            s.dataFilters.isEmpty && s.partitionFilters.isEmpty
          case _ => false
        }
    }.exists(identity)
  }

  /** Broadcasts of unfiltered scans that are the intended plan: the
    * scanned table is a SAMPLE-axis dimension (suppliers double as
    * arrays/samples in the fixtures), contract-bounded at ≤ hundreds
    * of rows in every reference config — broadcasting it is exactly
    * right. Corpus-axis tables (lineitem, documents, embeddings)
    * never get whitelisted. */
  private val intendedBroadcast = Map(
    "q47_perm_fdr" ->
      "sample×perm label relation (supplier scan × Range(nperm)) — samples contract-bounded, nperm fixture-bounded",
    "q81_e1_blocked" ->
      "supplier-derived group/replicate metadata on the build side — the sample axis, ≤ hundreds of rows in every reference config",
    "q141_quality_cluster_amortized" ->
      "the at-rest NB model tables (graft_nbw_*/graft_nbp_*) — bucket-space-bounded by construction (16^3 weight rows + a 1-row prior), stored full scans that exist precisely to be broadcast at apply time")

  private val intendedSmj = Map(
    "q35_minhash_lsh" ->
      "shingle/candidate joins keyed on (shingle|band|pair) — both sides corpus-grain",
    "q169_winnow_compact" ->
      "the compacted-index containment join on h: the re-cap window already partitions AND sorts the reference side by h, so SMJ reuses that sort with zero extra exchange — exactly the plan the h-bucketed at-rest layout serves; both sides corpus-grain, AQE demotes when small",
    "q170_neardup_compact" ->
      "the compacted-index candidate/verify joins on (band|shingle): the re-cap window partitions and sorts the reference shingles, SMJ reuses the sort (the at-rest bucketed layout's plan); both sides corpus-grain, AQE demotes when small",
    "q171_winnow_compact_amortized" ->
      "q169's containment join with the compacted generation read from its h-bucketed at-rest table — the bucketed scan arrives pre-partitioned and SMJ reuses the layout's sort order (bucketed_winnow_demo measures the exchange saving); both sides corpus-grain, AQE demotes when small",
    "q172_neardup_compact_amortized" ->
      "q170's candidate/verify joins with the compacted generation read from its band/shingle-bucketed at-rest tables — SMJ rides the bucketed layout (bucketed_neardup_demo measures the exchange saving); both sides corpus-grain, AQE demotes when small",
    "q47_perm_fdr" ->
      "per-(gene,perm) stat join against observed stats — both sides gene-grain",
    "q60_nuse" ->
      "SE relation joined with its probeset-grain median — AQE broadcasts when small",
    "q64_cqn" ->
      "cell relation joined with gene-grain spline/offset relations on gene",
    "q69_e2_chain" ->
      "voom observation relation joined with its (gene,group) cell means and QN rank means — both sides data-grain keyed; AQE broadcasts the small side at runtime (final plans show BroadcastQueryStage)",
    "q82_e2_blocked" ->
      "the q69 voom observation joins plus the GLS per-(gene,unit) aggregation joined back on gene — both sides data-grain keyed; AQE demotes to broadcast at runtime (final plans show BroadcastQueryStage)",
    "q79_full_curation" ->
      "curation keep-set joins (repetition/decontamination ids against the doc relation) — both sides corpus-grain keyed; AQE demotes at runtime",
    "q158_e8_webcorpus" ->
      "the q138 E7 joins (extraction line reassembly keyed on doc id, curation near-dup verify keyed on (id_a,id_b), loser anti-join) plus the URL-survivor semi-join on doc_id — all corpus-grain keyed; the URL-grain winner is a partial-aggregatable min_by; AQE demotes at runtime",
    "q138_e7_rawcrawl" ->
      "the q79 curation-chain joins over the EXTRACTED corpus (near-dup verify keyed on (id_a,id_b), loser anti-join on doc_id) plus the extraction's doc-keyed line reassembly — all corpus-grain keyed; AQE demotes at runtime",
    "q116_gopher_curation" ->
      "the q79 curation-chain joins (near-dup Jaccard verify keyed on (id_a,id_b), loser anti-join on doc_id) — both sides corpus-grain keyed; AQE demotes at runtime; the gopher prefilter itself is a zero-shuffle projection",
    "q85_paragraph_dedup" ->
      "paragraph reassembly LEFT JOIN (docs against their rebuilt text) — both sides corpus-grain keyed on doc id; broadcasting either side would be wrong at corpus scale, AQE demotes when small",
    "q94_bloom_dedup" ->
      "confirm anti-join of bloom-positive candidates against the reference fingerprint relation — both sides corpus-grain keyed on the fingerprint; the bloom prune already shrank the left side, AQE demotes when the candidate set is small",
    "q95_repeated_spans" ->
      "span-start mask-back join keyed on (doc, pos) and the doc-universe reassembly joins keyed on doc id — both sides corpus-grain; AQE demotes when small",
    "q114_snapshot_diff" ->
      "FULL OUTER join of two corpus snapshots on the id — both sides corpus-grain and full-outer cannot build a broadcast side; bucket both snapshots by id to co-locate at rest",
    "q156_graph_semdedup" ->
      "the component-labeling LEFT JOIN back onto the corpus on vec_id (the q117 verdict shape — the labeling is corpus-grain worst-case, and since round 15 it is served as a checkpointed relation whose static size is unknown, so AQE-off planning cannot broadcast it); both sides corpus-grain keyed, AQE demotes at runtime",
    "q117_semdedup" ->
      "within-cell pair join keyed on cell (both sides corpus-grain — the SemDeDup contract bounds per-cell mass via nCells ∝ N) and the dropped-id LEFT JOIN back on vec_id (drop set is corpus-grain worst-case); AQE demotes when small",
    "q147_curation_audit" ->
      "the q65 minhash pair machinery plus three corpus-grain keyed LEFT joins (winner-id, near-dup-loser, scored relations onto the doc universe) — attribution needs every input row, so no side is bounded; AQE demotes when small",
    "q145_semantic_decon" ->
      "the hit-id LEFT JOIN back on vec_id (the q117 verdict shape — the hit set is corpus-grain worst-case, a fully contaminated corpus); the benchmark panel join itself is explicitly broadcast; AQE demotes when small",
    "q118_dsir_select" ->
      "doc-grain weight relation LEFT JOIN back to the doc universe on doc_id — both sides corpus-grain keyed; the λ and top-k relations are bounded and explicitly broadcast; AQE demotes when small",
    "q119_quality_classifier" ->
      "doc-grain NB score relation LEFT JOIN back to the doc universe on doc_id — both sides corpus-grain keyed; the weight and prior relations are bucket-bounded and explicitly broadcast; AQE demotes when small",
    "q121_classifier_holdout" ->
      "held-out doc universe LEFT JOIN its doc-grain score relation plus the actual-label join, all keyed on doc_id — both sides corpus-grain; the NB weight/prior relations are bucket-bounded and explicitly broadcast; AQE demotes when small",
    "q122_component_winners" ->
      "the q92 pair/closure machinery plus membership × per-component argmax joins keyed on component — both sides corpus-grain (components worst-case O(corpus)); AQE demotes when small",
    "q140_containment_dedup" ->
      "the winnow fingerprint-keyed pair join (both sides fingerprint-grain, the q133 shape) and the loser left_anti on doc_id — both sides corpus-grain keyed; AQE demotes when small",
    "q123_neardup_incremental" ->
      "cross-corpus candidate/verify joins keyed on (band|shingle|pair) and the final left_anti on doc_id — both sides corpus-grain, the q35 shape split across two corpora; AQE demotes when small",
    "q164_index_delete" ->
      "the q123 band/shingle/pair-keyed joins against the takedown-deleted index (two keyed anti-joins ahead of them) — both sides corpus-grain keyed; AQE demotes when small",
    "q166_winnow_upsert" ->
      "the q142 fingerprint-keyed pair joins run once per index GENERATION (crawl 1 vs ref0, crawl 2 vs the upserted ref1) — both sides corpus-grain; the upsert itself is an append-only union; AQE demotes when small",
    "q167_winnow_delete" ->
      "the q142 fingerprint-keyed pair join against the takedown-deleted winnow index (two keyed anti-joins ahead of it) plus the loser left_anti on doc_id — both sides corpus-grain keyed; AQE demotes when small",
    "q168_graph_compact" ->
      "the refresh round's adjacency self-join on the pivot node id and its vector-scoring joins — both sides corpus-grain keyed (the NN-Descent local-join shape; the build's identical joins sit behind per-round checkpoints whose known small sizes let static planning broadcast them); AQE demotes when small",
    "q157_graph_upsert" ->
      "the graph relation joined/anti-joined on node id against the affected-node set, plus the beam-search expansion joins — graph side corpus-grain keyed (bucketed by vec_id at rest, the bucketed_graph_demo layout), affected/frontier sides |new|·k-bounded; AQE demotes when small",
    "q155_split_leakage" ->
      "the q152 machinery keyed on the split label — q35 shingle/band/pair-keyed joins plus split-lookup joins of the pair relation against the labeled doc projection; both sides corpus-grain keyed, output splits²-bounded; AQE demotes when small",
    "q152_source_overlap" ->
      "the q35 shingle/band/pair-keyed joins plus the two source-lookup joins of the pair relation against the doc-grain (id, source) projection — both sides corpus-grain keyed; the aggregated output is source²-bounded; AQE demotes when small",
    "q151_neardup_upsert" ->
      "the q123 band/shingle/pair-keyed joins run once per index GENERATION (crawl 1 vs ref0, crawl 2 vs the upserted ref1) — both sides corpus-grain; the upsert itself is an append-only union, never a shuffle of the existing index; AQE demotes when small",
    "q125_incremental_curation" ->
      "the q79 curation-chain joins plus the q123 reference near-dup front stage (band/shingle/pair-keyed) and the exact-confirm anti-join on the fingerprint — all corpus-grain keyed; AQE demotes at runtime",
    "q128_neardup_amortized" ->
      "the q123 joins with the reference side read from its BUCKETED at-rest tables — the SMJ on band/shingle is the intended at-scale plan (the bucketed side sorts at rest and needs no exchange, bucketed_neardup_demo's proof); AQE demotes when small",
    "q129_quality_cluster_curation" ->
      "the q65 curation joins plus the classifier-score join onto the dedup keepers and the component winner/loser joins — all corpus-grain keyed on doc/bucket/component; AQE demotes at runtime",
    "q130_e6_amortized" ->
      "the q125 chain joins with the reference near-dup side read from its BUCKETED at-rest tables (q128's layout) — band/shingle SMJs against the bucketed side are the intended at-scale plan; AQE demotes when small",
    "q131_real_token_budget" ->
      "the (doc, word) count relation joined with the vocabulary-grain segmentation on word, then the salted budget windows — both sides corpus/vocabulary-grain keyed; AQE demotes when small",
    "q34_ngram_jaccard" ->
      "per-source shingle-set pair self-join — both sides corpus-grain keyed on source; AQE demotes when small",
    "q44_combat" ->
      "data-grain expression cells joined with gene-grain batch estimates on gene — both sides gene-keyed; AQE demotes at runtime",
    "q66_combat_covariates" ->
      "the q44 ComBat joins plus covariate design joins — all gene-/data-grain keyed; AQE demotes at runtime",
    "q67_combat_nonparam" ->
      "the q44 joins plus the int.eprior per-gene posterior join — gene-keyed both sides; AQE demotes at runtime",
    "q65_text_curation" ->
      "the q79 curation-chain joins (near-dup verify on (id_a,id_b), loser anti-join on doc_id) — corpus-grain keyed; AQE demotes at runtime",
    "q75_e2_multi_contrast" ->
      "the q82 voom/GLS observation joins — data-grain keyed both sides; AQE demotes at runtime",
    "q72_bind_meta_de" ->
      "meta-relation and DE toptables merged on gene — both sides gene-grain keyed; AQE demotes when small",
    "q141_quality_cluster_amortized" ->
      "the q129 curation joins with the classifier score join reading the at-rest model — corpus-grain keyed on doc/bucket/component; AQE demotes at runtime",
    "q142_containment_incremental" ->
      "fingerprint-keyed pair join against the BUCKETED at-rest winnow index (the q128 at-scale shape — the bucketed side needs no exchange) plus the loser left_anti on doc_id; AQE demotes when small")

  /** Count SHUFFLE exchanges only — a BroadcastExchange moves the
    * bounded side, not the data, and is the desired join strategy.
    * One home for the counting rule (both bucketed demos use it). */
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)).size

  /** The bucketed-workspace co-location demo (SCALING.md / ROADMAP):
    * checkpoint the expression matrix bucketed on gene_id, then run a
    * two-stage per-gene pipeline (per-gene stats → self-join on gene)
    * and count the Exchanges — the bucketed plan must have ZERO
    * (stage co-location replaces the reference's .exp file hand-offs);
    * the unbucketed plan shuffles twice. */
  private def bucketedDemo(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val m = graft.model.ExpressionMatrix(
      spark.read.parquet(s"$dir/lineitem.parquet").select(
        col("l_partkey").cast("string").as("gene_id"),
        col("l_suppkey").cast("string").as("sample_id"),
        col("l_extendedprice").as("value")))
    def twoStage(mx: graft.model.ExpressionMatrix) = {
      val stats = mx.df.groupBy("gene_id")
        .agg(avg("value").as("mean"), stddev_samp("value").as("sd"))
      mx.df.join(stats, Seq("gene_id"))
        .groupBy("gene_id").agg(sum((col("value") - col("mean")) / col("sd")).as("z_sum"))
    }
    val plain = exchanges(twoStage(m))
    val bucketed = exchanges(twoStage(
      graft.model.Workspace.checkpointBucketed(m, "graft_bucket_demo", buckets = 8)))
    println(s"\n========== bucketed_demo ==========")
    println(s"[audit] bucketed_demo: exchanges unbucketed=$plain bucketed=$bucketed " +
      (if (bucketed == 0) "(no-exchange co-location confirmed)" else "UNEXPECTED EXCHANGES"))
  }

  /** The at-rest ANN-index partition-pruning proof: the residual PQ
    * code relation written PARTITIONED BY its coarse cell means a
    * probe (which joins codes against a broadcast LUT carrying only
    * the nProbe probed cells per query) reads only the probed cells'
    * FILES — dynamic partition pruning turns the IVF "touch
    * nProbe/nCells of the index" contract into a file-skipping fact
    * at rest. Measures `numFiles` actually read by the scan for the
    * unpartitioned vs cell-partitioned code table. */
  private def partitionedIvfDemo(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = Similarity.lloydCentroids(emb, nCells = 8, iters = 10, dim = 64)
    val books = Similarity.pqFitResidual(emb, cents, m = 8, ksub = 16,
      iters = 5, dim = 64)
    val codes = Similarity.pqEncodeResidual(emb, books, cents)
    val base = "target/plans/ivf_codes"
    codes.write.mode("overwrite").parquet(s"$base/plain")
    codes.write.mode("overwrite").partitionBy("cell").parquet(s"$base/bycell")
    val qs = emb.filter(col("vec_id") < 5)
    def filesRead(codesRel: org.apache.spark.sql.DataFrame,
        prune: Boolean): (Long, Long) = {
      val df = Similarity.ivfPqTopKResidual(qs, codesRel, k = 5, nProbe = 2,
        books = books, centroids = cents, pruneCells = prune)
      df.collect()
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec if s.metadata.get("Location")
          .exists(_.contains("ivf_codes")) => s
      }
      (scans.map(_.metrics("numFiles").value).sum,
        scans.map(s => s.metrics.get("numPartitions").map(_.value).getOrElse(0L)).sum)
    }
    val (plainFiles, _) = filesRead(spark.read.parquet(s"$base/plain"), prune = false)
    val (prunedFiles, prunedParts) =
      filesRead(spark.read.parquet(s"$base/bycell"), prune = true)
    println(s"\n========== partitioned_ivf_demo ==========")
    println(s"[audit] partitioned_ivf_demo: code-scan files read " +
      s"unpartitioned=$plainFiles cell-partitioned=$prunedFiles " +
      s"(partitions read=$prunedParts of 8 cells, nProbe=2 x 5 queries) " +
      (if (prunedFiles < plainFiles || prunedParts < 8)
        "(probed-cell pruning confirmed at rest)"
       else "UNEXPECTED: partitioning pruned nothing"))
  }

  /** The at-rest WINNOW-index co-location proof (TextDedup
    * .winnowIndex's storage contract, the q142 layout): the reference
    * winnowed-fingerprint relation written BUCKETED by `h` joins an
    * incremental crawl's fingerprints with no reference-side shuffle —
    * only the (new, small) incoming side exchanges. Same measurement
    * as [[bucketedNearDupDemo]], on the containment family's hash
    * key. */
  private def bucketedWinnowDemo(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ref = docs.filter(col("doc_id") % 7 < 3)
    val inc = docs.filter(col("doc_id") % 7 >= 3)
    def save(df: org.apache.spark.sql.DataFrame, table: String,
        bucketKey: Option[String]): org.apache.spark.sql.DataFrame = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table.toLowerCase)
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(warehouse)) fs.delete(warehouse, true)
      val w = df.write.format("parquet").mode("overwrite")
      bucketKey.fold(w)(k => w.bucketBy(8, k).sortBy(k)).saveAsTable(table)
      spark.table(table)
    }
    val (refFp, _) = graft.operators.TextDedup.winnowIndex(ref, md5Hashes = true)
    val plainTbl = save(refFp, "graft_winnow_fp_plain", None)
    val bucketTbl = save(refFp, "graft_winnow_fp_bucketed", Some("h"))
    // materialize the incoming fingerprints too, so the counted
    // exchanges are the JOIN's alone, and force the at-scale no-
    // broadcast regime (the bucketedNearDupDemo convention)
    val (incFp, _) = graft.operators.TextDedup.winnowIndex(inc, md5Hashes = true)
    val incTbl = save(incFp.select(col("h"), col("doc_id").as("inc_id")),
      "graft_winnow_fp_incoming", None)
    graft.model.RelCache.release("textdedup.winnowIndex")
    val prevThreshold =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def cand(refRel: org.apache.spark.sql.DataFrame) = incTbl
      .join(refRel.select(col("h"), col("doc_id").as("ref_id")), Seq("h"))
    val (p, b) =
      try (exchanges(cand(plainTbl)), exchanges(cand(bucketTbl)))
      finally prevThreshold match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    println(s"\n========== bucketed_winnow_demo ==========")
    println(s"[audit] bucketed_winnow_demo: containment candidate-join exchanges " +
      s"unbucketed-index=$p bucketed-index=$b " +
      (if (b < p) "(reference fingerprints co-located at rest — only the incoming crawl shuffles)"
       else "UNEXPECTED: bucketing removed no exchange"))
  }

  /** The at-rest k-NN GRAPH co-location proof (the q150 storage
    * contract): graphSearchTopK's beam-expansion join keys on the
    * graph's node id, so a graph table BUCKETED by vec_id joins each
    * round's frontier with NO graph-side shuffle — only the (tiny,
    * query-bounded) frontier exchanges. Compares shuffle-exchange
    * counts for the same expansion join against the unbucketed vs
    * bucketed at-rest graph under the no-broadcast regime. */
  private def bucketedGraphDemo(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def save(df: org.apache.spark.sql.DataFrame, table: String,
        bucketKey: Option[String]): org.apache.spark.sql.DataFrame = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table.toLowerCase)
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(warehouse)) fs.delete(warehouse, true)
      val w = df.write.format("parquet").mode("overwrite")
      bucketKey.fold(w)(k => w.bucketBy(8, k).sortBy(k)).saveAsTable(table)
      spark.table(table)
    }
    val graph = graft.operators.Similarity.knnGraphDescent(emb, k = 5,
      iters = 2, dim = 64)
    val plainTbl = save(graph, "graft_graph_plain", None)
    val bucketTbl = save(graph, "graft_graph_bucketed", Some("vec_id"))
    // materialized frontier (the per-round beam state), so the counted
    // exchanges are the expansion JOIN's alone
    val frontier = save(emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("vec_id").as("c")),
      "graft_graph_frontier", None)
    val prevThreshold =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def expand(g: org.apache.spark.sql.DataFrame) = frontier
      .join(g.select(col("vec_id").as("c"), col("nbr")), Seq("c"))
      .select(col("query_id"), col("nbr").as("c"))
    val (p, b) =
      try (exchanges(expand(plainTbl)), exchanges(expand(bucketTbl)))
      finally prevThreshold match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    println(s"\n========== bucketed_graph_demo ==========")
    println(s"[audit] bucketed_graph_demo: beam-expansion join exchanges " +
      s"unbucketed-graph=$p bucketed-graph=$b " +
      (if (b < p) "(graph co-located at rest — only the query frontier shuffles)"
       else "UNEXPECTED: bucketing removed no exchange"))
  }

  /** The at-rest near-dup index co-location proof (TextDedup
    * .nearDupIndex's storage contract): the reference band relation
    * written BUCKETED by `band` joins an incremental crawl's band rows
    * with no reference-side shuffle — only the (new, small) incoming
    * side exchanges. Compares shuffle-exchange counts for the same
    * candidate join against the unbucketed vs bucketed at-rest table. */
  private def bucketedNearDupDemo(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ref = docs.filter(col("doc_id") % 7 < 3)
    val inc = docs.filter(col("doc_id") % 7 >= 3)
    def save(df: org.apache.spark.sql.DataFrame, table: String,
        bucketKey: Option[String]): org.apache.spark.sql.DataFrame = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table.toLowerCase)
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(warehouse)) fs.delete(warehouse, true)
      val w = df.write.format("parquet").mode("overwrite")
      bucketKey.fold(w)(k => w.bucketBy(8, k).sortBy(k)).saveAsTable(table)
      spark.table(table)
    }
    val (refBands, refShingles) =
      graft.operators.TextDedup.nearDupIndex(ref, md5Hashes = true)
    val plainTbl = save(refBands, "graft_neardup_bands_plain", None)
    val bucketTbl = save(refBands, "graft_neardup_bands_bucketed", Some("band"))
    // materialize the incoming bands too, so the counted exchanges are
    // the JOIN's alone (not the signature aggregation upstream), and
    // force the at-scale join regime: at corpus scale neither side
    // broadcasts, which is exactly when at-rest bucketing pays
    val (incBandRel, incShingles) =
      graft.operators.TextDedup.nearDupIndex(inc, md5Hashes = true)
    val incTbl = save(
      incBandRel.select(col("band"), col("doc_id").as("inc_id")),
      "graft_neardup_bands_incoming", None)
    // restore the PRIOR threshold (not the build default) and do so on
    // every exit path — an exception here must not leave broadcast
    // joins disabled for every later audit in the session
    val prevThreshold =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def cand(refRel: org.apache.spark.sql.DataFrame) = incTbl
      .join(refRel.select(col("band"), col("doc_id").as("ref_id")), Seq("band"))
    val (p, b) =
      try (exchanges(cand(plainTbl)), exchanges(cand(bucketTbl)))
      finally prevThreshold match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    // the demo only needed the band relations; drop the shingle
    // relations nearDupIndex persisted for the (unused) verify path
    refShingles.unpersist(blocking = false)
    incShingles.unpersist(blocking = false)
    println(s"\n========== bucketed_neardup_demo ==========")
    println(s"[audit] bucketed_neardup_demo: candidate-join exchanges " +
      s"unbucketed-index=$p bucketed-index=$b " +
      (if (b < p) "(reference side co-located at rest — only the incoming crawl shuffles)"
       else "UNEXPECTED: bucketing removed no exchange"))
  }
}
