package graft.queries

import graft.model.ExpressionMatrix
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY.md §2 operator coverage: melt/unpivot (S1), F8,
  * F11, F12, A7-A10, A12, A20-A21, A23-A24, A26, A31, W4, plus the
  * Ward linkage utility (A8). Oracle SQL provided wherever DuckDB can
  * express the operator; iterative/linear-algebra kernels (ComBat,
  * PCA, ICC, logistic, eBayes, permutation FDR, Ward, enrichment) get
  * the driver's weaker rows-only check.
  */
object ExtraQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** avg price per (gene=partkey, sample=suppkey) — the shared matrix
    * for the kernel queries. Persisted: the iterative kernels
    * (ComBat, eBayes, PCA) branch over it several times. */
  private def geneSupplierMatrix(s: SparkSession, dir: String, maxGene: Int = Int.MaxValue): ExpressionMatrix =
    ExpressionMatrix(t(s, dir, "lineitem")
      .filter(col("l_partkey") <= maxGene)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(avg("l_extendedprice").as("value"))
      .select(col("l_partkey").cast("string").as("gene_id"),
        col("l_suppkey").cast("string").as("sample_id"), col("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def supplierGroups(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier").select(col("s_suppkey").cast("string").as("sample_id"),
      when(col("s_nationkey") % 2 === 0, "A").otherwise("B").as("group"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S1: wide→long melt (unpivot) ----
    "q28_melt" -> ((s, dir) => {
      val wide = t(s, dir, "lineitem").groupBy(col("l_partkey").cast("string").as("pk"))
        .agg(round(coalesce(sum(when(col("l_returnflag") === "R", col("l_quantity"))), lit(0.0)) + 1e-5, 2).as("qty_r"),
             round(coalesce(sum(when(col("l_returnflag") === "A", col("l_quantity"))), lit(0.0)) + 1e-5, 2).as("qty_a"),
             round(coalesce(sum(when(col("l_returnflag") === "N", col("l_quantity"))), lit(0.0)) + 1e-5, 2).as("qty_n"))
      ExpressionMatrix.melt(wide, "pk").df
        .select(col("gene_id").cast("long").as("l_partkey"),
          col("sample_id"), col("value"))
        .orderBy("l_partkey", "sample_id")
    }),

    // ---- F8: zero-count partition ----
    "q29_zero_partition" -> ((s, dir) => {
      val m = ExpressionMatrix(t(s, dir, "lineitem").select(
        col("l_partkey").cast("string").as("gene_id"),
        col("l_suppkey").cast("string").as("sample_id"),
        col("l_discount").as("value")))
      val (nonzero, zero) = Filters.partitionZeroCounts(m)
      val a = nonzero.df.select(col("gene_id")).distinct()
        .agg(count(lit(1)).as("n")).withColumn("branch", lit("nonzero"))
      val b = zero.df.select(col("gene_id")).distinct()
        .agg(count(lit(1)).as("n")).withColumn("branch", lit("zero"))
      a.unionByName(b).select("branch", "n").orderBy("branch")
    }),

    // ---- F11: replicate renumbering (dense rank over dataset×rep) ----
    "q41_replicate_renumber" -> ((s, dir) => {
      val target = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority").as("dataset"),
        (col("o_custkey") % 100).as("replicate"))
      Filters.renumberReplicates(target)
        .select(col("o_orderkey"), col("dataset"),
          col("replicate"), col("replicate_global"))
        .orderBy("o_orderkey")
    }),

    // ---- F12: sample dedup (first per key, deterministic order) ----
    "q42_dedup_first" -> ((s, dir) => {
      Filters.dedupSamples(t(s, dir, "orders"), "o_custkey",
          Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"))
        .orderBy("o_custkey")
    }),

    // ---- A24: IDR over FEM-combined vs single-study z thresholds ----
    "q48_idr" -> ((s, dir) => {
      val stats = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_linestatus"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"), avg("l_extendedprice").as("mean"),
             var_samp("l_extendedprice").as("var"))
        .withColumnRenamed("l_returnflag", "group")
        .withColumnRenamed("l_partkey", "gene_id")
      val eff = Meta.effectSizes(stats, "group", "l_linestatus", "A", "N")
        .withColumn("z_single", col("dstar") / sqrt(col("sigmad")))
      val perGene = eff.groupBy("gene_id")
        .agg(max(abs(col("z_single"))).as("z_max_single"), count(lit(1)).as("k"))
        .filter(col("k") > 1)
        .join(Meta.femRem(Meta.effectSizes(stats, "group", "l_linestatus", "A", "N"))
          .select(col("gene_id"), col("z_fem").as("z_comb")), Seq("gene_id"))
      Meta.idr(perGene, Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0))
        .select(col("t"), col("idr_count")).orderBy("t")
    }),

    // ---- A31: histogram (fixed-width buckets over min/max) ----
    "q50_hist" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val bounds = li.agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      li.crossJoin(broadcast(bounds))
        .withColumn("bucket", least(lit(19),
          floor((col("l_extendedprice") - col("lo")) / ((col("hi") - col("lo")) / 20.0)).cast("int")))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // ---- W4: percent_rank median split on per-gene SD ----
    "q52_percent_rank" -> ((s, dir) => {
      val sd = t(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(round(stddev_samp("l_extendedprice") + 1e-5, 2).as("sd_price"))
        .filter(col("sd_price").isNotNull)
      sd.withColumn("pr", round(percent_rank().over(
          Window.orderBy(col("sd_price").asc, col("l_partkey").asc)) + 1e-9, 6))
        .filter(col("pr") >= 0.5)
        .select(col("l_partkey"), col("sd_price"), col("pr"))
        .orderBy("l_partkey")
    }),

    // ---- F3: ProbeFilter cigar/gene reliability rules ----
    // Annotation relation fabricated deterministically from lineitem:
    // probeset = part, one row per lineitem mapping. Every 37th
    // probeset is multi-gene (suppkey parity), l_quantity=1 rows get a
    // mismatch cigar, l_quantity=50 rows map to 2 genes, linenumber 7
    // rows are unannotated "-". Exon threshold: remove at >1 bad row.
    "q58_probe_filter" -> ((s, dir) => {
      val annot = t(s, dir, "lineitem").select(
        col("l_partkey").cast("string").as("probeset"),
        when(col("l_linenumber") === 7, "-")
          .when(col("l_partkey") % 37 === 0,
            concat(lit("G"), col("l_partkey").cast("string"), lit("x"),
              (col("l_suppkey") % 2).cast("string")))
          .otherwise(concat(lit("G"), col("l_partkey").cast("string"))).as("gene_id"),
        when(col("l_linenumber") === 7, "-")
          .otherwise(concat(lit("N"), col("l_partkey").cast("string"))).as("gene_short_name"),
        when(col("l_quantity") === 1, "24=1X").otherwise("25=").as("cigar"),
        when(col("l_quantity") === 50, 2).otherwise(1).as("gene_no"))
      ProbeFilter.exonFlat(annot)
        .select(col("probe").cast("long").as("probeset"), col("gene_idD"),
          col("gene_short_name"))
        .orderBy("probeset")
    }),

    // ---- A10: ComBat batch adjustment (rows-only: iterative EB) ----
    "q44_combat" -> ((s, dir) => {
      val m = geneSupplierMatrix(s, dir)
      val batches = t(s, dir, "supplier").select(
        col("s_suppkey").cast("string").as("sample_id"),
        when(col("s_nationkey") % 3 === 0, "b0").otherwise("b1").as("batch"))
      Batch.combat(m, batches).df
        .groupBy("gene_id")
        .agg(round(avg("value") + 1e-5, 2).as("adj_mean"), count(lit(1)).as("n"))
        .select(col("gene_id").cast("long").as("l_partkey"), col("adj_mean"), col("n"))
        .orderBy("l_partkey")
    }),

    // ---- A12: eBayes moderated t (rows-only: trigamma inversion) ----
    "q45_moderated_t" -> ((s, dir) => {
      val stats = DiffExpr.groupStats(geneSupplierMatrix(s, dir), supplierGroups(s, dir))
      DiffExpr.moderatedT(stats, "group", "A", "B")
        .select(col("gene_id").cast("long").as("l_partkey"),
          round(col("log2fc") + 1e-5, 2).as("log2fc"),
          round(col("t_mod") + 1e-7, 4).as("t_mod"),
          round(col("p_mod") + 1e-9, 6).as("p_mod"))
        .orderBy("l_partkey")
    }),

    // ---- A20: ICC via distributed gramian (rows-only: BlockMatrix) ----
    "q46_icc" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_partkey") <= 100)
      def mat(status: String) = ExpressionMatrix(
        li.filter(col("l_linestatus") === status)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(avg("l_extendedprice").as("value"))
          .select(col("l_partkey").cast("string").as("gene_id"),
            col("l_suppkey").cast("string").as("sample_id"), col("value")))
      Meta.icc(mat("O"), mat("F"))
        .select(col("gene_id").cast("long").as("l_partkey"),
          round(col("icc") + 1e-7, 4).as("icc"))
        .orderBy("l_partkey")
    }),

    // ---- A7+A29: PCA coordinates + Mahalanobis outlier calls ----
    "q43_pca_outliers" -> ((s, dir) => {
      val m = geneSupplierMatrix(s, dir, maxGene = 50)
      val genes = (1 to 50).map(_.toString)
      val pcs = QC.pca(m, k = 3, genes = genes)
      QC.pcaOutliers(pcs, k = 3)
        .select(col("sample_id").cast("long").as("l_suppkey"),
          round(col("d2") + 1e-5, 2).as("d2"), col("outlier"))
        .orderBy("l_suppkey")
    }),

    // ---- A21: per-gene logistic regression z-scores ----
    "q53_logistic" -> ((s, dir) => {
      val m = geneSupplierMatrix(s, dir, maxGene = 200)
      val outcomes = t(s, dir, "supplier").select(
        col("s_suppkey").cast("string").as("sample_id"),
        (col("s_nationkey") % 2 === 0).cast("int").as("outcome"))
      // scale expression to avoid saturating the logit
      val scaled = ExpressionMatrix(m.df.withColumn("value", col("value") / 100000.0))
      Meta.logisticZScores(scaled, outcomes)
        .select(col("gene_id").cast("long").as("l_partkey"),
          round(col("z") + 1e-7, 4).as("z"))
        .orderBy("l_partkey")
    }),

    // ---- A23: permutation FDR (nperm deterministic label shuffles) ----
    "q47_perm_fdr" -> ((s, dir) => {
      val m = geneSupplierMatrix(s, dir, maxGene = 300)
      Meta.permutationFdr(m, supplierGroups(s, dir), "A", "B", nperm = 20)
        .select(col("gene_id").cast("long").as("l_partkey"),
          round(col("z_obs") + 1e-7, 4).as("z_obs"),
          round(col("fdr") + 1e-9, 6).as("fdr"))
        .orderBy("l_partkey")
    }),

    // ---- A26: set enrichment (hypergeometric) ----
    "q49_enrichment" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val term2gene = part.select(col("p_brand").as("term"), col("p_partkey").as("gene_id"))
      val sig = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_partkey").as("gene_id")).distinct()
      Meta.enrichment(term2gene, sig, part.select(col("p_partkey").as("gene_id")))
        .select(col("term"), col("term_size"), col("overlap"),
          round(col("p") + 1e-9, 6).as("p"))
        .orderBy("term")
    }),

    // ---- A13: decideTests significance calls at (alpha, lfc) ----
    "q55_decide_tests" -> ((s, dir) => {
      val p = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (((col("l_orderkey") * 131 + col("l_linenumber") * 7919) % 9973) / lit(9973.0)).as("p"),
        (((col("l_orderkey") * 7) % 21) - 10).cast("double").as("log2fc"))
      val adj = DiffExpr.bhAdjustScalable(p, "p", Seq(col("l_orderkey"), col("l_linenumber")))
      DiffExpr.decideTests(adj, alpha = 0.4, minLfc = 3.0)
        .groupBy("sig").agg(count(lit(1)).as("n"))
        .orderBy("sig")
    }),

    // ---- A12: all-pairwise-contrast enumeration (combn semantics) ----
    "q56_contrasts" -> ((s, dir) => {
      val stats = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"), avg("l_extendedprice").as("mean"),
             var_samp("l_extendedprice").as("var"))
        .withColumnRenamed("l_returnflag", "group")
        .withColumnRenamed("l_partkey", "gene_id")
      val flags = Seq("A", "N", "R")
      flags.combinations(2).map { case Seq(a, b) =>
        DiffExpr.welchT(stats, "group", a, b)
          .select(lit(s"${a}_vs_$b").as("contrast"), col("gene_id").as("l_partkey"),
            round(col("log2fc") + 1e-5, 2).as("log2fc"),
            round(col("t") + 1e-7, 4).as("t_stat"))
      }.reduce(_ unionByName _).orderBy("contrast", "l_partkey")
    }),

    // ---- A18: RMA median-polish summarisation (rows-only) ----
    "q54_median_polish" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_partkey") <= 100)
      val probes = ExpressionMatrix(li
        .groupBy(col("l_partkey"), col("l_linenumber"), col("l_suppkey"))
        .agg(avg("l_extendedprice").as("value"))
        .select(concat_ws("-", col("l_partkey"), col("l_linenumber")).as("gene_id"),
          col("l_suppkey").cast("string").as("sample_id"), col("value")))
      val annot = li.select(
        concat_ws("-", col("l_partkey"), col("l_linenumber")).as("probe"),
        col("l_partkey").cast("string").as("probeset")).distinct()
      Dedup.medianPolish(probes, annot)
        .df.select(col("gene_id").cast("long").as("l_partkey"),
          col("sample_id").cast("long").as("l_suppkey"),
          round(col("value") + 1e-5, 2).as("summarized"))
        .orderBy("l_partkey", "l_suppkey")
    }),

    // ---- A8: Ward linkage dendrogram heights ----
    "q51_ward" -> ((s, dir) => {
      val m = ExpressionMatrix(t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 12)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(avg("l_extendedprice").as("value"))
        .select(col("l_partkey").cast("string").as("gene_id"),
          col("l_suppkey").cast("string").as("sample_id"), col("value")))
      val merges = Cluster.wardLinkage(Cluster.sampleDistances(m))
      val spark = s
      import spark.implicits._
      merges.map(mg => (mg.step, mg.size, math.rint(mg.height / 1e6)))
        .toDF("step", "size", "height_m").orderBy("step")
    }),
  )

  private def contrastSql(a: String, b: String) =
    s"""SELECT '${a}_vs_$b' AS contrast, l_partkey,
        round((ma - mb) + 1e-5, 2) + 0.0 AS log2fc,
        round((ma - mb) / sqrt(va/na + vb/nb) + 1e-7, 4) + 0.0 AS t_stat
        FROM (
          SELECT l_partkey,
                 max(CASE WHEN l_returnflag='$a' THEN n END) AS na,
                 max(CASE WHEN l_returnflag='$a' THEN mean END) AS ma,
                 max(CASE WHEN l_returnflag='$a' THEN var END) AS va,
                 max(CASE WHEN l_returnflag='$b' THEN n END) AS nb,
                 max(CASE WHEN l_returnflag='$b' THEN mean END) AS mb,
                 max(CASE WHEN l_returnflag='$b' THEN var END) AS vb
          FROM (SELECT l_partkey, l_returnflag, count(*) AS n,
                       avg(l_extendedprice) AS mean, var_samp(l_extendedprice) AS var
                FROM lineitem GROUP BY 1, 2)
          GROUP BY 1
        ) WHERE na > 1 AND nb > 1 AND ma IS NOT NULL AND mb IS NOT NULL
              AND (va + vb) > 0"""

  val oracleSql: Map[String, String] = Map(
    "q58_probe_filter" ->
      """WITH annot AS (
           SELECT CAST(l_partkey AS VARCHAR) AS probeset,
                  CASE WHEN l_linenumber = 7 THEN '-'
                       WHEN l_partkey % 37 = 0
                         THEN 'G' || CAST(l_partkey AS VARCHAR) || 'x' || CAST(l_suppkey % 2 AS VARCHAR)
                       ELSE 'G' || CAST(l_partkey AS VARCHAR) END AS gene_id,
                  CASE WHEN l_linenumber = 7 THEN '-'
                       ELSE 'N' || CAST(l_partkey AS VARCHAR) END AS gene_short_name,
                  CASE WHEN l_quantity = 1 THEN '24=1X' ELSE '25=' END AS cigar,
                  CASE WHEN l_quantity = 50 THEN 2 ELSE 1 END AS gene_no
           FROM lineitem
         ), g AS (
           SELECT probeset,
                  count(DISTINCT gene_id) AS n_genes,
                  sum(CASE WHEN cigar <> '25=' OR gene_no <> 1 THEN 1 ELSE 0 END) AS bad_rows,
                  max(gene_id) AS gene_idD,
                  max(gene_short_name) AS gene_short_name
           FROM annot WHERE gene_id <> '-' GROUP BY 1
         )
         SELECT CAST(probeset AS BIGINT) AS probeset, gene_idD, gene_short_name
         FROM g WHERE n_genes = 1 AND bad_rows <= 1
         ORDER BY probeset""",

    "q55_decide_tests" ->
      """WITH p AS (
           SELECT l_orderkey, l_linenumber,
                  ((l_orderkey * 131 + l_linenumber * 7919) % 9973) / 9973.0 AS p,
                  CAST(((l_orderkey * 7) % 21) - 10 AS DOUBLE) AS log2fc
           FROM lineitem
         ), ranked AS (
           SELECT *, count(*) OVER () AS n,
                  row_number() OVER (ORDER BY p ASC, l_orderkey ASC, l_linenumber ASC) AS rk
           FROM p
         ), adj AS (
           SELECT log2fc,
                  least(1.0, min(p * n / rk) OVER
                    (ORDER BY p ASC, l_orderkey ASC, l_linenumber ASC
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS p_bh
           FROM ranked
         ) SELECT CAST(CASE WHEN p_bh < 0.4 AND abs(log2fc) > 3.0
                            THEN CASE WHEN log2fc > 0 THEN 1 WHEN log2fc < 0 THEN -1 ELSE 0 END
                            ELSE 0 END AS INT) AS sig,
                  count(*) AS n
           FROM adj GROUP BY 1""",

    "q56_contrasts" ->
      (contrastSql("A", "N") + "\nUNION ALL\n" + contrastSql("A", "R") +
       "\nUNION ALL\n" + contrastSql("N", "R")),

    "q28_melt" ->
      """WITH wide AS (
           SELECT l_partkey,
             round(coalesce(sum(CASE WHEN l_returnflag='R' THEN l_quantity END), 0) + 1e-5, 2) + 0.0 AS qty_r,
             round(coalesce(sum(CASE WHEN l_returnflag='A' THEN l_quantity END), 0) + 1e-5, 2) + 0.0 AS qty_a,
             round(coalesce(sum(CASE WHEN l_returnflag='N' THEN l_quantity END), 0) + 1e-5, 2) + 0.0 AS qty_n
           FROM lineitem GROUP BY 1
         )
         SELECT l_partkey, 'qty_r' AS sample_id, qty_r AS value FROM wide
         UNION ALL
         SELECT l_partkey, 'qty_a' AS sample_id, qty_a AS value FROM wide
         UNION ALL
         SELECT l_partkey, 'qty_n' AS sample_id, qty_n AS value FROM wide""",

    "q29_zero_partition" ->
      """WITH sums AS (
           SELECT l_partkey, sum(abs(l_discount)) AS s FROM lineitem GROUP BY 1
         )
         SELECT 'nonzero' AS branch, count(*) AS n FROM sums WHERE s <> 0
         UNION ALL
         SELECT 'zero' AS branch, count(*) AS n FROM sums WHERE s = 0""",

    "q41_replicate_renumber" ->
      """SELECT o_orderkey, o_orderpriority AS dataset,
                o_custkey % 100 AS replicate,
                CAST(dense_rank() OVER (ORDER BY o_orderpriority ASC, o_custkey % 100 ASC) AS INT)
                  AS replicate_global
         FROM orders""",

    "q42_dedup_first" ->
      """WITH ranked AS (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
           FROM orders
         ) SELECT o_custkey, o_orderkey FROM ranked WHERE rn = 1""",

    "q48_idr" ->
      """WITH stats AS (
           SELECT l_partkey, l_linestatus, l_returnflag,
                  count(*) AS n, avg(l_extendedprice) AS mean,
                  var_samp(l_extendedprice) AS var
           FROM lineitem GROUP BY 1, 2, 3
         ), wide AS (
           SELECT l_partkey, l_linestatus,
                  max(CASE WHEN l_returnflag = 'A' THEN mean END) AS ma,
                  max(CASE WHEN l_returnflag = 'N' THEN mean END) AS mb,
                  max(CASE WHEN l_returnflag = 'A' THEN var END) AS va,
                  max(CASE WHEN l_returnflag = 'N' THEN var END) AS vb,
                  max(CASE WHEN l_returnflag = 'A' THEN n END) AS na,
                  max(CASE WHEN l_returnflag = 'N' THEN n END) AS nb
           FROM stats GROUP BY 1, 2
         ), eff AS (
           SELECT l_partkey, l_linestatus, na, nb,
                  (ma - mb) / sqrt(((na-1)*va + (nb-1)*vb) / (na+nb-2)) AS d
           FROM wide
           WHERE ma IS NOT NULL AND mb IS NOT NULL AND na > 1 AND nb > 1 AND (va + vb) > 0
         ), star AS (
           SELECT l_partkey, l_linestatus, na, nb, d,
                  d * (1 - 3.0 / (4*(na+nb-2) - 1)) AS dstar
           FROM eff
         ), sized AS (
           SELECT l_partkey, dstar,
                  1.0/na + 1.0/nb + dstar*dstar / (2*(na+nb)) AS sigmad,
                  1.0 / (1.0/na + 1.0/nb + dstar*dstar / (2*(na+nb))) AS w
           FROM star
         ), per_gene AS (
           SELECT l_partkey,
                  max(abs(dstar / sqrt(sigmad))) AS z_max_single,
                  count(*) AS k,
                  (sum(w*dstar)/sum(w)) * sqrt(sum(w)) AS z_comb
           FROM sized GROUP BY 1 HAVING count(*) > 1
         )
         SELECT t.t, CAST(coalesce(sum(CASE WHEN abs(z_comb) >= t.t
                                             AND abs(z_max_single) < t.t
                                        THEN 1 END), 0) AS BIGINT) AS idr_count
         FROM per_gene CROSS JOIN (VALUES (0.5), (1.0), (1.5), (2.0), (2.5), (3.0)) t(t)
         GROUP BY 1""",

    "q50_hist" ->
      """WITH bounds AS (
           SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem
         )
         SELECT CAST(least(19, floor((l_extendedprice - lo) / ((hi - lo) / 20.0))) AS INT) AS bucket,
                count(*) AS n
         FROM lineitem CROSS JOIN bounds
         GROUP BY 1""",

    "q52_percent_rank" ->
      """WITH sd AS (
           SELECT l_partkey, round(stddev_samp(l_extendedprice) + 1e-5, 2) + 0.0 AS sd_price
           FROM lineitem GROUP BY 1
         ), pr AS (
           SELECT l_partkey, sd_price,
                  round(percent_rank() OVER (ORDER BY sd_price ASC, l_partkey ASC) + 1e-9, 6) + 0.0 AS pr
           FROM sd WHERE sd_price IS NOT NULL
         ) SELECT l_partkey, sd_price, pr FROM pr WHERE pr >= 0.5""",
  )
}
