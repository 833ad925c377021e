package graft.operators

import graft.model.ExpressionMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A10 — ComBat empirical-Bayes batch-effect removal
  * (`DiffExpression_closedPlatform.R:372-437`, sva's ComBat with the
  * reference's stability patch at :108-169).
  *
  * Spark-first decomposition (null covariate model, i.e. the
  * reference's `model.matrix(~1)` usage in `Study_effect.R:636`):
  *
  *  1. per-gene grand stats (pooled mean, pooled var) — one agg;
  *  2. standardize: z = (x − α̂_g) / σ̂_g — column algebra;
  *  3. per-(gene, batch) location/scale estimates (γ̂, δ̂²) — one agg;
  *  4. EB hyperparameters per batch (γ̄, τ̄², and inverse-gamma moment
  *     fit for δ²) — one tiny per-batch agg collected to the driver
  *     (rows = #batches, not data-sized);
  *  5. parametric posterior (γ*, δ²*) by the standard fixed-point
  *     iteration, run on the per-(gene,batch) relation with the
  *     broadcast hyperparameters — the iteration is closed-form per
  *     row given the hyperparameters (sva's `it.sol`), expressed as a
  *     bounded loop of column updates;
  *  6. adjust: x* = σ̂_g · (z − γ*)/√δ²* + α̂_g.
  *
  * Everything shuffles on gene exactly twice; no collect of any
  * gene-sized relation.
  */
object Batch {

  def combat(m: ExpressionMatrix, batches: DataFrame, batchCol: String = "batch",
      iterations: Int = 30): ExpressionMatrix = {
    val df = m.canonical.df.join(broadcast(batches.withColumnRenamed(batchCol, "batch")),
      Seq("sample_id"))

    // 1. per-gene grand mean / variance (across all samples)
    val grand = df.groupBy("gene_id")
      .agg(avg("value").as("alpha"), var_samp("value").as("sigma2"))
      .filter(col("sigma2") > 0)
    // 2. standardized data (reused by the location/scale pass and the
    // final adjustment — materialize once)
    val z = df.join(grand, Seq("gene_id"))
      .withColumn("z", (col("value") - col("alpha")) / sqrt(col("sigma2")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. per-(gene, batch) location/scale (feeds both the hyperprior
    // aggregate and the posterior map)
    val gb = z.groupBy("gene_id", "batch")
      .agg(count(lit(1)).as("n_b"), avg("z").as("gamma_hat"), var_samp("z").as("delta2_hat"))
      .filter(col("delta2_hat").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4. per-batch hyperpriors (moment estimates as in sva):
    //    gamma_bar, tau2 = var of gamma_hat; (a_prior, b_prior) from
    //    mean/var of delta2_hat
    val hyper = gb.groupBy("batch").agg(
        avg("gamma_hat").as("gamma_bar"), var_samp("gamma_hat").as("tau2"),
        avg("delta2_hat").as("d_bar"), var_samp("delta2_hat").as("d_var"))
      .withColumn("a_prior", (lit(2.0) * col("d_var") + col("d_bar") * col("d_bar")) / col("d_var"))
      .withColumn("b_prior", (col("d_bar") * col("d_var") + col("d_bar") * col("d_bar") * col("d_bar")) / col("d_var"))

    // 5. parametric EB posterior via sva's it.sol fixed point:
    //    g* = (n τ² γ̂ + δ²* γ̄)/(n τ² + δ²*)
    //    δ²* = (b + ½Σ(z−g*)² ) / (n/2 + a − 1), with Σ(z−g*)² =
    //          (n−1)δ̂² + n(γ̂ − g*)²   [sufficient statistics only].
    //    The iteration is row-local given the (broadcast) per-batch
    //    hyperparameters, so it runs as a typed map — a bounded Scala
    //    loop per (gene, batch) row — rather than as an unrolled
    //    column expression whose tree would grow exponentially with
    //    the iteration count.
    val spark = m.df.sparkSession
    import spark.implicits._
    val postSel = gb.join(broadcast(hyper), Seq("batch"))
      .select(col("gene_id"), col("batch"), col("n_b").cast("double"),
        col("gamma_hat"), col("delta2_hat"),
        col("gamma_bar"), col("tau2"), col("a_prior"), col("b_prior"))
      .as[(String, String, Double, Double, Double, Double, Double, Double, Double)]
      .map { case (gene, batch, n, gammaHat, delta2Hat, gammaBar, tau2, aPrior, bPrior) =>
        var gStar = gammaHat
        var dStar = delta2Hat
        var i = 0
        while (i < iterations) {
          gStar = (n * tau2 * gammaHat + dStar * gammaBar) / (n * tau2 + dStar)
          dStar = (bPrior + 0.5 * ((n - 1) * delta2Hat +
            n * (gammaHat - gStar) * (gammaHat - gStar))) / (n / 2 + aPrior - 1)
          i += 1
        }
        (gene, batch, gStar, dStar)
      }.toDF("gene_id", "batch", "g_star", "d_star")

    // 6. adjust
    val adjusted = z.join(postSel, Seq("gene_id", "batch"))
      .withColumn("value",
        sqrt(col("sigma2")) * (col("z") - col("g_star")) / sqrt(col("d_star")) + col("alpha"))
      .select("gene_id", "sample_id", "value")
    ExpressionMatrix(adjusted)
  }
}
