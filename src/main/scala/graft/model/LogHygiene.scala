package graft.model

/** Targeted log suppression for the harness mains (ADVICE r15).
  *
  * The iterative kernels intentionally unpersist locally-checkpointed
  * round state once the next state is materialized; Spark logs an
  * unconditional `RDD ... truncated and cannot be recomputed after
  * unpersisting` WARN per release. The old fix demoted the WHOLE
  * `org.apache.spark.rdd.MapPartitionsRDD` logger to ERROR — which
  * also swallowed "block not found"-class warnings, the FIRST symptom
  * if the aggressive releaseState lifecycle ever unpersisted a
  * lineage-truncated block that was still needed. This filter denies
  * ONLY the one intentional message (by substring, on the rdd logger
  * subtree) and stays NEUTRAL for everything else, so genuine storage
  * warnings still surface in Bench and Verify output. */
object LogHygiene {

  /** Install the message-targeted DENY filter on the log4j2 core
    * context's configuration (the same context `setLevel` reaches).
    * Idempotent; a non-log4j2-core backend degrades to a no-op. */
  def suppressIntentionalUnpersistWarn(): Unit =
    try {
      import org.apache.logging.log4j.core.Filter
      val ctx = org.apache.logging.log4j.LogManager
        .getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      val cfg = ctx.getConfiguration
      val marker = "graft-unpersist-warn-filter"
      if (cfg.getProperties != null && cfg.getProperties.containsKey(marker))
        return
      val filter = new org.apache.logging.log4j.core.filter.AbstractFilter(
        Filter.Result.DENY, Filter.Result.NEUTRAL) {
        override def filter(
            event: org.apache.logging.log4j.core.LogEvent): Filter.Result =
          if (event != null && event.getLoggerName != null &&
              event.getLoggerName.startsWith("org.apache.spark.rdd.") &&
              event.getMessage != null &&
              event.getMessage.getFormattedMessage != null &&
              event.getMessage.getFormattedMessage
                .contains("cannot be recomputed after unpersisting"))
            Filter.Result.DENY
          else Filter.Result.NEUTRAL
      }
      cfg.getRootLogger.addFilter(filter)
      if (cfg.getProperties != null) cfg.getProperties.put(marker, "1")
      ctx.updateLoggers()
    } catch { case _: Throwable => () }
}
