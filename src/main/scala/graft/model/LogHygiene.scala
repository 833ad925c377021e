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

  /** The one named DENY filter class — named (not anonymous) so the
    * installer can key idempotence off the filter's PRESENCE in a
    * config's filter chain (ADVICE r16: the old marker lived in
    * `cfg.getProperties`, so a put() failure after addFilter stacked
    * duplicate filters on every retry, and a rebuilt configuration
    * that kept properties but dropped filters read as installed). */
  private final class UnpersistDenyFilter
      extends org.apache.logging.log4j.core.filter.AbstractFilter(
        org.apache.logging.log4j.core.Filter.Result.DENY,
        org.apache.logging.log4j.core.Filter.Result.NEUTRAL) {
    override def filter(event: org.apache.logging.log4j.core.LogEvent)
        : org.apache.logging.log4j.core.Filter.Result =
      if (event != null && event.getLoggerName != null &&
          event.getLoggerName.startsWith("org.apache.spark.rdd.") &&
          event.getMessage != null &&
          event.getMessage.getFormattedMessage != null &&
          event.getMessage.getFormattedMessage
            .contains("cannot be recomputed after unpersisting"))
        org.apache.logging.log4j.core.Filter.Result.DENY
      else org.apache.logging.log4j.core.Filter.Result.NEUTRAL
  }

  /** True iff an [[UnpersistDenyFilter]] already sits in `f`'s chain
    * (log4j2 composes multiple addFilter calls into a
    * CompositeFilter). */
  private def installed(f: org.apache.logging.log4j.core.Filter): Boolean =
    f match {
      case null => false
      case c: org.apache.logging.log4j.core.filter.CompositeFilter =>
        c.getFiltersArray.exists(installed)
      case x => x.isInstanceOf[UnpersistDenyFilter]
    }

  /** Install the message-targeted DENY filter on the LoggerConfig the
    * rdd loggers actually TRAVERSE — `getLoggerConfig("org.apache
    * .spark.rdd")`, i.e. the closest configured ancestor (usually the
    * root, but a log4j2 configuration that defines its own
    * `org.apache.spark(.rdd)` logger with additivity=false never
    * routes events through the root config, so a root-only filter
    * silently stopped working there — ADVICE r16). The root config
    * keeps a copy too when it differs, covering a configuration
    * rebuilt with a closer logger AFTER install. Idempotence is keyed
    * off the presence of the named filter class in each target's own
    * chain. A non-log4j2-core backend degrades to a no-op. */
  def suppressIntentionalUnpersistWarn(): Unit =
    try {
      val ctx = org.apache.logging.log4j.LogManager
        .getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      val cfg = ctx.getConfiguration
      val targets = Seq(
        cfg.getLoggerConfig("org.apache.spark.rdd"), cfg.getRootLogger)
        .distinct
      var added = false
      targets.foreach { lc =>
        if (!installed(lc.getFilter)) {
          lc.addFilter(new UnpersistDenyFilter)
          added = true
        }
      }
      if (added) ctx.updateLoggers()
    } catch { case _: Throwable => () }
}
