package graft.model

/** Host-level session tuning shared by every entrypoint session
  * (round 17, guide §6 "I/O and file layout").
  *
  * Shuffle/spill local directories: Spark defaults its local dirs to
  * `java.io.tmpdir` (/tmp), which on this class of host is a slow
  * virtual disk — a MEASURED ~350-400 ms of the ~450-550 ms cost of
  * one tiny 32-partition shuffle job is shuffle-file I/O latency
  * (DiagFrag floors: 1-task no-shuffle job 68-92 ms, same job + one
  * 100k-row shuffle 455-549 ms, and 213-255 ms with local dirs on
  * tmpfs). A query chain with ~30 exchanges pays that per exchange.
  * Production guidance is the same ranked choice — put shuffle dirs
  * on the fastest local medium available (NVMe on real clusters); in
  * this sandbox that is the RAM-backed /dev/shm.
  *
  * Parameterised, never hard-coded (the optimization brief's
  * config rule): `SPARK_GRAFT_LOCAL_DIR` overrides the choice, an
  * explicit `SPARK_LOCAL_DIRS` / `spark.local.dir` from the
  * environment wins (Spark's own precedence — we only fill the
  * default), and hosts without a writable /dev/shm keep Spark's
  * stock behaviour. Scale note: local-dir payload at bench scale is
  * MBs against a 126 GB tmpfs; a deployment whose shuffle volume
  * exceeds RAM sets SPARK_GRAFT_LOCAL_DIR to its disk array — the
  * knob is the contract, the tmpfs default is the measured local
  * optimum. */
object SessionTuning {

  /** The local-dir default for this process, or None to leave Spark's
    * stock behaviour: explicit env beats graft env beats /dev/shm
    * probe. */
  def localDir: Option[String] =
    if (sys.env.contains("SPARK_LOCAL_DIRS")) None // Spark env wins untouched
    else sys.env.get("SPARK_GRAFT_LOCAL_DIR").filter(_.nonEmpty).orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        // per-process subdir so concurrent JVMs never share block dirs;
        // Spark removes its blockmgr/spill subdirs on shutdown, and the
        // deleteOnExit marker covers abnormal exits of the wrapper dir
        val d = new java.io.File(shm,
          s"graft-spark-${java.lang.ProcessHandle.current().pid()}")
        d.mkdirs()
        d.deleteOnExit()
        Some(d.getAbsolutePath)
      } else None
    }

  /** Apply the local-dir default to a session builder (no-op when the
    * environment already decides). */
  def tuned(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder =
    localDir.fold(b)(d => b.config("spark.local.dir", d))

  /** Spread a relation whose STATIC partition count is below the
    * session parallelism (round 17): zero-shuffle derivations put
    * their per-row compute on the SCAN's partitioning, and a
    * single-row-group parquet file is an unsplittable 1-task scan
    * (guide §2.5 "input skew: one huge unsplittable file —
    * repartition immediately after the read"). Scale-adaptive by
    * construction: a corpus-scale input arrives in ≥ parallelism
    * splits and takes the no-op branch, so the exchange is never
    * added at the scale where it would cost corpus volume. Streaming
    * inputs pass through untouched (micro-batches own their split). */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
