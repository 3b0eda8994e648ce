package graft.ops

import org.apache.spark.sql.DataFrame

/** Partitioning helpers shared by the operator family. */
object Partitioning {

  /** Scale-adaptive kernel spread (optimization guide §2.5, "input
    * skew: one huge unsplittable file"): a tiny input lands as fewer
    * scan partitions than the cluster has cores (a single-row-group
    * parquet file scans as ONE split no matter what
    * `files.maxPartitionBytes` says), so every CPU-bound per-row kernel
    * downstream — gram hashing, winnow signatures, SimHash, quality
    * regex passes — runs nearly serial while the other cores idle.
    * When the upstream grants less than half the default parallelism,
    * repartition the (already narrow) frame to it; the shuffled bytes
    * are bounded by the tiny input that triggered the condition. At
    * production scale a scan carries >= cores splits and this is the
    * identity — no extra exchange ever enters a big plan, so the
    * operators keep their zero/low-shuffle scale shapes. Round-robin
    * repartition keeps Spark's sort-before-repartition determinism;
    * the callers' kernels and aggregations are partitioning-
    * independent, so results are unchanged either way.
    */
  def spreadSmall(df: DataFrame): DataFrame = {
    // streaming frames can't be probed via .rdd (and micro-batch inputs
    // are partitioned by the source) — the spread is a batch-only aid
    if (df.isStreaming) return df
    // probing partition count (.rdd) physically plans the whole upstream
    // subtree — cheap on a scan, but composed pipelines (CorpusPrep)
    // call operators on DEEP mid-pipeline frames where that planning is
    // pure overhead AND any upstream shuffle already re-established
    // spark.sql.shuffle.partitions parallelism. A cheap logical-plan
    // walk skips the probe whenever a shuffle-introducing node (or an
    // explicit repartition, e.g. an outer spreadSmall) sits below.
    import org.apache.spark.sql.catalyst.plans.logical._
    val alreadyParallel = df.queryExecution.logical.exists {
      case _: Repartition | _: RepartitionOperation => true
      case _: Join | _: Aggregate | _: Window | _: Sort | _: Distinct => true
      case _ => false
    }
    if (alreadyParallel) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
