package graft

/** Scale-dependent session knobs, env-parameterised with local defaults
  * (round 15; the driver contract forbids constants tuned only for one
  * deployment — OPTIMIZATION_r15.md documents the production values).
  */
object Tuning {
  /** Floor for AQE post-shuffle partition coalescing
    * (`spark.sql.adaptive.coalescePartitions.minPartitionSize`).
    *
    * AQE coalesces by BYTES and is blind to per-row compute cost: with
    * the Spark default floor (1 MB), any shuffle stage under
    * cores × 1 MB collapses below full parallelism even when each row
    * carries 10⁴-10⁵ ops of downstream work (PPJoin prefix verify,
    * cosine verifies, DP folds). 64 kb keeps a 32-core box fully
    * parallel down to ~2 MB stages and measured x_ppjoin at half its
    * previous cost with no regression on byte-light queries (the floor
    * only engages when bytes/parallelism < 64 kb — trivially-small
    * stages still coalesce to one task).
    *
    * At a production cluster the per-task scheduling overhead argues
    * for the Spark default or higher: set
    * `SPARK_GRAFT_AQE_MIN_PARTITION=1mb` (or more) in the deployment
    * env; this default is the LOCAL tune the bench contract allows
    * when parameterised. */
  val AqeMinPartitionSize: String =
    sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64kb")
}
