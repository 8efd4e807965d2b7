package graft

import org.apache.spark.sql.DataFrame

/** Lineage-cut policy for iterative operators (PageRank, coreness,
  * k-truss, connected components, label propagation): every round
  * must truncate the logical plan or Catalyst analysis cost grows
  * super-linearly and the DAG re-executes all prior rounds on any
  * recompute.
  *
  * `localCheckpoint()` (the default) stores the cut RDD's blocks on
  * the executors that computed them — zero HDFS traffic, ideal for
  * local[*] and for clusters with static allocation. But those blocks
  * are NOT fault-tolerant: lose one executor (dynamic-allocation
  * decommission, spot kill, OOM) mid-iteration and a 30-round
  * PageRank over 100 TB dies unrecoverably (r15 verdict, design risk
  * #2). On a real cluster, set
  *
  *   spark.conf.set(Checkpoints.ConfKey, "hdfs:///tmp/graft-ckpt")
  *
  * and every iterative cut switches to a reliable `checkpoint()`
  * (replicated to the configured dir, survives executor loss). The
  * knob is session-conf rather than a per-call parameter so one line
  * of cluster config covers every operator, including cuts buried
  * inside composed pipelines the caller never sees. Both forms are
  * EAGER — operators rely on the cut materializing its input once.
  */
object Checkpoints {
  /** Session conf key: when set (non-empty), iterative lineage cuts
    * use reliable `checkpoint()` into this directory. */
  val ConfKey = "spark.graft.checkpoint.dir"

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir is cheap and idempotent for an unchanged
        // path; re-assert it so a caller-set conf wins over any stale
        // SparkContext-level dir from a previous operator.
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** Import-site sugar so call sites read like the built-in:
    * `frame.lineageCut()` instead of `Checkpoints.cut(frame)`. */
  implicit class LineageCutOps(private val df: DataFrame) extends AnyVal {
    def lineageCut(): DataFrame = cut(df)
  }
}
