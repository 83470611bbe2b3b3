package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}

/** THE localCheckpoint lifecycle pair for iterative loops — single
  * definition for the truncate/release protocol previously copied into
  * every loop (NND, GraphSearch, Centrality, Coreset, Dedup), so the
  * release semantics cannot drift between call sites.
  *
  * `truncate` materializes eagerly and cuts lineage; `release` frees
  * the executor blocks behind a checkpoint the loop no longer reads.
  * `Dataset.unpersist` alone never reaches a localCheckpoint's blocks
  * (the CacheManager never saw them), and
  * `GraftColumnBridge.releaseLocalCheckpoint` acts only when the plan
  * ROOT is the checkpoint's `LogicalRDD` — a deliberate no-op on
  * derived plans and on checkpoints a CALLER composed in, whose
  * truncated lineage could never recompute dropped blocks (see the
  * bridge's scaladoc for the full caveat). Callers must therefore pass
  * the checkpoint-rooted frame itself, not a map over it. */
object Checkpoints {
  def truncate(df: DataFrame): DataFrame = df.localCheckpoint(true)

  def release(ds: Dataset[_]): Unit = {
    ds.unpersist()
    org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(ds)
  }
}
