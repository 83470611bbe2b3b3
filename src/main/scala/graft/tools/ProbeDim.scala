package graft.tools

import org.apache.spark.sql.functions._

/** Isolated fresh-JVM probe for d11's dimension scaling (the
  * SCALE_BENCH.md dim addendum's attribution evidence): per tier dir,
  * runs the d11 kernel (augment -> deterministic k-means blocking at
  * the k ∝ N dial -> in-block pair verify) ONCE in a fresh session and
  * prints the blocking balance (Σ size(c)², top cluster sizes) and the
  * emitted pair count next to the wall — the three numbers that decide
  * whether a wall swing is the operator (unbalanced blocking or pair
  * blow-up) or the host/JVM (both stable while the wall moves).
  *
  * Freshness caveat: with several tier dirs in one invocation, only
  * the FIRST runs in a truly fresh session — later tiers execute in
  * a JVM the earlier ones warmed (JIT, code cache, grown heap). The
  * round-16 attribution therefore rests on cross-INVOCATION
  * repeatability (three separate runs agreeing per tier), plus a
  * single-dir 384-d-only run confirming the second-position number;
  * for a strict per-tier fresh reading, pass one dir per invocation.
  *
  * Usage: runMain graft.tools.ProbeDim <tierDir> [tierDir ...]
  * (fork with the scale config: SPARK_GRAFT_SHUFFLE=64, -Xmx32g). */
object ProbeDim {
  def main(args: Array[String]): Unit = {
    val sp = graft.Bench.session()
    for (dir <- args.toSeq) {
      val emb = sp.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("features"))
      val aug = graft.Queries.augmentEmb(emb)
      val n = aug.count()
      val k = math.max(8L, n / 500L).toInt
      val asg = graft.ops.Clustering.kmeansAssign(aug, "id", "features", k, 5, 42L)
      val sizes = asg.groupBy("cluster").count()
        .orderBy(desc("count")).collect().map(_.getLong(1))
      val sumSq = sizes.map(s => s * s).sum
      println(s"[probe] $dir n=$n k=$k nclusters=${sizes.length} " +
        s"top5=${sizes.take(5).mkString(",")} sumSq=$sumSq")
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.semanticPairs(aug, "id", "features", 0.9, k = k).count()
      println(s"[probe] $dir pairs=$pairs wall=${(System.nanoTime() - t0) / 1e9}")
    }
    sp.stop()
  }
}
