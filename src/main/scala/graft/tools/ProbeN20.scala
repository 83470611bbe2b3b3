package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the n20 consolidation (round 17): decomposes the
  * serve-recall pipeline into GRAPH quality vs DESCENT quality so a
  * flat n18 -> n20 pin delta is attributable. For one fixture dir:
  *   - base-layer adjacency recall vs brute-force true top-k, split
  *     by cohort (old points / new points), for the appended stack,
  *     the consolidated stack, and a from-scratch fresh build;
  *   - serve recall through each stack at the n18 descent budget
  *     (tombstones included, live-corpus truth — the pin's setup).
  * Throwaway-main discipline (sbt console can't run scripts). */
object ProbeN20 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Bench.session()
    import spark.implicits._

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("features"))
      .localCheckpoint()
    val old = e.filter(col("id") % 5 =!= 0)
    val nw = e.filter(col("id") % 5 === 0)
    val n = e.count()
    val maxLevel = math.max(1, (math.log(n / 16.0) / math.log(4.0)).toInt)
    println(s"[probe] n=$n maxLevel=$maxLevel")

    val levels = graft.ops.GraphSearch.assignLayers(old, maxLevel)
      .localCheckpoint()
    val base = graft.nnd.NND.buildGraph(old,
        graft.nnd.NND.Params(k = 10, maxIterations = 5))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
      .localCheckpoint()
    val prior = base +: (1 to maxLevel).map { l =>
      graft.nnd.NND.buildGraph(
          old.join(levels.filter(col("level") >= l).select("id"), "id"),
          graft.nnd.NND.Params(k = 8, maxIterations = 3))
        .filter(col("neighbors").isNotNull).select("id", "neighbors")
        .localCheckpoint()
    }
    val appended = graft.ops.GraphSearch.appendToGraphStack(prior, old, nw,
      k = 10, fanout = 4, beam = 64, hops = 5, seeds = 16,
      upperK = 8, upperBeam = 8, upperHops = 3).map(_.localCheckpoint())
    val cons = graft.ops.GraphSearch.consolidateStack(appended, e, nw,
      k = 10, fanout = 4, upperK = 8, maxIterations = 3)
      .map(_.localCheckpoint())
    // Fresh full-corpus stack (the s22 construction over ALL ids).
    val levelsAll = graft.ops.GraphSearch.assignLayers(e, maxLevel)
      .localCheckpoint()
    val fresh = (graft.nnd.NND.buildGraph(e,
        graft.nnd.NND.Params(k = 10, maxIterations = 5))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
      .localCheckpoint()) +: (1 to maxLevel).map { l =>
      graft.nnd.NND.buildGraph(
          e.join(levelsAll.filter(col("level") >= l).select("id"), "id"),
          graft.nnd.NND.Params(k = 8, maxIterations = 3))
        .filter(col("neighbors").isNotNull).select("id", "neighbors")
        .localCheckpoint()
    }

    // True top-10 adjacency (brute) in the GRAPH's own metric (l2Sim —
    // the lists being audited store 1/(1+L2), so the truth must too).
    val truth = {
      import graft.functions.VectorFunctions.vector_l2_sim
      val cc = e.select(col("id").as("nbr_id"), col("features").as("v_c"))
      e.select(col("id"), col("features").as("v_q"))
        .join(cc, col("id") =!= col("nbr_id"))
        .withColumn("sim", vector_l2_sim(col("v_q"), col("v_c")))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("id")
            .orderBy(desc("sim"), asc("nbr_id"))))
        .filter(col("rk") <= 10)
        .select(col("id"), col("nbr_id"))
        .localCheckpoint()
    }

    def adjRecall(g: DataFrame, label: String): Unit = {
      val edges = g.select(col("id"), explode(col("neighbors")).as("nb"))
        .select(col("id"), col("nb.id").as("nbr_id"))
      val hits = edges.join(truth, Seq("id", "nbr_id"), "left_semi")
        .withColumn("cohort", when(col("id") % 5 === 0, "new").otherwise("old"))
        .groupBy("cohort").agg(count(lit(1)).as("n_hits"))
      val tot = truth
        .withColumn("cohort", when(col("id") % 5 === 0, "new").otherwise("old"))
        .groupBy("cohort").agg(count(lit(1)).as("n_true"))
      hits.join(tot, "cohort").orderBy("cohort").collect().foreach { r =>
        println(f"[probe] $label adjacency ${r.getString(0)}%s: " +
          f"${r.getLong(1)}%d/${r.getLong(2)}%d = " +
          f"${r.getLong(1).toDouble / r.getLong(2)}%.3f")
      }
    }
    adjRecall(appended(0), "appended")
    adjRecall(cons(0), "consolidated")
    adjRecall(fresh(0), "fresh")

    // Serve at the n18 budget (tombstones + live truth, the pin setup).
    val dead = e.select("id").filter(col("id") % 7 === 3)
    val live = e.join(dead, Seq("id"), "left_anti")
    val q = live.filter(col("id") < 20)
    val liveTruth = graft.ops.SimilaritySearch.bruteForceTopK(live, q, 10)
    def serve(stk: Seq[DataFrame], label: String): Unit = {
      val res = graft.ops.GraphSearch.searchHierarchical(stk, e, q,
        k = 10, beam = 8, hops = 2, entries = 4, upperBeam = 8,
        upperHops = 3, seeds = 4, tombstones = Some(dead))
      val hits = res.select(col("query_id").as("id"), col("nbr_id"))
        .join(liveTruth.select(col("query_id").as("id"), col("nbr_id")),
          Seq("id", "nbr_id"), "left_semi").count()
      val tot = liveTruth.count()
      println(f"[probe] $label serve: $hits/$tot = ${hits.toDouble / tot}%.3f")
    }
    serve(appended, "appended")
    serve(cons, "consolidated")
    serve(fresh, "fresh")
    spark.stop()
  }
}
