package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilaritySearch
import graft.streaming.AnnServe

/** The streaming ANN serve must produce the batch IVF search's exact
  * rows: same candidates (cells partition the corpus, probes are a
  * stateless projection), same bounded top-k merge order (sim desc, id
  * asc) — so equality is row-level, not a recall summary. */
class AnnServeSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("features"))

  test("streaming IVF serve equals the batch IVF search row-for-row") {
    val e = emb
    val q = e.filter(col("id") < 20)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2))
    val batch = SimilaritySearch.ivfTopK(e, q, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val served = AnnServe.ivfServeTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(batch.nonEmpty)
    assert(served.toSet == batch.toSet,
      s"serve diverged from batch: only-batch=${batch.toSet -- served.toSet} " +
        s"only-served=${served.toSet -- batch.toSet}")
  }

  test("streaming layered serve equals the batch hierarchical search row-for-row") {
    val e = emb
    val q = e.filter(col("id") < 20)
    // A small in-memory stack suffices — the serve's claim is drain ==
    // batch over the SAME stack, whatever the stack is.
    val base = graft.nnd.NND.buildGraph(e,
        graft.nnd.NND.Params(k = 8, maxIterations = 4))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
      .localCheckpoint()
    val upper = graft.nnd.NND.buildGraph(
        e.join(graft.ops.GraphSearch.assignLayers(e, maxLevel = 1)
          .filter(col("level") >= 1).select("id"), "id"),
        graft.nnd.NND.Params(k = 6, maxIterations = 3))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
      .localCheckpoint()
    val layers = Seq(base, upper)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val batch = rows(graft.ops.GraphSearch.searchHierarchical(
      layers, e, q, k = 10, beam = 8, hops = 2, entries = 4,
      upperBeam = 8, upperHops = 3, seeds = 4))
    val served = rows(AnnServe.layeredServe(spark, sf001, layers, e))
    assert(batch.nonEmpty)
    assert(served.toSet == batch.toSet,
      s"layered serve diverged from batch: " +
        s"only-batch=${batch.toSet -- served.toSet} " +
        s"only-served=${served.toSet -- batch.toSet}")
  }

  test("streaming BM25 serve equals the batch impact-sum row-for-row") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val impacts = graft.ops.TextAnalysis.bm25Impacts(docs)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(
          graft.ops.TextAnalysis.tokens(col("text")))).as("term"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score_fp").desc, col("id").asc)
    val batch = queries.join(impacts, Seq("term"))
      .filter(col("id") =!= col("query_id"))
      .groupBy("query_id", "id")
      .agg(sum(col("s_fp")).as("score_fp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    val served = graft.streaming.Bm25Serve.bm25ServeTopK(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(1).toInt))
      .toSet
    assert(batch.nonEmpty)
    assert(served == batch,
      s"serve diverged: only-batch=${batch -- served} only-served=${served -- batch}")
  }

  test("streaming stack-append serve: drained fresh lists equal the batch ones, " +
      "and consolidation reproduces the batch appended stack") {
    val e = emb
    val existing = e.filter(col("id") % 5 =!= 0)
    // A small two-layer prior stack over the existing corpus.
    val base = graft.nnd.NND.buildGraph(existing,
        graft.nnd.NND.Params(k = 8, maxIterations = 4))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
      .localCheckpoint()
    val upper = graft.nnd.NND.buildGraph(
        existing.join(graft.ops.GraphSearch.assignLayers(existing, maxLevel = 1)
          .filter(col("level") >= 1).select("id"), "id"),
        graft.nnd.NND.Params(k = 6, maxIterations = 3))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
      .localCheckpoint()
    val layers = Seq(base, upper)
    val fresh = e.filter(col("id") % 5 === 0)
    def listRows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), Option(r.getSeq[org.apache.spark.sql.Row](1))
        .map(_.map(n => (n.getLong(0), n.getDouble(1))).toList))
    }
    // (a) drained per-batch fresh lists == the batch fresh lists, per
    // layer, scores included (per-point independence is the claim).
    val batchFresh = graft.ops.GraphSearch.stackFreshLists(layers, existing,
      fresh, k = 10, fanout = 4, beam = 32, hops = 3, seeds = 8,
      upperK = 6, upperBeam = 8, upperHops = 3)
    val served = AnnServe.stackAppendServe(spark, sf001, layers, existing,
      k = 10, fanout = 4, beam = 32, hops = 3, seeds = 8,
      upperK = 6, upperBeam = 8, upperHops = 3).localCheckpoint()
    batchFresh.zipWithIndex.foreach { case (bf, l) =>
      val b = listRows(bf).toSet
      val s = listRows(served.filter(col("layer") === l)
        .select("id", "neighbors")).toSet
      assert(l > 0 || b.nonEmpty, "base-layer fresh lists empty")
      assert(s == b, s"layer $l drained fresh lists diverged: " +
        s"only-batch=${(b -- s).take(3)} only-served=${(s -- b).take(3)}")
    }
    // (b) consolidating the DRAINED lists reproduces the batch
    // appendToGraphStack exactly — the maintainer's offline patch step
    // commutes with batch slicing.
    val fromDrained = graft.ops.GraphSearch.patchStackWithFresh(layers,
      layers.indices.map(l => served.filter(col("layer") === l)
        .select("id", "neighbors")),
      k = 10, upperK = 6)
    val batchStack = graft.ops.GraphSearch.appendToGraphStack(layers,
      existing, fresh, k = 10, fanout = 4, beam = 32, hops = 3, seeds = 8,
      upperK = 6, upperBeam = 8, upperHops = 3)
    fromDrained.lazyZip(batchStack).lazyZip(layers.indices).foreach {
      (d, b, l) =>
        val ds = listRows(d).toSet
        val bs = listRows(b).toSet
        assert(ds == bs, s"layer $l consolidated stack diverged: " +
          s"only-batch=${(bs -- ds).take(3)} only-drained=${(ds -- bs).take(3)}")
    }
  }

  test("streaming layered serve with tombstones equals the batch search " +
      "row-for-row, and dead ids neither return nor query") {
    val e = emb
    val dead = e.select("id").filter(col("id") % 7 === 3)
    val liveQ = e.join(dead, Seq("id"), "left_anti").filter(col("id") < 20)
    val base = graft.nnd.NND.buildGraph(e,
        graft.nnd.NND.Params(k = 8, maxIterations = 4))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
      .localCheckpoint()
    val upper = graft.nnd.NND.buildGraph(
        e.join(graft.ops.GraphSearch.assignLayers(e, maxLevel = 1)
          .filter(col("level") >= 1).select("id"), "id"),
        graft.nnd.NND.Params(k = 6, maxIterations = 3))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
      .localCheckpoint()
    val layers = Seq(base, upper)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val batch = rows(graft.ops.GraphSearch.searchHierarchical(
      layers, e, liveQ, k = 10, beam = 8, hops = 2, entries = 4,
      upperBeam = 8, upperHops = 3, seeds = 4, tombstones = Some(dead)))
    val served = rows(AnnServe.layeredServe(spark, sf001, layers, e,
      tombstones = Some(dead), liveQueriesOnly = true))
    assert(batch.nonEmpty)
    assert(served.toSet == batch.toSet,
      s"tombstoned layered serve diverged from batch: " +
        s"only-batch=${(batch.toSet -- served.toSet).take(3)} " +
        s"only-served=${(served.toSet -- batch.toSet).take(3)}")
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    assert(served.forall(r => !deadIds.contains(r._3)),
      "a tombstoned id was returned")
    assert(served.forall(r => !deadIds.contains(r._1)),
      "a tombstoned id queried")
  }

  test("bm25Impacts: maxPostings keeps each term's top postings by impact") {
    import spark.implicits._
    val d = Seq((1L, "hash hash"), (2L, "hash"), (3L, "hash join"))
      .toDF("doc_id", "text")
    val full = graft.ops.TextAnalysis.bm25Impacts(d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cut = graft.ops.TextAnalysis.bm25Impacts(d, maxPostings = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // One posting per term survives, and it is that term's best.
    assert(cut.map(_._1).sorted.toSeq == Seq("hash", "join"))
    cut.foreach { case (term, id, s) =>
      val best = full.filter(_._1._1 == term).maxBy { case ((_, i), v) => (v, -i) }
      assert((term, id) == best._1 && s == best._2,
        s"truncation kept a non-best posting for $term: ($id, $s) vs $best")
    }
  }
}
