package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, SimilaritySearch}

/** Correctness of the non-oracle ops: LSH/SimHash candidate quality vs
  * exact ground truth, ANN recall vs brute force, multimodal plumbing. */
class OpsSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")
  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("features"))

  test("minhash LSH pairs == exact jaccard pairs at threshold 0.7") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "ground truth should be non-empty")
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("hot-shingle df-cap keeps the near-dup pairs while shrinking the join") {
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", 0.7, maxDocFraction = Some(0.5))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.nonEmpty)
    assert(full.subsetOf(capped) || capped.subsetOf(full) || (full == capped),
      s"cap changed the pair set unexpectedly: only-full=${full -- capped} only-capped=${capped -- full}")
    assert(capped.intersect(full).size.toDouble / full.size >= 0.9,
      "df-cap lost too many true near-dup pairs")
  }

  test("simhash candidates cover the jaccard near-dup pairs") {
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val covered = truth.intersect(sim).size.toDouble / truth.size
    info(s"simhash recall of J>=0.8 pairs = $covered (|cand| = ${sim.size})")
    assert(covered >= 0.9, s"recall $covered too low")
  }

  test("LSH ANN recall@10 vs brute force >= 0.6") {
    val queries = emb.filter(col("id") < 50)
    val brute = SimilaritySearch.bruteForceTopK(emb, queries, 10)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val lsh = SimilaritySearch.lshTopK(emb, queries, 10)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      lsh.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(s"LSH ANN mean recall@10 = $mean")
    assert(mean >= 0.6, s"recall $mean too low for 5-plane hamming-2 multiprobe")
  }

  test("graph search recall@10 vs brute force >= 0.5") {
    val g = graft.nnd.NND.buildGraph(emb, graft.nnd.NND.Params(k = 10, maxIterations = 3))
      .filter(col("neighbors").isNotNull).select("id", "neighbors")
    val queries = emb.filter(col("id") < 50)
    val brute = SimilaritySearch.bruteForceTopK(emb, queries, 10)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val gs = graft.ops.GraphSearch.searchGraph(g, emb, queries, 10)
      .select("query_id", "nbr_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (qid, truth) =>
      gs.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(s"graph-search mean recall@10 = $mean")
    assert(mean >= 0.5, s"recall $mean too low")
  }

  test("embedding near-dup threshold has a safe float margin") {
    val cos = Dedup.embeddingPairs(emb, "id", "features", 0.0)
      .select("cosine").collect().map(_.getDouble(0))
    val margin = cos.map(c => math.abs(c - 0.5)).min
    info(s"closest cosine to the 0.5 threshold: margin $margin")
    assert(margin > 1e-4, "threshold too close to a data point for float parity")
  }

  test("multimodal decode is deterministic and partition-shaped") {
    val media = Multimodal.asMedia(docs)
    val out = Multimodal.decode(media).collect()
    assert(out.length == docs.count())
    assert(out.forall(m => m.channels == 3 && m.feature8.length == 8))
    val again = Multimodal.decode(media.repartition(7)).collect()
    assert(out.sortBy(_.doc_id).map(_.width).toSeq == again.sortBy(_.doc_id).map(_.width).toSeq)
  }

  test("stateful streaming sessionization equals the batch computation") {
    val streamed = graft.streaming.EventsStream.sessionCountsStateful(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = Queries.events(spark, sf001)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming daily aggregate equals the batch computation") {
    val streamed = graft.streaming.EventsStream.dailyAggregates(spark, sf001)
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Queries.events(spark, sf001)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
  }
}
