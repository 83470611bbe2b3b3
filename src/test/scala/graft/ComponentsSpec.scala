package graft

import org.apache.spark.sql.functions._

import graft.ops.{Components, Dedup, Sampling, TextAnalysis}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(nodes.toDF("id"), edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("disjoint cliques, a chain, and singletons") {
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (1L, 3L), // clique {1,2,3}
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), // chain {10..14}
      (20L, 21L))
    val got = cc((1L to 3L) ++ (10L to 14L) ++ Seq(20L, 21L, 30L), edges)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("long chain converges via pointer doubling (adversarial diameter)") {
    val n = 200L
    val edges = (1L until n).map(i => (i, i + 1))
    val got = cc(1L to n, edges)
    assert(got.values.toSet == Set(1L))
  }

  test("edge endpoints absent from the node list are absorbed; duplicate and reversed edges are fine") {
    val got = cc(Seq(5L), Seq((7L, 6L), (6L, 7L), (7L, 6L), (6L, 5L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("durable-checkpoint components equal the local form") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val edges = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (10L, 11L))
    val durable = Components.connectedComponents(
        (1L to 12L).toDF("id"), edges.toDF("u", "v"), checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(durable == cc(1L to 12L, edges))
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count() > 0)
  }

  test("clusterNearDups keeps exactly one doc per cluster and all singletons") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val clustered = Dedup.clusterNearDups(docs, "doc_id", "text", 0.7).cache()
    val total = docs.count()
    assert(clustered.count() == total)
    // every component's kept doc is its minimum member
    val badKeep = clustered
      .groupBy("component")
      .agg(min(col("id")).as("lo"), sum(col("keep")).as("kept"))
      .filter(col("kept") =!= 1 || col("lo") =!= col("component"))
      .count()
    assert(badKeep == 0)
    // the pair graph is reproduced: every near-dup pair lands in one component
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.7)
    val comp = clustered.select(col("id"), col("component"))
    val split = pairs
      .join(comp.toDF("doc_a", "ca"), "doc_a")
      .join(comp.toDF("doc_b", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(split == 0)
    clustered.unpersist()
  }

  test("repetitionStats agrees with a brute-force recount on a hand sample") {
    val df = Seq(
      (1L, "a b a b a"), // bigrams: ab ba ab ba -> top 2/4, distinct 2
      (2L, "x y z"), // 2 distinct bigrams
      (3L, "solo") // no bigrams -> dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df)
      .select("doc_id", "n_bigrams", "n_distinct_bigrams", "top_bigram_n")
      .as[(Long, Long, Long, Long)].collect().map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    assert(got == Map(1L -> ((4L, 2L, 2L)), 2L -> ((2L, 2L, 1L))))
  }

  test("stratifiedSample is invariant to physical partitioning and exact per stratum") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val a = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", 5)
      .select("o_orderkey", "rk").as[(Long, Int)].collect().toSet
    val b = Sampling.stratifiedSample(orders.repartition(17), "o_orderstatus", "o_orderkey", 5)
      .select("o_orderkey", "rk").as[(Long, Int)].collect().toSet
    assert(a == b)
    val perStratum = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", 5)
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    assert(perStratum.values.forall(_ == 5L))
  }

  test("salted stratified sample equals the single-window form exactly") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val direct = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", 5)
      .select("o_orderkey", "rk").as[(Long, Int)].collect().toSet
    val salted = Sampling.stratifiedSampleSalted(orders, "o_orderstatus", "o_orderkey", 5, salts = 7)
      .select("o_orderkey", "rk").as[(Long, Int)].collect().toSet
    assert(salted == direct)
  }

  test("quotaSample honors per-stratum quotas and drops unlisted strata") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val got = Sampling.quotaSample(orders, "o_orderstatus", "o_orderkey", Map("F" -> 3, "O" -> 7))
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    assert(got == Map("F" -> 3L, "O" -> 7L))
    // quota rows are the top of the uniform stratified ranking (same draw)
    val top3F = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", 3)
      .filter(col("o_orderstatus") === "F").select("o_orderkey").as[Long].collect().toSet
    val gotF = Sampling.quotaSample(orders, "o_orderstatus", "o_orderkey", Map("F" -> 3, "O" -> 7))
      .filter(col("o_orderstatus") === "F").select("o_orderkey").as[Long].collect().toSet
    assert(gotF == top3F)
  }

  test("splitByHash is exhaustive, disjoint, near the target fractions, and growth-stable") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val fr = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val n = orders.count().toDouble
    val counts = Sampling.splitByHash(orders, "o_orderkey", fr)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum.toDouble == n)
    assert(math.abs(counts("train") / n - 0.8) < 0.03, counts.toString)
    // growth stability: labels on a subset match labels on the full set
    val sub = Sampling.splitByHash(orders.filter(col("o_orderkey") < 5000), "o_orderkey", fr)
      .select(col("o_orderkey"), col("split")).as[(Long, String)].collect().toMap
    val full = Sampling.splitByHash(orders, "o_orderkey", fr)
      .filter(col("o_orderkey") < 5000)
      .select(col("o_orderkey"), col("split")).as[(Long, String)].collect().toMap
    assert(sub == full)
  }

  test("scrubPii redacts emails, IPs, and phone numbers; clean text passes untouched") {
    val dirty = Seq(
      (1L, "contact alice.smith+spam@example.co.uk for details"),
      (2L, "server at 192.168.1.254 timed out"),
      (3L, "call +1 (555) 123-4567 or 555.987.6543 now"),
      (4L, "mixed: bob@test.io from 10.0.0.1 dials 020 7946 0958"),
      (5L, "perfectly clean text with no pii at all"),
      (6L, "version 1.2 has 3 bugs")) // short digit runs must survive
      .toDF("doc_id", "text")
    val got = TextAnalysis.scrubPii(dirty)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "contact <EMAIL> for details")
    assert(got(2L) == "server at <IP> timed out")
    assert(got(3L) == "call <PHONE> or <PHONE> now")
    assert(got(4L) == "mixed: <EMAIL> from <IP> dials <PHONE>")
    assert(got(5L) == "perfectly clean text with no pii at all")
    assert(got(6L) == "version 1.2 has 3 bugs")
  }

  test("normalize strips punctuation, collapses whitespace, and is identity on clean text") {
    import graft.ops.TextAnalysis
    val messy = Seq((1L, "  Hello,   WORLD!! it's 42. ")).toDF("doc_id", "text")
    assert(TextAnalysis.normalize(messy).select("norm_text").as[String].head()
      == "hello world it s 42")
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val changed = TextAnalysis.normalize(docs)
      .filter(col("norm_text") =!= col("text")).count()
    assert(changed == 0, "fixture text is already canonical; normalize must be identity")
  }

  test("hashSample hits the target fraction within tolerance and is a pure row filter") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val total = orders.count().toDouble
    val frac = Sampling.hashSample(orders, "o_orderkey", 0.2).count() / total
    assert(math.abs(frac - 0.2) < 0.03, s"got $frac, want ~0.2")
    // deterministic: same rows on re-run
    val s1 = Sampling.hashSample(orders, "o_orderkey", 0.2).select("o_orderkey").as[Long].collect().toSet
    val s2 = Sampling.hashSample(orders.repartition(7), "o_orderkey", 0.2).select("o_orderkey").as[Long].collect().toSet
    assert(s1 == s2)
  }

  test("weightedSample draws proportional to weight, without replacement, partition-invariant") {
    import spark.implicits._
    // 200 heavy rows (w=100) + 200 light rows (w=1): E-S top-60 should
    // be overwhelmingly heavy (heavy:light inclusion odds ~100:1), the
    // sample has no repeats, and zero/negative weights are excluded.
    val rows = (0L until 200L).map(i => (i, 100L)) ++
      (200L until 400L).map(i => (i, 1L)) ++
      Seq((400L, 0L), (401L, -5L))
    val d = rows.toDF("id", "w")
    def run(parts: Int) = Sampling
      .weightedSample(d.repartition(parts), "id", "w", 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run(1)
    assert(got == run(7), "sample must not depend on partitioning")
    assert(got.size == 60 && got.map(_._1).distinct.size == 60)
    assert(!got.exists(t => t._1 == 400L || t._1 == 401L),
      "non-positive weights must be excluded")
    val heavy = got.count(_._2 == 100L)
    assert(heavy >= 55, s"top-60 should be dominated by heavy rows: $heavy")
    // The selection key really is ordered: output sorted desc.
    assert(got.map(_._3) == got.map(_._3).sorted(Ordering[Long].reverse))
  }
}
