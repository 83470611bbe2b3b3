package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pca, SimilaritySearch}

/** PCA fit: determinism, low-rank recovery, and the data-dependent
  * advantage over the JL random projection on structured corpora. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("features"))

  /** 4000 points in 50 clusters whose centers live in the span of the
    * FIRST 8 canonical coordinates (low intrinsic dimension — the
    * shape of real embedding corpora), plus small isotropic noise in
    * all 64. */
  private def lowRank = {
    val rnd = new scala.util.Random(29)
    val dim = 64
    val nClusters = 50
    val centers = Array.fill(nClusters) {
      val v = Array.fill(8)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      Array.tabulate(dim)(j => if (j < 8) (v(j) / norm).toFloat else 0f)
    }
    (0 until 4000).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("id", "features")
  }

  test("fit is invariant to input partitioning (bit-identical basis and spectrum)") {
    val (b1, s1) = Pca.fitSpectrum(emb.repartition(3), "features", 16)
    val (b2, s2) = Pca.fitSpectrum(emb.repartition(13), "features", 16)
    assert(s1.toSeq == s2.toSeq, "spectra differ across partitionings")
    assert(b1.map(_.toSeq).toSeq == b2.map(_.toSeq).toSeq,
      "basis differs across partitionings — fixed-point accumulation broken")
  }

  test("incremental fit from merged moment sketches is bit-identical to the union fit") {
    val a = emb.filter(col("id") % 5 === 0)   // "yesterday"
    val b = emb.filter(col("id") % 5 =!= 0)   // "today's increment"
    val merged = Pca.fitSpectrumFromMoments(
      Pca.mergeMoments(
        Pca.momentSketch(a, "features"),
        Pca.momentSketch(b, "features")), 16)
    val whole = Pca.fitSpectrum(emb, "features", 16)
    assert(merged._2.toSeq == whole._2.toSeq, "spectra differ")
    assert(merged._1.map(_.toSeq).toSeq == whole._1.map(_.toSeq).toSeq,
      "incremental basis differs from the union fit")
  }

  test("streamed moment sketch merges bit-identically to the batch sketch") {
    val streamed = graft.streaming.EventsStream.pcaMomentSketch(spark, sf0001, shards = 8)
    val streamedOther = graft.streaming.EventsStream.pcaMomentSketch(spark, sf0001, shards = 3)
    val batch = Pca.momentSketch(emb, "features")
    assert(streamed.toSeq == batch.toSeq,
      "streaming accumulation diverged from the batch sketch")
    assert(streamedOther.toSeq == batch.toSeq,
      "sketch depends on shard count — merge is not exact")
  }

  test("basis is orthonormal and the spectrum is descending") {
    val (basis, spectrum) = Pca.fitSpectrum(emb, "features", 8)
    for (r <- basis.indices; s <- r until basis.length) {
      val dot = basis(r).zip(basis(s)).map { case (x, y) => x.toDouble * y }.sum
      val want = if (r == s) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-5, s"<b$r, b$s> = $dot")
    }
    assert(spectrum.zip(spectrum.tail).forall { case (a, b) => a >= b - 1e-12 },
      "eigenvalues not sorted descending")
    assert(spectrum.head > 0, "degenerate spectrum")
  }

  test("low-rank corpus: the fitted basis recovers the signal subspace") {
    val (basis, spectrum) = Pca.fitSpectrum(lowRank, "features", 8)
    // Top-8 directions carry the cluster-center variance (signal 8-dim
    // at ~unit scale vs noise 0.05² per coordinate).
    val total = spectrum.sum
    val top8 = spectrum.take(8).sum
    info(f"top-8 variance share = ${top8 / total}%.3f")
    assert(top8 / total >= 0.7, s"signal subspace not dominant: ${top8 / total}")
    // And each recovered direction lies in the first-8-coordinate span.
    basis.foreach { v =>
      val mass = v.take(8).map(x => x.toDouble * x).sum /
        v.map(x => x.toDouble * x).sum
      assert(mass >= 0.95, s"basis vector leaks outside the signal span: $mass")
    }
  }

  test("low-rank corpus: PCA at quarter width beats RP at cluster retention") {
    val corpus = lowRank.repartition(8).cache()
    try {
      val queries = corpus.filter(col("id") < 50)
      val nClusters = 50
      def agreement(c: org.apache.spark.sql.DataFrame,
                    q: org.apache.spark.sql.DataFrame): Double = {
        val inCluster = SimilaritySearch.bruteForceTopK(c, q, 10)
          .select("query_id", "nbr_id").collect()
          .map(r => (r.getLong(0) % nClusters) == (r.getLong(1) % nClusters))
        inCluster.count(identity).toDouble / inCluster.length
      }
      val basis = Pca.fit(corpus, "features", 16)
      val pcaAgree = agreement(
        Pca.reduce(corpus, "features", basis),
        Pca.reduce(queries, "features", basis))
      val rpAgree = agreement(
        SimilaritySearch.rpReduce(corpus, "features", 16),
        SimilaritySearch.rpReduce(queries, "features", 16))
      info(f"64->16 top-10 cluster agreement: PCA=$pcaAgree%.3f RP=$rpAgree%.3f")
      assert(pcaAgree >= 0.95, s"fitted basis scattered neighbors: $pcaAgree")
      assert(pcaAgree >= rpAgree,
        s"data-dependent basis lost to the random map: $pcaAgree vs $rpAgree")
    } finally corpus.unpersist()
  }
}
