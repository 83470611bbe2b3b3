package graft

import org.apache.spark.sql.functions._

import graft.core.Similarity
import graft.functions.VectorFunctions._

/** The native codegen expressions must be bit-identical to the
  * higher-order-function forms (which are what the DuckDB oracles
  * mirror). */
class VectorExpressionsSpec extends SparkSpec {

  private def pairs = {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    e.as("a").join(e.as("b"), col("a.id") + 1 === col("b.id"))
      .select(col("a.v").as("va"), col("b.v").as("vb"))
  }

  test("vector_dot bit-equals the zip_with/aggregate form") {
    val diff = pairs
      .select((vector_dot(col("va"), col("vb")) =!=
        Similarity.dotCol(col("va"), col("vb"))).as("ne"))
      .filter(col("ne")).count()
    assert(diff == 0)
  }

  test("vector_l2 bit-equals the HOF form") {
    val diff = pairs
      .select((vector_l2(col("va"), col("vb")) =!=
        Similarity.l2Col(col("va"), col("vb"))).as("ne"))
      .filter(col("ne")).count()
    assert(diff == 0)
  }

  test("JVM kernel bit-equals the codegen kernel on adversarial floats") {
    // Cross-kernel parity contract (Similarity.l2 scaladoc): the typed
    // JVM kernel the NND core runs and the codegen VectorL2 expression
    // must agree to the BIT, or sims stored by one path and re-derived
    // by the other (appendToGraph lists folded into updateGraph) split
    // into two TopKAggregator entries for one neighbor. The fixture is
    // chosen to catch single-precision subtraction: (2^25, 1f) differs
    // between float-sub (rounds to 2^25) and double-sub (exact 2^25-1),
    // so a kernel that subtracts in float FAILS here; subnormals and
    // mixed-exponent randoms cover rounding at the other extreme.
    val rnd = new scala.util.Random(7)
    val adversarial: Seq[(Array[Float], Array[Float])] = Seq(
      (Array(33554432f, 1f, Float.MinPositiveValue),
        Array(1f, 33554432f, -Float.MinPositiveValue)),
      (Array(1.0000001f, -1.0000001f), Array(1f, -1f)),
      (Array(1e30f, 1e-30f), Array(-1e30f, -1e-30f))) ++
      Seq.fill(100) {
        def v = Array.fill(8)(
          (rnd.nextFloat() - 0.5f) * math.pow(2.0, rnd.nextInt(41) - 20).toFloat)
        (v, v)
      }
    import spark.implicits._
    val df = adversarial.toDF("va", "vb")
      .select(col("va"), col("vb"),
        vector_l2(col("va"), col("vb")).as("l2"),
        vector_l2_sim(col("va"), col("vb")).as("sim"))
    df.collect().foreach { r =>
      val va = r.getSeq[Float](0).toArray
      val vb = r.getSeq[Float](1).toArray
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(Similarity.l2(va, vb)),
        s"l2 mismatch on ${va.toSeq} vs ${vb.toSeq}: codegen=${r.getDouble(2)} jvm=${Similarity.l2(va, vb)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(Similarity.l2Sim(va, vb)),
        s"l2Sim mismatch on ${va.toSeq} vs ${vb.toSeq}")
    }
  }

  test("native expressions participate in whole-stage codegen") {
    val df = pairs.select(vector_dot(col("va"), col("vb")))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen spans in the simple plan
    // string; the vector_dot Project must be inside one.
    val line = plan.linesIterator.find(_.contains("vector_dot")).getOrElse("")
    assert(line.contains("*("), s"vector_dot Project not codegen'd:\n$plan")
    // Same claim for the matrix-on-the-instance expressions: the
    // reference-object pattern must not drop them to interpreted eval.
    val df2 = pairs.select(random_project(col("va"), 16),
      lsh_buckets(col("va"), 8, 4))
    df2.collect()
    val plan2 = df2.queryExecution.executedPlan.toString
    for (fn <- Seq("random_project", "lsh_buckets")) {
      val l = plan2.linesIterator.find(_.contains(fn)).getOrElse("")
      assert(l.contains("*("), s"$fn Project not codegen'd:\n$plan2")
    }
  }

  test("SQL registration via GraftExtensions exposes vector_dot to spark.sql") {
    // The shared test session was built without extensions; injecting at
    // the registry level directly mirrors what GraftExtensions does.
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"))) {
      reg.createOrReplaceTempFunction("vector_dot",
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.VectorDot(args(0), args(1)), "scala_udf")
    }
    spark.read.parquet(s"$sf0001/embeddings.parquet").createOrReplaceTempView("emb_sql")
    val n = spark.sql(
      """SELECT a.vec_id, vector_dot(a.embedding, b.embedding) AS d
        |FROM emb_sql a JOIN emb_sql b ON a.vec_id + 1 = b.vec_id""".stripMargin)
      .filter("d IS NOT NULL").count()
    assert(n == 499)
  }

  test("SQL registration of random_project folds literal params and rejects non-literals") {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("random_project"))) {
      reg.createOrReplaceTempFunction("random_project",
        (args: Seq[Expression]) => graft.functions.RandomProject(args(0),
          args(1) match {
            case Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(s"outDim must be a literal, got $other")
          },
          if (args.length > 2) args(2) match {
            case Literal(v: Int, IntegerType) => v.toLong
            case Literal(v: Long, LongType) => v
            case other => throw new IllegalArgumentException(s"seed must be a literal, got $other")
          } else 42L), "scala_udf")
    }
    spark.read.parquet(s"$sf0001/embeddings.parquet").createOrReplaceTempView("emb_rp_sql")
    // The SQL form must be the same expression as the Column API form.
    val viaSql = spark.sql(
      "SELECT vec_id, random_project(embedding, 16) AS p FROM emb_rp_sql ORDER BY vec_id LIMIT 5")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val viaCol = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), random_project(col("embedding"), 16).as("p"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(viaSql.toSeq == viaCol.toSeq)
    // A non-literal construction param must fail loudly, not mis-project.
    val err = intercept[Exception] {
      spark.sql("SELECT random_project(embedding, CAST(vec_id AS INT)) FROM emb_rp_sql LIMIT 1")
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("vector_quantize + quantized_dot: codegen equals interpreted equals a JVM recount") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val scale = 0.6
    val rows = e.as("a").join(e.as("b"), col("a.id") + 1 === col("b.id"))
      .select(col("a.v").as("va"), col("b.v").as("vb"),
        quantized_dot(vector_quantize(col("a.v"), lit(scale)),
          vector_quantize(col("b.v"), lit(scale))).as("qd"))
      .collect()
    assert(rows.length == 499)
    rows.foreach { r =>
      val va = r.getSeq[Float](0)
      val vb = r.getSeq[Float](1)
      def q(x: Float): Long =
        math.max(-127.0, math.min(127.0, math.rint(x / scale * 127.0))).toByte.toLong
      val want = va.zip(vb).map { case (x, y) => q(x) * q(y) }.sum
      assert(r.getLong(2) == want, s"quantized dot mismatch: ${r.getLong(2)} vs $want")
    }
  }

  test("quantized dot ranking tracks exact dot ranking (rank correlation on a star)") {
    // For one query vector vs all others, top-10 by quantized dot must
    // heavily overlap top-10 by exact dot even before the re-rank stage.
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val scale = e.agg(max(greatest(abs(array_max(col("v"))), abs(array_min(col("v"))))))
      .first().getFloat(0).toDouble
    val q0 = e.filter(col("id") === 0)
    val joined = e.filter(col("id") =!= 0).crossJoin(
        q0.select(col("v").as("vq")))
      .select(col("id"),
        vector_dot(col("vq"), col("v")).as("exact"),
        quantized_dot(vector_quantize(col("vq"), lit(scale)),
          vector_quantize(col("v"), lit(scale))).as("approx"))
      .collect()
    val topExact = joined.sortBy(r => (-r.getDouble(1), r.getLong(0))).take(10).map(_.getLong(0)).toSet
    val topApprox = joined.sortBy(r => (-r.getLong(2), r.getLong(0))).take(10).map(_.getLong(0)).toSet
    val overlap = topExact.intersect(topApprox).size
    info(s"int8 top-10 overlap with exact: $overlap/10")
    assert(overlap >= 7, s"quantization destroyed ranking: overlap $overlap/10")
  }

  test("matrix_project: codegen equals a JVM recount and stays in whole-stage codegen") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("features"))
    val dim = 64
    // deterministic non-trivial matrix (no fit dependency in this spec)
    val m = Array.tabulate(5, dim)((r, j) =>
      (math.sin(r * dim + j).toFloat))
    val df = e.filter(col("id") < 50)
      .select(col("features"), matrix_project(col("features"), m).as("p"))
    val rows = df.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val p = r.getSeq[Float](1).toArray
      assert(p.length == 5)
      for (out <- 0 until 5) {
        var s = 0.0
        for (j <- 0 until dim) s += m(out)(j).toDouble * v(j).toDouble
        assert(p(out) == s.toFloat, s"row $out: ${p(out)} vs ${s.toFloat}")
      }
    }
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("matrix_project")).getOrElse("")
    assert(line.contains("*("), s"matrix_project Project not codegen'd:\n$plan")
  }

  test("pq_encode/pq_lut/pq_adc: codegen equals a JVM recount; ADC reconstructs codeword dots") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("features"))
    val numSub = 4
    val bookSize = 16
    val books = graft.ops.SimilaritySearch.trainPqCodebooks(
      e, numSub, bookSize, sampleSize = 256)

    val rows = e.filter(col("id") < 50)
      .select(col("features"),
        pq_encode(col("features"), books).as("codes"),
        pq_lut(col("features"), books).as("lut"))
      .collect()
    assert(rows.length == 50)
    val subDim = books.head.head.length
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val codes = r.getAs[Array[Byte]](1)
      val lut = r.getSeq[Double](2).toArray
      assert(codes.length == numSub && lut.length == numSub * bookSize)
      for (sub <- 0 until numSub) {
        // encode: strict-< argmin of ||c||²/2 − v_sub·c, first-min tie-break
        var best = 0; var bestScore = Double.PositiveInfinity
        for (c <- 0 until bookSize) {
          val row = books(sub)(c)
          var bias = 0.0
          for (j <- 0 until subDim) bias += row(j).toDouble * row(j)
          var dot = 0.0
          for (j <- 0 until subDim) dot += v(sub * subDim + j).toDouble * row(j)
          val score = bias / 2.0 - dot
          if (score < bestScore) { bestScore = score; best = c }
          // lut: exact codeword dot
          assert(lut(sub * bookSize + c) == dot,
            s"lut mismatch at sub=$sub c=$c")
        }
        assert((codes(sub) & 0xFF) == best, s"code mismatch at sub=$sub")
      }
    }

    // ADC over (lut, codes) pairs equals the sum of the coded rows'
    // LUT entries — checked through a two-row join so the expression
    // runs against mixed inputs, not a self-pair.
    val pairsDf = e.filter(col("id") < 20)
    val adc = pairsDf.as("a").join(pairsDf.as("b"), col("a.id") + 1 === col("b.id"))
      .select(
        pq_adc(pq_lut(col("a.features"), books),
          pq_encode(col("b.features"), books)).as("adc"),
        pq_lut(col("a.features"), books).as("lut"),
        pq_encode(col("b.features"), books).as("codes"))
      .collect()
    adc.foreach { r =>
      val lut = r.getSeq[Double](1).toArray
      val codes = r.getAs[Array[Byte]](2)
      val want = codes.zipWithIndex.map { case (c, sub) =>
        lut(sub * bookSize + (c & 0xFF))
      }.foldLeft(0.0)(_ + _)
      assert(r.getDouble(0) == want)
    }

    // The kernels must stay inside whole-stage codegen.
    val df = e.select(pq_encode(col("features"), books).as("c"),
      pq_adc(pq_lut(col("features"), books),
        pq_encode(col("features"), books)).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    for (fn <- Seq("pq_encode", "pq_adc")) {
      val l = plan.linesIterator.find(_.contains(fn)).getOrElse("")
      assert(l.contains("*("), s"$fn Project not codegen'd:\n$plan")
    }
  }

  test("lsh_buckets: codegen equals a JVM recount of the sign-matrix fold") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val numPlanes = 12
    val numTables = 16
    val seed = 42L
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val rows = e.select(col("v"),
        lsh_buckets(col("v"), numPlanes, numTables, seed).as("bks"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val got = r.getSeq[Long](1)
      assert(got.length == numTables)
      // Independent recount of the documented construction: sign of
      // Σ_j ±v_j with ±1 from the xxhash64(k, j) chain parity.
      val want = (0 until numTables).map { t =>
        (0 until numPlanes).map { p =>
          val k = t * numPlanes + p
          val seedK = XXH64.hashLong(k.toLong, seed)
          var s = 0.0
          v.indices.foreach { j =>
            val sign = if ((XXH64.hashLong(j.toLong, seedK) & 1L) == 0L) 1.0 else -1.0
            s += sign * v(j).toDouble
          }
          if (s >= 0) 1L << p else 0L
        }.reduce(_ | _)
      }
      assert(got == want, s"bucket mismatch: $got vs $want")
    }
    // Distinct seeds must de-correlate the tables (different buckets).
    val other = e.limit(50).select(
        lsh_buckets(col("v"), numPlanes, numTables, seed).as("a"),
        lsh_buckets(col("v"), numPlanes, numTables, 7L).as("b"))
      .collect()
    assert(other.exists(r => r.getSeq[Long](0) != r.getSeq[Long](1)),
      "seed had no effect on bucket assignment")
  }

  test("random_project: codegen equals a JVM recount; isometry in expectation") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val outDim = 32
    val seed = 42L
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val rows = e.select(col("v"),
        random_project(col("v"), outDim, seed).as("p"))
      .collect()
    assert(rows.length == 500)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val base = XXH64.hashLong(0x5250L, seed)
    var ratioSum = 0.0
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val got = r.getSeq[Float](1)
      assert(got.length == outDim)
      // Independent recount of the documented construction: Rademacher
      // fold with the RP-prefixed xxhash64 chain, double accumulation,
      // one float rounding.
      val want = (0 until outDim).map { k =>
        val seedK = XXH64.hashLong(k.toLong, base)
        var s = 0.0
        v.indices.foreach { j =>
          val sign = if ((XXH64.hashLong(j.toLong, seedK) & 1L) == 0L) 1.0 else -1.0
          s += sign * v(j).toDouble
        }
        (s * scale).toFloat
      }
      assert(got == want, s"projection mismatch: $got vs $want")
      val n2In = v.map(x => x.toDouble * x).sum
      val n2Out = got.map(x => x.toDouble * x).sum
      ratioSum += n2Out / n2In
    }
    // E||Rx||^2 = ||x||^2; per-row variance ~2/outDim, so the mean over
    // 500 rows concentrates to ~1 +- 0.01 — 5% margin is generous.
    val meanRatio = ratioSum / rows.length
    info(f"mean ||Rx||^2/||x||^2 over 500 rows = $meanRatio%.4f (outDim=$outDim)")
    assert(meanRatio > 0.95 && meanRatio < 1.05,
      s"projection is not an isometry in expectation: $meanRatio")
    // Distinct seeds must yield distinct projections, and the RP hash
    // stream must not collapse onto the LSH hyperplane stream.
    val other = e.limit(50).select(
        random_project(col("v"), outDim, seed).as("a"),
        random_project(col("v"), outDim, 7L).as("b"))
      .collect()
    assert(other.exists(r => r.getSeq[Float](0) != r.getSeq[Float](1)),
      "seed had no effect on the projection")
  }

  test("nearest_centroid bit-equals the array-sort-of-structs Column form") {
    // The Column form is the pre-round-6 implementation (O(k·d)
    // generated code — replaced by the native kernel, VERDICT r5 #4);
    // it stays here as the independent parity witness because the s07
    // pinned census was measured against it.
    val rnd = new scala.util.Random(11)
    val centroids = Array.fill(17, 64)(rnd.nextGaussian().toFloat * 0.7f)
    def columnForm(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val scored = centroids.indices.map { i =>
        val bias = {
          var s = 0.0; var j = 0
          while (j < centroids(i).length) { s += centroids(i)(j).toDouble * centroids(i)(j); j += 1 }
          s / 2.0
        }
        struct((lit(bias) - vector_dot(vec, typedlit(centroids(i).toSeq))).as("d"),
          lit(i).as("cluster"))
      }
      element_at(array_sort(array(scored: _*)), 1).getField("cluster")
    }
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("embedding").as("v"))
    val diff = e.select(
        (nearest_centroid(col("v"), centroids) =!= columnForm(col("v"))).as("ne"))
      .filter(col("ne")).count()
    assert(diff == 0)
  }

  test("centroid_dot equals vector_dot against the indexed centroid row") {
    val rnd = new scala.util.Random(13)
    val centroids = Array.fill(9, 64)(rnd.nextGaussian().toFloat)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("c", (col("id") % 9).cast("int"))
    val diff = e.select((centroid_dot(col("v"), col("c"), centroids) =!=
        element_at(array(centroids.indices.map(i =>
          vector_dot(col("v"), typedlit(centroids(i).toSeq))): _*), col("c") + 1)).as("ne"))
      .filter(col("ne")).count()
    assert(diff == 0)
  }

  test("type check rejects non-float arrays") {
    val bad = intercept[Exception] {
      pairs.select(vector_dot(col("va").cast("array<double>"), col("vb"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("array"), bad.getMessage)
  }

  test("null array elements fail fast instead of silently scoring as 0.0") {
    import spark.implicits._
    // Unsafe float reads surface a null element as 0.0f — a silently
    // wrong sim on the ranking paths, and a divergence from the HOF
    // forms (which return NULL). The guard throws descriptively.
    val d = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)))
      .toDF("va", "vb")
    val e = intercept[Exception] {
      d.select(vector_dot(col("va"), col("vb"))).collect()
    }
    assert(e.getMessage.contains("null array element"), e.getMessage)
    val e2 = intercept[Exception] {
      d.select(lsh_buckets(col("va"), 4, 2)).collect()
    }
    assert(e2.getMessage.contains("null array element"), e2.getMessage)
  }

  test("pq_adc rejects codes outside the LUT's codebook size") {
    import spark.implicits._
    // LUT from k=4 codebooks (numSub=1), codes byte 7: without the
    // bounds check this reads another subspace's slot (or past the
    // array) silently.
    val d = Seq((Seq(0.1, 0.2, 0.3, 0.4), Array[Byte](7))).toDF("lut", "codes")
    val e = intercept[Exception] {
      d.select(pq_adc(col("lut"), col("codes"))).collect()
    }
    assert(e.getMessage.contains("outside codebook size"), e.getMessage)
  }

  test("centroid_dot rejects out-of-range cluster ids with context") {
    import spark.implicits._
    val cents = Array(Array(1.0f, 0.0f))
    val d = Seq((Seq(1.0f, 2.0f), 3)).toDF("v", "c")
    val e = intercept[Exception] {
      d.select(centroid_dot(col("v"), col("c"), cents)).collect()
    }
    assert(e.getMessage.contains("outside [0, 1)"), e.getMessage)
  }

  test("nearest_centroid rejects a ragged centroid matrix; vector_quantize rejects scale <= 0") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      graft.functions.NearestCentroid(null,
        Array(Array(1.0f, 2.0f), Array(3.0f)))
    }
    val d = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("v")
    val e = intercept[Exception] {
      d.select(vector_quantize(col("v"), lit(0.0))).collect()
    }
    assert(e.getMessage.contains("scale must be > 0"), e.getMessage)
  }
}
