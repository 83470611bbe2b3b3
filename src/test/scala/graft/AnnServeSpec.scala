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
}
