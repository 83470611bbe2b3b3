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

  test("native expressions participate in whole-stage codegen") {
    val df = pairs.select(vector_dot(col("va"), col("vb")))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen spans in the simple plan
    // string; the vector_dot Project must be inside one.
    val line = plan.linesIterator.find(_.contains("vector_dot")).getOrElse("")
    assert(line.contains("*("), s"vector_dot Project not codegen'd:\n$plan")
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

  test("type check rejects non-float arrays") {
    val bad = intercept[Exception] {
      pairs.select(vector_dot(col("va").cast("array<double>"), col("vb"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("array"), bad.getMessage)
  }
}
