package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{LshBuckets, QuantizedDot, RandomProject, VectorDot, VectorL2, VectorQuantize}

/** Session extensions registering graft's native expressions under SQL
  * names, so the engine's functions are first-class in the SQL surface:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT vector_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      info(classOf[VectorDot], "vector_dot",
        "vector_dot(a, b) - double dot product of two ARRAY<FLOAT> vectors"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("vector_l2"),
      info(classOf[VectorL2], "vector_l2",
        "vector_l2(a, b) - euclidean distance of two ARRAY<FLOAT> vectors"),
      (args: Seq[Expression]) => VectorL2(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("vector_quantize"),
      info(classOf[VectorQuantize], "vector_quantize",
        "vector_quantize(a, scale) - int8 scalar quantization of an ARRAY<FLOAT> vector to BINARY"),
      (args: Seq[Expression]) => VectorQuantize(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("quantized_dot"),
      info(classOf[QuantizedDot], "quantized_dot",
        "quantized_dot(a, b) - integer dot product of two int8-quantized BINARY vectors"),
      (args: Seq[Expression]) => QuantizedDot(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("random_project"),
      info(classOf[RandomProject], "random_project",
        "random_project(v, outDim[, seed]) - seeded Rademacher JL projection of an ARRAY<FLOAT> vector to outDim dimensions"),
      (args: Seq[Expression]) => RandomProject(args(0),
        intLit(args, 1, "random_project", "outDim").toInt,
        if (args.length > 2) intLit(args, 2, "random_project", "seed") else 42L)))
    e.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      info(classOf[LshBuckets], "lsh_buckets",
        "lsh_buckets(v, numPlanes, numTables[, seed]) - sign-LSH bucket id per table for an ARRAY<FLOAT> vector"),
      (args: Seq[Expression]) => LshBuckets(args(0),
        intLit(args, 1, "lsh_buckets", "numPlanes").toInt,
        intLit(args, 2, "lsh_buckets", "numTables").toInt,
        if (args.length > 3) intLit(args, 3, "lsh_buckets", "seed") else 42L)))
  }

  /** The construction params ride the expression instance (the sign
    * matrices are built from them before any row is seen), so the SQL
    * form requires them as integer literals. */
  private def intLit(args: Seq[Expression], i: Int, fn: String, name: String): Long =
    args(i) match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be an integer literal, got $other")
    }
}
