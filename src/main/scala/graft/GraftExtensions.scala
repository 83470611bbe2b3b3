package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{QuantizedDot, VectorDot, VectorL2, VectorQuantize}

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
  }
}
