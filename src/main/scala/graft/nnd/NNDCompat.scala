package graft.nnd

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/** Input row of the reference API (`/root/reference/src/main/scala/com/
  * github/fvictorio/nnd/NND.scala:62`). */
case class Node(
    features: Vector,
    label: Option[Long],
    partition: Long = 0,
    finished: Boolean = false)

/** Output row of the reference API (`NND.scala:63`): neighbors is the
  * (id, similarity) adjacency list, null for finished/isolated rows. */
case class NodeWithNeighbors(
    features: Vector,
    label: Option[Long],
    neighbors: Seq[(Long, Double)],
    partition: Long = 0,
    finished: Boolean = false)

/** Drop-in replacement for the reference's public surface
  * (`NND.buildGraph`, `NND.scala:66`): same signature, same row types,
  * same semantics — backed by the DataFrame engine. A caller of
  * `com.github.fvictorio.nnd.NND.buildGraph` can switch imports and run
  * unchanged.
  *
  * Features are carried through from the caller's RDD untouched (the
  * engine computes similarities on a float32 copy; similarity VALUES may
  * differ in low-order bits from a pure-double pipeline, which is within
  * the approximate contract of NN-descent).
  */
object NNDCompat {

  def buildGraph(
      rdd: RDD[(Long, Node)],
      noNeighbors: Int,
      maxIterations: Int,
      earlyTermination: Double,
      sampleRate: Double,
      bucketsPerInstance: Int): RDD[(Long, NodeWithNeighbors)] = {
    val spark = SparkSession.active
    import spark.implicits._

    val df = rdd
      .map { case (id, n) =>
        (id, n.features.toArray.map(_.toFloat), n.partition, n.finished)
      }
      .toDF("id", "features", "partition", "finished")

    // expansion = 1.0 is the strict reference parameter regime (build
    // the graph at k, not an internally widened k') — the compat shim
    // must not silently trade 4x local-join work for quality the caller
    // never asked for. Callers who want the higher-recall regime use
    // the native API with Params' default expansion.
    val params = NND.Params(
      k = noNeighbors,
      maxIterations = maxIterations,
      earlyTermination = earlyTermination,
      sampleRate = sampleRate,
      bucketsPerInstance = bucketsPerInstance,
      expansion = 1.0)

    val neighbors: RDD[(Long, Seq[(Long, Double)])] =
      NND.buildGraph(df, params)
        .filter($"neighbors".isNotNull)
        .select($"id", $"neighbors")
        .as[(Long, Seq[(Long, Double)])]
        .rdd

    // Reference J1 (NND.scala:274-278): left outer join with the caller's
    // rdd so original features/labels pass through exactly.
    rdd.leftOuterJoin(neighbors).mapValues { case (node, nbrs) =>
      NodeWithNeighbors(node.features, node.label, nbrs.orNull, node.partition, node.finished)
    }
  }
}
