package graft.core

/** Core row types for the graft engine.
  *
  * Mirrors the reference data model (`/root/reference/src/main/scala/com/
  * github/fvictorio/nnd/NND.scala:62-63`) re-expressed for Spark SQL:
  * features are native `ARRAY<FLOAT>` columns (parquet-friendly,
  * codegen-friendly) rather than `ml.linalg.Vector`, and the adjacency
  * list is `ARRAY<STRUCT<id, similarity>>`.
  */
final case class NodePoint(
    id: Long,
    features: Array[Float],
    partition: Long = 0L,
    label: Option[Long] = None,
    finished: Boolean = false)

/** One directed k-NN edge: `src`'s list contains `dst` at similarity `sim`. */
final case class Edge(src: Long, dst: Long, sim: Double)

/** Entry of a node's neighbor list (reference `Seq[(Long, Double)]`,
  * `NND.scala:63`). */
final case class Neighbor(id: Long, similarity: Double)

/** A node id with its (sorted, bounded-K) neighbor list. */
final case class NeighborList(id: Long, neighbors: Seq[Neighbor])
