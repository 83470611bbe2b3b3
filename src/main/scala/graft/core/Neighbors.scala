package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Neighbor-list assembly shared by every path that rebuilds an
  * adjacency array outside [[graft.nnd.TopKAggregator]] (the purge
  * regroup in `NND.updateGraph`, the appended lists in
  * `GraphSearch.appendedLists`): sort by (similarity desc, id asc) —
  * the aggregator's merge order — so list ordering is bit-identical
  * across the build, purge, and append paths BY CONSTRUCTION rather
  * than by kept-in-sync copies of the sort_array/struct idiom. */
object Neighbors {

  /** Group `rows` by `id` into `(id, neighbors ARRAY<STRUCT<id,
    * similarity>>)` sorted (similarity desc, id asc). */
  def assemble(rows: DataFrame, id: Column, nbrId: Column,
      sim: Column): DataFrame =
    rows.groupBy(id.as("id"))
      .agg(sort_array(collect_list(struct(
        (-sim).as("neg"), nbrId.as("id"), sim.as("similarity")))).as("srt"))
      .select(col("id"),
        expr("transform(srt, x -> struct(x.id as id, x.similarity as similarity))")
          .as("neighbors"))
}
