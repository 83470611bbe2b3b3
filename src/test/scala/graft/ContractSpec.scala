package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the queries/oracle maps must stay in sync —
  * every oracle belongs to a declared query, and the set of
  * deliberately rows-only (approximate, hash-dependent) queries is
  * exactly the documented one, so a new query can't silently ship
  * without its correctness check. */
class ContractSpec extends AnyFunSuite {

  /** Empty since round 3: the formerly rows-only approximate ops
    * (s02–s05, d04, n01, n02) now emit pinned recall/coverage counts
    * with literal oracles — every declared query has a DuckDB check. */
  private val documentedRowsOnly = Set.empty[String]

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries are exactly the documented approximate set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == documentedRowsOnly,
      s"undocumented rows-only queries: ${rowsOnly -- documentedRowsOnly}; " +
        s"documented-but-missing: ${documentedRowsOnly -- rowsOnly}")
  }

  test("query names follow the family naming scheme") {
    val pat = "^(q|d|t|s|m|n|st|p)[0-9]+_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"off-scheme query names: $bad")
  }

  test("oracle SQL references only fixture tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val froms = "(?i)(?:FROM|JOIN)\\s+([a-z_]+)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val known = tables ++ Set("unnest", "range") // table functions
      val cteNames = "(?i)([a-z_]+)\\s*(?:\\([a-z_, ]*\\))?\\s*AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = froms -- known -- cteNames
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
