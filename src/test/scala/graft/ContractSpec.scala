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
    // One optional letter after the number: sibling exhibits of one
    // recipe under different fronts (s20 IVF / s20b graph).
    val pat = "^(q|d|t|s|m|n|st|p)[0-9]+[a-z]?_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"off-scheme query names: $bad")
  }

  test("no pinnedValues row is an unmeasured placeholder (all zeros)") {
    // Catches the round-5 failure class in seconds, without a Spark
    // session: a pin committed as (0,0,0) across EVERY column means
    // PinDump was never run for that query — PinsSpec would fail 4
    // minutes in; this fails immediately with the remedy. Per-QUERY,
    // not per-column: a measured zero column inside an otherwise
    // non-zero row is a legitimate census fact (t39's n_repetitive —
    // the fixture plants dup docs, not within-doc repetition), while a
    // never-measured placeholder is zero everywhere.
    Queries.pinnedValues.foreach { case (name, cols) =>
      val allZero = cols.forall { case (_, (v001, v01, v1)) =>
        v001 == 0L && v01 == 0L && v1 == 0L
      }
      assert(!allZero,
        s"""$name is pinned (0,0,0) on every column — an unmeasured """ +
          """placeholder. Run `sbt "runMain graft.tools.PinDump"` and """ +
          "paste the measured values into Queries.pinnedValues before " +
          "committing.")
    }
  }

  test("every pinnedValues entry names a declared query") {
    val orphans = Queries.pinnedValues.map(_._1).toSet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"pins without queries: $orphans")
  }

  test("bench regression guard: parses both prior-artifact shapes and merges sources") {
    val dir = java.nio.file.Files.createTempDirectory("graft_benchprev")
    try {
      // The raw bench line (close-tree bench.json): full per-phase map.
      java.nio.file.Files.writeString(dir.resolve("bench.json"),
        """{"metric":"total","value":9.9,"queries":{"a_q":2.0,"b_q":4.0,"c_q":0.2}}""")
      // The driver wrapper: compact map under parsed.queries (overlays).
      java.nio.file.Files.writeString(dir.resolve("BENCH_r14.json"),
        """{"n":1,"tail":"...","parsed":{"queries":{"b_q":3.0}}}""")
      // An older round artifact that must NOT win the newest-selection.
      java.nio.file.Files.writeString(dir.resolve("BENCH_r09.json"),
        """{"n":1,"parsed":{"queries":{"b_q":99.0}}}""")
      val Some((label, m)) = Bench.priorMedians(None, dir): @unchecked
      assert(label == "bench_baseline.json+BENCH_r14.json")
      assert(m == Map("a_q" -> 2.0, "b_q" -> 3.0, "c_q" -> 0.2),
        "frozen round-start baseline overlaid by the NEWEST driver artifact")
      // Same-round freeze: a later run overwrites bench.json with its
      // own output; the guard must keep comparing against the frozen
      // round-start baseline, never same-round numbers (which would
      // mask exactly the within-round regressions it exists to catch).
      java.nio.file.Files.writeString(dir.resolve("bench.json"),
        """{"queries":{"a_q":9.0,"b_q":9.0}}""")
      val Some((labelFroz, mFroz)) = Bench.priorMedians(None, dir): @unchecked
      assert(labelFroz == "bench_baseline.json+BENCH_r14.json" &&
        mFroz("a_q") == 2.0, "same-round output must not replace the baseline")
      // New round: a newer driver artifact refreshes the baseline from
      // the inherited bench.json (the previous round's close).
      java.nio.file.Files.writeString(dir.resolve("BENCH_r15.json"),
        """{"parsed":{"queries":{"b_q":1.0}}}""")
      val Some((_, mRoll)) = Bench.priorMedians(None, dir): @unchecked
      assert(mRoll("a_q") == 9.0 && mRoll("b_q") == 1.0,
        "round rollover must re-freeze from the inherited close")
      // Explicit override takes precedence over both defaults.
      val Some((l2, m2)) = Bench.priorMedians(
        Some(dir.resolve("BENCH_r09.json").toString), dir): @unchecked
      assert(l2 == "BENCH_r09.json" && m2 == Map("b_q" -> 99.0))
      // Garbage degrades to no-prior, never an exception.
      java.nio.file.Files.writeString(dir.resolve("bad.json"), "{not json")
      assert(Bench.priorMedians(Some(dir.resolve("bad.json").toString), dir).isEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .foreach(java.nio.file.Files.delete)
      java.nio.file.Files.delete(dir)
    }
  }

  test("bench regression guard: flags >1.5x on >=0.5s priors only") {
    val prior = Map("slow_q" -> 2.0, "ok_q" -> 2.0, "tiny_q" -> 0.2)
    val cur = Seq("slow_q" -> 3.1, "ok_q" -> 2.9, "tiny_q" -> 5.0,
      "new_q" -> 9.0)
    assert(Bench.flagRegressions(cur, prior) == Seq(("slow_q", 2.0, 3.1)),
      "3.1 > 1.5*2.0 flags; 2.9 <= 3.0 passes; sub-0.5s priors and " +
        "phases with no prior are exempt")
  }

  test("oracle SQL references only fixture tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val froms = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val known = tables ++ Set("unnest", "range") // table functions
      val cteNames = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([a-z_, ]*\\))?\\s*AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = froms -- known -- cteNames
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
