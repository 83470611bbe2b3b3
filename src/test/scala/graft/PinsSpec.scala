package graft

/** Local gate for the pinned-literal oracles (VERDICT r4 #2): executes
  * every pinned-oracle declared query (s02–s05, s07, d04, n01, n02) at
  * sf0.001 and asserts the emitted counts equal the
  * [[Queries.pinnedValues]] literals — the same values the driver's
  * DuckDB compare checks at sf0.01. Rounds 3 and 4 both shipped with the
  * driver gate red on re-tuned ANN queries while `sbt test` stayed green
  * because nothing executed the pins; this suite closes that hole: any
  * behavior drift (a re-tuned default, a changed seed or hash) fails
  * here until the pins are re-measured.
  *
  * On failure: `sbt "runMain graft.tools.PinDump"` re-measures all three
  * SFs and prints the table to paste into Queries.pinnedValues — in the
  * SAME commit as the behavior change. */
class PinsSpec extends SparkSpec {
  Queries.pinnedValues.foreach { case (name, cols) =>
    test(s"$name output equals its pinned sf0.001 literals") {
      val row = SparkEntry.queries(name)(spark, sf0001).collect()(0)
      val drift = cols.flatMap { case (c, (v001, _, _)) =>
        val got = row.getAs[Long](c)
        if (got == v001) None else Some(s"$c: pinned $v001, measured $got")
      }
      assert(drift.isEmpty,
        s"$name drifted from its pins (${drift.mkString("; ")}) — op behavior " +
          "changed; re-measure with `sbt \"runMain graft.tools.PinDump\"` and " +
          "update Queries.pinnedValues in the same commit")
    }
  }
}
