package graft.tools

import org.apache.spark.sql.SparkSession

/** Re-measurement harness for [[graft.Queries.pinnedValues]]: runs every
  * pinned-oracle declared query at each fixture dir and prints the
  * measured counts in the exact literal syntax of the `pinnedValues`
  * table, ready to paste into `Queries.scala`.
  *
  * Run whenever an ANN/LSH/NND default, seed, or hash changes — in the
  * SAME commit as the change (the round-3/4 driver-gate regressions were
  * exactly this step skipped):
  *
  * {{{ sbt "runMain graft.tools.PinDump" }}}
  *
  * Args (optional): fixture dirs, default the three driver SFs. Each
  * dir's tuple slot is detected from the data (lineitem cardinality),
  * so a subset or out-of-order dirs still print a correctly-aligned
  * table — unmeasured slots carry the current pinned values.
  */
object PinDump {
  def main(args: Array[String]): Unit = {
    // `--only=name1,name2` re-measures a subset (a new pin's first
    // measurement shouldn't re-run every ANN query at three SFs);
    // remaining args are fixture dirs.
    val only: Option[Set[String]] = args.collectFirst {
      case a if a.startsWith("--only=") =>
        a.stripPrefix("--only=").split(",").toSet
    }
    val dirArgs = args.filterNot(_.startsWith("--only=")).toSeq
    val dirs =
      if (dirArgs.nonEmpty) dirArgs
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Which pin slot each dir compares against is detected from the
    // data (lineitem row count — the same discriminator pinnedCounts
    // uses), not from argument position: `runMain ... /path/sf0.1`
    // must diff against the sf0.1 pin, not the first tuple slot.
    val sfSlot: Map[String, Option[Int]] = dirs.map { dir =>
      dir -> (spark.read.parquet(s"$dir/lineitem.parquet").count() match {
        case 6000 => Some(0)
        case 60000 => Some(1)
        case 600000 => Some(2)
        case _ => None
      })
    }.toMap

    val measured = graft.Queries.pinnedValues
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, cols) =>
      val byDir = dirs.map { dir =>
        val t0 = System.nanoTime()
        val row = graft.SparkEntry.queries(name)(spark, dir).collect()(0)
        System.err.println(f"[pindump] $name $dir ${(System.nanoTime() - t0) / 1e9}%.1fs")
        cols.map { case (c, _) => c -> row.getAs[Long](c) }.toMap
      }
      name -> cols.map { case (c, pinned) => (c, pinned, byDir.map(_(c))) }
    }

    // Paste-ready table, ordered by DETECTED slot — not dir-argument
    // order: `runMain ... /path/sf0.1` must land in the third tuple
    // position, with unmeasured slots carried over from the current
    // pins (a positional print would paste sf0.1 values into the
    // sf0.001 slot).
    val dirSlots = dirs.map(sfSlot)
    println("  val pinnedValues: Seq[(String, Seq[(String, (Long, Long, Long))])] = Seq(")
    println(measured.map { case (name, cols) =>
      s"""    "$name" -> Seq(\n""" + cols.map { case (c, pinned, vs) =>
        val out = Array(pinned._1, pinned._2, pinned._3)
        dirSlots.zip(vs).foreach { case (slot, v) => slot.foreach(out(_) = v) }
        s"""      "$c" -> (${out.mkString("L, ")}L)"""
      }.mkString(",\n") + ")"
    }.mkString(",\n") + ")")

    dirs.filter(sfSlot(_).isEmpty).foreach(d => System.err.println(
      s"[pindump] $d: unrecognized scale factor — skipped in the drift report"))
    val drift = measured.flatMap { case (name, cols) =>
      cols.flatMap { case (c, pinned, vs) =>
        val pinArr = Array(pinned._1, pinned._2, pinned._3)
        dirs.zip(vs).flatMap { case (dir, v) =>
          sfSlot(dir).collect { case slot if pinArr(slot) != v =>
            s"$name.$c @$dir pinned=${pinArr(slot)} measured=$v"
          }
        }
      }
    }
    if (drift.nonEmpty) {
      System.err.println("[pindump] DRIFT vs current pins:")
      drift.foreach(d => System.err.println(s"[pindump]   $d"))
    } else System.err.println("[pindump] all measured values match current pins")
    spark.stop()
  }
}
