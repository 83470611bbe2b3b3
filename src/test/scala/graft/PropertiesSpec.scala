package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the Column-expression primitives that were
  * rewritten for the interpreted-HOF performance fix (zip_with shingle
  * chains) and for the order-statistic quantile cut: each is checked
  * against a naive Scala reference on randomized inputs, all cases
  * evaluated through ONE DataFrame so Spark evaluation cost is paid
  * once per property, not per case. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val Cases = 300

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "x", "aa"))
  } yield toks.mkString(" ")

  private def refShingles(text: String, n: Int): Seq[String] = {
    val words = text.split(" ", -1)
    if (words.length >= n) words.sliding(n).map(_.mkString(" ")).toSeq
    else Seq(text)
  }

  test("shingles(n=2,3,4) equal the naive sliding-window reference on random texts") {
    // NB: empty-string text splits to [""] (length 1), exercising the
    // whole-text fallback; token duplicates exercise merge ties.
    val texts = sample(textGen, Cases)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3, 4)) {
      val got = df.select(col("id"), graft.ops.Dedup.shingles(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == refShingles(t, n),
          s"n=$n text='$t': ${got(i.toLong)} != ${refShingles(t, n)}")
      }
    }
  }

  test("quantileFilter matches a naive sorted-scan reference across a percent-grid of q") {
    // Values from a tiny grid force duplicates AT the threshold; group
    // sizes hit the q·n-integral hazard combos (e.g. q=0.07, n=100).
    val rowGen = for {
      g <- Gen.oneOf("g1", "g2", "g3")
      v <- Gen.choose(0, 9)
    } yield (g, v.toDouble)
    val rows = sample(rowGen, 150).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
    val df = rows.toDF("doc_id", "source", "quality")
    for (q <- Seq(0.07, 0.14, 0.25, 0.5, 0.9, 1.0)) {
      val got = graft.ops.Sampling
        .quantileFilter(df, "doc_id", "source", "quality", q)
        .select("doc_id", "thr", "keep")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
      rows.groupBy(_._2).foreach { case (_, members) =>
        val sorted = members.sortBy(m => (m._3, m._1))
        val k = math.max(math.ceil(q * sorted.size - 1e-9).toLong, 1L).toInt
        val thr = sorted(k - 1)._3
        members.foreach { case (id, _, v) =>
          assert(got(id) == ((thr, v >= thr)),
            s"q=$q id=$id v=$v: ${got(id)} != ($thr, ${v >= thr})")
        }
      }
    }
  }
}
