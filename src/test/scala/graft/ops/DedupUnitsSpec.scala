package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Corpus-wide keep-first unit dedup ([[Dedup.dedupUnitsKeepFirst]]):
  * first occurrence survives (across AND within documents), short units
  * are exempt, emptied documents drop, and the winner-selection window
  * pre-prunes map-side. */
class DedupUnitsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha\nbravo\nalpha"),          // within-doc repeat of alpha
    (2L, "bravo\ncharlie"),               // bravo already seen in doc 1
    (3L, "alpha\nbravo"),                 // nothing new → drops
    (4L, "-\ncharlie\n-\ndelta")          // '-' exempt at minUnitLength=2
  ).toDF("doc_id", "text")

  test("first (doc, pos) occurrence survives; later repeats vanish; empty docs drop") {
    val out = Dedup.dedupUnitsKeepFirst(docs, "doc_id", "text", minUnitLength = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha\nbravo") // within-doc repeat removed
    assert(out(2L) == "charlie")
    assert(!out.contains(3L))        // every unit seen earlier
    assert(out(4L) == "-\n-\ndelta") // exempt '-' kept BOTH times, in place
  }

  test("minUnitLength=1 exempts only empty segments") {
    val d = Seq((1L, "a\n\nb"), (2L, "a\n\nc")).toDF("doc_id", "text")
    val out = Dedup.dedupUnitsKeepFirst(d, "doc_id", "text", minUnitLength = 1)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a\n\nb")
    assert(out(2L) == "\nc") // 'a' deduped; the empty segment is exempt
  }

  test("winner selection pre-prunes map-side (WindowGroupLimit)") {
    val d = spark.range(500).select(col("id"),
      concat(lit("unit-"), (col("id") % 5).cast("string")).as("text"))
    val plan = Dedup.dedupUnitsKeepFirst(d, "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pre-prune in plan:\n$plan")
  }

  test("deterministic under repartitioning") {
    val a = Dedup.dedupUnitsKeepFirst(docs, "doc_id", "text", minUnitLength = 2)
      .as[(Long, String)].collect().toSet
    val b = Dedup.dedupUnitsKeepFirst(docs.repartition(7), "doc_id", "text",
      minUnitLength = 2).as[(Long, String)].collect().toSet
    assert(a == b)
  }
}
