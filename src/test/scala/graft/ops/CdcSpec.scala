package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "p")

  private def changes(rows: (Long, String, Double, String, Long)*) =
    rows.toDF("k", "s", "p", "__op", "__seq")

  test("applyChangelog: insert, update, delete, passthrough") {
    val out = Cdc.applyChangelog(base,
      changes((2L, "B", 21.0, "U", 1L), (3L, "c", 30.0, "D", 1L),
        (5L, "e", 50.0, "I", 1L)),
      Seq("k"), "__seq", "__op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0),
      (5L, "e", 50.0)))
  }

  test("applyChangelog: latest seq wins; same-seq tie favors the delete") {
    val out = Cdc.applyChangelog(base,
      changes(
        (1L, "a1", 11.0, "U", 1L), (1L, "a2", 12.0, "U", 2L), // later U wins
        (2L, "b9", 29.0, "U", 2L), (2L, "b", 20.0, "D", 1L),  // U outlasts D
        (3L, "c9", 39.0, "U", 5L), (3L, "c", 30.0, "D", 5L)), // tie -> D
      Seq("k"), "__seq", "__op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a2", 12.0), (2L, "b9", 29.0), (4L, "d", 40.0)))
  }

  test("applyChangelog: null keys and unknown ops are ignored") {
    val ch = Seq((Option.empty[Long], "x", 1.0, "U", 1L),
      (Some(2L), "x", 1.0, "??", 1L)).toDF("k", "s", "p", "__op", "__seq")
    val out = Cdc.applyChangelog(base, ch, Seq("k"), "__seq", "__op")
    assert(out.orderBy("k").as[(Long, String, Double)].collect().toSeq ==
      base.orderBy("k").as[(Long, String, Double)].collect().toSeq)
  }

  test("applyChangelog: delete of a missing key is a no-op insert-wise") {
    val out = Cdc.applyChangelog(base,
      changes((9L, "z", 0.0, "D", 1L)), Seq("k"), "__seq", "__op")
    assert(out.count() == 4)
  }

  test("scdHistory: intervals close at the next change; deletes open none") {
    val ch = changes(
      (1L, "a", 10.0, "I", 1L), (1L, "a2", 11.0, "U", 3L), // two intervals
      (2L, "b", 20.0, "I", 1L), (2L, "b", 20.0, "D", 2L),  // closed by delete
      (3L, "c", 30.0, "I", 5L))                            // open only
    val out = Cdc.scdHistory(ch, Seq("k"), "__seq", "__op")
      .orderBy("k", "valid_from").collect().toSeq.map(r =>
        (r.getAs[Long]("k"), r.getAs[String]("s"), r.getAs[Long]("valid_from"),
          Option(r.getAs[Any]("valid_to")), r.getAs[Boolean]("is_current")))
    assert(out == Seq(
      (1L, "a", 1L, Some(3L), false), (1L, "a2", 3L, None, true),
      (2L, "b", 1L, Some(2L), false),
      (3L, "c", 5L, None, true)))
  }

  test("scdHistory: same-seq U/D race resolves to the delete") {
    val ch = changes((1L, "a", 1.0, "I", 1L),
      (1L, "x", 9.0, "U", 2L), (1L, "a", 1.0, "D", 2L))
    val out = Cdc.scdHistory(ch, Seq("k"), "__seq", "__op").collect()
    assert(out.length == 1 && out.head.getAs[Long]("valid_from") == 1L &&
      out.head.getAs[Long]("valid_to") == 2L && !out.head.getAs[Boolean]("is_current"))
  }

  test("snapshotDiff: added / removed / changed; unchanged not emitted") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val after = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val out = Cdc.snapshotDiff(before, after, Seq("k"), Seq("v"))
      .orderBy("k").collect().toSeq.map(r =>
        (r.getLong(0), r.getString(1), r.getAs[String]("v_before"),
          r.getAs[String]("v_after")))
    assert(out == Seq((1L, "removed", "a", null), (3L, "changed", "c", "C"),
      (4L, "added", null, "d")))
  }

  test("snapshotDiff: null-safe value compare") {
    val before = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "v")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "v")
    val out = Cdc.snapshotDiff(before, after, Seq("k"), Seq("v")).collect()
    assert(out.length == 1 && out.head.getLong(0) == 2L &&
      out.head.getString(1) == "changed")
  }
}
