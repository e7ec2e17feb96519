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

  // -------------------------------------------- incremental rollup

  private def rollupKey(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (Option(r.get(0)).map(_.toString),
      r.getLong(1), r.getLong(2),
      Option(r.getDecimal(3)).map(_.stripTrailingZeros))).toSet

  test("incrementalRollup equals the from-scratch recompute on real data") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val k = col("o_orderkey")
    def tag(df: org.apache.spark.sql.DataFrame, op: String, seq: Long) =
      df.withColumn("__op", lit(op)).withColumn("__seq", lit(seq))
    val ch = tag(orders.filter(k % 10 === 1)
        .withColumn("o_totalprice", col("o_totalprice") * 2), "U", 1L)
      .unionByName(tag(orders.filter(k % 10 === 0), "D", 1L))
      .unionByName(tag(orders.filter(k % 10 === 2), "U", 1L))
      .unionByName(tag(orders.filter(k % 10 === 2), "D", 2L))
      .unionByName(tag(orders.filter(k % 10 === 3)
        .withColumn("o_orderkey", k + 10000000L), "I", 1L))
    val oldAgg = Cdc.rollupOf(orders, Seq("o_orderstatus"), "o_totalprice")
    val inc = Cdc.incrementalRollup(oldAgg, orders, ch, Seq("o_orderkey"),
      Seq("o_orderstatus"), "o_totalprice", "__seq", "__op")
    val want = Cdc.rollupOf(
      Cdc.applyChangelog(orders, ch, Seq("o_orderkey"), "__seq", "__op"),
      Seq("o_orderstatus"), "o_totalprice")
    assert(rollupKey(inc) == rollupKey(want))
  }

  test("incrementalRollup: vanishing group, new group, null dim, all-null values") {
    val b = Seq((1L, Option("x"), Option(1.0)), (2L, Option("x"), Option(2.0)),
      (3L, None: Option[String], Option(3.0)),
      (4L, Option("z"), None: Option[Double])).toDF("k", "g", "v")
    val ch = Seq(
      (1L, Option("x"), Option(1.0), "D", 1L),   // shrink group x
      (2L, Option("x"), Option(2.0), "D", 1L),   // ...to zero -> vanishes
      (5L, Option("w"), Option(5.0), "I", 1L),   // brand-new group w
      (6L, None: Option[String], Option(6.0), "I", 1L), // grow the null group
      (7L, Option("z"), None: Option[Double], "I", 1L)  // z stays all-null
    ).toDF("k", "g", "v", "__op", "__seq")
    val oldAgg = Cdc.rollupOf(b, Seq("g"), "v")
    val inc = Cdc.incrementalRollup(oldAgg, b, ch, Seq("k"), Seq("g"), "v",
      "__seq", "__op")
    val want = Cdc.rollupOf(
      Cdc.applyChangelog(b, ch, Seq("k"), "__seq", "__op"), Seq("g"), "v")
    assert(rollupKey(inc) == rollupKey(want))
    val m = inc.collect().map(r => Option(r.get(0)).map(_.toString) ->
      ((r.getLong(1), Option(r.getDecimal(3))))).toMap
    assert(!m.contains(Some("x")))                       // vanished
    assert(m(Some("w"))._1 == 1L)                        // appeared
    assert(m(None)._1 == 2L)                             // null dim merged
    assert(m(Some("z"))._1 == 2L && m(Some("z"))._2.isEmpty) // null total kept
  }
}
