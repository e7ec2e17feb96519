package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Plan-level proof of the layout helpers: bucketing removes the join
  * exchange; salting preserves join results exactly. */
class LayoutSpec extends SparkSuite {

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private lazy val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("bucketed tables equi-join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a killed prior run can leave the warehouse dirs without catalog entries
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    for (t <- Seq("li_b", "ord_b")) {
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) rmrf(loc)
    }
    Layout.writeBucketed(lineitem.select("l_orderkey", "l_quantity"), "li_b", 4,
      Seq("l_orderkey"))
    Layout.writeBucketed(orders.select("o_orderkey", "o_totalprice"), "ord_b", 4,
      Seq("o_orderkey"))
    val j = spark.table("li_b").join(spark.table("ord_b"),
      col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the test exercises the bucketed sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
      assert(j.count() == lineitem.count()) // every lineitem has an order
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join returns exactly the plain join result") {
    val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val salted = Layout.saltedJoin(
      lineitem, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), factIdCol = "l_linenumber", saltBuckets = 4)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("deterministicSplit: disjoint, exhaustive, stable, ~right proportions") {
    val split = Layout.deterministicSplit(lineitem,
      "l_orderkey", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("_split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = lineitem.count()
    assert(counts.values.sum == n, "split must be exhaustive")
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.05, counts.toString)
    // stable: same assignment on re-run
    val again = Layout.deterministicSplit(lineitem,
      "l_orderkey", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.select("l_orderkey", "l_linenumber", "_split")
      .exceptAll(again.select("l_orderkey", "l_linenumber", "_split")).isEmpty)
    // same key always lands in the same split (group-safe: no order leakage
    // between train and eval for multi-row keys)
    val perKey = split.groupBy("l_orderkey")
      .agg(countDistinct("_split").as("k")).agg(max("k")).first().getLong(0)
    assert(perKey == 1L)
  }

  test("repartitionByKeys reuses the exchange for a following aggregation") {
    val rep = Layout.repartitionByKeys(lineitem, 4, "l_orderkey")
    val agg = rep.groupBy("l_orderkey").agg(sum("l_quantity"))
    val plan = agg.queryExecution.executedPlan.toString
    // only the explicit repartition exchange; no extra ENSURE_REQUIREMENTS hash exchange
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(3000))
  }
}
