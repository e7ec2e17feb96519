package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch 1× vs 10× scale smoke for the round-14 operators (not part of
  * the suite — run via `Test/runMain graft.tools.R14Smoke`): replicate
  * sf0.1 tables 10× (same key universe — the hot-key / heavy-history
  * direction) and compare wall time + the bounded-state invariants:
  *  - attribution (last/first/position) and locf see 10× events per
  *    user — per-key window cost is linear in each key's own history;
  *  - mannWhitney's grid-cell table must NOT grow (asserted);
  *  - resampleDaily's grid is keys × span — 10× observations over the
  *    same users and days leave the OUTPUT INVARIANT (asserted);
  *  - labelPropagation collapses 10× parallel edges into the same
  *    simple graph — label vector stays node-sized (asserted);
  *  - associationRules sees the same rule vocabulary at 10× support;
  *  - rfm aggregates to the same #customers, so the ntile windows are
  *    replication-invariant in row count (asserted);
  *  - bhFdr runs at 10× the hypothesis count (the only input that is
  *    ever model-sized by construction). */
object R14Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[smoke] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // same key universe, distinct event ids: 10× history per key
    def rep10(df: org.apache.spark.sql.DataFrame, idKey: String) =
      (0 until 10).map(i => df.withColumn(idKey, col(idKey) + lit(i * 100000000L)))
        .reduce(_ unionByName _)

    var inv = Map.empty[String,
      (Long, Long, Long, Long, Long, Long, Long, Long, Long)]
    for ((label, o, ev, li) <- Seq(
        ("1x", orders, events, lineitem),
        ("10x", rep10(orders, "o_orderkey"), rep10(events, "event_id"),
          rep10(lineitem, "l_linenumber")))) {
      time(s"attribution_first $label") {
        graft.ops.Sequences.firstTouchAttribution(ev, "user_id", "ts",
          "event_id", "event_type", "purchase").count() }
      time(s"attribution_position $label") {
        graft.ops.Sequences.positionAttribution(ev, "user_id", "ts",
          "event_id", "event_type", "purchase").count() }
      time(s"locf $label") {
        graft.ops.TimeSeries.locfFill(ev.withColumn("value",
            when(col("event_id") % 3 === 0, lit(null).cast("double"))
              .otherwise(col("value"))),
          "user_id", "ts", "event_id", "value").count() }
      val mw = time(s"mannwhitney $label") {
        graft.ops.Sketches.mannWhitney(o, "o_totalprice",
          col("o_orderstatus") === "F", col("o_orderstatus") === "O", 100.0)
          .count() }
      val mwCells = o.filter(col("o_totalprice").isNotNull)
        .select((floor(col("o_totalprice") / 100.0 + 0.5) * 100.0).as("v"))
        .distinct().count()
      val rs = time(s"resample_daily $label") {
        graft.ops.TimeSeries.resampleDaily(ev, "user_id", "ts",
          "event_id", "value").count() }
      val edges = o.select((col("o_orderkey") % 5000).as("src"),
        (col("o_custkey") % 5000).as("dst"))
      val lp = time(s"label_prop $label") {
        graft.ops.Graphs.labelPropagation(edges, "src", "dst", 3).count() }
      val ar = time(s"assoc_rules $label") {
        graft.ops.Baskets.associationRules(li, "l_orderkey", "l_partkey",
          minSupport = 2, minConfidence = 0.05).count() }
      val rfm = time(s"rfm $label") {
        graft.ops.Rollups.rfmSegments(o, "o_custkey", "o_orderdate",
          "o_totalprice").count() }
      val mH = if (label == "1x") 500L else 5000L
      time(s"bh_fdr m=$mH $label") {
        graft.ops.Sketches.bhFdr(docs.limit(mH.toInt)
            .select(col("doc_id").as("id"),
              ((col("doc_id") * 37 % 97).cast("double") / 97.0).as("p")),
          "id", "p", 0.2).count() }
      val kp = time(s"kappa $label") {
        graft.ops.Classifier.cohensKappa(docs.select(col("lang").as("r1"),
          when(col("doc_id") % 7 === 0, col("source")).otherwise(col("lang"))
            .as("r2")), "r1", "r2").count() }
      // second batch: the bin/series/month tables must stay model-sized
      val isoB = time(s"isotonic $label") {
        graft.ops.Classifier.isotonicCalibration(o.select(
          ((col("o_orderkey") * 13 % 100).cast("double") / 100.0).as("s"),
          when(col("o_orderkey") * 7 % 100 < col("o_orderkey") * 13 % 100, 1.0)
            .otherwise(0.0).as("y")), "s", "y", 10).count() }
      val daily = ev.filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("nv"))
      val ho = time(s"holt $label") {
        graft.ops.TimeSeries.holtSmooth(daily, "event_type", "day", "nv")
          .count() }
      val se = time(s"seasonal $label") {
        graft.ops.TimeSeries.seasonalDecompose(daily, "event_type", "day",
          "nv").count() }
      val tsn = time(s"theil_sen $label") {
        graft.ops.TimeSeries.theilSen(daily, "event_type", "day", "nv")
          .count() }
      val pop = time(s"pop $label") {
        graft.ops.Rollups.periodOverPeriod(o, "o_orderdate", "o_totalprice")
          .count() }
      time(s"wilcoxon $label") {
        val paired = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
          .groupBy(col("user_id"))
          .agg(sum(when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L)).as("h1"),
            sum(when(dayofmonth(col("ts")) > 15, 1L).otherwise(0L)).as("h2"))
        graft.ops.Sketches.wilcoxonSignedRank(paired, "h1", "h2", 1.0).count() }
      time(s"cohens_d $label") {
        graft.ops.Sketches.cohensD(ev, "value",
          col("event_type") === "click", col("event_type") === "view").count() }
      println(s"[smoke] $label bounded-state: mw_rows=$mw mw_grid_cells=$mwCells " +
        s"resample_rows=$rs labelprop_nodes=$lp rules=$ar rfm_rows=$rfm kappa_rows=$kp " +
        s"iso_bins=$isoB holt_keys=$ho seasonal_rows=$se theil_keys=$tsn pop_months=$pop")
      inv += label -> ((mwCells, rs, lp, rfm, isoB, ho, se, tsn, pop))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    assert(inv("1x") == inv("10x"),
      s"bounded-state invariants moved between 1x and 10x: $inv")
    println("[smoke] done — grid cells and resample output replication-invariant")
    spark.stop()
  }
}
