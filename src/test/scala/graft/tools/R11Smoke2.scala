package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Classifier, FuzzyJoin, Graphs, Sequences, TimeSeries}

/** Scratch 10× scale smoke for the late round-11 operators (not part of
  * the suite — run via `Test/runMain graft.tools.R11Smoke2`): funnel,
  * rolling/EWMA, edit-distance join, PageRank, logistic fit. Replication
  * multiplies the KEY universe (users / strings / nodes), the axis that
  * actually grows at corpus scale; wall ratios at or under the data
  * ratio are the pass shape (the exception is fuzzy-join, whose OUTPUT
  * grows with the near-pair count — reported, not bounded). */
object R11Smoke2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[r11smoke2] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      n
    }
    val events = spark.read.parquet(s"$dir/events.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def repEvents(n: Int): DataFrame =
      (0 until n).map(i => events
        .withColumn("user_id", col("user_id") + lit(i * 100000000L))
        .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
    def repDocs(n: Int): DataFrame =
      (0 until n).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _)

    def funnelRun(d: DataFrame): Long =
      Sequences.funnel(d, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"),
        horizon = Some(expr("INTERVAL 7 DAYS"))).count()
    def rollingRun(d: DataFrame): Long =
      TimeSeries.rollingFeatures(d, "user_id", "ts", "value", "event_id",
        rowFrame = 4, rangeSeconds = 86400)
        .agg(count(lit(1))).head().getLong(0)
    def ewmaRun(d: DataFrame): Long =
      TimeSeries.ewma(d, "user_id", "ts", "value", "event_id", alpha = 0.1,
        blockSize = 64).agg(count(lit(1))).head().getLong(0)
    // replicas take DIFFERENT 16-char windows of the text: duplicating a
    // corpus verbatim makes the pair OUTPUT quadratic in the copy count
    // (every copy pairs with every other at distance 0 — the scaladoc's
    // exact-dedup-first caveat), which would measure output size, not
    // blocking cost
    def fuzzyStrs(n: Int): DataFrame =
      (0 until n).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
        .select(col("doc_id"), substring(col("text"), 1 + 17 * i, 16).as("s"))
        .filter(length(col("s")) === 16))
        .reduce(_ unionByName _)
    def fuzzyRun(d: DataFrame): Long =
      FuzzyJoin.editDistanceJoin(d, "doc_id", "s", maxDist = 2).count()
    def prRun(d: DataFrame): Long = {
      val edges = d.select(col("doc_id").as("src"),
        (col("doc_id") % 1000 + expr("doc_id div 100000000") * 100000000L).as("dst"))
      Graphs.pageRank(edges, "src", "dst", iterations = 3).count()
    }
    def fitRun(d: DataFrame): Long =
      Classifier.fitLogistic(
        d.filter(col("text").isNotNull && col("lang").isNotNull)
          .withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0)),
        Seq(least(col("n_chars") / 500.0, lit(2.0))), "y",
        learningRate = 2.0, iterations = 3).count()

    val eventRuns = Seq[(String, DataFrame => Long)](
      "funnel" -> funnelRun, "rolling" -> rollingRun, "ewma" -> ewmaRun)
    for ((label, run) <- eventRuns) {
      run(events) // warm
      val n1 = time(s"$label 1x")(run(events))
      val n10 = time(s"$label 10x")(run(repEvents(10)))
      require(n10 == 10 * n1, s"$label: 10x rows $n10 != 10 * $n1")
    }
    fuzzyRun(fuzzyStrs(1)) // warm
    time("fuzzy join 1x")(fuzzyRun(fuzzyStrs(1)))
    time("fuzzy join 10x")(fuzzyRun(fuzzyStrs(10)))
    val docRuns = Seq[(String, DataFrame => Long)](
      "pagerank 3 iters" -> prRun,
      "logit fit 3 iters" -> fitRun)
    for ((label, run) <- docRuns) {
      run(docs) // warm
      time(s"$label 1x")(run(docs))
      time(s"$label 10x")(run(repDocs(10)))
    }
    spark.stop()
  }
}
