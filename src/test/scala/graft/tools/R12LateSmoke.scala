package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch 1× vs 10× scale smoke for the round-12-LATE evaluation/audit
  * operators (not part of the suite — run via
  * `Test/runMain graft.tools.R12LateSmoke`): replicate sf0.1 documents /
  * events 10× with shifted ids and compare wall time + output shape.
  * The interesting directions: the AUC/percentile rank passes see 10×
  * the per-distinct-score tallies, the count-min cell table must NOT
  * grow (bounded by depth×width), PSI/chi-square/null-pattern tables
  * stay bin/cell-sized, and the token-table comparisons (log-odds,
  * cluster labels, lexical) absorb a 10×-mass but near-identical
  * vocabulary. */
object R12LateSmoke {
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
      println(f"[smoke] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val docs10 = (0 until 10).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    val events10 = (0 until 10).map(i =>
      events.withColumn("event_id", col("event_id") + lit(i * 100000000L)))
      .reduce(_ unionByName _)

    for ((label, d, e) <- Seq(("1x", docs, events), ("10x", docs10, events10))) {
      val scored = graft.ops.Classifier.scoreLinear(
          d.filter(col("text").isNotNull && col("lang").isNotNull &&
            col("n_chars").isNotNull),
          Seq(least(col("n_chars") / 500.0, lit(2.0)) -> 0.8),
          bias = -0.5)
        .withColumn("score", round(col("score"), 6))
        .withColumn("y", when(col("n_chars") >= 500, 1.0).otherwise(0.0))
      time(s"auc_by_lang $label") {
        graft.ops.Classifier.aucROCBy(scored, Seq("lang"), "score", "y").count()
      }
      time(s"pct_norm $label") {
        graft.ops.Sketches.percentileNormalize(
          d.select("doc_id", "lang", "n_chars"), "n_chars", "doc_id",
          Seq("lang")).count()
      }
      val cms = time(s"cms_build $label") {
        val c = graft.ops.Sketches.cmsBuild(e, "user_id", depth = 4, width = 64)
        val n = c.count()
        println(s"[smoke]   cms cells: $n (bounded by 256 at ANY input size)")
        c
      }
      time(s"cms_estimate $label") {
        graft.ops.Sketches.cmsEstimate(cms,
          spark.range(0, 150).select(col("id").as("user_id")), "user_id",
          depth = 4, width = 64).count()
      }
      time(s"psi $label") {
        graft.ops.Sketches.scorePsi(
          d.select(col("n_chars").cast("double").as("v")),
          d.select((col("n_chars") * 2).cast("double").as("v")), "v").count()
      }
      time(s"chi_square $label") {
        graft.ops.Integrity.chiSquare(d, "lang", "source").count()
      }
      time(s"log_odds $label") {
        graft.ops.LmScore.logOddsDiff(
          d.filter(col("lang") === "en"),
          d.filter(!(col("lang") <=> "en")), "text", k = 15).count()
      }
      time(s"cluster_labels $label") {
        graft.ops.Retrieval.clusterLabels(d, "lang", "text", k = 5).count()
      }
      time(s"lexical $label") {
        graft.ops.TextAnalysis.lexicalDiversity(d, "text").count()
      }
      time(s"null_patterns $label") {
        graft.ops.Integrity.nullPatterns(d,
          Seq("text", "lang", "source", "n_chars")).count()
      }
    }
    spark.stop()
  }
}
