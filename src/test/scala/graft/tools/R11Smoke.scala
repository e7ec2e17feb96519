package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Bpe, QualityRules, Similarity, Sketches, TextAnalysis}

/** Scratch 10× scale smoke for the round-11 operators (not part of the
  * suite — run via `Test/runMain graft.tools.R11Smoke`): every new family
  * is map-only or partial-aggregable, so 10× data must cost ≈10× work on a
  * fixed-width pool — wall ratios well under 10 (parallel slack) and
  * NEVER above it are the pass shape. */
object R11Smoke {
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
      println(f"[r11smoke] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      n
    }
    def rep(df: DataFrame, n: Int): DataFrame =
      (0 until n).map(i =>
        df.withColumn("doc_id", col("doc_id") + lit(i * 100000000L)))
        .reduce(_ unionByName _)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val merges = Seq("e r" -> "er", "o r" -> "or", "i n" -> "in",
      "s t" -> "st", "a r" -> "ar", "a n" -> "an")

    def qualityRun(d: DataFrame): Long = d.select(
      QualityRules.gopherKeep(col("text")).as("g"),
      QualityRules.topNgramCharFraction(col("text"), 2).as("t2"),
      TextAnalysis.charEntropy(col("text")).as("e"),
      graft.expressions.native.dedupNormalize(col("text")).as("n"),
      Bpe.tokenCount(col("text"), merges).as("b")).count()

    def kmvRun(d: DataFrame): Long = d
      .agg(Sketches.kmv(col("doc_id"), 4096).as("sk"))
      .select(Sketches.kmvEstimate(col("sk"), 4096)).count()

    def poolRun(d: DataFrame): Long = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val joined = d.select(col("doc_id"))
        .withColumn("label", pmod(col("doc_id"), lit(10)).cast("int"))
        .join(emb.withColumnRenamed("label", "l2"),
          pmod(col("doc_id"), lit(500)) === col("vec_id") % 500)
      Similarity.meanPool(
        joined.withColumn("e", col("embedding").cast("array<double>")),
        Seq("label"), "e").count()
    }

    for ((label, run) <- Seq[(String, DataFrame => Long)](
      "quality+bpe+entropy+normalize" -> qualityRun,
      "kmv sketch" -> kmvRun)) {
      run(docs) // warm
      val n1 = time(s"$label 1x")(run(docs))
      val d10 = rep(docs, 10)
      val n10 = time(s"$label 10x")(run(d10))
      require(n10 == 10 * n1 || label.contains("kmv"),
        s"$label: 10x rows $n10 != 10 * $n1")
    }
    poolRun(docs) // warm
    time("meanPool joined 1x")(poolRun(docs))
    time("meanPool joined 10x")(poolRun(rep(docs, 10)))
    spark.stop()
  }
}
