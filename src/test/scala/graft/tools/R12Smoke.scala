package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch 1× vs 10× scale smoke for the round-12 operators (not part of
  * the suite — run via `Test/runMain graft.tools.R12Smoke`): replicate
  * sf0.1 documents 10× with shifted ids and compare wall time + output
  * shape for phrase search, keyword tagging, entity resolution, profile
  * drift, KN bigrams, PII scrub, and confusable skeleton. The interesting
  * directions: phrase/tag candidate sets grow linearly (posting prune must
  * stay selective), entity clusters double in membership (survivorship is
  * one partial agg), KN windows absorb a richer vocabulary. */
object R12Smoke {
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
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[smoke] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val docs10 = (0 until 10).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 100000000L)))
      .reduce(_ unionByName _)

    def phrases = Seq((1L, "table value part"), (2L, "fast join"),
      (3L, "spark zz never"), (4L, "value")).toDF("pid", "phrase")
    def dict = Seq(("perf", "fast"), ("perf", "slow"), ("perf", "quick"),
      ("storage", "table"), ("storage", "row"), ("storage", "column"))
      .toDF("tag", "term")

    for ((label, d) <- Seq("1x" -> docs, "10x" -> docs10)) {
      val n1 = time(s"phrase_search $label") {
        graft.ops.Retrieval.phraseSearch(d, "doc_id", "text",
          phrases, "pid", "phrase").count()
      }
      val n2 = time(s"tag_keywords $label") {
        graft.ops.TextAnalysis.tagKeywords(d, "doc_id", "text",
          dict, "tag", "term", minHits = 2).count()
      }
      val n3 = time(s"pii_scrub $label") {
        graft.ops.Pii.scrub(d.filter(col("text").isNotNull), "text").count()
      }
      val n4 = time(s"confusable_skeleton $label") {
        d.filter(col("text").isNotNull)
          .select(graft.ops.Confusables.skeleton(col("text")).as("k"))
          .agg(sum(length(col("k")))).head()
        d.count()
      }
      val n5 = time(s"kn_bigram $label") {
        graft.ops.LmScore.knBigramModel(d, "text", k = 200).count()
      }
      println(s"[smoke] counts $label: phrase=$n1 tag=$n2 pii=$n3 docs=$n4 kn=$n5")
    }

    // entity resolution: 10× in the CLUSTER-SIZE direction — every
    // customer gets 10 typo variants instead of 1, so each entity's
    // survivorship aggregate absorbs 11 members
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey").isNotNull)
    def base = c.select(col("c_custkey").as("rid"),
      concat(lit("Entity "), md5(col("c_custkey").cast("string"))).as("name"),
      col("c_mktsegment").as("segment"), col("c_acctbal").as("bal"))
    def dups(k: Int) = (1 to k).map(i =>
      c.select((col("c_custkey") + lit(i * 100000000L)).as("rid"),
        concat(lit("entity "),
          substring(md5(col("c_custkey").cast("string")), 1, 31)).as("name"),
        lit(null).cast("string").as("segment"),
        (col("c_acctbal") + i).as("bal"))).reduce(_ unionByName _)
    for ((label, k) <- Seq("1-dup" -> 1, "10-dup" -> 10)) {
      val n = time(s"entity_resolution $label") {
        graft.ops.EntityResolution.resolve(base.unionByName(dups(k)),
          "rid", "name", Seq("segment", "bal"), maxDist = 1).count()
      }
      println(s"[smoke] entities $label: $n")
    }

    val before = spark.read.parquet(s"$dir/orders.parquet")
    val before10 = (0 until 10).map(i =>
      before.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
    for ((label, d) <- Seq("1x" -> before, "10x" -> before10)) {
      time(s"profile_drift(approx) $label") {
        graft.ops.Sketches.profileDrift(d, d.filter(col("o_orderkey") % 10 =!= 0),
          exact = false).count()
      }
    }
    spark.stop()
  }
}
