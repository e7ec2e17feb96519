package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc ×3 warm timing of named harness queries at sf0.1 — for
  * before/after checks inside one session.
  * `Test/runMain graft.tools.QuickProbe q_a q_b …` */
object QuickProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { q =>
      graft.SparkEntry.queries(q)(spark, dir).count() // warm
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[quick] $q%-24s min ${ts.head}%6.2f median ${ts(1)}%6.2f s")
    }
    spark.stop()
  }
}
