package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Bench-drift attribution probe (r7/r8 verdict ask): the queries that
  * regressed-then-rebounded across rounds WITH ZERO CODE CHANGE, run
  * back-to-back ×5 inside ONE warmed JVM at the harness bench scale
  * (sf0.1, local[32]). If their per-run spread within a single JVM is of
  * the same order as the cross-round swings (2–5×), those swings are
  * container/JVM variance, not code — and per-query cross-round deltas
  * below that band carry no signal.
  *
  * `Test/runMain graft.tools.DriftProbe` — numbers in SCALE.md
  * ("Bench drift attribution").
  */
object DriftProbe {
  private val probes = Seq("q_uuid", "q_window_events", "q_weighted_sample",
    "q_zorder", "q_type_int", "q_ann_cosine", "q_approx_distinct",
    "q_dedup_minhash",
    // r9 above-band watch items (driver showed 2.6× / 3.7× on
    // unchanged-or-faster code): attribute within one JVM
    "q_curation_e2e", "q_pack_sequences",
    // r10: the two-pass composition swung 3.59→9.89 s between two
    // same-session bench runs — give the next round in-JVM numbers
    "q_twopass")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm pass: codegen + JIT + parquet footer cache, not timed
    probes.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())

    val times = probes.map { n =>
      n -> (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
    }
    println(f"[drift] ${"query"}%-20s ${"min"}%6s ${"median"}%6s ${"max"}%6s  max/min")
    times.foreach { case (n, ts) =>
      println(f"[drift] $n%-20s ${ts.head}%6.3f ${ts(2)}%6.3f ${ts.last}%6.3f  ${ts.last / ts.head}%.2f")
    }
    spark.stop()
  }
}
