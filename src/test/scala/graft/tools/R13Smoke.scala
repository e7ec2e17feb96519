package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch 1× vs 10× scale smoke for the round-13 operators (not part of
  * the suite — run via `Test/runMain graft.tools.R13Smoke`): replicate
  * sf0.1 tables 10× with shifted keys and compare wall time + the
  * bounded-state invariants. The interesting directions:
  *  - triangles/hits/ppr see 10× the edges over the same node universe
  *    (heavier multi-edges) — vectors stay node-sized;
  *  - ksStatistic's grid-cell table and mutualInfo's contingency table
  *    must NOT grow (asserted equal 1× vs 10×);
  *  - cusum/autocorr daily series stay (types × days)-sized;
  *  - embeddingCovariance stays ONE aggregate row (36 pair cells);
  *  - frequentPairs with shifted basket ids sees the same pair
  *    vocabulary at 10× the support;
  *  - skyline2D's frontier is replication-invariant (same points, 10×
  *    the carrying rows);
  *  - mmrRerank scales with queries × pool, not the corpus.
  */
object R13Smoke {
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
      println(f"[smoke] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def rep10(df: org.apache.spark.sql.DataFrame, key: String) =
      (0 until 10).map(i => df.withColumn(key, col(key) + lit(i * 100000000L)))
        .reduce(_ unionByName _)

    for ((label, o, li, ev, em) <- Seq(
        ("1x", orders, lineitem, events, emb),
        ("10x", rep10(orders, "o_orderkey"), rep10(lineitem, "l_orderkey"),
          rep10(events, "event_id"), rep10(emb, "vec_id")))) {
      // graph ops over a synthetic edge list: key-mod universe of 5000
      // nodes, so 10× data = 10× parallel edges over the same nodes
      val edges = o.select((col("o_orderkey") % 5000).as("src"),
        (col("o_custkey") % 5000).as("dst"))
      val tri = time(s"triangles $label") {
        graft.ops.Graphs.triangles(edges, "src", "dst").count() }
      time(s"hits $label") {
        graft.ops.Graphs.hits(edges, "src", "dst", iterations = 3).count() }
      time(s"ppr $label") {
        graft.ops.Graphs.pageRankPersonalized(edges, "src", "dst",
          edges.select(col("src").as("node")).filter(col("node") % 7 === 0)
            .distinct(),
          "node", iterations = 3).count() }
      val ks = time(s"ks_test $label") {
        graft.ops.Sketches.ksStatistic(o, "o_totalprice",
          col("o_orderstatus") === "F", col("o_orderstatus") === "O", 100.0)
          .select("d_stat").as[Double].head() }
      // the gridded cell table is SF-invariant: count it directly
      val kcells = o.filter(col("o_totalprice").isNotNull)
        .select((floor(col("o_totalprice") / 100.0 + 0.5) * 100.0).as("v"))
        .distinct().count()
      val mi = time(s"mutual_info $label") {
        graft.ops.Sketches.mutualInfo(li, "l_returnflag", "l_linestatus")
          .select("n_cells").as[Long].head() }
      println(s"[smoke] $label bounded-state: ks_grid_cells=$kcells mi_cells=$mi")
      val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val targets = daily.groupBy(col("event_type"))
        .agg((floor(avg(col("n")) * 1e6 + lit(0.5)) / 1e6).as("target"))
      val cu = time(s"cusum $label") {
        graft.ops.TimeSeries.cusum(daily, "event_type", "day", "n",
          targets, "target", 1.0, 15.0).count() }
      time(s"autocorr $label") {
        graft.ops.TimeSeries.autocorrelation(daily, "event_type", "day", "n", 3).count() }
      val cov = time(s"embed_cov $label") {
        graft.ops.Similarity.embeddingCovariance(em, "embedding", 8).count() }
      println(s"[smoke] $label bounded-state: cusum_series_rows=$cu embed_cov_cells=$cov")
      time(s"frequent_pairs $label") {
        graft.ops.Baskets.frequentPairs(li, "l_orderkey", "l_partkey", 2).count() }
      val sky = time(s"skyline $label") {
        graft.ops.Sketches.skyline2D(
          o.select(col("o_orderkey"), col("o_totalprice"),
            (lit(0L) - unix_micros(col("o_orderdate").cast("timestamp")))
              .cast("double").as("neg_t")),
          "o_totalprice", "neg_t").count() }
      println(s"[smoke] $label: triangles_nodes=$tri ks_d=$ks skyline_rows=$sky")
      time(s"mmr $label") {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val qs = Seq((1L, "fast hash join"), (2L, "window group query"),
          (3L, "slow table scan")).toDF("qid", "qtext")
        val bm = graft.ops.Retrieval.bm25TopK(docs, "doc_id", "text",
          qs, "qid", "qtext", k = 10)
        graft.ops.Similarity.mmrRerank(bm.select("qid", "doc_id", "score"),
          "qid", "doc_id", "score", em, "vec_id", "embedding", 5, 0.7).count() }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    println("[smoke] done")
    spark.stop()
  }
}
