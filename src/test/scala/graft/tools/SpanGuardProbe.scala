package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribution probe for the r10 span-excision skew guard: the shipped
  * `min(struct)`-aggregate winner selection vs an inline replica of the r9
  * `row_number`-window form, timed in ONE JVM on (a) the real sf0.1
  * documents (benign key distribution) and (b) an adversarial corpus where
  * one k-token span occurs in EVERY document — the hot-key shape the guard
  * exists for. Also asserts both forms produce identical results on both
  * corpora.
  *
  * `Test/runMain graft.tools.SpanGuardProbe` — numbers in SCALE.md.
  */
object SpanGuardProbe {
  private val K = 8

  /** The r9 winner selection, verbatim shape: rank ALL occurrences of a
    * span key in one window partition. */
  private def oldForm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksArr = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol), toksArr.as("__toks"))
    val toks = base.select(col(idCol),
      posexplode(col("__toks")).as(Seq("__pos", "__tok")))
    val wins = base.filter(size(col("__toks")) >= K)
      .select(col(idCol), posexplode(
          transform(sequence(lit(1), size(col("__toks")) - (K - 1)),
            i => md5(array_join(slice(col("__toks"), i, lit(K)), " ").cast("binary"))))
        .as(Seq("__wpos", "__wkey")))
    val w = Window.partitionBy(col("__wkey")).orderBy(col(idCol), col("__wpos"))
    val removed = wins
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > 1)
      .select(col(idCol).as("__rid"),
        explode(sequence(col("__wpos"), col("__wpos") + (K - 1))).as("__rpos"))
      .distinct()
    toks.join(removed,
        col(idCol) === col("__rid") && col("__pos") === col("__rpos"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__tok")))),
        x => x.getField("__tok")), " ").as("text_clean"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String, reps: Int = 3)(f: => Long): Unit = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[spanguard] $label%-42s min ${ts.head}%6.2f  median ${ts(reps / 2)}%6.2f s")
    }

    val real = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    // adversarial: 20k docs, EVERY one carrying the same 8-token span
    val hotSpan = "h1 h2 h3 h4 h5 h6 h7 h8"
    val hot = spark.range(20000).select(col("id").as("doc_id"),
      concat(lit("u"), col("id"), lit("a u"), col("id"), lit("b "),
        lit(hotSpan), lit(" u"), col("id"), lit("c")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hot.count()

    // equivalence first (both corpora), then timing
    def canon(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val newReal = canon(graft.ops.Dedup.dedupSpansKeepFirst(real, "doc_id", "text", k = K))
    val oldReal = canon(oldForm(real, "doc_id", "text"))
    assert(newReal == oldReal, "guarded form diverged from r9 form on sf0.1 documents")
    val newHot = canon(graft.ops.Dedup.dedupSpansKeepFirst(hot, "doc_id", "text", k = K))
    val oldHot = canon(oldForm(hot, "doc_id", "text"))
    assert(newHot == oldHot, "guarded form diverged from r9 form on the hot corpus")
    println(s"[spanguard] equivalence: real ${newReal.size} docs, hot ${newHot.size} docs — identical under both forms")

    time("sf0.1 documents, r9 window form")(
      oldForm(real, "doc_id", "text").count())
    time("sf0.1 documents, r10 guarded form")(
      graft.ops.Dedup.dedupSpansKeepFirst(real, "doc_id", "text", k = K).count())
    time("hot-span corpus, r9 window form")(
      oldForm(hot, "doc_id", "text").count())
    time("hot-span corpus, r10 guarded form")(
      graft.ops.Dedup.dedupSpansKeepFirst(hot, "doc_id", "text", k = K).count())
    spark.stop()
  }
}
