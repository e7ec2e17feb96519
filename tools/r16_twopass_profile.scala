// Stage-by-stage decomposition of q_twopass (r16 optimization round).
// Run like tools/r16_time.scala.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
spark.sparkContext.setLogLevel("ERROR")
val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
def t[A](name: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $name%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
}
def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
val docs = spark.read.parquet(s"$dir/documents.parquet")
val crawl = docs.select(col("doc_id"),
  concat(lit("https://www.crawl"), pmod(col("doc_id"), lit(50)).cast("string"),
    lit(".co.uk/d/"), col("doc_id").cast("string")).as("url"),
  concat(lit("crawl"), pmod(col("doc_id"), lit(50)).cast("string"),
    lit(" home about contact navigation\n"), col("text")).as("text"))
for (rep <- 1 to 2) {
  println(s"=== rep $rep ===")
  t("crawl scan")(noop(crawl))
  val allowed = graft.ops.Urls.filterBlockedDomains(crawl, "url", Seq("blocked.example.com"))
  t("1 blocklist")(noop(allowed))
  val byUrl1 = graft.ops.Urls.dedupByUrl(allowed, "url", "doc_id")
    .withColumn("domain", graft.ops.Urls.registrableDomain(col("url")))
  t("2 urlDedup+domain")(noop(byUrl1))
  val byUrlPin = t("pin byUrl")(byUrl1.localCheckpoint())
  val meta = byUrlPin.select(col("doc_id"), col("url_canonical"), col("domain"))
  val deboiled = graft.ops.Boilerplate.removeFrequentLinesByStratum(
    byUrlPin, "doc_id", "domain", "text", minDocs = 3L, delim = "\n", joinSep = "\n")
  t("3 boilerplate")(noop(deboiled))
  val unitDeduped = graft.ops.Dedup.dedupUnitsKeepFirst(deboiled, "doc_id", "text_clean",
    delim = "\n", joinSep = "\n")
  t("4 unitDedup")(noop(unitDeduped))
  val w = org.apache.spark.sql.expressions.Window
    .partitionBy(md5(col("text_clean").cast("binary"))).orderBy(col("doc_id"))
  val first = unitDeduped.withColumn("__rn", row_number().over(w))
    .filter(col("__rn") === 1).drop("__rn")
    .join(meta, Seq("doc_id"))
    .select(col("doc_id"), col("url_canonical"), col("domain"), col("text_clean"))
  t("5 exactDedup+join (first pass out)")(noop(first))
  val seam = t("pin seam")(first.localCheckpoint())
  val docs2 = seam.withColumnRenamed("text_clean", "text")
    .withColumn("lang", lit(null).cast("string"))
  val validated = graft.core.Validate(docs2,
    "text" -> (graft.filters.Macros.cleanText | graft.filters.MinLength(20)),
    "lang" -> (graft.filters.Optional("und") | graft.filters.CaseFold() | graft.filters.MaxLength(8))).valid
  t("6 validate")(noop(validated))
  val scored = validated
    .withColumn("lang_guess", graft.ops.TextAnalysis.languageId(col("text")))
    .withColumn("quality", graft.ops.TextAnalysis.qualityScore(col("text")))
    .withColumn("n_tokens", graft.ops.TextAnalysis.tokenCount(col("text")))
    .filter(col("quality") >= 0.3)
  t("7 score+gate")(noop(scored))
  val fingerprinted = scored.withColumn("fp", graft.ops.TextAnalysis.fingerprintMd5(col("text")))
  val exactDeduped0 = fingerprinted
    .withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy("doc_id")))
    .filter(col("__rn") === 1).drop("__rn")
  t("8 exact fp dedup")(noop(exactDeduped0))
  val exactDeduped = t("pin exactDeduped")(exactDeduped0.localCheckpoint())
  val nearDups = graft.ops.Dedup.minhashNearDups(exactDeduped, "doc_id", "text",
    numHashes = 64, threshold = 0.9, maxBucket = 32)
  t("9 minhashNearDups")(noop(nearDups))
  val out = graft.ops.Clusters.dropNearDupClusters(exactDeduped, nearDups, "doc_id")
  t("10 dropNearDupClusters")(noop(out))
  t("TOTAL as one query (count)")(
    (graft.SparkEntry.queries("q_twopass"))(spark, dir).count())
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
}
System.exit(0)
