object OneQ {
  def main(a: Array[String]): Unit = {
    val (name, sf, out) = (a(0), a(1), a(2))
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sf).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/$name")
    val sql = graft.SparkEntry.oracleSql.get(name)
      .map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .getOrElse("null")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      s"""{"$name": ${sql}}""")
    spark.stop()
  }
}
