package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSuite
import graft.{filters => F}

/** Source/sink surface: validated CSV/JSON ingest and quarantine egress. */
class ValidatedIOSpec extends SparkSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_io").toFile.getAbsolutePath

  test("csv ingest validates at the boundary") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"),
      "id,name\n1,alice\n2,\n3,bob\n")
    val schema = StructType.fromDDL("id INT, name STRING")
    val res = ValidatedIO.csv(spark, s"$dir/in.csv", schema)("name" -> F.Required())
    assert(res.valid.count() == 2 && res.invalid.count() == 1)
  }

  test("json ingest with typed schema and chained validation") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(dir, "in.json"),
      """{"id": 1, "v": "  ok  "}
        |{"id": 2, "v": null}
        |""".stripMargin)
    val schema = StructType.fromDDL("id INT, v STRING")
    val res = ValidatedIO.json(spark, s"$dir/in.json", schema)(
      "v" -> (F.Required() | F.Strip()))
    val rows = res.valid.select("v").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ok"))
    assert(res.invalid.count() == 1)
  }

  test("json corrupt-record quarantine survives count-only pruning") {
    // regression: the JSON file source raises
    // QUERY_ONLY_CORRUPT_RECORD_COLUMN when a pruned plan (a bare count()
    // over either split) references only the corrupt column — the bench
    // harness does exactly that, so corrupt-schema reads route through
    // from_json over a text scan instead
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(dir, "in.json"),
      """{"id": 1, "v": "ok"}
        |
        |{"id": "not-a-number", "v": "cast failure"}
        |this line is not json
        |{"id": 3, "v": null}
        |""".stripMargin)
    val schema = StructType.fromDDL("id BIGINT, v STRING, _corrupt_record STRING")
    val res = ValidatedIO.json(spark, s"$dir/in.json", schema)(
      "_corrupt_record" -> F.Empty())
    // count() on both splits: the exact shape the file source rejects
    assert(res.valid.count() == 2)   // blank line skipped like the file source
    assert(res.invalid.count() == 2) // cast failure + malformed line
    assert(res.valid.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // the cleaned frame nulls the flagged value (filter protocol), so the
    // quarantine evidence lives in _errors, not the cleaned column
    val errs = res.invalid.selectExpr("to_json(_errors)").collect().map(_.getString(0))
    assert(errs.forall(_.contains("\"code\":\"not_empty\"")))
    // the cast-failure row keeps its parseable sibling fields (PERMISSIVE)
    assert(res.invalid.select("v").collect().map(_.getString(0))
      .contains("cast failure"))
  }

  test("csv corrupt-record quarantine survives count-only pruning") {
    // regression (r12 bench n_failed=1): the CSV file source raises the
    // same QUERY_ONLY_CORRUPT_RECORD_COLUMN as JSON when a pruned plan
    // (the bench's bare count() over the valid split, whose filter is on
    // _corrupt_record alone) references only the corrupt column — so
    // corrupt-schema CSV reads route through from_csv over a text scan
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"),
      "id,name\n1,alice\n\nnot-a-number,bob\n3,carol\n")
    val schema = StructType.fromDDL("id BIGINT, name STRING, _corrupt_record STRING")
    val res = ValidatedIO.csv(spark, s"$dir/in.csv", schema,
      Map("header" -> "true"))("_corrupt_record" -> F.Empty())
    // count() on both splits: the exact shape the file source rejects
    assert(res.valid.count() == 2)   // header + blank line both dropped
    assert(res.invalid.count() == 1) // the BIGINT cast failure
    assert(res.valid.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // PERMISSIVE keeps the parseable sibling field on the quarantined row
    assert(res.invalid.select("name").collect().map(_.getString(0)).toSeq == Seq("bob"))
  }

  test("avro ingest roundtrips types and validates at the boundary") {
    val dir = tmpDir()
    import spark.implicits._
    Seq((1L, Some("ok"), 1.5), (2L, None, -0.25), (3L, Some("x"), 0.0))
      .toDF("id", "v", "d")
      .write.mode("overwrite").format(ValidatedIO.AvroFormat).save(s"$dir/a")
    val res = ValidatedIO.avro(spark, s"$dir/a", "v" -> F.Required())
    assert(res.valid.count() == 2 && res.invalid.count() == 1)
    // doubles roundtrip bit-exactly (Avro stores IEEE natively)
    assert(res.valid.select("d").as[Double].collect().sorted.toSeq == Seq(0.0, 1.5))
  }

  test("xml ingest: explicit schema, absent elements null, validation") {
    val dir = tmpDir()
    import spark.implicits._
    Seq((1L, Some("ok"), Some(2.5)), (2L, None, None))
      .toDF("id", "v", "d")
      .write.mode("overwrite").option("rootTag", "rows").option("rowTag", "r")
      .format("xml").save(s"$dir/x")
    val schema = StructType.fromDDL("id BIGINT, v STRING, d DOUBLE")
    val res = ValidatedIO.xml(spark, s"$dir/x", "r", schema)("v" -> F.Required())
    assert(res.valid.count() == 1 && res.invalid.count() == 1)
    val row = res.valid.select("id", "v", "d").as[(Long, String, Double)].head()
    assert(row == ((1L, "ok", 2.5)))
    // the writer omitted row 2's null fields; the schema read nulls them
    assert(res.invalid.select("d").filter(col("d").isNull).count() == 1)
  }

  test("quarantine sink splits valid/invalid with serialized errors") {
    val dir = tmpDir()
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "")).toDF("id", "v")
    val res = graft.core.Validate(df, "v" -> F.Required())
    ValidatedIO.writeQuarantined(res, s"$dir/ok", s"$dir/bad")
    assert(spark.read.parquet(s"$dir/ok").count() == 1)
    val bad = spark.read.parquet(s"$dir/bad")
    assert(bad.count() == 1)
    val err = bad.select("_errors").collect()(0).getString(0)
    assert(err.contains("\"code\":\"empty\""))
  }

  test("parquet ingest over testdata") {
    val res = ValidatedIO.parquet(spark, "/root/testdata/sf0.001/documents.parquet",
      "text" -> F.Required())
    assert(res.valid.count() == 500)
  }

  test("streaming parquet source validates with the same specs") {
    // file-stream sources need a directory; stage the single parquet file
    val dir = tmpDir()
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(dir, "part-0.parquet"))
    val schema = spark.read.parquet(s"$dir").schema
    val res = ValidatedIO.streamParquet(spark, dir,
      schema, "text" -> F.Required())
    assert(res.df.isStreaming)
    val q = res.valid.writeStream.format("memory").queryName("vio_out")
      .outputMode("append").start()
    q.processAllAvailable()
    val n = spark.table("vio_out").count()
    q.stop()
    assert(n == 500)
  }

  test("writeAudited publishes only when every expectation passes") {
    import spark.implicits._
    val dir = tmpDir()
    val path = s"$dir/table"
    val good = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val r1 = ValidatedIO.writeAudited(good, path, Seq(
      ValidatedIO.Expect.rowCountBetween(1),
      ValidatedIO.Expect.noNulls("id", "v"),
      ValidatedIO.Expect.unique("id")))
    assert(r1.published && r1.nRows == 3 && r1.failures.isEmpty)
    assert(spark.read.parquet(path).count() == 3)
    // a failing batch must NOT replace the published data, and must
    // clean its staging directory
    val bad = Seq((1L, "x"), (1L, null: String)).toDF("id", "v")
    val r2 = ValidatedIO.writeAudited(bad, path, Seq(
      ValidatedIO.Expect.noNulls("v"),
      ValidatedIO.Expect.unique("id"),
      ValidatedIO.Expect.rowCountBetween(3)))
    assert(!r2.published && r2.failures.size == 3)
    assert(spark.read.parquet(path).count() == 3, "old publish must survive")
    assert(spark.read.parquet(path).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("table."))
    assert(leftovers.isEmpty, s"staging/trash must be cleaned: ${leftovers.toSeq}")
    // republish over an existing table swaps contents
    val next = Seq((9L, "z")).toDF("id", "v")
    val r3 = ValidatedIO.writeAudited(next, path, Seq(
      ValidatedIO.Expect.rowCountBetween(1, 1)))
    assert(r3.published)
    assert(spark.read.parquet(path).as[(Long, String)].collect().toSeq ==
      Seq((9L, "z")))
  }

  test("parquetWithLineage: basename + per-file row position from the file index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lineage").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir + "/p1")
    Seq((3L, "c")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(dir + "/p2")
    // read both subdirs as one dataset
    val out = ValidatedIO.parquetWithLineage(spark, dir + "/p*")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(out.length == 3)
    // every basename is a real part file, row positions restart per file
    assert(out.forall { case (_, f, _) => f.startsWith("part-") && f.endsWith(".parquet") })
    val byFile = out.groupBy(_._2)
    assert(byFile.size == 2)
    assert(byFile.values.forall(rows => rows.map(_._3).sorted.sameElements(0L until rows.length)))
  }
}
