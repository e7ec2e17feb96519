package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Int8 embedding quantization ([[Similarity.quantizeInt8]]): code range,
  * reference-formula pin, round-trip error bound, cosine preservation. */
class QuantizeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codes in [-127,127]; reference formula matches element-wise") {
    val rows = Seq((1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("id", "v")
    val out = rows.select(col("id"), Similarity.quantizeInt8(col("v")).as("qs"))
      .select(col("id"), col("qs.scale"), col("qs.q"))
      .as[(Long, Double, Seq[Int])].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    val (s1, q1) = out(1L)
    assert(math.abs(s1 - 1.0 / 127.0) < 1e-15)
    assert(q1 == Seq(64, -127, 32, 0)) // floor(0.5*127+0.5)=64, floor(31.75+0.5)=32
    val (s2, q2) = out(2L)
    assert(s2 == 0.0 && q2 == Seq(0, 0)) // null vector → zeros
  }

  test("dotI is NULL on dimension mismatch (data error surfaces, not silent 0)") {
    val rows = Seq((1L, Seq(1, 2, 3), Seq(4, 5, 6)), (2L, Seq(1, 2), Seq(1, 2, 3)))
      .toDF("id", "a", "b")
      .select(col("id"), graft.expressions.native.dotI(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L).contains(32L))
    assert(rows(2L).isEmpty, "mismatched dims must score NULL, not 0")
    // same through the SQL registration path
    graft.GraftFunctions.register(spark)
    val sql = spark.sql("SELECT dot_i(array(1,2), array(1,2,3)) AS d").collect()(0)
    assert(sql.isNullAt(0))
  }

  test("round-trip error bounded by scale/2 per element") {
    val qd = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
      Similarity.quantizeInt8(col("embedding")).as("qs"))
      .withColumn("back", Similarity.dequantize(col("qs")))
      .withColumn("maxerr", aggregate(zip_with(col("v"), col("back"), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)))
      .select(col("maxerr"), col("qs.scale").as("s"))
      .as[(Double, Double)].collect()
    qd.foreach { case (err, s) => assert(err <= s / 2 + 1e-12, s"err $err vs scale $s") }
  }

  test("quantizedTopK ranks like float cosine top-k (high agreement on testdata)") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", 3)
      .select("q_id", "cand_id").as[(Long, Long)].collect().toSet
    // int8 cosine is a close approximation: expect ≥ 2/3 of the exact
    // top-3 pairs to survive quantized ranking on near-orthogonal data
    val agree = (exact intersect quant).size.toDouble / exact.size
    assert(agree >= 0.6, s"only $agree of exact top-k survived quantization: $quant vs $exact")
  }

  test("cosine on dequantized vectors tracks the original within 2e-2") {
    val a = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("ia"), col("embedding").cast("array<double>").as("va"),
        Similarity.dequantize(Similarity.quantizeInt8(col("embedding"))).as("da"))
    val b = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("ib"), col("embedding").cast("array<double>").as("vb"),
        Similarity.dequantize(Similarity.quantizeInt8(col("embedding"))).as("db"))
    val errs = a.crossJoin(b)
      .select((Similarity.cosine(col("va"), col("vb"))
        - Similarity.cosine(col("da"), col("db"))).as("d"))
      .as[Double].collect()
    errs.foreach(d => assert(math.abs(d) < 0.02, s"cosine drift $d"))
  }
}
