package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** [[Similarity.meanPool]]: exact means on hand vectors, partial-merge
  * correctness across partitions, null handling, dimension-mismatch
  * loudness. */
class MeanPoolSpec extends SparkSuite {
  import spark.implicits._

  test("element-wise mean, exact on hand vectors across 8 partitions") {
    val df = Seq(
      ("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)), ("a", Seq(5.0, 6.0)),
      ("b", Seq(10.0, 0.0))
    ).toDF("g", "v").repartition(8)
    val got = Similarity.meanPool(df, Seq("g"), "v").orderBy("g").collect()
    assert(got(0).getString(0) == "a" &&
      got(0).getSeq[Double](1) == Seq(3.0, 4.0) && got(0).getLong(2) == 3L)
    assert(got(1).getString(0) == "b" &&
      got(1).getSeq[Double](1) == Seq(10.0, 0.0) && got(1).getLong(2) == 1L)
  }

  test("null vectors are skipped; an all-null group pools to null, n = 0") {
    val df = Seq(
      ("a", Some(Seq(2.0, 2.0))), ("a", None),
      ("c", None)
    ).toDF("g", "v")
    val got = Similarity.meanPool(df, Seq("g"), "v").orderBy("g").collect()
    assert(got(0).getSeq[Double](1) == Seq(2.0, 2.0) && got(0).getLong(2) == 1L)
    assert(got(1).isNullAt(1) && got(1).getLong(2) == 0L)
  }

  test("dimension mismatch throws instead of silently truncating") {
    val df = Seq(("a", Seq(1.0, 2.0)), ("a", Seq(1.0))).toDF("g", "v").coalesce(1)
    val ex = intercept[Exception] {
      Similarity.meanPool(df, Seq("g"), "v").collect()
    }
    assert(ex.getMessage != null)
  }

  test("float input upcasts exactly; agrees with a driver-side reference") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("label") === 3)
    val got = Similarity.meanPool(emb, Seq("label"), "embedding")
      .head().getSeq[Double](1)
    val rows = emb.select("embedding").collect().map(_.getSeq[Float](0).toSeq)
    val ref = rows.toSeq.transpose.map(cs => cs.map(_.toDouble).sum / rows.length)
    got.zip(ref).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }
}
