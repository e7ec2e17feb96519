package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Sketch/profile aggregates: bounded-state summaries over the testdata. */
class SketchesSpec extends SparkSuite {
  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("exact and approx percentiles agree within tolerance") {
    val exact = Sketches.percentiles(li, "l_quantity", Seq(0.5))
      .collect()(0).getSeq[Double](0)
    val approx = Sketches.approxQuantiles(li, "l_quantity", Seq(0.5), 0.01)
      .collect()(0).getSeq[Double](0)
    assert(math.abs(exact.head - approx.head) <= 2.0, s"$exact vs $approx")
  }

  test("frequent items finds the dominant value") {
    val skewed = li.withColumn("k",
      when(col("l_orderkey") % 10 < 8, "hot").otherwise(concat(lit("cold"), col("l_orderkey"))))
    val freq = Sketches.frequentItems(skewed, Seq("k"), support = 0.5).collect()(0)
    assert(freq.getSeq[String](0).contains("hot"))
  }

  test("count-min sketch serializes; profile summarizes null rate and range") {
    val cms = Sketches.countMin(li, "l_returnflag").collect()(0)
    assert(cms.get(0) != null)
    val prof = Sketches.profile(li, "l_quantity").collect()(0)
    assert(prof.getLong(0) == li.count() && prof.getLong(1) == 0L)
    assert(prof.getDouble(3) == 1.0 && prof.getDouble(4) == 50.0)
  }
}
