package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class IntegritySpec extends SparkSuite {
  import spark.implicits._

  private def parent = Seq((1L, "a"), (2L, "b")).toDF("pk", "x")

  test("fkOrphans: missing keys and null keys are orphans by default") {
    val child = Seq(Some(1L), Some(3L), None).toDF("fk")
    val out = Integrity.fkOrphans(child, parent, Seq("fk"), Seq("pk"))
      .as[Option[Long]].collect().toSet
    assert(out == Set(Some(3L), None))
  }

  test("fkOrphans: ignoreNullKeys exempts nullable FKs") {
    val child = Seq(Some(1L), Some(3L), None).toDF("fk")
    val out = Integrity.fkOrphans(child, parent, Seq("fk"), Seq("pk"),
      ignoreNullKeys = true).as[Option[Long]].collect().toSet
    assert(out == Set(Some(3L)))
  }

  test("fkOrphans: duplicate parent keys don't duplicate children") {
    val p = Seq(1L, 1L, 1L).toDF("fk")
    val child = Seq(1L, 2L).toDF("fk")
    val out = Integrity.fkOrphans(child, p, Seq("fk")).as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("dupKeys reports only violating groups with counts") {
    val df = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k")
    val out = Integrity.dupKeys(df, Seq("k")).orderBy("k")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 3L)))
  }

  test("summary counts rows, distinct/null keys, orphans, dup groups") {
    val child = Seq(Some(1L), Some(1L), Some(3L), None).toDF("fk")
    val row = Integrity.summary(child, parent, Seq("fk"), Seq("pk")).head()
    assert(row.getAs[Long]("n_rows") == 4 && row.getAs[Long]("n_distinct_keys") == 2)
    assert(row.getAs[Long]("n_null_keys") == 1 && row.getAs[Long]("n_orphans") == 1)
    assert(row.getAs[Long]("n_dup_keys") == 1)
  }
}
