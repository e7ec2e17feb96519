package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scratch profiler: stage-level timing of the minhash near-dup path at a
  * given SF dir (not part of the suite — run via Test/runMain). */
object ProfileDedup {
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
    spark.sparkContext.setCheckpointDir("/tmp/graft-profile-ckpt")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[profile] docs=${docs.count()}")

    // warm the JVM/codegen once
    time("warmup full q_dedup_minhash") {
      Dedup.minhashNearDups(docs, "doc_id", "text", numHashes = 64, threshold = 0.9)
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 3) {
      time(s"run $i full q_dedup_minhash") {
        Dedup.minhashNearDups(docs, "doc_id", "text", numHashes = 64, threshold = 0.9)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // stage decomposition
    val filtered = docs.filter(col("text").isNotNull)
    time("signature kernel only") {
      filtered.select(col("doc_id"), Dedup.minhashSignature(col("text"), 64).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("sig + window collapse") {
      val idSig = filtered.select(col("doc_id").as("id"),
        Dedup.minhashSignature(col("text"), 64).as("sig"))
      idSig.withColumn("rep", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sig")))
        .write.format("noop").mode("overwrite").save()
    }
    // inline replica of nearDupsBySignature's guarded path, stage by stage
    locally {
      import org.apache.spark.sql.expressions.Window
      val bands = 8; val rowsPerBand = 8; val maxBucket = 64; val threshold = 0.9
      val idSig = filtered.select(col("doc_id").as("id"),
        Dedup.minhashSignature(col("text"), 64).as("sig"))
      val collapsed = time("A collapse + localCheckpoint") {
        idSig.withColumn("rep", min(col("id")).over(Window.partitionBy("sig")))
          .localCheckpoint()
      }
      val starPairs = collapsed.filter(col("id") =!= col("rep"))
        .select(col("rep").as("id_a"), col("id").as("id_b"), lit(1.0).as("jaccard_est"))
      val reps = collapsed.filter(col("id") === col("rep"))
        .select(col("id"), col("sig"))
        .withColumn("bhs", Dedup.minhashBands(col("sig"), bands, rowsPerBand))
      val guarded = time("B guard stats + localCheckpoint") {
        val slim = reps.select(col("id"), posexplode(col("bhs")).as(Seq("band", "h")))
        val wide = slim.groupBy("band", "h").count()
          .filter(col("count") > maxBucket)
          .select(col("band"), col("h"), ceil(col("count") / maxBucket).cast("int").as("splits"))
        val wideIds = slim.join(wide, Seq("band", "h"))
          .groupBy("id")
          .agg(map_from_entries(collect_list(struct(col("band"), col("splits")))).as("wm"))
        reps.join(wideIds, Seq("id"), "left")
          .withColumn("subs", transform(sequence(lit(0), lit(bands - 1)),
            j => when(col("wm").isNull, lit(0)).otherwise(coalesce(
              pmod(xxhash64(col("sig"), j), element_at(col("wm"), j).cast("long"))
                .cast("int"), lit(0)))))
          .drop("wm").localCheckpoint()
      }
      time("C band join + agreement + union") {
        val banded = guarded.select(col("id"), col("sig"), col("bhs"), col("subs"),
          posexplode(arrays_zip(col("bhs"), col("subs"))).as(Seq("band", "z")))
          .select(col("id"), col("sig"), col("bhs"), col("subs"), col("band"),
            col("z.bhs").as("h"), col("z.subs").as("sub"))
        val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
          col("bhs").as("bhs_a"), col("subs").as("subs_a"), col("band"), col("h"), col("sub"))
        val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
          col("bhs").as("bhs_b"), col("subs").as("subs_b"), col("band"), col("h"), col("sub"))
        val dupEarlier = (1 until bands).foldLeft(when(col("band") === 0, lit(false))) {
          case (acc, bIdx) => acc.when(col("band") === bIdx,
            (0 until bIdx).map(j =>
              col("bhs_a").getItem(j) === col("bhs_b").getItem(j) &&
                col("subs_a").getItem(j) === col("subs_b").getItem(j)).reduce(_ || _))
        }
        val joined = a.join(b, Seq("band", "h", "sub"))
          .filter(col("id_a") < col("id_b") && !dupEarlier)
          .select(col("id_a"), col("id_b"),
            graft.expressions.native.sigAgreement(col("sig_a"), col("sig_b")).as("jaccard_est"))
          .filter(col("jaccard_est") >= threshold)
        starPairs.unionByName(joined)
          .write.format("noop").mode("overwrite").save()
      }
    }
    for (cap <- Seq(32, 64)) {
      time(s"full minhash maxBucket=$cap") {
        Dedup.minhashNearDups(docs, "doc_id", "text", numHashes = 64,
          threshold = 0.9, maxBucket = cap)
          .write.format("noop").mode("overwrite").save()
      }
      val n = Dedup.minhashNearDups(docs, "doc_id", "text", numHashes = 64,
        threshold = 0.9, maxBucket = cap).count()
      println(s"[profile] pairs at maxBucket=$cap: $n")
    }
    time("pipeline e2e warm") {
      graft.examples.TrainingDataPipeline.curate(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("pipeline e2e warm 2") {
      graft.examples.TrainingDataPipeline.curate(docs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
