package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Seen-keys Bloom sketch for incremental exact dedup ([[Dedup.seenFilter]]
  * / [[Dedup.mightBeSeen]] / [[Dedup.splitBySeenFilter]]): no false
  * negatives ever, bounded false positives, plan stays join-free. */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private lazy val corpus = (0L until 2000L).map(i => (i, s"doc body number $i"))
    .toDF("doc_id", "text")
  private lazy val fp = md5(col("text").cast("binary"))

  test("no false negatives: every ingested key reads as might-be-seen") {
    val bytes = Dedup.seenFilter(corpus, fp, expectedItems = 2000)
    val misses = corpus.filter(!Dedup.mightBeSeen(bytes, fp)).count()
    assert(misses == 0, s"$misses ingested keys claimed unseen — bloom false negative")
  }

  test("unseen keys mostly pass; false-positive rate near fpp") {
    val bytes = Dedup.seenFilter(corpus, fp, expectedItems = 2000, fpp = 0.01)
    val fresh = (10000L until 14000L).map(i => (i, s"brand new text $i"))
      .toDF("doc_id", "text")
    val flagged = fresh.filter(Dedup.mightBeSeen(bytes, fp)).count()
    // 4000 unseen keys at 1% nominal fpp — allow generous slack
    assert(flagged < 200, s"$flagged/4000 unseen keys flagged — fpp far above nominal")
  }

  test("splitBySeenFilter routes exactly: certain-new ∪ needs-verify = batch, disjoint") {
    val bytes = Dedup.seenFilter(corpus, fp, expectedItems = 2000)
    val batch = corpus.filter(col("doc_id") < 50) // 50 true dups
      .union(Seq((90000L, "never seen before A"), (90001L, "never seen before B"))
        .toDF("doc_id", "text"))
    val (fresh, verify) = Dedup.splitBySeenFilter(batch, bytes, fp)
    val freshIds = fresh.select("doc_id").as[Long].collect().toSet
    val verifyIds = verify.select("doc_id").as[Long].collect().toSet
    assert((freshIds intersect verifyIds).isEmpty)
    assert((freshIds union verifyIds) == batch.select("doc_id").as[Long].collect().toSet)
    // every true dup MUST land on the verify side
    assert((0L until 50L).forall(verifyIds.contains))
    // the two genuinely-new docs land on fresh unless a (rare) false positive
    assert(freshIds.contains(90000L) || freshIds.contains(90001L))
  }

  test("seenFilter sizes past Spark's 2^26-bit runtime-filter clamp (regression)") {
    // df.stat.bloomFilter (Spark 4) runs BloomFilterAggregate, which
    // silently clamps to 2^26 bits = 8,388,608 bytes — beyond ~7M keys at
    // 1% the sketch saturates and flags nearly everything (measured 99.8%
    // fpp at 50M keys). The direct build must honor the requested
    // capacity: 10M expected keys needs ~96M bits ≈ 12MB.
    val keys = spark.range(200000L).toDF("k")
    val bytes = Dedup.seenFilter(keys, col("k"), expectedItems = 10000000L)
    assert(bytes.length > 8388624,
      s"sketch is ${bytes.length} B — capped at Spark's 2^26-bit clamp")
    // fpp sanity at this occupancy (200k keys in 10M capacity): ~0
    val fresh = spark.range(500000L, 600000L).toDF("k")
    val flagged = fresh.filter(Dedup.mightBeSeen(bytes, col("k"))).count()
    assert(flagged < 1000, s"$flagged/100000 fresh keys flagged — sketch saturated")
    // and still no false negatives
    assert(keys.filter(!Dedup.mightBeSeen(bytes, col("k"))).count() == 0)
  }

  test("sharded sketch: no false negatives across shard boundaries") {
    // 2000 keys spread over 7 shards (a prime, so no accidental alignment
    // with the 32-thread partitioning); EVERY ingested key must probe
    // true — a key routed to shard i at build time must consult shard i
    // at probe time, whatever partition computed it
    val shards = Dedup.seenFilterSharded(corpus, fp, shards = 7,
      expectedItemsPerShard = 400)
    assert(shards.length == 7)
    val misses = corpus.repartition(13)
      .filter(!Dedup.mightBeSeenSharded(shards.toSeq, fp)).count()
    assert(misses == 0, s"$misses keys lost across shard boundaries")
    // unseen keys still mostly pass (each shard sized for its slice)
    val fresh = (10000L until 14000L).map(i => (i, s"brand new text $i"))
      .toDF("doc_id", "text")
    val flagged = fresh.filter(Dedup.mightBeSeenSharded(shards.toSeq, fp)).count()
    assert(flagged < 200, s"$flagged/4000 unseen keys flagged — sharded fpp broken")
    // agreement with the unsharded sketch on the definitely-new verdict:
    // both must clear the same genuinely-fresh batch join-free
    val one = Dedup.seenFilter(corpus, fp, expectedItems = 2000)
    val bothClear = fresh.filter(!Dedup.mightBeSeen(one, fp) &&
      !Dedup.mightBeSeenSharded(shards.toSeq, fp)).count()
    assert(bothClear > 3600)
  }

  test("sharded probe is map-only: no join or exchange in the filtered plan") {
    val shards = Dedup.seenFilterSharded(corpus, fp, shards = 4,
      expectedItemsPerShard = 600)
    val plan = corpus.filter(!Dedup.mightBeSeenSharded(shards.toSeq, fp))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join"),
      s"expected a join-free map plan, got:\n$plan")
  }

  test("seenFilter on an empty frame returns an empty sketch, not an error") {
    // a zero-partition RDD has nothing to treeReduce — regression for the
    // guard; the empty sketch must flag nothing and accept probes
    val empty = corpus.filter(col("doc_id") < 0).repartition(1).filter(lit(false))
    val bytes = Dedup.seenFilter(empty, fp, expectedItems = 100)
    assert(corpus.filter(Dedup.mightBeSeen(bytes, fp)).count() == 0)
  }

  test("probes built from equal-but-distinct shard bytes compare equal") {
    // case-class equality over Seq[Array[Byte]] was reference equality:
    // two probes deserialized/rebuilt from identical bytes never matched,
    // silently defeating semanticEquals/subexpression elimination. The
    // digest-based equals must see through distinct array instances.
    val shards = Dedup.seenFilterSharded(corpus, fp, shards = 4,
      expectedItemsPerShard = 600)
    val copies = shards.map(_.clone())
    val h = org.apache.spark.sql.catalyst.expressions.Literal(42L)
    val a = graft.expressions.BloomMightContainSharded(shards.toSeq, h)
    val b = graft.expressions.BloomMightContainSharded(copies.toSeq, h)
    assert(a == b && a.hashCode == b.hashCode,
      "equal shard bytes in distinct arrays must compare equal")
    val c = graft.expressions.BloomMightContainSharded(shards.toSeq.take(3), h)
    assert(a != c, "different shard sets must not compare equal")
  }

  test("256-shard probe stays inside whole-stage codegen (no interpreted fallback)") {
    // the old when-chain probe emitted one branch per shard with the
    // shard's bytes inlined in the generated source — at high shard
    // counts Janino's method limit forced interpreted fallback. The
    // single-expression probe must COMPILE at a realistic shard count:
    // with codegen.fallback off, a Janino failure throws instead of
    // silently interpreting.
    val shards = Dedup.seenFilterSharded(corpus, fp, shards = 256,
      expectedItemsPerShard = 64)
    assert(shards.length == 256)
    // probe over a Range scan, NOT the local Seq: ConvertToLocalRelation
    // evaluates any deterministic filter over a LocalRelation driver-side
    // at optimization time, which would bypass codegen entirely
    val probe = spark.range(2000)
      .select(concat(lit("doc body number "), col("id")).as("text"))
    val probeFp = md5(col("text").cast("binary"))
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val misses = probe
        .filter(!Dedup.mightBeSeenSharded(shards.toSeq, probeFp)).count()
      assert(misses == 0, s"$misses keys lost across 256 shard boundaries")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
    // and the plan is one codegen'd map stage — the `*(n)` prefix is the
    // WholeStageCodegen marker in simple-mode plan strings
    val plan = probe.filter(!Dedup.mightBeSeenSharded(shards.toSeq, probeFp))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"), s"probe fell out of codegen:\n$plan")
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join"))
  }

  test("splitBySeenFilterSharded routes exactly: certain-new ∪ needs-verify = batch, disjoint") {
    val shards = Dedup.seenFilterSharded(corpus, fp, shards = 7,
      expectedItemsPerShard = 400)
    val batch = corpus.filter(col("doc_id") < 50)
      .union(Seq((90000L, "never seen before A"), (90001L, "never seen before B"))
        .toDF("doc_id", "text"))
    val (fresh, verify) = Dedup.splitBySeenFilterSharded(batch, shards.toSeq, fp)
    val freshIds = fresh.select("doc_id").as[Long].collect().toSet
    val verifyIds = verify.select("doc_id").as[Long].collect().toSet
    assert((freshIds intersect verifyIds).isEmpty)
    assert((freshIds union verifyIds) == batch.select("doc_id").as[Long].collect().toSet)
    assert((0L until 50L).forall(verifyIds.contains))
    assert(freshIds.contains(90000L) || freshIds.contains(90001L))
  }

  test("probe is map-only: no join or exchange in the filtered plan") {
    val bytes = Dedup.seenFilter(corpus, fp, expectedItems = 2000)
    val plan = corpus.filter(!Dedup.mightBeSeen(bytes, fp))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join"),
      s"expected a join-free map plan, got:\n$plan")
  }
}
