package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a SHARDED seen-keys sketch
  * ([[graft.ops.Dedup.seenFilterSharded]]): routes the already-hashed key
  * to its shard (`((h % n) + n) % n` — the same floor-mod as `pmod`, and
  * the same routing the build used) and probes exactly that shard's
  * filter.
  *
  * One expression for the WHOLE shard set, replacing the previous
  * `when`-chain probe (one branch per shard, each inlining its filter's
  * serialized bytes into the generated source): at the permitted maximum
  * of 4096 shards that chain blew past Janino's 64 KB method limit into
  * interpreted fallback with the multi-GB sketch set embedded once per
  * plan reference. Here the generated code is a constant-size array index
  * + virtual call — the deserialized filters live in the codegen
  * `references` array (`addReferenceObj`, the same mechanism Spark's own
  * `BloomFilterMightContain` uses), so codegen survives at ANY shard
  * count and the plan carries the bytes exactly once.
  *
  * Child must be the LongType hash the keys were inserted under (xxhash64
  * on both sides — see [[graft.ops.Dedup.mightBeSeenSharded]]). Filters
  * deserialize lazily once per (de)serialized expression instance, never
  * per row.
  */
case class BloomMightContainSharded(shardBytes: Seq[Array[Byte]],
                                    child: Expression)
    extends UnaryExpression {

  require(shardBytes.nonEmpty, "empty shard set")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_sharded"

  @transient private lazy val filters: Array[BloomFilter] =
    shardBytes.map(b =>
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))).toArray

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    val n = filters.length
    filters((((h % n) + n) % n).toInt).mightContainLong(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fs = ctx.addReferenceObj("shardedBloomFilters", filters,
      "org.apache.spark.util.sketch.BloomFilter[]")
    val n = filters.length
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = $fs[(int) ((($h % ${n}L) + ${n}L) % ${n}L)].mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainSharded =
    copy(child = newChild)
}
