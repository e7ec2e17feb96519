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
  * plan reference. Here the generated code is a constant-size virtual
  * call, so codegen survives at ANY shard count — and the codegen
  * `references` entry is THIS expression instance itself (the
  * `CodegenFallback` pattern), not a second copy of the filters: the
  * expression-tree node and the references entry are one shared object
  * in the task's single serialization stream, so the serialized shard
  * bytes ship once per task, and the deserialized filters are
  * `@transient lazy` — rebuilt at most once per executor instance,
  * never per row.
  *
  * Child must be the LongType hash the keys were inserted under (xxhash64
  * on both sides — see [[graft.ops.Dedup.mightBeSeenSharded]]).
  *
  * Equality compares an MD5 digest of the shard bytes (plus the child),
  * not the `Seq[Array[Byte]]` itself — array reference equality would
  * make semantically identical probes compare unequal, silently
  * defeating `semanticEquals`/subexpression elimination when a probe
  * column is reused.
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

  @transient private lazy val shardDigest: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    shardBytes.foreach { b =>
      md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length).array())
      md.update(b)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  override def equals(other: Any): Boolean = other match {
    case that: BloomMightContainSharded =>
      child == that.child && shardBytes.length == that.shardBytes.length &&
        shardDigest == that.shardDigest
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(prettyName, child, shardDigest)

  /** Row-level probe, shared by interpreted and generated paths. */
  def probe(h: Long): Boolean = {
    val n = filters.length
    filters((((h % n) + n) % n).toInt).mightContainLong(h)
  }

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shardedBloomProbe", this,
      classOf[BloomMightContainSharded].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $self.probe($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainSharded =
    copy(child = newChild)
}
