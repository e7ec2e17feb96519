package graft.expressions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV ("k minimum values") theta sketch aggregate (Bar-Yossef et al. 2002;
  * the DataSketches theta-sketch family): keeps the `k` smallest DISTINCT
  * 64-bit hash values seen, under UNSIGNED order. Partial-aggregable — each
  * map task maintains its own bounded tree and only `≤ k` longs per partial
  * cross the exchange, so a corpus-scale distinct-cardinality / set-algebra
  * question never shuffles raw keys (the property HLL has for pure counting,
  * extended here to union/intersection/difference estimates).
  *
  * Input: a LongType hash column (callers apply `xxhash64` — keeping the
  * hash outside lets one sketch feed many key shapes). Output: the sorted
  * `array<long>` of retained values, each offset by `Long.MinValue` so that
  * SIGNED order equals unsigned hash order — downstream Column ops
  * (`array_intersect`, comparisons, `slice`) then work directly; see
  * `Sketches.kmv*` for the estimator algebra. When the input has fewer than
  * `k` distinct hashes the sketch is EXACT (it holds every distinct hash),
  * which is what lets the DuckDB oracle pin it bit-for-bit at gate scale.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"kmv sketch size k must be positive, got $k")

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  /** Flip the sign bit: signed order of the stored value == unsigned order
    * of the original hash. */
  @inline private def flip(h: Long): Long = h ^ Long.MinValue

  private def addBounded(buf: JTreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }
  }

  override def update(buf: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) addBounded(buf, flip(v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: JTreeSet[java.lang.Long], other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) addBounded(buf, it.next())
    buf
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a LongType hash input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
}
