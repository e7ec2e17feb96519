package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise vector-sum aggregate over `array<double>` rows (state =
  * one running double[] + a row count), the primitive behind mean-pooled
  * embeddings (chunk → document pooling, cluster centroids, domain
  * embedding profiles). Partial-aggregable: each map task reduces its rows
  * to ONE dim-length vector, so the exchange carries partials, never rows —
  * the property that makes pooling a million-chunk corpus a map-side
  * reduction instead of a groupBy-collect.
  *
  * Output: `struct(sum array<double>, n long)` — callers divide for the
  * mean (`Similarity.meanPool`) so one aggregate serves sum, mean and
  * weighted recombination. Null rows are skipped; the first non-null row
  * fixes the dimension and a later mismatched dimension throws (silent
  * truncation would corrupt every downstream cosine).
  */
case class ArraySumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArraySumAgg.Buf]
  with UnaryLike[Expression] {

  import ArraySumAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(null, 0L)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sum == null) buf.sum = new Array[Double](n)
      else require(buf.sum.length == n,
        s"array_sum: dimension mismatch (${buf.sum.length} vs $n)")
      var i = 0
      while (i < n) { buf.sum(i) += arr.getDouble(i); i += 1 }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    if (other.sum != null) {
      if (buf.sum == null) { buf.sum = other.sum.clone(); buf.n = other.n }
      else {
        require(buf.sum.length == other.sum.length,
          s"array_sum: dimension mismatch (${buf.sum.length} vs ${other.sum.length})")
        var i = 0
        while (i < buf.sum.length) { buf.sum(i) += other.sum(i); i += 1 }
        buf.n += other.n
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    if (buf.sum == null) null
    else InternalRow(new GenericArrayData(buf.sum), buf.n)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val n = if (buf.sum == null) -1 else buf.sum.length
    val bb = ByteBuffer.allocate(4 + 8 + math.max(n, 0) * 8)
    bb.putInt(n).putLong(buf.n)
    if (n > 0) buf.sum.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val cnt = bb.getLong
    if (n < 0) new Buf(null, cnt)
    else {
      val arr = new Array[Double](n)
      var i = 0
      while (i < n) { arr(i) = bb.getDouble; i += 1 }
      new Buf(arr, cnt)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ArraySumAgg =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_sum expects array<double>, got $other")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sum", ArrayType(DoubleType, containsNull = false)),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "array_sum"
}

object ArraySumAgg {
  /** Mutable aggregation state: running element-wise sum + row count. */
  final class Buf(var sum: Array[Double], var n: Long)
}
