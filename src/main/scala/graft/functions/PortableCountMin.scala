package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{col => _, _}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable count-min sketch — the heavy-hitters / frequency
  * member of the sketch family (distinct = [[PortableHll]] a03,
  * quantiles = a02, frequency = this).
  *
  * Like [[PortableHll]], every ingredient is pinned so a second engine
  * can rebuild the identical sketch in SQL:
  *
  *  - [[PortableCountMin.depth]] hash rows; row `d`'s hash of value `s`
  *    is md5("d:s") (the value's string form — caller casts);
  *  - bucket = first md5 byte, i.e. the first two hex chars as an
  *    integer in [0, 256) — exactly [[PortableCountMin.width]] buckets,
  *    so the SQL twin is strpos arithmetic on two hex chars (the a03
  *    register trick);
  *  - state = depth × width exact BIGINT counters, laid out row-major
  *    `(d, bucket)`; update adds 1 to one counter per row, merge is
  *    elementwise add — commutative, so the sketch is partition- and
  *    order-invariant and hash-comparable across engines;
  *  - point estimate for key k = min over d of counter[d][bucket_d(k)]
  *    (computed by the caller via [[PortableCountMin.estimate]]) — the
  *    classic count-min upper bound: ≥ true count, with overestimate
  *    bounded by collisions.
  *
  * Scale: the partial-aggregate state is depth·width longs (8 KB) per
  * group regardless of input size — the whole point of sketching a
  * 100 TB stream.
  */
case class PortableCountMin(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import PortableCountMin._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_portable_cms"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  // task-local digest (see PortableHll — per-row getInstance is a
  // measurable JCA lookup cost on wide partitions)
  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var d = 0
      while (d < depth) {
        md.reset()
        // md5 of the string "d:value" — matches md5(concat_ws(':', d, k))
        md.update(prefixes(d))
        val digest = md.digest(bytes)
        buf(d * width + (digest(0) & 0xff)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): PortableCountMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PortableCountMin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PortableCountMin =
    copy(child = newChildren.head)
}

object PortableCountMin {
  /** Hash rows: 4 independent md5 families. */
  val depth = 4
  /** Buckets per row: first md5 byte — uniform, SQL-expressible. */
  val width = 256

  /** Pre-encoded "d:" prefixes (ASCII) for the per-row digests. */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(d => s"$d:".getBytes("UTF-8"))

  /** Column API: input must be the value's STRING form (caller casts). */
  def portableCms(c: Column): Column = ColumnBridge.column(
    PortableCountMin(ColumnBridge.expression(c)).toAggregateExpression())

  /** Bucket of `key` under hash row `d` as a Column — the same first-two
    * hex chars the aggregate uses, via codegen'd conv(). */
  def bucket(d: Int, key: Column): Column =
    conv(substring(md5(concat_ws(":", lit(d), key)), 1, 2), 16, 10).cast("int")

  /** Count-min point estimate of `key` against a sketch column (the
    * array this aggregate returns): min over rows of the hit counter. */
  def estimate(sketch: Column, key: Column): Column =
    least((0 until depth).map(d =>
      element_at(sketch, bucket(d, key) + d * width + 1)): _*)
}
