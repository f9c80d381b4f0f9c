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

/** Engine-portable Bloom filter — the MEMBERSHIP member of the sketch
  * family (distinct = [[PortableHll]] a03, frequency =
  * [[PortableCountMin]] a04, quantiles = a05, membership = this). The
  * 100 TB use is the semi-join pre-filter: build the filter over the
  * small side's keys once, broadcast ~1 KB, and drop the provable
  * non-matches map-side before any shuffle of the big side.
  *
  * Like its siblings, every ingredient is pinned so a second engine
  * rebuilds the identical bit array in SQL:
  *
  *  - [[PortableBloom.depth]] hash functions; hash `d` of value `s` is
  *    md5("d:s") (the [[PortableCountMin]] prefix convention);
  *  - bit position = first two md5 bytes as a 16-bit int (= the first
  *    four hex chars, the a03/p04 strpos/conv trick) mod
  *    [[PortableBloom.bits]] (65536 divides evenly → unbiased);
  *  - state = [[PortableBloom.words]] BIGINT words of
  *    [[PortableBloom.wordBits]] = 32 ACTIVE bits each. 32, not 64:
  *    every word stays in [0, 2^32) so `1 << bit` and `word >> bit`
  *    never touch the sign bit — DuckDB raises on `1::BIGINT << 63`
  *    and arithmetic-vs-logical shift of negatives differs across
  *    engines; positive-only words sidestep the whole class;
  *  - update sets one bit per hash row, merge is elementwise OR —
  *    commutative and idempotent, so the sketch is partition-, order-,
  *    and duplicate-invariant, and per-day/per-shard filters union by
  *    OR without rescanning;
  *  - membership for key k ([[PortableBloom.hit]]) = all `depth` bits
  *    set — no false negatives, false-positive rate
  *    (1 − e^(−depth·n/bits))^depth.
  */
case class PortableBloom(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import PortableBloom._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_portable_bloom"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

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
        md.update(prefixes(d))
        val digest = md.digest(bytes)
        val pos = (((digest(0) & 0xff) << 8) | (digest(1) & 0xff)) % bits
        buf(pos >>> 5) |= 1L << (pos & 31)
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(offset: Int): PortableBloom =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PortableBloom =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PortableBloom =
    copy(child = newChildren.head)
}

object PortableBloom {
  /** Independent md5 hash families ("d:" prefixes). */
  val depth = 4
  /** Filter size in bits. 65536 % bits == 0 keeps positions unbiased. */
  val bits = 4096
  /** Active bits per BIGINT word (32 — see class doc). */
  val wordBits = 32
  /** State length: bits / wordBits BIGINT words. */
  val words: Int = bits / wordBits

  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(d => s"$d:".getBytes("UTF-8"))

  /** Column API: input must be the value's STRING form (caller casts). */
  def portableBloom(c: Column): Column = ColumnBridge.column(
    PortableBloom(ColumnBridge.expression(c)).toAggregateExpression())

  /** Bit position of `key` under hash row `d` — the same first-two-md5-
    * bytes integer the aggregate uses, via codegen'd conv(). */
  def position(d: Int, key: Column): Column =
    (conv(substring(md5(concat_ws(":", lit(d), key)), 1, 4), 16, 10)
      .cast("int") % bits)

  /** Imperative mirror of update+probe for STATEFUL STREAMING use
    * (e.g. [[graft.streaming.EventStreams.dedupStreamBloom]]): sets
    * the key's bits in `words` and returns true iff every bit was
    * ALREADY set (apparent duplicate). Identical positions to the
    * aggregate's update and the SQL twin, so a state snapshot is
    * comparable across engines. Caller supplies the MessageDigest
    * (one per group invocation, not per key). */
  def testAndSet(words: Array[Long], keyBytes: Array[Byte],
      md: java.security.MessageDigest): Boolean = {
    var seen = true
    var d = 0
    while (d < depth) {
      md.reset()
      md.update(prefixes(d))
      val digest = md.digest(keyBytes)
      val pos = (((digest(0) & 0xff) << 8) | (digest(1) & 0xff)) % bits
      val w = pos >>> 5
      val b = 1L << (pos & 31)
      if ((words(w) & b) == 0L) { seen = false; words(w) |= b }
      d += 1
    }
    seen
  }

  /** Membership probe against a sketch column (the BIGINT-word array
    * this aggregate returns): true iff all `depth` bits are set. All
    * codegen'd built-ins (conv / element_at / shiftright / bitwise). */
  def hit(sketch: Column, key: Column): Column =
    (0 until depth).map { d =>
      val pos = position(d, key)
      val word = element_at(sketch, shiftright(pos, 5) + 1)
      val bit = pos.bitwiseAND(lit(31))
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
