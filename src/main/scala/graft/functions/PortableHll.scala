package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable HyperLogLog (SURVEY.md §4.2 item 3: custom
  * `TypedImperativeAggregate`).
  *
  * Unlike `approx_count_distinct` (whose HLL++ sketch is
  * implementation-defined and therefore rows-only in the oracle), every
  * ingredient here is pinned so a second engine can compute the exact
  * same sketch in SQL:
  *
  *  - hash = md5 of the value's string form (identical across engines);
  *  - register index = first md5 byte mod [[PortableHll.m]] (= first two
  *    hex chars);
  *  - rank = leading-zero bits of the next 48 bits (hex chars 3–14)
  *    plus 1, capped at 49 (all-zero case);
  *  - per-register state = max rank (commutative merge ⇒ partition- and
  *    order-invariant);
  *  - harmonic sum collapsed EXACTLY as the integer
  *    S = Σ_j 2^(50 − R_j) (a BIGINT: ≤ m·2^50 = 2^56), so the sketch
  *    state itself is hash-comparable — no float accumulation anywhere;
  *  - raw estimate = α_m · m² · 2^50 / S in one double division
  *    (deterministic IEEE), rounded by the caller.
  *
  * No small-range/large-range correction: this is the raw HLL
  * estimator, named accordingly. Buffer = m register bytes (ranks ≤ 49
  * fit a byte); partial-aggregate shuffle traffic is m bytes per group.
  */
case class PortableHll(
    child: Expression,
    emitRegisters: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import PortableHll._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (emitRegisters) "graft_portable_hll_regs" else "graft_portable_hll"

  override def dataType: DataType =
    if (emitRegisters) ArrayType(IntegerType, containsNull = false)
    else StructType(Seq(
      StructField("estimate", DoubleType, nullable = false),
      StructField("harmonic_sum", LongType, nullable = false),
      StructField("zero_registers", LongType, nullable = false)))

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  // task-local digest: a JCA getInstance lookup per row is measurable
  // on 100M-row partitions; expression instances are per-task copies
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      md5.reset()
      val digest = md5.digest(v.asInstanceOf[UTF8String].getBytes)
      val reg = (digest(0) & 0xff) % m
      // 48-bit big-endian value from bytes 1..6 (hex chars 3..14)
      var bits = 0L
      var i = 1
      while (i <= 6) { bits = (bits << 8) | (digest(i) & 0xffL); i += 1 }
      val rank =
        if (bits == 0L) maxRank
        else java.lang.Long.numberOfLeadingZeros(bits) - 16 + 1
      if (rank > buf(reg)) buf(reg) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    if (emitRegisters)
      // raw m-register vector — the MERGEABLE form: coarser rollup
      // levels re-aggregate these by per-index max without rescanning
      // the fact (a10); collapse only at output time
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        buf.map(_.toInt))
    var s = 0L
    var zeros = 0L
    var i = 0
    while (i < m) {
      s += 1L << (scalePow - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    // exact literal order matters: the oracle SQL spells the same chain
    val est = alpha * m.toDouble * m.toDouble * scale / s.toDouble
    InternalRow(est, s, zeros)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): PortableHll =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PortableHll =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PortableHll =
    copy(child = newChildren.head)
}

object PortableHll {
  /** Register count (uniform under `byte mod m` since 256 % 64 == 0). */
  val m = 64
  /** Rank cap: 48 observed bits all zero → rank 49. */
  val maxRank = 49
  /** Harmonic-sum scaling: 2^(scalePow − rank) summed as exact longs. */
  val scalePow = 50
  val scale: Double = (1L << scalePow).toDouble
  /** α_64 — spelled as the same double expression in the oracle SQL. */
  val alpha: Double = 0.7213 / (1.0 + 1.079 / 64.0)

  /** Column API: input must be the value's STRING form (caller casts —
    * engines agree on integer→string rendering). */
  def portableHll(c: Column): Column = ColumnBridge.column(
    PortableHll(ColumnBridge.expression(c)).toAggregateExpression())

  /** Register-vector form: the mergeable partial state (m ints), for
    * sketch-cube re-aggregation across rollup levels (a10). */
  def portableHllRegs(c: Column): Column = ColumnBridge.column(
    PortableHll(ColumnBridge.expression(c), emitRegisters = true)
      .toAggregateExpression())
}
