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
  * small side's keys once, broadcast it, and drop the provable
  * non-matches map-side before any shuffle of the big side.
  *
  * GEOMETRY IS A PARAMETER (r9): the filter only filters while its
  * load stays below the design point, and a fixed size saturates
  * silently as the key set grows — the identical failure mode as
  * Spark 4's 64 Mbit `InjectRuntimeFilter` cap (SCALING.md round-8)
  * and the third application of the corpus-size-keyed-geometry
  * discipline ([[graft.queries.Dedup.cosParamsFor]],
  * [[graft.queries.Dedup.simhashParamsFor]]). Size with
  * [[PortableBloom.bloomParamsFor]](nKeys); the contract default
  * ([[PortableBloom.bits]] = 4096 / depth 4) remains the oracle-locked
  * small-state geometry (streaming per-key dedup state, golden specs).
  *
  * Like its siblings, every ingredient is pinned so a second engine
  * rebuilds the identical bit array in SQL:
  *
  *  - `depth` hash functions; hash `d` of value `s` is md5("d:s")
  *    (the [[PortableCountMin]] prefix convention);
  *  - bit position: for bits ≤ 65536, the first two md5 bytes as a
  *    16-bit int (= the first four hex chars, the a03/p04
  *    strpos/conv trick) mod `bits`; for larger filters the first
  *    FOUR bytes as an unsigned 32-bit int mod `bits`. Both schemes
  *    are unbiased because `bits` is a power of two (65536 % bits == 0
  *    resp. 2^32 % bits == 0), and the scheme is a pure function of
  *    `bits`, so both engines pick the same one. The 16-bit scheme is
  *    kept for small filters so the contract default's bit grid is
  *    bit-identical to every earlier round (oracle-locked);
  *  - state = bits / [[PortableBloom.wordBits]] BIGINT words of 32
  *    ACTIVE bits each. 32, not 64: every word stays in [0, 2^32) so
  *    `1 << bit` and `word >> bit` never touch the sign bit — DuckDB
  *    raises on `1::BIGINT << 63` and arithmetic-vs-logical shift of
  *    negatives differs across engines; positive-only words sidestep
  *    the whole class;
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
    bits: Int = PortableBloom.bits,
    depth: Int = PortableBloom.depth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import PortableBloom.{prefixes, wordBits, maxBits}

  require(bits >= 64 && bits <= maxBits && Integer.bitCount(bits) == 1,
    s"bits must be a power of two in [64, $maxBits]: $bits")
  require(depth >= 1 && depth <= prefixes.length,
    s"depth in [1, ${prefixes.length}]: $depth")

  private val words: Int = bits / wordBits
  private val widePos: Boolean = bits > 65536

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
        val u16 = ((digest(0) & 0xff) << 8) | (digest(1) & 0xff)
        val pos =
          if (widePos)
            ((((u16.toLong << 16) |
              ((digest(2) & 0xff) << 8) | (digest(3) & 0xff))) % bits).toInt
          else u16 % bits
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
  /** CONTRACT-DEFAULT filter size in bits — the oracle-locked small-
    * state geometry (streaming per-key dedup state, where n per key is
    * tiny). Production semi-join prefilters size by key count via
    * [[bloomParamsFor]] instead: at 2,943 keys this default is 94 %
    * loaded with fpp ≈ 0.79 — a filter that no longer filters. */
  val bits = 4096
  /** Active bits per BIGINT word (32 — see class doc). */
  val wordBits = 32
  /** State length of the contract default: bits / wordBits words. */
  val words: Int = bits / wordBits
  /** Geometry ceiling: 2^26 bits = 8 MB broadcast — comfortably
    * below executor broadcast budgets; at the ceiling the design load
    * holds through ~4.2 M keys, beyond which the filter degrades
    * gracefully toward pass-through (callers with larger key sets
    * shard the filter or skip the prefilter tier). */
  val maxBits: Int = 1 << 26

  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(16)(d => s"$d:".getBytes("UTF-8"))

  /** Corpus-size-keyed Bloom geometry — (bits, depth) for `nKeys`
    * build-side keys: bits = the smallest power of two ≥ 16·n,
    * clamped to [contract 4096, [[maxBits]]], depth fixed at 4 (the
    * hash-family convention every SQL twin spells). At the 16·n
    * design point the load is 1 − e^(−depth·n/bits) ≤ 22.1 % and the
    * false-positive rate ≤ (0.221)^4 ≈ 2,400 ppm — the prefilter
    * drops ≥ 99.7 % of absent keys map-side. Rounding UP to a power
    * of two means real load only ever lands at or below the design
    * point. Reproduces the contract default (4096) for n ≤ 256. */
  def bloomParamsFor(nKeys: Long): (Int, Int) = {
    val target = math.max(1L, 16L * math.max(0L, nKeys))
    val pow = 64 - java.lang.Long.numberOfLeadingZeros(target - 1)
    val sized = math.min(maxBits.toLong, math.max(bits.toLong, 1L << pow))
    (sized.toInt, depth)
  }

  /** Design envelope for a [[bloomParamsFor]]-sized filter, in the ppm
    * units a17 emits: load ≤ 250,000 ppm (design point 221,000 at the
    * 16 bits/key ratio — rounding up to a power of two only ever lands
    * BELOW it, so 250k is headroom, not slack) and measured fpp
    * ≤ 25,000 ppm (~10× the 2,400 ppm design fpp — generous against
    * probe-set noise, still 30× below the saturated filter's 790,000).
    * SketchAuditSpec asserts the a17 `sized` row satisfies this and
    * that a deliberately undersized filter violates it, so geometry
    * or scale drift fails `sbt test` instead of shipping silently
    * (the r8 lesson: a16 measured the saturation for two rounds and
    * nothing acted on it). */
  def withinDesignEnvelope(loadPpm: Long, fprPpm: Long): Boolean =
    loadPpm <= 250000L && fprPpm <= 25000L

  /** Column API: input must be the value's STRING form (caller casts). */
  def portableBloom(c: Column): Column = portableBloom(c, bits, depth)

  /** Sized-geometry Column API (callers pass [[bloomParamsFor]]). */
  def portableBloom(c: Column, bits: Int, depth: Int): Column =
    ColumnBridge.column(
      PortableBloom(ColumnBridge.expression(c), bits, depth)
        .toAggregateExpression())

  /** Bit position of `key` under hash row `d` — the same md5-prefix
    * integer the aggregate uses, via codegen'd conv(). Scheme follows
    * `bits` (16-bit positions for bits ≤ 65536, 32-bit above), so the
    * contract default's grid is untouched. */
  def position(d: Int, key: Column, bits: Int = PortableBloom.bits): Column =
    if (bits <= 65536)
      (conv(substring(md5(concat_ws(":", lit(d), key)), 1, 4), 16, 10)
        .cast("int") % bits)
    else
      (conv(substring(md5(concat_ws(":", lit(d), key)), 1, 8), 16, 10)
        .cast("long") % bits).cast("int")

  /** Imperative mirror of update+probe for STATEFUL STREAMING use
    * (e.g. [[graft.streaming.EventStreams.dedupStreamBloom]]): sets
    * the key's bits in `words` and returns true iff every bit was
    * ALREADY set (apparent duplicate). Identical positions to the
    * aggregate's update and the SQL twin at the CONTRACT default
    * geometry (per-key streaming state is small-n, so 4096 bits is
    * the right size THERE — sizing only matters for corpus-scale
    * build sides). Caller supplies the MessageDigest (one per group
    * invocation, not per key). */
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
  def hit(sketch: Column, key: Column): Column = hit(sketch, key, bits, depth)

  /** Sized-geometry probe — (bits, depth) must match the build side's. */
  def hit(sketch: Column, key: Column, bits: Int, depth: Int): Column =
    (0 until depth).map { d =>
      val pos = position(d, key, bits)
      val word = element_at(sketch, shiftright(pos, 5) + 1)
      val bit = pos.bitwiseAND(lit(31))
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
