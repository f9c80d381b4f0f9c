package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path (SURVEY.md
  * §7.3 [CUSTOM]).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * falls back to interpreted lambda evaluation per row; these
  * expressions generate a tight primitive double loop inside
  * whole-stage codegen instead. Semantics match the HOF fold exactly:
  * sequential accumulation in array order, so results are bit-identical
  * and the DuckDB oracles keep matching.
  *
  * Array elements must be non-null (embedding vectors); null arrays
  * propagate null via the default null-intolerant binary contract.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // children must already be array<double> (callers cast explicitly)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ x² over a double array — the self-dot, kept unary so norm
  * computation stays one scan with no zip. */
case class SquaredNorm(child: Expression)
    extends UnaryExpression {

  // child must already be array<double> (callers cast explicitly)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $x.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SquaredNorm =
    copy(child = newChild)
}

/** Σ floor((xᵢ−yᵢ)²·2²⁰) over two double arrays, as a BIGINT — the
  * integer fixed-point squared distance that makes nearest-neighbor
  * ASSIGNMENT engine-portable (the s06 PQ pattern): each per-element
  * term is a deterministic double expression (two IEEE ops on
  * float-derived values, an exact ×2²⁰ exponent shift, an unambiguous
  * FLOOR) and the sum is integer, so the result is bit-identical
  * regardless of accumulation order, partitioning, or engine — no
  * ROUND boundary for two engines to disagree about, unlike a rounded
  * cosine argmax. Iterates min(len) like [[DotProduct]]. */
case class FixedPointSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // children must already be array<double> (callers cast explicitly)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_fp_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += math.floor(d * d * 1048576.0).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $s += (long) java.lang.Math.floor($d * $d * 1048576.0);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointSqDist =
    copy(left = newLeft, right = newRight)
}

/** Integer fixed-point inner product: Σ floor(aᵢ·bᵢ·2²⁰) as BIGINT —
  * the relevance twin of [[FixedPointSqDist]]. Each term is one IEEE
  * multiply, an exact ×2²⁰ exponent shift, and an unambiguous FLOOR;
  * the sum is integer, so rankings built on it are bit-identical
  * under any accumulation order, partitioning, or engine (unlike a
  * rounded-cosine score, which can flip at a representability
  * boundary between engines). Iterates min(len) like [[DotProduct]]. */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_fp_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(x.getDouble(i) * y.getDouble(i) * 1048576.0).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) java.lang.Math.floor(
         |    $x.getDouble($i) * $y.getDouble($i) * 1048576.0);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}

/** Character-level hamming distance between two equal-length strings
  * (bitstring fingerprints) — replaces an N-term substring-comparison
  * expression chain with one fused loop over the UTF8 bytes. ASCII
  * inputs only (bitstrings), so byte == char. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val y = b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = math.abs(x.length - y.length).toLong
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |byte[] $x = $l.getBytes();
         |byte[] $y = $r.getBytes();
         |int $n = java.lang.Math.min($x.length, $y.length);
         |long $d = java.lang.Math.abs($x.length - $y.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x[$i] != $y[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid argmin as ONE codegen'd map expression (r11):
  * given a vector and the full centroid table as an array-of-arrays
  * (ordered by cell id), returns the 0-based index of the centroid
  * with the minimal [[FixedPointSqDist]] — first index wins ties,
  * which IS the `(distance, cell-id)` lexicographic argmin when the
  * array is id-ordered, so results are bit-identical to the r10
  * `min(struct(d, cell))` aggregate form.
  *
  * WHY an expression and not the aggregate: the agg form consumes the
  * `corpus × centroids` crossJoin — n·nCells rows that whole-stage
  * codegen pipes into a partial SortAggregate, whose sorter
  * MATERIALIZES them (the 33.6 M-vector HierProbe run expanded
  * 33.6 M × 512 rows ≈ multi-TB of sort spill and filled the disk —
  * SCALING.md r11). This form does the identical arithmetic as a pure
  * per-row loop over the broadcast array: zero expansion, zero sort,
  * zero exchange — the assignment pass a production IVF actually
  * ships. Returns null on an empty/absent centroid array (unreachable
  * for a non-empty corpus — seeds come from the corpus itself). */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  // left: array<double> (the vector); right: array<array<double>>
  // (id-ordered centroids) — callers construct both explicitly
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_cell"
  // nullable even when children aren't: the empty-centroid case emits
  // null, so codegen must materialize a mutable isNull slot
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cells = b.asInstanceOf[ArrayData]
    val nc = cells.numElements()
    if (nc == 0) return null
    var best = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < nc) {
      val sv = cells.getArray(c)
      val n = math.min(v.numElements(), sv.numElements())
      var s = 0L
      var i = 0
      while (i < n) {
        val d = v.getDouble(i) - sv.getDouble(i)
        s += math.floor(d * d * 1048576.0).toLong
        i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cells) => {
      val nc = ctx.freshName("nc")
      val c = ctx.freshName("c")
      val sv = ctx.freshName("sv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $nc = $cells.numElements();
         |if ($nc == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = -1;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $nc; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $sv = $cells.getArray($c);
         |    int $n = java.lang.Math.min($v.numElements(), $sv.numElements());
         |    long $s = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $d = $v.getDouble($i) - $sv.getDouble($i);
         |      $s += (long) java.lang.Math.floor($d * $d * 1048576.0);
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}

/** Broadcast-Bloom membership probe as a codegen'd predicate (r12):
  * `bloom.value.mightContainLong(child)` over a driver-built
  * `util.sketch.BloomFilter` broadcast — the wedge-prune filter of the
  * g02/g10/g17/g18 triangle core. Replaces the boxed Scala-closure UDF
  * form (`udf((k: Long) => bc.value.mightContainLong(k))`): a ScalaUDF
  * boxes the packed key to `java.lang.Long`, routes through the
  * encoder/converter bridge, and blocks expression-level codegen
  * fusion on the hottest row stream in the suite (Σdeg⁺² wedge rows —
  * 834 M at sf1, every one probed). This form is the identical probe
  * as a primitive-long call inside whole-stage codegen — same filter
  * object, same hash math, bit-identical keep/drop decisions — so the
  * exact closing join downstream sees exactly the same rows.
  *
  * The broadcast handle rides the expression (serializable; executors
  * read the torrent-cached value once per task, not per row). */
case class BloomMightContain(child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // one filter-object field per operator instance: resolve the
      // broadcast once at codegen-object init, not once per row
      val bfClass = "org.apache.spark.util.sketch.BloomFilter"
      val bcRef = ctx.addReferenceObj("bloomBc", bloom,
        "org.apache.spark.broadcast.Broadcast")
      val bf = ctx.addMutableState(bfClass, "bloomFilter",
        v => s"$v = ($bfClass) $bcRef.value();", forceInline = true)
      s"${ev.value} = $bf.mightContainLong($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

/** Column-level API for the vector expressions. */
object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm2(a: Column): Column =
    ColumnBridge.column(SquaredNorm(ColumnBridge.expression(a)))

  def fpSqDist(a: Column, b: Column): Column =
    ColumnBridge.column(
      FixedPointSqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def fpDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FixedPointDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      HammingDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nearestCell(v: Column, cells: Column): Column =
    ColumnBridge.column(
      NearestCell(ColumnBridge.expression(v), ColumnBridge.expression(cells)))

  def bloomMightContain(key: Column,
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloom))
}
