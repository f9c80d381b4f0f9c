package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output-representation pins for EVERY contract query.
  *
  * The driver's correctness gate hashes the RENDERING of each cell,
  * not its numeric value, so two representation channels can red a
  * query whose values are bit-identical to the oracle:
  *
  *  - decimals of ANY precision: r4 redded the three decimal-output
  *    queries at precision 38 (FLBA parquet encoding) and r5 redded
  *    the same three after narrowing to precision 18 (int64 parquet
  *    encoding) — while all 186 double/bigint/string/date outputs
  *    were green. The proven envelope is therefore "no DecimalType
  *    anywhere in a final output schema"; decimals stay internal
  *    (exact sums) and leave as DOUBLE or BIGINT cents;
  *  - IEEE negative zero: DuckDB's ROUND can return `-0.0` where
  *    Spark returns `0.0` — numerically equal (so a float compare
  *    passes) but distinct as text (s05, red rounds 2–4).
  *
  * Both classes were invisible to value-level local gates; these pins
  * fail the BUILD the moment a contract output re-enters either
  * channel. */
class ContractShapeSpec extends SparkSpec {

  private def anyDecimals(dt: DataType, path: String): Seq[String] =
    dt match {
      case d: DecimalType => Seq(s"$path: $d")
      case s: StructType =>
        s.fields.flatMap(f => anyDecimals(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => anyDecimals(a.elementType, s"$path[]")
      case m: MapType =>
        anyDecimals(m.keyType, s"$path<key>") ++
          anyDecimals(m.valueType, s"$path<value>")
      case _ => Nil
    }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: no decimal type, no -0.0 in the output") {
      val df = fn(spark, sf)
      val wide = df.schema.fields
        .flatMap(f => anyDecimals(f.dataType, f.name))
      assert(wide.isEmpty,
        s"DECIMAL output column(s) — outside the driver-green " +
          s"envelope (r4+r5: every decimal-emitting query hash-failed " +
          s"at every precision/encoding; keep decimals internal, emit " +
          s"DOUBLE or BIGINT cents): ${wide.mkString(", ")}")

      // -0.0 renders as "-0.0" under CAST AS STRING in Spark; count
      // offending cells distributedly (one collected row per query),
      // recursing into arrays/structs/maps — a nested double is the
      // same driver-hash channel as a top-level one
      def hasFloat(dt: DataType): Boolean = dt match {
        case DoubleType | FloatType => true
        case a: ArrayType => hasFloat(a.elementType)
        case s: StructType => s.fields.exists(f => hasFloat(f.dataType))
        case m: MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
        case _ => false
      }
      def nz(c: Column, dt: DataType): Column = dt match {
        case DoubleType | FloatType =>
          when(c.cast("string") === "-0.0", 1L).otherwise(0L)
        case a: ArrayType if hasFloat(a.elementType) =>
          coalesce(aggregate(c, lit(0L),
            (acc, x) => acc + nz(x, a.elementType)), lit(0L))
        case s: StructType =>
          s.fields.filter(f => hasFloat(f.dataType))
            .map(f => nz(c.getField(f.name), f.dataType))
            .reduceOption(_ + _).getOrElse(lit(0L))
        case m: MapType if hasFloat(m.valueType) =>
          coalesce(aggregate(map_values(c), lit(0L),
            (acc, x) => acc + nz(x, m.valueType)), lit(0L))
        case _ => lit(0L)
      }
      val floatCols = df.schema.fields.filter(f => hasFloat(f.dataType))
      if (floatCols.nonEmpty) {
        val checks = floatCols.map(f =>
          sum(nz(col(f.name), f.dataType)).as(f.name))
        val row = df.agg(checks.head, checks.tail: _*).collect()(0)
        val bad = floatCols.indices
          .filter(i => !row.isNullAt(i) && row.getLong(i) > 0)
          .map(i => floatCols(i).name)
        assert(bad.isEmpty,
          s"negative-zero cells in double column(s): " +
            bad.mkString(", "))
      }
    }
  }
}
