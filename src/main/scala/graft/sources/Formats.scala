package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1 S1–S7).
  *
  * The reference's only format is line-oriented text in a replicated
  * flat namespace (`SDFS.cpp`, `MapleJuice.cpp:34-37`); the engine keeps
  * that (text) and adds the columnar/structured formats a Spark-native
  * pipeline actually runs on. Replication/durability is the storage
  * layer's job (SURVEY.md §2.5) — never engine code.
  *
  * | Reference op | Here |
  * |---|---|
  * | S1 file scan            | [[readText]] / [[readParquet]] ... |
  * | S2 directory scan+concat| same calls with a glob/dir path (native multi-file scan) |
  * | S3 put (overwrite)      | write helpers with mode=overwrite (delete-then-put) |
  * | S4 per-key fan-out      | [[writePartitionedByKey]] |
  * | S5 delete               | GraftSession.delete |
  * | S6 catalog listing      | GraftSession.ls / store |
  * | S7 round-robin split    | [[roundRobinSplit]] (RoundRobinPartitioning) |
  */
object Formats {

  def readText(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path) // explicit schema: no inference scan

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeText(ds: Dataset[String], path: String): Unit =
    ds.write.mode("overwrite").text(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** S4: one output directory per distinct key value. */
  def writePartitionedByKey(df: DataFrame, keyCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(keyCol).parquet(path)

  /** S7: the reference's `split_file` (line i → piece i mod n,
    * `MapleJuice.cpp:16-51`) is exactly RoundRobinPartitioning. */
  def roundRobinSplit[T](ds: Dataset[T], n: Int): Dataset[T] =
    ds.repartition(math.max(1, n))

  /** Range-clustered layout writer: range-partition on the key, sort
    * within partitions, write parquet. Every output file then covers a
    * disjoint key range (spec-pinned), so parquet row-group min/max
    * statistics let a key-predicate scan skip whole files — at 100 TB
    * the difference between reading one file and reading all of them.
    * The write costs one range exchange (sampled boundaries) + a
    * spillable per-partition sort; downstream scans repay it on every
    * selective read. */
  def writeRangeClustered(df: DataFrame, path: String, keyCol: String,
      numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(math.max(1, numFiles), col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(path)
  }
}
