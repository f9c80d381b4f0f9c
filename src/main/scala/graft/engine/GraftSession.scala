package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + dataset catalog (SURVEY.md §7.1 layer 1): the SDFS
  * namespace surface (put/get/delete/ls/store — `SDFS.cpp`,
  * `file_list.cpp:12`) re-expressed as a named-dataset catalog.
  *
  * Datasets live as temp views (cheap, lazy) and optionally as Parquet
  * under the warehouse dir for durability — replication/placement is the
  * storage layer's job (SURVEY.md §2.5), never engine code.
  */
class GraftSession(val spark: SparkSession, warehouse: String) {

  private def path(name: String) = s"$warehouse/$name"

  /** `put <local> <name>`: register (and optionally persist) a dataset
    * under a flat name. Overwrite = delete-then-put (`SDFS.cpp:135`). */
  def put(name: String, df: DataFrame, persist: Boolean = false): Unit = {
    if (persist) {
      df.write.mode("overwrite").parquet(path(name))
      spark.read.parquet(path(name)).createOrReplaceTempView(name)
    } else df.createOrReplaceTempView(name)
  }

  /** Register a line-oriented text file (the reference's only input
    * format) under a name. */
  def putText(name: String, file: String): Unit =
    spark.read.textFile(file).toDF("value").createOrReplaceTempView(name)

  /** `get <name>`: resolve a named dataset. */
  def get(name: String): DataFrame = spark.table(name)

  /** `delete <name>` (`SDFS.cpp:220-228`). */
  def delete(name: String): Unit = {
    spark.catalog.dropTempView(name)
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** `ls <name>`: the files backing a persisted dataset (the replica
    * listing's moral equivalent, `SDFS.cpp:230-235`). */
  def ls(name: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.toString).toSeq.sorted
  }

  /** `store`: all registered dataset names (`file_list.cpp:82-93`). */
  def store(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted
}

object GraftSession {
  /** Standard local session with the engine's scale-posture defaults. */
  def local(cores: Int = 8, warehouse: String = "/tmp/graft-warehouse")
      : GraftSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new GraftSession(spark, warehouse)
  }
}
