package graft.kv

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's maple/juice dataflow algebra as a thin typed API over
  * Dataset (SURVEY.md §2.2, §7.1 layer 2).
  *
  * Contract fidelity:
  *  - maple = partition → per-split flatMap emitting (key, value) pairs
  *    (`MapleJuice.cpp:54-80`; exe contract `word_count_map.cpp`).
  *    User logic is a Scala closure instead of a shipped executable —
  *    the process boundary disappears into the executor JVM.
  *  - numTasks is clamped to [1, cluster parallelism] exactly like the
  *    reference clamps to live membership (`MapleJuice.cpp:227-235`).
  *  - shuffle/group = hash partitioning on key (`MapleJuice.cpp:260-268`
  *    — except distributed, not a master-side merge).
  *  - juice = per-key reduce over grouped values (`MapleJuice.cpp:
  *    83-108`); final output lexicographically key-sorted, matching the
  *    juice master's std::map merge (`MapleJuice.cpp:351-377`).
  *  - KV text format: one line per key, space-separated values with a
  *    trailing space (`MapleJuice.cpp:272-279`). Keys/values must not
  *    contain whitespace (reference format constraint, SURVEY.md §1.2).
  */
object MapleJuice {

  /** Reference task-count clamp (`MapleJuice.cpp:227-235`): the cluster
    * size role is played by the scheduler's default parallelism. */
  def clampTasks(spark: SparkSession, requested: Int): Int =
    math.max(1, math.min(requested, spark.sparkContext.defaultParallelism))

  /** Maple phase: repartition the line dataset into numTasks splits and
    * run the mapper per line. Round-robin split (`MapleJuice.cpp:16-51`)
    * ≡ RoundRobinPartitioning via repartition(n). */
  def maple(input: Dataset[String], numTasks: Int)(
      mapper: String => IterableOnce[(String, String)]): Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.repartition(clampTasks(spark, numTasks)).flatMap(mapper)
  }

  /** Juice phase: hash-shuffle on key (replaces the master-side merge —
    * the reference's scalability bottleneck, SURVEY.md §3.1 step 8),
    * reduce each group, and (by default) sort the final output by key
    * as the reference's sorted final merge does. */
  def juice(kv: Dataset[(String, String)], numTasks: Int,
      sortOutput: Boolean = true)(
      reducer: (String, Iterator[String]) => IterableOnce[(String, String)])
      : Dataset[(String, String)] = {
    val spark = kv.sparkSession
    import spark.implicits._
    val n = clampTasks(spark, numTasks)
    val reduced = kv
      .repartition(n, col("_1"))
      .groupByKey(_._1)
      .flatMapGroups((k, vs) => reducer(k, vs.map(_._2)).iterator)
    if (sortOutput) reduced.orderBy(col("_1")) else reduced
  }

  /** Render grouped KV pairs in the reference's on-disk format:
    * `key v1 v2 … ` (trailing space, `MapleJuice.cpp:272-279`). */
  def toKvLines(kv: Dataset[(String, String)]): DataFrame =
    kv.groupBy(col("_1").as("key"))
      .agg(concat_ws(" ", collect_list(col("_2"))).as("vals"))
      .select(concat(col("key"), lit(" "), col("vals"), lit(" ")).as("line"))
      .orderBy(col("line"))

  /** Per-key fan-out sink (S4, `MapleJuice.cpp:285-298`): one directory
    * per distinct key under `path`. */
  def perKeyFanout(kv: Dataset[(String, String)], path: String): Unit =
    kv.toDF("key", "value")
      .write.mode("overwrite").partitionBy("key").parquet(path)

  /** S4 with the reference's exact on-disk shape (`MapleJuice.cpp:
    * 285-298`): one TEXT file per key named `<prefix>_<key>.txt` under
    * `dir`, containing the grouped line `key v1 v2 … ` (trailing
    * space). The grouped lines are written distributed (partitioned
    * text sink, one row per key so exactly one part file per key dir),
    * then a driver-side pass renames `key=K/part-…` → `prefix_K.txt` —
    * O(#keys) filesystem metadata ops, the same per-key file count the
    * reference's master writes, never data movement. Keys must be
    * whitespace-free (reference format constraint, SURVEY.md §1.2). */
  def perKeyFanoutText(kv: Dataset[(String, String)], dir: String,
      prefix: String): Unit = {
    val spark = kv.sparkSession
    import spark.implicits._
    val lines = kv.groupByKey(_._1)
      .mapGroups((k, vs) => (k, (Iterator(k) ++ vs.map(_._2)).mkString(" ") + " "))
      .toDF("key", "line")
    val out = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, "_tmp_fanout")
    lines.repartition(col("key"))
      .write.mode("overwrite").partitionBy("key").text(tmp.toString)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(tmp)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("key="))
      .foreach { st =>
        val key = java.net.URLDecoder.decode(
          st.getPath.getName.stripPrefix("key="), "UTF-8")
        val part = fs.listStatus(st.getPath)
          .filter(_.getPath.getName.startsWith("part-")).head
        val dst = new org.apache.hadoop.fs.Path(out, s"${prefix}_$key.txt")
        fs.delete(dst, false)
        fs.rename(part.getPath, dst)
      }
    fs.delete(tmp, true)
  }

  /** Exe-contract fidelity (optional, SURVEY.md §2.4 UDF row): the
    * reference runs arbitrary user executables as mappers over their
    * split (`MapleJuice.cpp:63-67`, exe contract `word_count_map.cpp`).
    * The Spark-native equivalent is RDD.pipe: each task streams its
    * split through the command's stdin and parses `key value` lines
    * from stdout — same process boundary, executor-local. */
  def maplePipe(input: Dataset[String], numTasks: Int, command: Seq[String])
      : Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    val piped = input.repartition(clampTasks(spark, numTasks))
      .rdd.pipe(command)
    piped.flatMap { line =>
      val toks = line.trim.split("\\s+", 2)
      if (toks.length == 2) Some((toks(0), toks(1))) else None
    }.toDS()
  }

  /** Juice-side exe contract (`MapleJuice.cpp:83-108`; exe input format
    * `word_count_reduce.cpp:10-38`): after the hash shuffle, each key's
    * group is rendered as the reference's grouped-KV line
    * `key v1 v2 … ` (trailing space) and each partition's lines are
    * streamed through the user executable via pipe(); stdout
    * `key value` lines are parsed back. One process per reduce task —
    * the same process-per-task boundary the reference's juice worker
    * has, but executor-local and fault-retried by Spark. A key's full
    * value list is materialized into its line, exactly as the
    * reference's juice input files are. */
  def juicePipe(kv: Dataset[(String, String)], numTasks: Int,
      command: Seq[String], sortOutput: Boolean = true)
      : Dataset[(String, String)] = {
    val spark = kv.sparkSession
    import spark.implicits._
    val n = clampTasks(spark, numTasks)
    val grouped = kv.repartition(n, col("_1"))
      .groupByKey(_._1)
      .mapGroups((k, vs) => (Iterator(k) ++ vs.map(_._2)).mkString(" ") + " ")
    val out = grouped.rdd.pipe(command).flatMap { line =>
      val toks = line.trim.split("\\s+", 2)
      if (toks.length == 2) Some((toks(0), toks(1))) else None
    }.toDS()
    if (sortOutput) out.orderBy(col("_1")).as[(String, String)] else out
  }

  // ----------------------------------------------------- built-in jobs

  /** Q1 word count with the reference tokenizer: words are maximal runs
    * of [A-Za-z0-9-]; every other byte (incl. \r — CRLF-safe) delimits
    * (`word_count_map.cpp:20`, `WordCount.java:52`). Sorted by word
    * (C5). DataFrame formulation → whole-stage codegen, partial agg. */
  def wordCount(lines: Dataset[String]): DataFrame =
    lines.select(explode(split(col("value"), "[^A-Za-z0-9-]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Q2 reverse web-graph. The reference parses a global whitespace
    * token stream (`linked_graph_map.cpp:15` — pairs may span lines), so
    * tokens are indexed globally (zipWithIndex: one extra narrow pass)
    * and paired (i/2). Emits reversed (to → from) adjacency, values
    * sorted for determinism (SURVEY.md §7.4). */
  def reverseGraph(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val toks = lines.flatMap(_.split("\\s+").filter(_.nonEmpty))
    val indexed = toks.rdd.zipWithIndex.toDF("tok", "idx")
    val from = indexed.filter(col("idx") % 2 === 0)
      .select((col("idx") / 2).cast("long").as("pair"), col("tok").as("from"))
    val to = indexed.filter(col("idx") % 2 === 1)
      .select(((col("idx") - 1) / 2).cast("long").as("pair"), col("tok").as("to"))
    from.join(to, "pair")
      .groupBy(col("to").as("dst"))
      .agg(concat_ws(" ", array_sort(collect_list(col("from")))).as("adj"))
      .orderBy("dst")
  }

  /** Hadoop-twin rendering of the adjacency list:
    * `dst (src1 src2 …)` (`LinkedGraph.java:92`). */
  def reverseGraphHadoopStyle(lines: Dataset[String]): DataFrame =
    reverseGraph(lines)
      .select(col("dst"), concat(lit("("), col("adj"), lit(")")).as("adj"))

  /** Q3 distributed grep (`logger.cpp`): pattern-filter a glob of log
    * files, count per file ("node") plus a TOTAL row — the client-side
    * sum (`logger.cpp:223`). */
  def logQuery(spark: SparkSession, glob: String, pattern: String): DataFrame = {
    val lines = spark.read.textFile(glob)
      .select(col("value"), input_file_name().as("node"))
      .filter(col("value").rlike(pattern))
    val per = lines.groupBy(col("node")).agg(count(lit(1)).as("n"))
    val tot = lines.agg(count(lit(1)).as("n"))
      .select(lit("TOTAL").as("node"), col("n"))
    per.unionByName(tot).orderBy("node")
  }
}
