package graft.sources

import graft.SparkSpec
import graft.kv.Combiners
import org.apache.spark.sql.types._

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("fmt").toString

  private lazy val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
    .toDF("id", "k", "v")
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("v", DoubleType)))

  test("csv round-trip with explicit schema") {
    val p = tmp()
    Formats.writeCsv(df, p)
    val back = Formats.readCsv(spark, p, schema)
    assert(back.as[(Long, String, Double)].collect().toSet ===
      df.as[(Long, String, Double)].collect().toSet)
  }

  test("orc round-trip; filters push into the orc scan") {
    val p = tmp()
    Formats.writeOrc(df, p)
    val back = Formats.readOrc(spark, p)
    assert(back.as[(Long, String, Double)].collect().toSet ===
      df.as[(Long, String, Double)].collect().toSet)
    val filtered = Formats.readOrc(spark, p).filter($"id" === 1L)
    filtered.collect()
    assert(filtered.queryExecution.executedPlan.toString
      .contains("PushedFilters: ["), "orc scan lost predicate pushdown")
  }

  test("json round-trip with explicit schema (no inference scan)") {
    val p = tmp()
    Formats.writeJson(df, p)
    val back = Formats.readJson(spark, p, schema)
    assert(back.count() === 3)
  }

  test("partitioned parquet write fans out per key (S4) and prunes on read") {
    val p = tmp()
    Formats.writePartitionedByKey(df, "k", p)
    val dirs = new java.io.File(p).listFiles().map(_.getName)
      .filter(_.startsWith("k=")).toSet
    assert(dirs === Set("k=a", "k=b"))
    val pruned = Formats.readParquet(spark, p).filter($"k" === "a")
    assert(pruned.count() === 2)
    // partition filter must prune at plan time
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(k"), plan)
  }

  test("text round-trip + round-robin split balances partitions (S7)") {
    val p = tmp()
    Formats.writeText(Seq("l1", "l2", "l3", "l4").toDS(), p)
    val back = Formats.readText(spark, p)
    assert(back.collect().toSet === Set("l1", "l2", "l3", "l4"))
    val split = Formats.roundRobinSplit(back, 2)
    assert(split.rdd.getNumPartitions === 2)
    assert(Formats.roundRobinSplit(back, -3).rdd.getNumPartitions === 1)
  }

  test("typed combiner wordcount equals the DataFrame fast path") {
    val lines = Seq("a b a", "b a\r\nc").toDS()
    val typed = Combiners.wordCountCombined(lines).collect().toMap
    assert(typed === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("range-clustered layout: every output file covers a disjoint key range") {
    import org.apache.spark.sql.functions._
    val p = tmp()
    val df = (1 to 10000).map(i => ((i * 37) % 10007, s"v$i"))
      .toDF("k", "v") // keys arrive unordered
    Formats.writeRangeClustered(df, p, "k", numFiles = 8)
    val files = new java.io.File(p).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("k")), max(col("k"))).head()
      (r.getInt(0), r.getInt(1))
    }.sortBy(_._1)
    // disjoint and ordered: file i's max < file i+1's min
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, ranges.mkString(","))
      case _ =>
    }
    // nothing lost
    assert(spark.read.parquet(p).count() === 10000)
  }
}
