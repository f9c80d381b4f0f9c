package graft.tools

/** Scratch plan dumper for local inspection: Test/runMain graft.tools.PlanDump <query> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val name = args.headOption.getOrElse("p03_source_cap")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/plan_dump.txt"),
      p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[plandump] wrote /tmp/plan_dump.txt (${p.length} chars)")
    spark.stop()
  }
}
