package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of probe rows share one hot key
  private lazy val probe = (1 to 2000)
    .map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong))
    .toDF("k", "payload")
  private lazy val build = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "attr")

  test("salted join returns exactly the plain join's rows") {
    val plain = probe.join(build, "k")
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(probe, build, "k", factor = 8)
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq === plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("the shuffle hashes on (key, salt) so the hot key spreads") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Skew.saltedJoin(probe, build, "k", factor = 8)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("__graft_salt"), p)
      assert(p.contains("hashpartitioning(k"), p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("factor=1 degenerates to the plain join") {
    val plain = probe.join(build, "k").count()
    assert(Skew.saltedJoin(probe, build, "k", 1).count() === plain)
  }
}
