package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins (SCALING.md "Joins").
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; salting
  * is the explicit mitigation when a hot key must hash-join a build side
  * that is too big to broadcast but small enough to replicate: the build
  * side is replicated `factor` ways with a salt column, probe rows are
  * assigned a deterministic-per-row salt, and the join key becomes
  * (key, salt) — the hot key's rows now spread over `factor` shuffle
  * partitions instead of one.
  *
  * Cost model: build side grows ×factor (shuffle + memory), probe side
  * unchanged; pick factor ≈ (hot-key rows) / (target partition rows).
  * Result set is identical to the plain join (spec-pinned).
  */
object Skew {

  /** Inner equi-join `probe ⋈ build` on `key`, salted `factor` ways.
    * The probe salt is derived from a per-row id, so a hot key's rows
    * distribute uniformly; every build row exists for every salt value,
    * so no pair is lost and none duplicates. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val saltVals = array((0 until factor).map(lit): _*)
    val buildX = build.withColumn("__graft_salt", explode(saltVals))
    val probeX = probe.withColumn("__graft_salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    probeX.join(buildX, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
