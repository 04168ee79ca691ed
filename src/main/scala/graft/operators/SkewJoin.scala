package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join split (spark.sql.adaptive.skewJoin, enabled in
  * Sessions.builder) cannot apply: streaming joins, first-run plans
  * before AQE statistics exist, or hot keys so extreme that one
  * post-split partition still dominates.
  *
  * The skewed (probe) side scatters each row into one of `salt` subkeys;
  * the build side replicates `salt`×. Work for a hot key then spreads
  * over `salt` tasks instead of one. Replication multiplies the build
  * side, so salt counts stay small (8-32) and the build side should be
  * the smaller relation — the same asymmetry the reference's
  * broadcast-vs-partition cost decision encodes
  * (Optimization.cpp:885-1046).
  */
object SkewJoin {

  /** Inner equi-join with the left (probe/skewed) side salted and the
    * right (build) side replicated. Semantically identical to
    * `probe.join(build, probeKey === buildKey)`. */
  def saltedJoin(probe: DataFrame, probeKey: Column,
                 build: DataFrame, buildKey: Column,
                 salt: Int = 16): DataFrame = {
    // scatter by row position, NOT by hashing row content — duplicate
    // rows of the hot key would hash to one bucket and re-concentrate
    val scattered = probe.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    scattered
      .join(replicated, probeKey === buildKey && scattered("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
