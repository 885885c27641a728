package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join via key salting (the manual fallback when AQE's
  * skew-join split isn't available — e.g. the skewed side feeds a
  * non-shuffle operator, or salting must be planned statically).
  *
  * The hot key's rows on the large side get a random-ish salt in
  * [0, saltFactor); the small side is replicated saltFactor times so
  * every (key, salt) bucket joins. Correct for inner joins on any key
  * distribution; result equals the plain join (verified in SkewSpec).
  *
  * At 100 TB: saltFactor bounds the largest post-shuffle partition at
  * ~|hotkey|/saltFactor rows; replication cost is |small| x saltFactor,
  * so use it for dimension-ish right sides (or AQE for two big sides). */
object SkewJoin {

  def salted(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    // deterministic pseudo-salt (hash of whole row + key) so results are
    // reproducible; uniformity is what matters, not randomness
    val salted = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(saltFactor)))
    val replicated = small
      .withColumn("_salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
