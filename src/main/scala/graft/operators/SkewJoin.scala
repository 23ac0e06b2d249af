package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash join sends every row of one key to one task; a hot key (the
  * celebrity user, the null-ish default id, the power-law hub node)
  * serializes into a single straggler task. AQE's skew-join splitting
  * handles sort-merge joins after the fact; salting handles it AT the
  * shuffle, works for any join the planner picks, and is the standard
  * recipe when the skew is known. The probe side gains a deterministic
  * salt — `pmod(xxhash64(key columns, row-disambiguating columns),
  * factor)` — and the build side is exploded `factor` ways so every
  * (key, salt) pair exists; the join key becomes `(keys…, salt)`,
  * spreading each hot key over `factor` tasks. Result set is EXACTLY
  * the plain inner join's (each probe row meets each matching build row
  * once — the build replica with the probe's salt), which is what the
  * oracle gate pins.
  *
  * Cost: the build side shuffles `factor ×` its size — use the smaller
  * table as `build`, and factor ≈ the number of cores a hot key should
  * spread over, not more.
  */
object SkewJoin {

  /** Inner-join `probe` (large, skewed) with `build` (smaller) on
    * `keys`, salted `factor` ways. Column contract: probe columns ++
    * build's non-key columns (rename collisions on the way in). */
  def salted(probe: DataFrame, build: DataFrame, keys: Seq[String],
             factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val saltSrc = probe.columns.map(col).toIndexedSeq
    val p = probe.withColumn("__salt",
      pmod(xxhash64(saltSrc: _*), lit(factor.toLong)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
