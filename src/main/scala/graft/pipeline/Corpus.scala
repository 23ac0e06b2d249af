package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composite training-corpus preparation: quality gate → exact dedup →
  * (optionally) near-dedup. The composition is what a real data pipeline
  * runs end-to-end; each stage keeps its scale shape (projection filter,
  * one hash-aggregate shuffle, LSH candidate join).
  */
object Corpus {

  /** Quality-filter then exact-dedup a document set. Returns one row per
    * surviving distinct text: representative (min id) + multiplicity. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double = 0.5): DataFrame =
    Dedup.exact(
      docs.filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality),
      idCol, Seq(textCol))

  /** Full pipeline: quality gate, exact dedup, then drop near-duplicates
    * (minhash-LSH; the lower-id member of each near-dup pair survives).
    * Returns the surviving representative ids. */
  def cleanNearDedup(docs: DataFrame, idCol: String, textCol: String,
                     minQuality: Double = 0.5,
                     jaccardThreshold: Double = 0.8): DataFrame = {
    val exact = clean(docs, idCol, textCol, minQuality)
    val kept = docs.join(exact.select(col(idCol)), idCol)
    val nearDups = Dedup.minhashLsh(kept, idCol, textCol,
      threshold = jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    kept.join(nearDups, Seq(idCol), "left_anti").select(col(idCol))
  }
}
