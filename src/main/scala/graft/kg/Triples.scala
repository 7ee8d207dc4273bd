package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triple materialization (SURVEY §2 G7/A15): linked+canonicalized mentions →
  * (subj, pred, obj, doc_id) rows.
  *
  * Predicates (north rule): mentions, sameAs, inDoc, label, category.
  * subj is the canonical entity URI `ent:<canonical_id>`.
  */
object Triples {

  private def uri(c: org.apache.spark.sql.Column) = concat(lit("ent:"), c.cast("string"))

  /** linked: output of Linker.link joined with canonical ids (columns
    * entity_id, canonical_id, canonical, dict_category, surface, doc_id, ...).
    */
  def fromLinkedMentions(linked: DataFrame): DataFrame = {
    val base = linked.select(
      uri(col("canonical_id")).as("subj"),
      col("entity_id"), col("canonical"), col("dict_category"),
      col("surface"), col("doc_id"))

    val mentions = base.select(col("subj"), lit("mentions").as("pred"), col("surface").as("obj"), col("doc_id"))
    val inDoc = base.select(col("subj"), lit("inDoc").as("pred"), col("doc_id").as("obj"), col("doc_id")).distinct()
    val label = base.select(col("subj"), lit("label").as("pred"), col("canonical").as("obj"), col("doc_id")).distinct()
    val category = base.select(col("subj"), lit("category").as("pred"), col("dict_category").as("obj"), col("doc_id")).distinct()
    val sameAs = base
      .filter(uri(col("entity_id")) =!= col("subj"))
      .select(col("subj"), lit("sameAs").as("pred"), uri(col("entity_id")).as("obj"), col("doc_id"))
      .distinct()

    mentions.unionByName(inDoc).unionByName(label).unionByName(category).unionByName(sameAs)
  }
}
