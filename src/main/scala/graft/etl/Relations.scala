package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relation (edge) conformance: label mapping + endpoint identity.
  * Reference: `/root/reference/insert.py:132-166`. */
object Relations {

  /** J3/C8 — FR relation label → enum (insert.py:156-159). A literal
    * `when` chain (3 entries) beats a join: broadcast-free, codegen'd.
    * Unmatched labels → NULL, matching `dict.get`. Note the dataset's own
    * spelling "espoux (e) de". */
  def mapRelationType(label: Column): Column =
    when(label === "espoux (e) de", "SPOUSE_OF")
      .when(label === "parent (e) de", "PARENT_OF")
      .when(label === "enfant (e) de", "CHILD_OF")

  /** Conformed relations input → edge list with deterministic endpoint ids.
    *
    * Reference semantics implemented (insert.py:134-162, intended — see
    * SURVEY.md §2.4 BUG-1): skip rows where either endpoint's first_name is
    * null (F3); both endpoints typed 'PF'; endpoints deduped by natural key
    * (name, first_name, birthday, 'PF') with one id per key; one output edge
    * per surviving input row (duplicates kept).
    */
  def buildEdges(relations: DataFrame): DataFrame = {
    relations
      .filter(col("first_name_s").isNotNull && col("first_name_d").isNotNull)
      .select(
        Identity.surrogateId(col("name_s"), col("first_name_s"),
          col("birthday_s"), lit("PF")).as("entity_id_source"),
        Identity.surrogateId(col("name_d"), col("first_name_d"),
          col("birthday_d"), lit("PF")).as("entity_id_destination"),
        mapRelationType(col("relation_type")).as("relation_type"))
  }

  /** The distinct endpoint entities referenced by the edges — the engine
    * equivalent of the reference's `entities_mapper` flush
    * (insert.py:165-166): one row per natural key, typed 'PF'. */
  def endpointEntities(relations: DataFrame): DataFrame = {
    val filtered = relations
      .filter(col("first_name_s").isNotNull && col("first_name_d").isNotNull)
    val sources = filtered.select(
      col("name_s").as("name"), col("first_name_s").as("first_name"),
      col("birthday_s").as("birthday"))
    val dests = filtered.select(
      col("name_d").as("name"), col("first_name_d").as("first_name"),
      col("birthday_d").as("birthday"))
    sources.unionByName(dests)
      .distinct()
      .select(
        Identity.surrogateId(col("name"), col("first_name"),
          col("birthday"), lit("PF")).as("entity_id"),
        col("name"), col("first_name"), col("birthday"),
        lit("PF").as("entity_type"))
  }
}
