package graft.queries

import graft.QuerySpec

/** Single place where module query registries are concatenated.
  * Duplicate names would silently shadow a query, so fail fast. */
object Registry {
  def all: Map[String, QuerySpec] = {
    val parts: Seq[Map[String, QuerySpec]] = Seq(
      Relational.registry,
      Etl.registry,
      Analytic.registry,
      Events.registry,
      Text.registry,
      DedupQ.registry,
      SimilarityQ.registry,
      MultimodalQ.registry,
      Scale.registry,
      Warehouse.registry,
      Integration.registry,
      GraphQ.registry,
      LearnQ.registry
    )
    val merged = parts.flatten
    require(merged.size == parts.map(_.size).sum,
      "duplicate query name across registries")
    merged.toMap
  }
}
