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
      LearnQ.registry,
      LinkageQ.registry
    )
    val pairs = parts.flatten
    val merged = pairs.toMap
    // toMap silently keeps the LAST duplicate — compare the DEDUPED size
    // (the old `pairs.size` comparison was vacuously true and let a
    // duplicate name shadow a query unnoticed).
    require(merged.size == pairs.size,
      s"duplicate query name across registries: ${pairs.map(_._1)
        .groupBy(identity).collect { case (n, o) if o.size > 1 => n }
        .mkString(", ")}")
    merged
  }
}
