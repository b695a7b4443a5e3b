package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end integration pipeline — the engine re-expression of the
  * reference's `import_to_mySQL()` (`/root/reference/insert.py:87-191`).
  *
  * Input: raw (un-renamed) contacts / contracts / relations frames as read
  * from the source files. Output: the four conformed tables the reference
  * loads into MySQL, as lazy DataFrames.
  *
  * Divergences from the reference, all deliberate (SURVEY.md §1, §2.4):
  *  - surrogate ids are deterministic sha2 over the natural key
  *    (name, first_name, birthday, entity_type) instead of uuid4 — required
  *    for idempotence, distribution, and oracle checks. Consequently rows
  *    sharing a natural key share an id, and `entities` is deduped on it
  *    (the reference's *intent*; its uuid4 version emits duplicate natural
  *    keys with distinct ids and has the dead-branch bug at insert.py:150).
  *  - phone validity is the NSN-length reduction of libphonenumber's
  *    `is_possible_number` (see [[Phone]]).
  *
  * Plan shape at scale: three scans → partition-local conform/id columns →
  * one union → one dedup shuffle for `entities`; contacts/contracts never
  * shuffle at all. The reference's O(n²) driver-side loops
  * (insert.py:134-166) do not exist here.
  */
object Pipeline {

  final case class Output(
      entities: DataFrame,
      contacts: DataFrame,
      contracts: DataFrame,
      relations: DataFrame)

  private val entityCols =
    Seq("entity_id", "name", "first_name", "birthday", "entity_type")

  def run(contactsRaw: DataFrame, contractsRaw: DataFrame,
          relationsRaw: DataFrame): Output = {

    // Conform: positional rename (insert.py:102-107) + date parsing
    // (insert.py:110-115) + phone normalization (insert.py:118).
    val contacts = Conform.rename(contactsRaw, Conform.contactColumns)
      .withColumn("birthday", Conform.parseDateFr(col("birthday")))
      .withColumn("phone_number", Phone.normalize(col("phone_number")))
      .withColumn("entity_id", Identity.surrogateId(
        col("name"), col("first_name"), col("birthday"), col("entity_type")))

    val contracts = Conform.rename(contractsRaw, Conform.contractColumns)
      .withColumn("birthday", Conform.parseDateFr(col("birthday")))
      .withColumn("open_at", Conform.parseDateFr(col("open_at")))
      .withColumn("date_price", Conform.parseDateFr(col("date_price")))
      .withColumn("entity_type",
        Conform.entityType(col("first_name"), col("birthday")))
      .withColumn("entity_id", Identity.surrogateId(
        col("name"), col("first_name"), col("birthday"), col("entity_type")))

    val relations = Conform.rename(relationsRaw, Conform.relationColumns)
      .withColumn("birthday_s", Conform.parseDateIso(col("birthday_s")))
      .withColumn("birthday_d", Conform.parseDateIso(col("birthday_d")))

    // entities = contacts ∪ contracts ∪ relation endpoints, deduped on the
    // natural key (one shuffle; see scaladoc).
    val entities = contacts.select(entityCols.map(col): _*)
      .unionByName(contracts.select(entityCols.map(col): _*))
      .unionByName(Relations.endpointEntities(relations))
      .dropDuplicates("entity_id")

    // Reshape for load (insert.py:173-174): drop natural-key columns.
    // The contacts dimension is keyed by entity_id (insert.py:189), and
    // with deterministic ids duplicate natural keys now share one id — so
    // the dimension is deduped keep-first under a total order (the same
    // dedup the reference's uuid4-per-row scheme silently avoided while
    // violating its own dedup intent; SURVEY §2.4 BUG-1).
    val contactsOut = {
      val reshaped = contacts.drop("name", "first_name", "birthday", "entity_type")
      val order = reshaped.columns.filterNot(_ == "entity_id").map(col).toSeq
      Identity.dedupFirst(reshaped, Seq("entity_id"), order)
    }

    Output(
      entities = entities,
      contacts = contactsOut,
      contracts = contracts
        .drop("name", "first_name", "birthday", "entity_type", "value"),
      relations = Relations.buildEdges(relations))
  }
}
