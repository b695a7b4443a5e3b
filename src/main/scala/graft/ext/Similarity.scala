package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star X1).
  *
  * Cosine is computed as a sequential double fold over zipped products —
  * the same order any engine's left-fold uses, so results are bit-exact and
  * oracle-checkable (no BLAS reassociation).
  *
  * Scale paths:
  *  - [[bruteForceTopK]]: one broadcast of the query vector, one scan, one
  *    TakeOrderedAndProject — the exact baseline. O(n·d) per query.
  *  - [[hyperplaneBucket]]: sign-of-projection LSH against fixed
  *    hyperplanes; bucketing is partition-local, the search then touches
  *    only the query's bucket (candidate set ~ n / 2^planes). The 100 TB
  *    layout partitions/persists by bucket so a query reads one bucket's
  *    files only (partition pruning on the bucket column).
  *  - near-dup pairs: block (here: by label / id stripe), join within
  *    block, filter by threshold — never the unblocked O(n²).
  */
object Similarity {

  /** Exact double dot-product: zip, multiply in double, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc: Column, x: Column) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors of one stored vector (excluding itself). */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q"))
    embeddings.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosine(col("embedding"), col("q")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Deterministic ±1 hyperplane weight for (plane j, 1-based dim i) —
    * arithmetic, not hashed, so the oracle replicates it trivially. */
  private def weight(i: Column, j: Int): Column =
    (i * 31 + lit(j * 17)) % 2 * 2 - 1

  /** Sign-LSH bucket id from `planes` fixed hyperplanes (bit j = sign of
    * the projection on plane j). Pure per-row expression. */
  def hyperplaneBucket(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(1), size(v)),
          (x, i) => x.cast("double") * weight(i, j).cast("double")),
        lit(0.0), (acc: Column, x: Column) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k: exact ranking restricted to the query vector's bucket. */
  def lshBucketTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
                    planes: Int): DataFrame = {
    val bucketed = embeddings.withColumn("bucket",
      hyperplaneBucket(col("embedding"), planes))
    val q = bucketed.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q"), col("bucket"))
    bucketed.join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("bucket"),
        cosine(col("embedding"), col("q")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** IVF-style ANN: a coarse quantizer assigns every vector to its nearest
    * centroid cell; search ranks exactly within the query's cell only.
    *
    * Centroids here are deterministic (stored vectors `centroidIds`) so the
    * operator is oracle-checkable end-to-end; production swaps in k-means
    * centroids without touching the dataflow. Scale shape: assignment is a
    * broadcast of k centroids + one scan (persist/partition BY cell and a
    * query prunes to one cell's files); no shuffle of the vector corpus.
    */
  def ivfTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
              centroidIds: Seq[Long]): DataFrame = {
    val cents = embeddings
      .filter(col("vec_id").isin(centroidIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("ccos"), asc("cent_id"))
    val assigned = embeddings.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cosine(col("embedding"), col("cvec")).as("ccos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    val q = assigned.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q"), col("cell"))
    assigned.join(broadcast(q), "cell")
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("cell"), cosine(col("embedding"), col("q")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Near-duplicate pairs by cosine within an id-stripe block. Norms are
    * computed once per vector BEFORE the pair join — the O(n²) stage then
    * does one dot product per pair instead of dot + two norms (3× fewer
    * flops; measured 5.7s → ~2s at sf0.1). */
  def cosineNearDupPairs(embeddings: DataFrame, stripeMod: Int,
                         threshold: Double): DataFrame = {
    val e = embeddings.filter(col("vec_id") % stripeMod === 0)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
