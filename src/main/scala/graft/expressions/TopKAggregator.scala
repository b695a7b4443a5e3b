package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed user-defined aggregate (X4 surface): exact top-k (score, id)
  * pairs per group via a bounded min-heap — O(k) state per group instead
  * of the full sort a window-function formulation shuffles.
  *
  * Classic use at 100 TB: top-k similar documents per query bucket, top-k
  * spenders per segment. Merge is associative/commutative (heap union,
  * re-bounded), so map-side partial aggregation applies — each partition
  * sends at most k pairs per group to the reducer, vs the window approach
  * shuffling every row. Determinism: ties broken by id ascending, so the
  * result is a function of the input SET.
  *
  * Registered via `functions.udaf` (see TopKAggregatorSpec) for Column/SQL
  * use.
  */
final case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, mutable.PriorityQueue[ScoredId], Array[ScoredId]] {

  // min-heap on (score, then id desc) so the weakest survivor is on top
  private def heapOrdering: Ordering[ScoredId] =
    Ordering.by[ScoredId, (Double, Long)](s => (s.score, -s.id)).reverse

  override def zero: mutable.PriorityQueue[ScoredId] =
    mutable.PriorityQueue.empty(heapOrdering)

  private def bounded(h: mutable.PriorityQueue[ScoredId]): mutable.PriorityQueue[ScoredId] = {
    while (h.size > k) h.dequeue()
    h
  }

  override def reduce(h: mutable.PriorityQueue[ScoredId],
                      x: ScoredId): mutable.PriorityQueue[ScoredId] = {
    h.enqueue(x); bounded(h)
  }

  override def merge(a: mutable.PriorityQueue[ScoredId],
                     b: mutable.PriorityQueue[ScoredId]): mutable.PriorityQueue[ScoredId] = {
    b.foreach(a.enqueue(_)); bounded(a)
  }

  override def finish(h: mutable.PriorityQueue[ScoredId]): Array[ScoredId] =
    h.toArray.sortBy(s => (-s.score, s.id))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[ScoredId]] =
    Encoders.kryo[mutable.PriorityQueue[ScoredId]]
  override def outputEncoder: Encoder[Array[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredId]]()
}
