package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values buffer: the k smallest DISTINCT strings
  * seen, as a typed partial+final `Aggregator` — the state of a KMV
  * distinct-count sketch (Bar-Yossef et al. 2002) over md5-hashed
  * values.
  *
  * Why not `collect_set` + `slice(array_sort(...))`: that buffers every
  * distinct value per group in one aggregation buffer before truncating
  * — the same corpus-sized-buffer anti-pattern the inverted-index cap
  * avoids. Here each map task reduces its slice to ≤ k strings, merges
  * union bounded buffers, and the shuffle carries ≤ k values per
  * (partition, group) — fixed-size state at any input scale, which is
  * the entire point of a cardinality sketch.
  *
  * Distinctness is enforced INSIDE the buffer: duplicate hashes must
  * not occupy two of the k slots or the k-th minimum — the estimator's
  * input — would be biased low. The membership probe is a linear scan
  * of ≤ k entries, reached only after the `v < head` bound check
  * rejects the (overwhelming at scale) non-candidate majority; the
  * [[TopKAggregator]] heap layout is reused with the comparator
  * inverted (head = LARGEST kept value = the eviction candidate).
  *
  * `finish` returns the ascending array; callers read element k−1 as
  * the k-th minimum. Determinism: input strings are md5 hex (lowercase
  * ASCII), so binary string order is total and engine-independent.
  */
class BottomKStrings(k: Int)
    extends Aggregator[String, mutable.PriorityQueue[String], Array[String]] {
  require(k >= 2, s"k must be at least 2: $k")

  // head = WORST element for a bottom-k = the largest kept string
  override def zero: mutable.PriorityQueue[String] =
    mutable.PriorityQueue.empty[String](Ordering.String)

  private def add(buf: mutable.PriorityQueue[String], v: String): Unit =
    if (v != null && (buf.size < k || v < buf.head) && !buf.exists(_ == v)) {
      buf.enqueue(v)
      if (buf.size > k) buf.dequeue()
    }

  override def reduce(
      buf: mutable.PriorityQueue[String], in: String): mutable.PriorityQueue[String] = {
    add(buf, in); buf
  }

  override def merge(
      a: mutable.PriorityQueue[String],
      b: mutable.PriorityQueue[String]): mutable.PriorityQueue[String] = {
    b.foreach(add(a, _)); a
  }

  override def finish(buf: mutable.PriorityQueue[String]): Array[String] =
    buf.toArray.sorted

  override def bufferEncoder: Encoder[mutable.PriorityQueue[String]] =
    Encoders.kryo[mutable.PriorityQueue[String]]
  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
