package graft.functions.expr

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: selection of at most k (score, id) pairs under
  * the total order (score desc, id asc).
  *
  * Two layouts behind one contract, chosen by k:
  *  - SMALL k (≤ [[TopKState.HeapMinK]], the serving top-10..100 and
  *    every dedupIds caller): flat arrays kept ORDERED by insertion
  *    sort — O(k) insert with cache-friendly constants, state ordered
  *    at rest.
  *  - LARGE k (the re-rank SHORTLIST path, k = topK·candMult — ~20k
  *    at the r13 20M-vector probe's rule point): the same arrays kept
  *    as a MIN-RANK BINARY HEAP (worst kept entry at the root),
  *    insert O(log k). Insertion sort here was the measured stage-1
  *    wall: while the buffer fills, nearly EVERY scanned code inserts
  *    (a prune-dead partition holds ~n/parts ≈ k rows), and the merge
  *    phase re-inserts every partial entry — O(n·k) against the
  *    heap's O(n·log k). [[ordered]] sorts once at eval; which k
  *    survive and their final order are IDENTICAL either way (the
  *    oracle-pinned total order decides both).
  *
  * `dedupIds` keeps at most one (the best-scored) entry per id — for
  * inputs where the same candidate can be scored more than once (e.g.
  * an LSH pair matching several bands). Partial states dedup within
  * their partition and `mergeFrom` dedups across, so the result is the
  * exact distinct-by-id top-k without a separate pair-dedup shuffle.
  * Dedup stays on the ordered layout (its duplicate scan is O(size)
  * either way and its callers use small k). */
final class TopKState(val k: Int, val dedupIds: Boolean = false) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0
  private val heapMode = !dedupIds && k > TopKState.HeapMinK

  /** Does the new (s, id) rank strictly better than slot i? */
  private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  /** Does slot a rank strictly WORSE than (s, id)? (the heap order —
    * the root is the worst kept entry) */
  private def worseThan(a: Int, s: Double, id: Long): Boolean =
    scores(a) < s || (scores(a) == s && ids(a) > id)

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worseThan(i, scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worseThan(l, scores(w), ids(w))) w = l
      if (r < size && worseThan(r, scores(w), ids(w))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  def insert(s: Double, id: Long): Unit = {
    if (heapMode) {
      if (size < k) {
        scores(size) = s; ids(size) = id; size += 1
        siftUp(size - 1)
      } else if (worseThan(0, s, id)) { // new strictly beats the worst kept
        scores(0) = s; ids(0) = id
        siftDown()
      }
      return
    }
    if (dedupIds) {
      var e = 0
      while (e < size && ids(e) != id) e += 1
      if (e < size) {
        if (!beats(s, id, e)) return // kept entry is at least as good
        // strictly better duplicate: drop the kept one, insert below
        var j = e
        while (j < size - 1) { scores(j) = scores(j + 1); ids(j) = ids(j + 1); j += 1 }
        size -= 1
      }
    }
    if (size == k && !beats(s, id, k - 1)) return // doesn't beat the worst kept
    var i = 0
    while (i < size && !beats(s, id, i)) i += 1 // skip better-ranked entries
    var j = math.min(size, k - 1)
    while (j > i) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(i) = s; ids(i) = id
    if (size < k) size += 1
  }

  def mergeFrom(o: TopKState): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }

  /** The kept entries under the output total order (score desc, id
    * asc): the ordered layout is already there; a heap state sorts its
    * (bounded, ≤ k) survivors once here. */
  def ordered(): (Array[Double], Array[Long]) =
    if (!heapMode) (scores, ids)
    else {
      val idx = Array.range(0, size).sortWith { (a, b) =>
        scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
      }
      (idx.map(scores), idx.map(ids))
    }
}

object TopKState {
  /** Above this k the state keeps a heap instead of a sorted array —
    * the crossover is well below where O(k)-per-insert hurts, and the
    * small-k serving path keeps its cache-friendly flat layout. */
  val HeapMinK = 128
}

/** `topk_by_score(score, id, k)` — aggregate returning the k highest
  * (score, id) pairs as `array<struct<score double, id long>>`,
  * ordered by (score desc, id asc).
  *
  * Scale rationale: the window formulation (`row_number over
  * (partition by q order by s desc)`) must SHUFFLE every scored pair
  * to rank them — |Q|·|C| rows through the exchange. This aggregate
  * keeps k rows per group per partition map-side (partial aggregation),
  * so the exchange carries ≤ partitions·|Q|·k rows regardless of
  * corpus size. That is the difference between ANN over 100 TB
  * shuffling terabytes vs megabytes. */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    dedupIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKState = new TopKState(k, dedupIds)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKState): Any = {
    val (s, ids) = buf.ordered()
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(s(i), ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new TopKState(k, dedupIds)
    var i = 0
    // raw layout order (sorted or heap) — re-inserting rebuilds the
    // mode's own invariant; the selection is order-independent
    while (i < n) { st.insert(bb.getDouble, bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
