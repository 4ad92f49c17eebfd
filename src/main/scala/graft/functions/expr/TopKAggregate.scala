package graft.functions.expr

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: (score desc, id asc)-ordered selection of at
  * most k (score, id) pairs. Flat arrays + insertion sort — k is small
  * (10–100), so O(k) insert beats heap constant factors and the state
  * serializes trivially.
  *
  * `dedupIds` keeps at most one (the best-scored) entry per id — for
  * inputs where the same candidate can be scored more than once (e.g.
  * an LSH pair matching several bands). Partial states dedup within
  * their partition and `mergeFrom` dedups across, so the result is the
  * exact distinct-by-id top-k without a separate pair-dedup shuffle. */
final class TopKState(val k: Int, val dedupIds: Boolean = false) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** Does the new (s, id) rank strictly better than slot i? */
  private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def insert(s: Double, id: Long): Unit = {
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
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.scores(i), buf.ids(i))
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
    // stored in order, so inserts are append-fast
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
