package graft.functions.expr

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with k counters.
  *
  * Invariants (the classic MG guarantee, preserved under merge per the
  * mergeable-summaries construction): after processing n items,
  *   - every stored count `c_i` satisfies `f_i - n/(k+1) <= c_i <= f_i`
  *     (`f_i` = the item's true frequency), and
  *   - every item with `f_i > n/(k+1)` IS stored — so with
  *     `k + 1 > 1/phi` the summary's key set is a guaranteed SUPERSET
  *     of the phi-heavy hitters.
  *
  * State is O(k) regardless of input cardinality: this is what makes
  * frequent-items queries feasible when the item domain (n-grams,
  * URLs, user ids at 100 TB) is too large to hash-aggregate exactly —
  * partial aggregation keeps k counters per partition and the exchange
  * carries one k-entry summary per partition instead of one row per
  * distinct item. */
final class MgState(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)
  var n: Long = 0L

  def add(item: String): Unit = {
    n += 1
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) {
      counts.put(item, cur + 1)
    } else if (counts.size < k) {
      counts.put(item, 1L)
    } else {
      // full and item absent: decrement all, drop zeros (absorbs the
      // new item's weight too — k+1 units per step, hence the n/(k+1)
      // error bound)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
      }
    }
  }

  /** Mergeable-summaries merge: pointwise sum, then if over k entries
    * subtract the (k+1)-th largest count from all and drop non-positive
    * — combined error stays <= (n1+n2)/(k+1). */
  def mergeFrom(o: MgState): Unit = {
    n += o.n
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** `mg_summary(item, k)` — aggregate returning
  * `struct<n: bigint, items: array<struct<item string, lo bigint>>>`:
  * the input count and the Misra–Gries k-counter summary, ordered by
  * (lo desc, item asc) for determinism.
  *
  * The intended use is two-pass EXACT heavy hitters without a
  * full-cardinality shuffle: pass 1 collects the candidate superset
  * (guaranteed to contain every item with frequency > n/(k+1)); pass 2
  * semi-joins the raw data against the <= k candidates (broadcast) and
  * recounts exactly — the final `HAVING count >= ceil(phi*n)` result is
  * deterministic and independent of partitioning, even though the MG
  * counts themselves are not. */
case class MgSummary(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lo", LongType, nullable = false))), containsNull = false),
      nullable = false)))
  override def prettyName: String = "mg_summary"

  override def createAggregationBuffer(): MgState = new MgState(k)

  override def update(buf: MgState, input: InternalRow): MgState = {
    val v = itemExpr.eval(input)
    // null items are skipped (not counted in n): a null can't be a hitter
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgState, other: MgState): MgState = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgState): Any = {
    import scala.jdk.CollectionConverters._
    val entries = buf.counts.entrySet().asScala.toArray
      .sortBy(e => (-e.getValue, e.getKey))
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      rows(i) = InternalRow(UTF8String.fromString(entries(i).getKey), entries(i).getValue)
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(rows))
  }

  override def serialize(buf: MgState): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    val items = buf.counts.entrySet().asScala.toArray
    val bytes = items.map(e => e.getKey.getBytes(StandardCharsets.UTF_8))
    var len = 8 + 4
    var i = 0
    while (i < items.length) { len += 4 + bytes(i).length + 8; i += 1 }
    val bb = ByteBuffer.allocate(len)
    bb.putLong(buf.n)
    bb.putInt(items.length)
    i = 0
    while (i < items.length) {
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(items(i).getValue)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new MgState(k)
    st.n = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val blen = bb.getInt
      val arr = new Array[Byte](blen)
      bb.get(arr)
      st.counts.put(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSummary =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSummary =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgSummary =
    copy(itemExpr = newChildren(0))
}
