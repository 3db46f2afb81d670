package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregation state: a worst-first heap of (value, payload)
  * pairs, "better" = larger value, tie-broken by smaller payload. */
final class TopKState(val k: Int) {
  // head = the WORST kept entry (smallest value, then largest payload) —
  // the one a better candidate evicts
  val pq: scala.collection.mutable.PriorityQueue[(Long, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.fromLessThan[(Long, Long)]((a, b) =>
        if (a._1 != b._1) a._1 > b._1 else a._2 < b._2))

  def offer(v: Long, p: Long): Unit =
    if (pq.size < k) pq.enqueue((v, p))
    else {
      val w = pq.head
      if (v > w._1 || (v == w._1 && p < w._2)) { pq.dequeue(); pq.enqueue((v, p)) }
    }
}

/** Top-k (value, payload) pairs per group as a bounded-heap
  * TypedImperativeAggregate — the scale-correct replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` window: the
  * window SORTS every group's full row set; this keeps O(k) state per
  * group with map-side partial aggregation, so a 100 TB top-3-per-brand
  * never materializes or sorts the long tail. Output: array<struct<v,p>>
  * ordered v desc, p asc (rank = array position + 1). */
case class TopKPairs(
    value: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(value, payload)
  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && payload.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (bigint, bigint), got " +
        s"(${value.dataType.simpleString}, ${payload.dataType.simpleString})")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("p", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(b: TopKState, input: InternalRow): TopKState = {
    val v = value.eval(input)
    if (v != null) {
      val p = payload.eval(input)
      if (p != null) b.offer(v.asInstanceOf[Long], p.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKState, other: TopKState): TopKState = {
    other.pq.foreach { case (v, p) => b.offer(v, p) }
    b
  }

  override def eval(b: TopKState): Any = {
    val sorted = b.pq.toArray.sortWith((a, x) =>
      if (a._1 != x._1) a._1 > x._1 else a._2 < x._2)
    new GenericArrayData(sorted.map { case (v, p) => InternalRow(v, p) })
  }

  override def serialize(b: TopKState): Array[Byte] = {
    val arr = b.pq.toArray
    val buf = ByteBuffer.allocate(8 + arr.length * 16)
    buf.putLong(arr.length.toLong)
    arr.foreach { case (v, p) => buf.putLong(v); buf.putLong(p) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong.toInt
    val b = new TopKState(k)
    (0 until n).foreach(_ => b.offer(buf.getLong, buf.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(value = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "graft_topk"
}

/** Misra-Gries frequent-items state over hashed (long) items: at most
  * `capacity` counters. The classic bound survives distributed merging
  * (mergeable-summaries form): any item with global count > n/(capacity+1)
  * is guaranteed present in the merged candidate set. */
final class MisraGriesState(val capacity: Int) {
  val counts = new java.util.HashMap[Long, Long]()

  def offer(item: Long): Unit = {
    val cur = counts.getOrDefault(item, 0L)
    if (cur > 0L) counts.put(item, cur + 1L)
    else if (counts.size < capacity) counts.put(item, 1L)
    else {
      // classic Misra-Gries: decrement every counter, drop zeros, discard
      // the incoming item
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Merge (mergeable-summaries): sum counters; if over capacity, subtract
    * the (capacity+1)-th largest count from all and drop ≤ 0. */
  def mergeIn(other: MisraGriesState): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > capacity) {
      val values = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val cut = values(counts.size - capacity - 1) // (capacity+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0) eit.remove() else e.setValue(nv)
      }
    }
  }
}

/** Misra-Gries candidate set (array of hashed items, sorted) — pass 1 of
  * the exact two-pass heavy-hitters: bounded state per partition, merged
  * map-side; pass 2 re-counts only the ≤ capacity candidates exactly. */
case class MisraGries(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesState] {
  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_misra_gries expects bigint, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MisraGriesState = new MisraGriesState(capacity)

  override def update(b: MisraGriesState, input: InternalRow): MisraGriesState = {
    val v = child.eval(input)
    if (v != null) b.offer(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MisraGriesState, other: MisraGriesState): MisraGriesState = {
    b.mergeIn(other)
    b
  }

  override def eval(b: MisraGriesState): Any = {
    val keys = new Array[Long](b.counts.size)
    val it = b.counts.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(b: MisraGriesState): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + b.counts.size * 16)
    buf.putLong(b.counts.size.toLong)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.putLong(e.getKey); buf.putLong(e.getValue)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong.toInt
    val b = new MisraGriesState(capacity)
    (0 until n).foreach { _ =>
      val k = buf.getLong; val c = buf.getLong
      b.counts.put(k, c)
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_misra_gries"
}

/** KMV (k-minimum-values) distinct sketch state: the k smallest DISTINCT
  * hash values seen. Fully mergeable (set-union + trim) and DETERMINISTIC
  * — no RNG, the hash function is the randomness — so unlike HLL-style
  * sketches the estimate is bit-for-bit replayable by any engine that can
  * sort the same hashes (the DuckDB oracle replays it exactly). */
final class KMinState(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def offer(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) {
      if (set.add(h)) { set.remove(set.last()); () }
    }
  }
  def mergeIn(other: KMinState): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) offer(it.next())
  }
}

/** The k smallest distinct hashes per group as a TypedImperativeAggregate
  * — the state behind an exact-replayable approximate-distinct: O(k) per
  * group with map-side partial aggregation, where `count(DISTINCT h)`
  * shuffles every distinct value and `collect_set` holds the whole
  * domain. Output: array<bigint> ascending, length min(k, true distinct).
  * The estimator lives caller-side (see TextCorpus.distinctSketch): with
  * fewer than k kept the count is EXACT; at k the classic KMV estimate
  * (k−1)/normalized(kth-min) applies, integer-exactly. */
case class KMinDistinct(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinState] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmin_distinct expects bigint, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KMinState = new KMinState(k)

  override def update(b: KMinState, input: InternalRow): KMinState = {
    val v = child.eval(input)
    if (v != null) b.offer(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KMinState, other: KMinState): KMinState = {
    b.mergeIn(other)
    b
  }

  override def eval(b: KMinState): Any = {
    val out = new Array[Long](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: KMinState): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + b.set.size * 8)
    buf.putLong(b.set.size.toLong)
    val it = b.set.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KMinState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong.toInt
    val b = new KMinState(k)
    (0 until n).foreach(_ => b.offer(buf.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KMinDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinDistinct =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_kmin_distinct"
}

/** HyperLogLog register state: `m = 2^p` register maxima over a
  * `hashBits`-bit non-negative hash. Register index = top `p` hash bits;
  * rho = 1 + leading zeros of the remaining `F = hashBits − p` bits
  * (`F + 1` for an all-zero remainder). Registers are element-wise-MAX
  * mergeable — max is idempotent AND commutative, the strongest fold
  * class (replays and late data are exact by construction, no txn guard
  * needed) — and with a deterministic hash the whole state is bit-for-bit
  * replayable by any engine that can count leading zeros (the DuckDB
  * oracle replays it via `length(bin(rem))`). */
final class HllState(val m: Int, val hashBits: Int, val p: Int) {
  val registers = new Array[Byte](m)

  def offer(h: Long): Unit = {
    if (h < 0L || (hashBits < 63 && h >= (1L << hashBits)))
      throw new IllegalArgumentException(
        s"graft_hll_registers: hash $h outside [0, 2^$hashBits) — the " +
          "register/rho split needs the declared hash width; fix the hash " +
          "projection upstream")
    val f = hashBits - p
    val reg = (h >>> f).toInt
    val rem = h & ((1L << f) - 1L)
    val rho = if (rem == 0L) f + 1
      else f - (64 - java.lang.Long.numberOfLeadingZeros(rem)) + 1
    if (rho > registers(reg)) registers(reg) = rho.toByte
  }

  def mergeIn(other: HllState): Unit = {
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }
}

/** HLL register maxima per group as a TypedImperativeAggregate: O(m)
  * state per group with map-side partial aggregation — the fixed-size
  * complement to [[KMinDistinct]]'s O(k) order-dependent state (KMV keeps
  * the k smallest hashes; HLL keeps 2^p leading-zero maxima — pick KMV
  * when small counts must be EXACT, HLL when the state must be
  * fixed-size and the fold idempotent). Output: array<int> of length m
  * (register maxima, 0 = never touched). The estimator lives caller-side
  * (see [[graft.operators.Sketches.hllSketch]]), integer-exactly. */
case class HllRegisters(
    child: Expression, p: Int, hashBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllState] {
  require(p >= 4 && p <= 14, s"p must be in [4, 14] (16..16384 registers), got $p")
  require(hashBits > p && hashBits <= 61,
    s"hashBits must be in (p, 61] so the 2^(F+1) inverse-power sums fit a " +
      s"BIGINT, got $hashBits")

  private def m: Int = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_registers expects bigint, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllState = new HllState(m, hashBits, p)

  override def update(b: HllState, input: InternalRow): HllState = {
    val v = child.eval(input)
    if (v != null) b.offer(v.asInstanceOf[Long])
    b
  }

  override def merge(b: HllState, other: HllState): HllState = {
    b.mergeIn(other)
    b
  }

  override def eval(b: HllState): Any =
    new GenericArrayData(b.registers.map(_.toInt))

  override def serialize(b: HllState): Array[Byte] = b.registers.clone()

  override def deserialize(bytes: Array[Byte]): HllState = {
    val b = new HllState(m, hashBits, p)
    System.arraycopy(bytes, 0, b.registers, 0, m)
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): HllRegisters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegisters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_hll_registers"
}

/** Column-API entry points for the native aggregates. */
object NativeAgg {
  def kMinDistinct(hash: Column, k: Int): Column =
    Bridge.column(KMinDistinct(Bridge.expression(hash), k)
      .toAggregateExpression())
  def topKPairs(value: Column, payload: Column, k: Int): Column =
    Bridge.column(TopKPairs(Bridge.expression(value), Bridge.expression(payload), k)
      .toAggregateExpression())
  def misraGries(item: Column, capacity: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(item), capacity)
      .toAggregateExpression())
  def hllRegisters(hash: Column, p: Int, hashBits: Int): Column =
    Bridge.column(HllRegisters(Bridge.expression(hash), p, hashBits)
      .toAggregateExpression())
}
