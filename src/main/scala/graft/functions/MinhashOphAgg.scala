package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-permutation minhash signatures with rotation densification:
  * `minhash_oph_sigs(s, nBins, seed)` computes an `nBins`-component
  * signature from ONE hash per input row — the scale formulation of
  * minhash (Li, Owen & Zhang 2012; densification per Shrivastava &
  * Li 2014's rotation scheme).
  *
  * Classic k-hash minhash pays k affine evaluations + k buffer-slot
  * updates per shingle occurrence; at 128 hashes that arithmetic is
  * the dominant CPU of the whole dedup funnel once the exchanges are
  * pruned (SCALING.md round-13). OPH instead splits ONE 64-bit hash's
  * space into `nBins` buckets by its high bits and keeps the min per
  * bucket — one bucket update per row, ~n× less signature CPU — then
  * fills each EMPTY bucket from the nearest non-empty bucket to its
  * right (cyclically), offset by `borrowDistance · C` so that two
  * docs' borrowed values only collide when they borrowed the same
  * value over the same distance. The densified estimator is unbiased
  * for Jaccard; with J ≥ 0.8 pairs and 128 bins the LSH recall
  * arithmetic matches the classic family's (the exact-verify stage
  * downstream catches the residual either way — same 6σ contract).
  *
  * Value bits: bucket = s' >>> (64 − log2 nBins), kept value = s'
  * where s' = (s XOR seed) · golden (an odd-constant remix so the
  * seed decorrelates OPH runs the way `hashParams` seeds the classic
  * family). `Long.MaxValue` doubles as the empty sentinel — a real
  * remixed hash equal to it (2^-64 per row) would read as empty and
  * borrow instead; both sides of a true duplicate pair compute the
  * same borrow, so the estimate survives even that.
  *
  * A group with no non-null input evaluates to NULL (the MIN-family
  * convention shared with `minhash_sigs`).
  */
case class MinhashOphAgg(
    first: Expression, second: Expression, third: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val Golden = 0x9E3779B97F4A7C15L // odd ⇒ bijective remix
  private val Empty = Long.MaxValue

  override def children: Seq[Expression] = Seq(first, second, third)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.exists(_.dataType != LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"$prettyName requires (bigint, bigint, bigint), got " +
            children.map(_.dataType.simpleString).mkString(", "))
    else if (!second.foldable || !third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"$prettyName requires constant (foldable) nBins and seed")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess

  @transient private lazy val n: Int = {
    val v = second.eval() match {
      case l: java.lang.Long => l.longValue
      case other => throw graft.exceptions.InvalidArgumentValue(
        s"$prettyName: nBins must be a non-null bigint constant, " +
          s"got $other")
    }
    if (v < 2 || v > 4096 || (v & (v - 1)) != 0)
      throw graft.exceptions.InvalidArgumentValue(
        s"$prettyName: nBins must be a power of two in [2, 4096], " +
          s"got $v — the bucket index is the hash's high bits")
    v.toInt
  }
  @transient private lazy val shift: Int =
    64 - java.lang.Long.numberOfTrailingZeros(n.toLong)
  @transient private lazy val seedMix: Long = third.eval() match {
    case l: java.lang.Long => l.longValue
    case other => throw graft.exceptions.InvalidArgumentValue(
      s"$prettyName: seed must be a non-null bigint constant, " +
        s"got $other")
  }

  override def dataType: DataType = ArrayType(LongType, false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](n)
    java.util.Arrays.fill(buf, Empty)
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val sv = first.eval(input)
    if (sv != null) {
      val s = (sv.asInstanceOf[Long] ^ seedMix) * Golden
      val bin = (s >>> shift).toInt
      if (s < buf(bin)) buf(bin) = s
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var nonEmpty = false
    var i = 0
    while (i < n && !nonEmpty) {
      nonEmpty = buf(i) != Empty; i += 1
    }
    if (!nonEmpty) return null
    // rotation densification: empty bin j borrows the first
    // non-empty bin to its cyclic right, offset by distance·Golden.
    // Emitted components are TRUNCATED to 31 bits (>>> 33): the
    // affine family's sub-2^31 values compress ~17% better through
    // the estimate-join exchanges (measured, SCALING round-13), and
    // truncation only adds a 2^-31 false-equality to the component
    // estimate — absorbed by the exact verify like every other
    // funnel approximation. Truncate AFTER the borrow offset so
    // distinct borrow distances stay distinguishable.
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      val v =
        if (buf(i) != Empty) buf(i)
        else {
          var t = 1
          while (buf((i + t) & (n - 1)) == Empty) t += 1
          buf((i + t) & (n - 1)) + t.toLong * Golden
        }
      out(i) = v >>> 33
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * n)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](n)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): MinhashOphAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): MinhashOphAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinhashOphAgg =
    copy(first = newChildren(0), second = newChildren(1),
      third = newChildren(2))

  override def prettyName: String = "minhash_oph_sigs"
}
