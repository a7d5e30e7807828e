package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{BloomFilterAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable summary aggregates — the sketch shapes whose POINT is the
  * aggregation topology: a bounded partial state per partition, merged
  * associatively, so the shuffle carries O(partitions × k) state instead
  * of the raw stream or the full key domain. Scalar one-pass sketches
  * (MinHash, SimHash, quantize) live in [[NativeExpressions]]; these are
  * the `TypedImperativeAggregate`s.
  */
object SketchAggregates {

  /** Misra-Gries heavy-hitters summary (Misra & Gries 1982), k counters.
    *
    * Deterministic (no hashing, no randomness) and MERGEABLE in the
    * Agarwal et al. "Mergeable Summaries" (PODS'12) sense: pointwise-sum
    * two summaries, then subtract the (k+1)-th largest counter value and
    * drop non-positive entries. Under any tree of merges the estimate
    * satisfies  true - n/(k+1) <= est <= true,  so every key with
    * frequency > n/(k+1) is guaranteed present in the summary — the
    * property q70's oracle check rests on.
    *
    * At 100 TB this is the frequent-token pass that needs NO shuffle of
    * the token stream and NO vocabulary-sized state (contrast q61, which
    * shuffles the vocabulary): each task keeps k counters, the merge
    * combines 32 summaries of k entries. The exact per-key count it is
    * validated against (q70's second branch) is the thing that stops
    * scaling when the key domain does.
    *
    * Update cost: the decrement-all step is O(k) but runs at most n/(k+1)
    * times total (each run removes k+1 weight), so the amortized per-row
    * cost is O(1).
    */
  case class MisraGries(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("key", StringType, nullable = false),
        StructField("est", LongType, nullable = false))),
      containsNull = false)

    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"misra_gries needs a string key, got ${child.dataType.catalogString}")
      else if (k < 1)
        TypeCheckResult.TypeCheckFailure(s"misra_gries needs k >= 1, got $k")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): mutable.HashMap[String, Long] =
      mutable.HashMap.empty

    override def update(
        buf: mutable.HashMap[String, Long],
        input: InternalRow): mutable.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val key = v.asInstanceOf[UTF8String].toString
        buf.get(key) match {
          case Some(c) => buf.update(key, c + 1L)
          case None if buf.size < k => buf.update(key, 1L)
          case None =>
            // classic MG absorb: the unseen item and one unit of every
            // counter cancel (k+1 weight removed); zeroed counters leave
            val dead = mutable.ArrayBuffer.empty[String]
            buf.foreach { case (kk, c) =>
              if (c == 1L) dead += kk else buf.update(kk, c - 1L)
            }
            dead.foreach(buf.remove)
        }
      }
      buf
    }

    override def merge(
        b1: mutable.HashMap[String, Long],
        b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b2.foreach { case (kk, c) => b1.update(kk, b1.getOrElse(kk, 0L) + c) }
      if (b1.size > k) {
        // subtract the (k+1)-th largest value; at most k survive strictly
        val vals = b1.values.toArray
        java.util.Arrays.sort(vals)
        val t = vals(vals.length - 1 - k)
        val dead = mutable.ArrayBuffer.empty[String]
        b1.foreach { case (kk, c) =>
          if (c - t <= 0L) dead += kk else b1.update(kk, c - t)
        }
        dead.foreach(b1.remove)
      }
      b1
    }

    override def eval(buf: mutable.HashMap[String, Long]): Any =
      new GenericArrayData(buf.toSeq.sortBy(_._1).map { case (kk, c) =>
        InternalRow(UTF8String.fromString(kk), c)
      }.toArray[Any])

    override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (kk, c) => out.writeUTF(kk); out.writeLong(c) }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGries =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGries =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MisraGries =
      copy(child = c)
    override def prettyName: String = "misra_gries"
  }

  /** Column builder: `misra_gries(key, k)` — array<struct<key,est>> of at
    * most k candidate heavy hitters, sorted by key.
    */
  def misraGries(key: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGries(GraftColumnBridge.expression(key), k).toAggregateExpression())

  // --------------------------------------------------------------------
  // Bloom-filter semi-join pruning (q69) — Spark ships the aggregate/test
  // expression pair (BloomFilterAggregate / BloomFilterMightContain) for
  // its own runtime row-level filtering but does not expose them as
  // public functions; these builders surface the same codepath for
  // EXPLICIT pruning: build the filter distributed (partial filters
  // OR-merge), ship one binary to the probe side, and test at the scan —
  // the fact table is pruned BEFORE any shuffle or join.
  // --------------------------------------------------------------------

  /** Distributed bloom build over xxhash64(key): one binary blob out. */
  def bloomFilterAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftColumnBridge.expression(key))),
        Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Membership probe against a built filter (false positives possible,
    * false negatives impossible — callers follow with an exact join).
    */
  def mightContain(bloom: Column, key: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(
        GraftColumnBridge.expression(bloom),
        new XxHash64(Seq(GraftColumnBridge.expression(key)))))
}
