package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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

  // --------------------------------------------------------------------
  // Shared deterministic 64-bit hashing for the sketches below. FNV-1a
  // (public-domain constants) + a splitmix64 finalizer: build side and
  // probe side MUST agree bit-for-bit, so both call these statics.
  // --------------------------------------------------------------------
  object GraftHash {
    def fnv1a(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      h
    }

    /** splitmix64 finalizer — decorrelates the second CMS hash from the
      * first (Kirsch-Mitzenmacher double hashing h1 + i*h2).
      */
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }

    /** Row-i counter position for a CMS of the given width. */
    def cmsPos(key: UTF8String, i: Int, width: Int): Int = {
      val h1 = fnv1a(key.getBytes)
      val h2 = mix(h1) | 1L
      java.lang.Math.floorMod(h1 + i.toLong * h2, width.toLong).toInt
    }
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005): depth×width counter
    * matrix, point query = min over rows. One-sided DETERMINISTIC
    * guarantee est >= true (counters only ever add); the overcount is
    * collision mass, in expectation N/width per row and min'd over
    * `depth` independent rows — the bound q80's oracle check rests on.
    *
    * Mergeable exactly (counter matrices add pointwise), so the shuffle
    * carries depth×width longs per partition regardless of the key
    * domain — the frequency-estimation twin of [[MisraGries]]: MG keeps
    * the IDENTITIES of heavy keys, CMS answers point queries for ANY
    * key; pipelines run CMS when the query keys are known downstream
    * (per-domain counts, per-user rate limits) and the domain is too
    * large to shuffle.
    */
  case class CountMin(
      child: Expression,
      depth: Int,
      width: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"count_min needs a string key, got ${child.dataType.catalogString}")
      else if (depth < 1 || width < 1)
        TypeCheckResult.TypeCheckFailure(s"count_min needs depth/width >= 1")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val key = v.asInstanceOf[UTF8String]
        var i = 0
        while (i < depth) {
          buf(i * width + GraftHash.cmsPos(key, i, width)) += 1L
          i += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any =
      new GenericArrayData(buf.map(Long.box).toArray[Any])

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(o: Int): CountMin =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMin =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CountMin =
      copy(child = c)
    override def prettyName: String = "count_min"
  }

  /** Point query against an eval'd [[CountMin]] sketch: min over the
    * depth rows at the key's positions. Probe volume is tiny (the
    * tracked-key list), so interpreted eval is fine — the hot path is
    * the build aggregate.
    */
  case class CountMinQuery(
      sketch: Expression,
      key: Expression,
      depth: Int,
      width: Int)
    extends Expression with CodegenFallback {

    override def children: Seq[Expression] = Seq(sketch, key)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      if (!sketch.dataType.isInstanceOf[ArrayType] ||
          sketch.dataType.asInstanceOf[ArrayType].elementType != LongType)
        TypeCheckResult.TypeCheckFailure("count_min_query needs array<bigint> sketch")
      else if (key.dataType != StringType)
        TypeCheckResult.TypeCheckFailure("count_min_query needs a string key")
      else TypeCheckResult.TypeCheckSuccess

    override def eval(input: InternalRow): Any = {
      val s = sketch.eval(input)
      val k = key.eval(input)
      if (s == null || k == null) null
      else {
        val arr = s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val ks = k.asInstanceOf[UTF8String]
        var best = Long.MaxValue
        var i = 0
        while (i < depth) {
          val c = arr.getLong(i * width + GraftHash.cmsPos(ks, i, width))
          if (c < best) best = c
          i += 1
        }
        best
      }
    }

    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): CountMinQuery =
      copy(sketch = cs(0), key = cs(1))
    override def prettyName: String = "count_min_query"
  }

  /** K-minimum-values distinct sketch (Bar-Yossef et al. 2002 / Beyer et
    * al. "Distinct-value synopses" SIGMOD'07): the k smallest 64-bit
    * hashes of the distinct elements. Mergeable (union the sets, keep
    * the k smallest) and CLOSED UNDER SET ALGEBRA — two sketches give
    * union cardinality ((k-1)/u_k on the merged sketch) and Jaccard
    * (fraction of the merged sketch present in both inputs), which is
    * what q81 exploits: count-distinct-overlap without shuffling either
    * distinct set. Below k distinct values the sketch IS the exact
    * distinct hash set.
    */
  case class Kmv(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"kmv needs a string key, got ${child.dataType.catalogString}")
      else if (k < 2)
        TypeCheckResult.TypeCheckFailure(s"kmv needs k >= 2, got $k")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last() && !buf.contains(h)) {
        buf.add(h); buf.remove(buf.last()); ()
      }

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null)
        add(buf, GraftHash.mix(GraftHash.fnv1a(v.asInstanceOf[UTF8String].getBytes)))
      buf
    }

    override def merge(
        b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b2.iterator()
      while (it.hasNext) add(b1, it.next())
      b1
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val arr = new Array[Any](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(arr)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next().longValue())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): Kmv =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): Kmv =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): Kmv =
      copy(child = c)
    override def prettyName: String = "kmv"
  }

  /** Column builder: `count_min(key, depth, width)` — flattened
    * depth×width counter matrix.
    */
  def countMin(key: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMin(GraftColumnBridge.expression(key), depth, width)
        .toAggregateExpression())

  /** Column builder: point query into a built count-min sketch. */
  def countMinQuery(sketch: Column, key: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinQuery(
        GraftColumnBridge.expression(sketch),
        GraftColumnBridge.expression(key), depth, width))

  /** Column builder: `kmv(key, k)` — ascending array of the k smallest
    * distinct-element hashes.
    */
  def kmv(key: Column, k: Int): Column =
    GraftColumnBridge.column(
      Kmv(GraftColumnBridge.expression(key), k).toAggregateExpression())

  /** Per-group top-k as a BOUNDED-HEAP aggregate — the scale-correct
    * replacement for the `row_number() OVER (PARTITION BY g ORDER BY v)
    * ... WHERE rn <= k` idiom. The window formulation shuffles EVERY raw
    * row to its group's reducer and sorts the whole group; this
    * aggregate keeps a k-entry heap per group per task, so the shuffle
    * carries O(groups × k) entries and nothing is ever globally sorted —
    * the same topology win TakeOrderedAndProject gives the global case
    * (round 5's q89/q118 rewrites), delivered for the GROUPED case as a
    * mergeable summary. Exact, not approximate: a top-k is closed under
    * merge, unlike a quantile.
    *
    * Ordering is (ord DESC, id ASC) — the registry's standard tiebreak —
    * so results are engine-deterministic and oracle-checkable against
    * the window formulation. Payload is (id: long, ord: double); rank is
    * materialized in the output array so callers explode straight to
    * ranked rows.
    */
  case class TopKBy(
      ordExpr: Expression,
      idExpr: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

    override def left: Expression = ordExpr
    override def right: Expression = idExpr

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("ord", DoubleType, nullable = false))),
      containsNull = false)

    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      if (ordExpr.dataType != DoubleType)
        TypeCheckResult.TypeCheckFailure(
          s"topk_by needs a double ord, got ${ordExpr.dataType.catalogString}")
      else if (idExpr.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"topk_by needs a long id, got ${idExpr.dataType.catalogString}")
      else if (k < 1)
        TypeCheckResult.TypeCheckFailure(s"topk_by needs k >= 1, got $k")
      else TypeCheckResult.TypeCheckSuccess

    // the queue's MAX is the WORST retained entry (lowest ord; among
    // equal ords the largest id), so head inspection + dequeue evicts it
    private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower ord = "greater"
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id = "greater"
      }
    }

    // single source of ordering truth: strictly "less worst" under
    // worstFirst — primitive >/== here would disagree with the heap's
    // Double.compare on NaN (all primitive comparisons false) and -0.0
    // (== says equal, compare says less), breaking heap/eviction
    // agreement
    private def better(c: (Double, Long), w: (Double, Long)): Boolean =
      worstFirst.compare(c, w) < 0

    private def offer(
        buf: mutable.PriorityQueue[(Double, Long)],
        e: (Double, Long)): Unit =
      if (buf.size < k) buf.enqueue(e)
      else if (better(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }

    override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty(worstFirst)

    override def update(
        buf: mutable.PriorityQueue[(Double, Long)],
        input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
      val o = ordExpr.eval(input)
      val i = idExpr.eval(input)
      // NaN ord is skipped like NULL: a NaN admitted to the heap would
      // rank as the best entry (Double.compare sorts NaN greatest) and
      // poison the top-k nondeterministically
      if (o != null && i != null && !java.lang.Double.isNaN(o.asInstanceOf[Double]))
        offer(buf, (o.asInstanceOf[Double], i.asInstanceOf[Long]))
      buf
    }

    override def merge(
        b1: mutable.PriorityQueue[(Double, Long)],
        b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
      b2.foreach(offer(b1, _))
      b1
    }

    override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
      val sorted = buf.toArray.sortWith(better)
      new GenericArrayData(sorted.zipWithIndex.map { case ((o, i), r) =>
        InternalRow(r + 1, i, o)
      }.toArray[Any])
    }

    override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (o, i) => out.writeDouble(o); out.writeLong(i) }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKBy =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKBy =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): TopKBy = copy(ordExpr = l, idExpr = r)
    override def prettyName: String = "topk_by"
  }

  /** Column builder: `topk_by(ord, id, k)` — array<struct<rank,id,ord>>
    * of the k largest (ord desc, id asc) entries.
    */
  def topkBy(ord: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKBy(GraftColumnBridge.expression(ord),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
