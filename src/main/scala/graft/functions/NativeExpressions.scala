package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftColumnBridge

/** Custom Catalyst expressions for the sketch operators where composing
  * builtins forces a plan-shape penalty (SURVEY.md preference order (b)):
  * computing a MinHash signature or SimHash via builtins needs
  * explode(shingles) → groupBy(doc) with N aggregates — an extra shuffle
  * of |docs|·|shingles| rows. These evaluate in ONE pass over the array,
  * inside the scan's projection: no explode, no shuffle.
  *
  * Both produce byte-identical results to the md5()-composed SQL (the
  * DuckDB oracles in operators.Dedup prove it per round): hashes are
  * md5 hex of UTF-8, bit extraction is plain hex-nibble arithmetic.
  *
  * CodegenFallback is deliberate: the per-row work is MD5-dominated, so
  * interpreted dispatch is noise; keeping the expression a leaf inside
  * the projection keeps the surrounding plan whole-stage-codegen'd.
  */
object NativeExpressions {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** minhash_signature(shingles, n): array of n min-hashes, where family
    * member i is md5(i + ":" + shingle) and the signature element is the
    * lexicographic min over the DISTINCT shingle set — identical to
    * `min(md5(concat(lit(s"i:"), sh)))` grouped per doc.
    */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_signature"

    // Null ELEMENTS are skipped — the min(md5(...)) groupBy formulation
    // this mirrors drops null shingles (concat with null → null, min
    // ignores nulls); an all-null array degenerates to the empty case.
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val seen = new java.util.HashSet[String]()
      val mins = Array.fill[String](numHashes)(null)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val sh = arr.getUTF8String(i).toString
          if (seen.add(sh)) {
            var h = 0
            while (h < numHashes) {
              val hex = md5hex(s"$h:$sh")
              if (mins(h) == null || hex.compareTo(mins(h)) < 0) mins(h) = hex
              h += 1
            }
          }
        }
        i += 1
      }
      if (seen.isEmpty) return null
      new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** simhash(tokens, bits): SimHash over the token multiset, bits <= 64.
    * Token hash = first bits/4 hex chars of md5(token); bit b of the
    * packed result is the sign of sum(count * (2*bit_b(hash) - 1)) —
    * identical to the per-bit-aggregate SQL formulation in
    * operators.Dedup.q20/q44.
    */
  case class SimHashN(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    require(bits > 0 && bits <= 64 && bits % 4 == 0)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = s"simhash$bits"

    // Null tokens are skipped (the per-bit-aggregate SQL drops them: a
    // null token hashes to null and contributes nothing to any bit sum);
    // an all-null array degenerates to the empty case.
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new java.util.HashMap[String, Long]()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val tok = arr.getUTF8String(i).toString
          counts.merge(tok, 1L, (a, b) => a + b)
        }
        i += 1
      }
      if (counts.isEmpty) return null
      val comp = new Array[Long](bits)
      counts.forEach { (tok, cnt) =>
        val h = md5hex(tok)
        var b = 0
        while (b < bits) {
          val v = Character.digit(h.charAt(b / 4), 16)
          val bit = (v >> (b % 4)) & 1
          comp(b) += cnt * (2L * bit - 1L)
          b += 1
        }
      }
      var packed = 0L
      var b = 0
      while (b < bits) {
        if (comp(b) > 0) packed |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(packed)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** word_shingles(text, k): whitespace-split word k-grams in one tight
    * pass. Equivalent to transform(sequence(0, n-k), i -> concat_ws(' ',
    * toks[i..i+k-1])) but those higher-order builtins are CodegenFallback
    * with per-element interpreted dispatch — measured 7x slower on the
    * shingle workload. Split semantics match Spark's split(text, " ")
    * (limit -1: trailing empties kept).
    */
  case class WordShingles(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "word_shingles"

    private val space = java.util.regex.Pattern.compile(" ")

    override def nullSafeEval(input: Any): Any = {
      val toks = space.split(input.asInstanceOf[UTF8String].toString, -1)
      val n = toks.length - k + 1
      if (n <= 0) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def wordShingles(text: Column, k: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), k))

  /** cosine_lsh_signature(vec, numPlanes): random-hyperplane LSH signature
    * for cosine similarity. Plane p's coefficient for dimension d is ±1 by
    * the parity of the first hex nibble of md5(p + ":" + d) — a
    * deterministic pseudo-random hyperplane any engine can reproduce (the
    * DuckDB oracle builds the same planes in SQL). Bit p of the signature
    * = sign of <plane_p, vec>.
    */
  case class CosineLshSignature(child: Expression, numPlanes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_lsh_signature"

    // coefficient matrix is tiny (planes x dims) and lazily cached per dim
    @transient private lazy val coefCache =
      new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

    private def coefs(dims: Int): Array[Double] =
      coefCache.computeIfAbsent(dims, { _ =>
        val arr = new Array[Double](numPlanes * dims)
        var p = 0
        while (p < numPlanes) {
          var d = 0
          while (d < dims) {
            val nib = Character.digit(md5hex(s"$p:$d").charAt(0), 16)
            arr(p * dims + d) = if (nib % 2 == 0) 1.0 else -1.0
            d += 1
          }
          p += 1
        }
        arr
      })

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val dims = arr.numElements()
      val v = new Array[Double](dims)
      var d = 0
      while (d < dims) { v(d) = arr.getDouble(d); d += 1 }
      val c = coefs(dims)
      var packed = 0L
      var p = 0
      while (p < numPlanes) {
        var s = 0.0
        var i = 0
        while (i < dims) { s += c(p * dims + i) * v(i); i += 1 }
        if (s > 0) packed |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(packed)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def cosineLshSignature(vec: Column, numPlanes: Int): Column =
    GraftColumnBridge.column(CosineLshSignature(GraftColumnBridge.expression(vec), numPlanes))

  /** dot_product(a, b): sequential left-to-right fold of a[i]*b[i] over two
    * double arrays — bit-identical to `aggregate(zip_with(a, b, _*_), 0.0,
    * _+_)` and to DuckDB's list_dot_product, but with REAL `doGenCode`: the
    * higher-order builtins are CodegenFallback with a per-element lambda
    * dispatch (~7x slower on this workload); this compiles to a tight Java
    * loop inside whole-stage codegen. The similarity family (q21/q22/q29)
    * is dot-product-bound, so this is its hot path.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // also NULL on length mismatch
    override def prettyName: String = "dot_product"

    // Length mismatch and NULL elements yield NULL — matching the builtin
    // fold it stands in for (zip_with pads the shorter array with NULLs
    // and a NULL product poisons the running sum), so the
    // DotProductRewrite optimizer rule is semantics-preserving.
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      java.lang.Double.valueOf(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** quantize_stats(vec): one-pass int8 symmetric-quantization statistics
    * over a double array — struct(max_abs, max_code, min_code,
    * max_abs_err) with scale = 127/max|v|, code = floor(v*scale + 0.5),
    * err = |code/scale - v|. Bit-identical to the builtin formulation
    * (4 transforms + zip_with + 3 array_max/min) it replaces in q42, but
    * those higher-order builtins are interpreted per element AND the
    * shared subtrees (codes, scale) are re-evaluated per consumer; this
    * is one tight loop per row.
    */
  case class QuantizeStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("max_abs", DoubleType),
      StructField("max_code", LongType),
      StructField("min_code", LongType),
      StructField("max_abs_err", DoubleType)))
    override def nullable: Boolean = true
    override def prettyName: String = "quantize_stats"

    // accepts array<float> directly (float->double widening is IEEE-exact,
    // so results match the cast-then-compute formulation bit for bit)
    @transient private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    // Degenerate inputs yield NULL: a null element (the builtin
    // transform/zip_with chain null-propagates through every derived
    // column) and an all-zero vector (scale = 127/0 would be Infinity and
    // the codes NaN — quantization is undefined, so say so rather than
    // emit sentinel garbage).
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null
      def elem(i: Int): Double =
        if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      var maxAbs = 0.0
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val a = math.abs(elem(i))
        if (a > maxAbs) maxAbs = a
        i += 1
      }
      if (maxAbs == 0.0) return null
      val scale = 127.0 / maxAbs
      var maxCode = Double.NegativeInfinity
      var minCode = Double.PositiveInfinity
      var maxErr = 0.0
      i = 0
      while (i < n) {
        val x = elem(i)
        val c = math.floor(x * scale + 0.5)
        if (c > maxCode) maxCode = c
        if (c < minCode) minCode = c
        val e = math.abs(c / scale - x)
        if (e > maxErr) maxErr = e
        i += 1
      }
      InternalRow(maxAbs, maxCode.toLong, minCode.toLong, maxErr)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def quantizeStats(vec: Column): Column =
    GraftColumnBridge.column(QuantizeStats(GraftColumnBridge.expression(vec)))

  /** repetition_stats(items): per-row multiset statistics —
    * struct(n_items, n_distinct, max_count) over a string array in ONE
    * hash pass. Replaces the explode → groupBy(doc, item) → groupBy(doc)
    * chain (two SHUFFLES of |docs|·|items| rows) with scan-local work:
    * the repetition signals of a document never need cross-row state, so
    * at 100 TB this is the difference between a shuffle-bound job and a
    * scan-bound one.
    */
  case class RepetitionStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_items", LongType),
      StructField("n_distinct", LongType),
      StructField("max_count", LongType)))
    override def nullable: Boolean = true
    override def prettyName: String = "repetition_stats"

    // Null elements are skipped (the explode → filter formulation drops
    // them before counting); n_items counts non-null items only, and an
    // all-null array degenerates to the empty case.
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new java.util.HashMap[String, Long]()
      var nonNull = 0L
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          counts.merge(arr.getUTF8String(i).toString, 1L, (a, b) => a + b)
          nonNull += 1
        }
        i += 1
      }
      if (nonNull == 0) return null
      var maxC = 0L
      val it = counts.values().iterator()
      while (it.hasNext) { val c = it.next(); if (c > maxC) maxC = c }
      InternalRow(nonNull, counts.size.toLong, maxC)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def repetitionStats(items: Column): Column =
    GraftColumnBridge.column(RepetitionStats(GraftColumnBridge.expression(items)))

  /** count_in_set(tokens, words): how many array elements are in a fixed
    * word set — one hash-set pass, replacing
    * `size(filter(toks, _.isInCollection(words)))` whose higher-order
    * filter is interpreted per element with a per-element Catalyst eval.
    * Used by the stopword-ratio (q23), language-ID profile scores (q25 —
    * four instances per row), and quality-filter (q48) hot paths.
    */
  case class CountInSet(child: Expression, words: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "count_in_set"

    @transient private lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](words.size * 2)
      words.foreach(s.add)
      s
    }

    // Null elements are skipped — matching the filter+isInCollection
    // formulation, where a null element's membership test is null and the
    // filter drops it.
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var c = 0L
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i).toString)) c += 1
        i += 1
      }
      java.lang.Long.valueOf(c)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def countInSet(tokens: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(CountInSet(GraftColumnBridge.expression(tokens), words))

  /** image_dims(payload): byte-level media-header sniffing — format,
    * width, height parsed from the leading bytes of a PNG / JPEG / GIF
    * payload, null when no signature matches. This is the header-read
    * class of image decode (the part that needs no codec): big-endian
    * IHDR fields for PNG, little-endian logical-screen fields for GIF,
    * and for JPEG a real marker-segment walk — skip FF fill bytes and
    * variable-length APPn/comment segments until the first SOF frame
    * header (C0–CF minus C4/C8/CC), whose height/width are the image
    * dimensions. One pass over the binary column inside the scan
    * projection; q27's mapPartitions stub remains the seam where a full
    * pixel codec would plug in.
    */
  /** The codec-free header-parse core shared by the [[ImageDims]]
    * expression (scan-projection path) and the q27 mapPartitions decoder
    * (the seam a full pixel codec would plug into): one object, one
    * byte-walk, two call sites — so expression and decoder can never
    * disagree on a header layout.
    */
  object ImageHeader {
    final case class Meta(format: String, width: Int, height: Int)

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    private def parseJpeg(b: Array[Byte]): Meta = {
      var i = 2 // past SOI
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // desynced: not a marker
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // FF fill bytes
        if (j >= b.length) return null
        val m = b(j) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2) ...
          if (j + 8 > b.length) return null
          return Meta("jpeg", be16(b, j + 6), be16(b, j + 4))
        } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) {
          i = j + 1 // standalone marker, no length field
        } else {
          if (j + 3 > b.length) return null
          i = j + 1 + be16(b, j + 1) // skip segment (length includes itself)
        }
      }
      null
    }

    /** Parse the leading media header; null when no signature matches. */
    def parse(b: Array[Byte]): Meta =
      if (b.length >= 24 &&
          (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
          b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
        Meta("png", be32(b, 16), be32(b, 20)) // IHDR width/height, BE32
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        parseJpeg(b)
      else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        Meta("gif", le16(b, 6), le16(b, 8)) // logical screen, LE16
      else null
  }

  case class ImageDims(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "image_dims"

    override def nullSafeEval(input: Any): Any = {
      val m = ImageHeader.parse(input.asInstanceOf[Array[Byte]])
      if (m == null) null
      else InternalRow(UTF8String.fromString(m.format), m.width, m.height)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def imageDims(payload: Column): Column =
    GraftColumnBridge.column(ImageDims(GraftColumnBridge.expression(payload)))

  /** jaro_winkler(a, b): the classic Winkler-boosted Jaro similarity —
    * the string metric record-linkage systems pair with Levenshtein
    * (q92): position-tolerant (a match window of max(|a|,|b|)/2 - 1),
    * transposition-discounting, and prefix-boosted. Semantics verified
    * byte-for-byte against DuckDB's `jaro_winkler_similarity` over the
    * full q147 pair population: greedy left-to-right flag matching,
    * transpositions = (mismatched matched positions) / 2 with INTEGER
    * floor, prefix boost l·0.1·(1−jaro) for l ≤ 4 applied only when
    * jaro > 0.7 (the standard boost threshold), and 0.0 — not 1.0 —
    * when either side is empty. One pass per pair inside the scan
    * projection (CodegenFallback: the per-row DP dominates, the
    * surrounding plan stays whole-stage).
    */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val sa = a.asInstanceOf[UTF8String].toString
      val sb = b.asInstanceOf[UTF8String].toString
      java.lang.Double.valueOf(NativeExpressions.jaroWinklerSim(sa, sb))
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  private[graft] def jaroWinklerSim(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val tt = t / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (m - tt).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinkler(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Register the native expressions in a session's FunctionRegistry so
    * `spark.sql` queries can call them by name:
    * word_shingles(text, k), minhash_signature(shingles, n),
    * simhash32(tokens), cosine_lsh_signature(vec, planes).
    * (The int arguments must be literals, like any expression-building
    * parameter.)
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def intArg(e: Expression): Int =
      e.eval(InternalRow.empty).asInstanceOf[Number].intValue()
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es.head, intArg(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es.head, intArg(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("simhash32",
      es => SimHashN(es.head, 32), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHashN(es.head, 64), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_lsh_signature",
      es => CosineLshSignature(es.head, intArg(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("image_dims",
      es => ImageDims(es.head), "scala_udf")
  }

  /** hilbert_index(x, y, bits): position of integer point (x, y) on the
    * order-`bits` Hilbert space-filling curve (the standard xy2d walk:
    * per level, quadrant digit d += s²·((3·rx) xor ry) then the
    * reflect-and-swap rotation). A COLUMN-ALGEBRA formulation would
    * nest one conditional rewrite of (x, y) per level — the expression
    * tree doubles per level (newX references both x and y), i.e. 2^bits
    * nodes, which breaks whole-stage codegen long before bits=12 — so
    * this is exactly the custom-Expression case (SURVEY preference (b)):
    * a tight generated loop, one pass per row, inside the scan
    * projection. Hilbert beats Morton (q138's `spread`) on locality:
    * every curve step is an axis-neighbor move, so bucket bounding boxes
    * are tighter and a 2-D box predicate scans fewer buckets — q243
    * measures that claim against the SAME box on the SAME points.
    */
  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean =
      left.nullable || right.nullable
    override def prettyName: String = "hilbert_index"

    override def nullSafeEval(a: Any, b: Any): Any = {
      var x = a.asInstanceOf[Int].toLong
      var y = b.asInstanceOf[Int].toLong
      var d = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      java.lang.Long.valueOf(d)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val d = ctx.freshName("d")
        val s = ctx.freshName("s")
        val rx = ctx.freshName("rx")
        val ry = ctx.freshName("ry")
        val t = ctx.freshName("t")
        s"""
           |long $x = (long) $a;
           |long $y = (long) $b;
           |long $d = 0L;
           |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
           |  long $rx = (($x & $s) > 0) ? 1L : 0L;
           |  long $ry = (($y & $s) > 0) ? 1L : 0L;
           |  $d += $s * $s * ((3L * $rx) ^ $ry);
           |  if ($ry == 0) {
           |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
           |    long $t = $x; $x = $y; $y = $t;
           |  }
           |}
           |${ev.value} = $d;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(HilbertIndex(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), bits))

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(shingles), numHashes))

  def simhash32(tokens: Column): Column =
    GraftColumnBridge.column(SimHashN(GraftColumnBridge.expression(tokens), 32))

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHashN(GraftColumnBridge.expression(tokens), 64))
}
