package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NativeExpressions._

/** Differential tests: each native expression must produce EXACTLY the
  * value of the builtin-composed formulation it replaced (that is the
  * oracle-parity contract), checked over the real documents/embeddings
  * tables.
  */
class NativeExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("WordShingles == transform/sequence formulation") {
    import spark.implicits._
    val toks = split($"text", " ")
    val builtin = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", get(toks, i), get(toks, i + 1), get(toks, i + 2))))
      .otherwise(expr("array()").cast("array<string>"))
    val diff = Tables.load(spark, dir, "documents")
      .select($"doc_id", wordShingles($"text", 3).as("native"), builtin.as("ref"))
      .filter(!($"native" <=> $"ref"))
    assert(diff.count() == 0)
  }

  test("WordShingles edge cases: short text, multiple/trailing spaces") {
    import spark.implicits._
    val rows = Seq("a b", "a b c", "a  b  c", "a b c ", "", "x")
      .toDF("text")
      .select($"text", wordShingles($"text", 3).as("native"),
        split($"text", " ").as("toks"))
      .collect()
    assert(rows(0).getSeq[String](1) == Seq.empty) // 2 tokens
    assert(rows(1).getSeq[String](1) == Seq("a b c"))
    assert(rows(2).getSeq[String](1) == Seq("a  b", " b ", "b  c")) // empties kept
    assert(rows(3).getSeq[String](1) == Seq("a b c", "b c ")) // trailing empty kept
    assert(rows(4).getSeq[String](1) == Seq.empty)
    assert(rows(5).getSeq[String](1) == Seq.empty)
  }

  test("MinHashSignature == min(md5(i:sh)) groupBy formulation") {
    import spark.implicits._
    val sh = operators.Dedup.docShingles(Tables.load(spark, dir, "documents"))
    val ref = sh.groupBy($"doc_id").agg(
      (0 until 8).map(i => min(md5(concat(lit(s"$i:"), $"sh"))).as(s"s$i")).head,
      (0 until 8).map(i => min(md5(concat(lit(s"$i:"), $"sh"))).as(s"s$i")).tail: _*)
    val native = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        minhashSignature(array_distinct(operators.Dedup.shingles($"text")), 8).as("sig"))
      .filter(size($"sig") === 8)
      .select(($"doc_id" +: (0 until 8).map(i => element_at($"sig", i + 1).as(s"s$i"))): _*)
    val diff = ref.as("r").join(native.as("n"), "doc_id")
      .filter((0 until 8).map(i => col(s"r.s$i") =!= col(s"n.s$i")).reduce(_ || _))
    assert(ref.count() == native.count())
    assert(diff.count() == 0)
  }

  test("SimHash32 == 32-aggregate bit-sum formulation") {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", substring(md5($"tok"), 1, 8))
    val bitSums = (0 until 32).map { b =>
      val v = (instr(lit("0123456789abcdef"), substring($"h", b / 4 + 1, 1)) - 1)
      val bit = floor(v / math.pow(2, b % 4).toInt).cast("long") % 2
      sum($"cnt" * (bit * 2 - 1)).as(s"c$b")
    }
    val ref = toks.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", (0 until 32).map(b =>
        when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as("ref"))
    val native = Tables.load(spark, dir, "documents")
      .select($"doc_id", simhash32(split($"text", " ")).as("native"))
    val diff = ref.join(native, "doc_id").filter($"ref" =!= $"native")
    assert(diff.count() == 0)
  }

  test("CosineLshSignature is deterministic and bit-bounded") {
    import spark.implicits._
    val e = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val s1 = e.select($"vec_id", cosineLshSignature($"v", 16).as("sig"))
    val s2 = e.select($"vec_id", cosineLshSignature($"v", 16).as("sig2"))
    assert(s1.join(s2, "vec_id").filter($"sig" =!= $"sig2").count() == 0)
    assert(s1.filter($"sig" < 0 || $"sig" >= (1L << 16)).count() == 0)
    // signatures spread across buckets (not degenerate)
    assert(s1.select($"sig").distinct().count() > 10)
  }

  test("QuantizeStats == builtin transform/zip_with formulation, bit-exact") {
    import spark.implicits._
    val v = transform($"embedding", x => x.cast("double"))
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = lit(127.0) / maxAbs
    val codes = transform(v, x => floor(x * scale + 0.5))
    val dequant = zip_with(codes, v, (c, x) => abs(c / scale - x))
    val diff = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", quantizeStats($"embedding").as("q"),
        maxAbs.as("r_max_abs"),
        array_max(codes).cast("long").as("r_max_code"),
        array_min(codes).cast("long").as("r_min_code"),
        array_max(dequant).as("r_max_err"))
      .filter($"q.max_abs" =!= $"r_max_abs" || $"q.max_code" =!= $"r_max_code" ||
        $"q.min_code" =!= $"r_min_code" || $"q.max_abs_err" =!= $"r_max_err")
    assert(diff.count() == 0)
  }

  test("RepetitionStats == explode/groupBy formulation") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val ref = docs
      .select($"doc_id", operators.Dedup.shingles($"text").as("shs"))
      .filter(size($"shs") > 0)
      .select($"doc_id", size($"shs").cast("long").as("n_items"), explode($"shs").as("sh"))
      .groupBy($"doc_id", $"n_items", $"sh").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id", $"n_items")
      .agg(count(lit(1)).as("n_distinct"), max($"c").as("max_count"))
    val native = docs
      .select($"doc_id", repetitionStats(operators.Dedup.shingles($"text")).as("r"))
      .filter($"r".isNotNull)
      .select($"doc_id", $"r.n_items", $"r.n_distinct", $"r.max_count")
    assert(native.count() == ref.count())
    val joined = native.as("n").join(ref.as("r"), Seq("doc_id"))
    assert(joined.filter($"n.n_items" =!= $"r.n_items" ||
      $"n.n_distinct" =!= $"r.n_distinct" ||
      $"n.max_count" =!= $"r.max_count").count() == 0)
  }

  test("CountInSet == size(filter(isInCollection)) formulation") {
    import spark.implicits._
    val toks = split($"text", " ")
    val ws = operators.TextAnalysis.Stopwords
    val ref = size(filter(toks, t => t.isInCollection(ws))).cast("long")
    val diff = Tables.load(spark, dir, "documents")
      .select(countInSet(toks, ws).as("native"), ref.as("ref"))
      .filter($"native" =!= $"ref")
    assert(diff.count() == 0)
    val edge = Seq("", "the the a zzz").toDF("text")
      .select(countInSet(split($"text", " "), ws)).collect().map(_.getLong(0))
    assert(edge.toSeq == Seq(0L, 3L))
  }

  test("degenerate inputs: null elements and all-zero vectors yield null/skip") {
    import spark.implicits._
    // QuantizeStats: all-zero vector has no defined scale; null element
    // null-propagates (both match the builtin formulation, where 127/0 =
    // Infinity codes would otherwise become NaN→Long.MinValue garbage)
    val qrows = Seq(
      (1L, Some(Seq[Option[Double]](Some(0.0), Some(0.0)))),
      (2L, Some(Seq[Option[Double]](Some(1.0), None))),
      (3L, Some(Seq[Option[Double]](Some(1.0), Some(-2.0)))))
      .toDF("id", "v")
      .select($"id", quantizeStats($"v").as("q")).orderBy($"id").collect()
    assert(qrows(0).isNullAt(1) && qrows(1).isNullAt(1) && !qrows(2).isNullAt(1))
    // RepetitionStats / CountInSet / SimHash / MinHash: null elements are
    // skipped; an all-null array degenerates to the empty case
    val arr = Seq(
      (1L, Seq[Option[String]](Some("a"), None, Some("a"))),
      (2L, Seq[Option[String]](None, None))).toDF("id", "t")
    val r = arr.select($"id", repetitionStats($"t").as("r"),
        countInSet($"t", Seq("a")).as("c"),
        simhash32($"t").as("s"), minhashSignature($"t", 4).as("m"))
      .orderBy($"id").collect()
    assert(r(0).getStruct(1).getLong(0) == 2L) // n_items counts non-null only
    assert(r(0).getLong(2) == 2L && !r(0).isNullAt(3) && !r(0).isNullAt(4))
    assert(r(1).isNullAt(1) && r(1).getLong(2) == 0L &&
      r(1).isNullAt(3) && r(1).isNullAt(4))
  }

  test("DotProduct == aggregate/zip_with fold, bit-exact, null-safe") {
    import spark.implicits._
    val e = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val a = e.select($"vec_id".as("ida"), $"v".as("va"))
    val b = e.select($"vec_id".as("idb"), $"v".as("vb"))
    val pairs = a.join(b, $"ida" % 7 === $"idb" % 7 && $"ida" < $"idb")
    val fold = aggregate(zip_with($"va", $"vb", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    // bit-exact (=!=, no tolerance): both are the same sequential fold
    assert(pairs.select(dotProduct($"va", $"vb").as("n"), fold.as("r"))
      .filter($"n" =!= $"r").count() == 0)
    val nulls = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("x", "y").select(dotProduct($"x", $"y").as("d")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("ImageDims: header parsing incl. JPEG marker walk and malformed bytes") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val png = "89504e470d0a1a0a0000000d49484452" + "00000140" + "000000f0" +
      "080600000000000000"
    // JPEG with TWO APPn segments, FF fill bytes, and a DRI before SOF2
    // (progressive) — the walk must skip all of them and read C2's frame
    val jpeg = "ffd8" + "ffe000104a46494600010100004800480000" +
      "ffe10008deadbeefbeef" + "ffffffdd0004ffff" + "ffc20011" + "08" +
      "0155" + "0207" + "03011100021101031101"
    val gif = "474946383761" + "4001" + "f000" + "f00000" // GIF87a, LE
    val rows = Seq(
      (1L, hx(png)), (2L, hx(jpeg)), (3L, hx(gif)),
      (4L, hx("89504e470d0a1a0a000000")),     // truncated PNG
      (5L, hx("ffd8ffe10008deadbeefbeef")),   // JPEG without any SOF
      (6L, hx("ffd8ff")),                     // truncated mid-marker
      (7L, "not an image".getBytes("UTF-8")), // no signature
      (8L, Array.emptyByteArray))
      .toDF("id", "b")
      .select($"id", graft.functions.NativeExpressions.imageDims($"b").as("m"))
      .orderBy($"id").collect()
    val ok = rows.take(3).map(r => (r.getStruct(1).getString(0),
      r.getStruct(1).getInt(1), r.getStruct(1).getInt(2)))
    assert(ok(0) == ("png", 320, 240))
    assert(ok(1) == ("jpeg", 519, 341)) // w=0x0207, h=0x0155
    assert(ok(2) == ("gif", 320, 240))  // 0x0140 LE, 0x00f0 LE
    assert(rows.drop(3).forall(_.isNullAt(1)), "malformed payloads must be null")
  }

  test("resizeThumb: header walk finds the body start, resampler hits NN positions") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val body = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    def expect(b: String): Long =
      (0 until 64).map(j => (j + 1).toLong * b((j * b.length) / 64).toInt).sum
    val png = hx("89504e470d0a1a0a0000000d49484452" + "00000140" + "000000f0" +
      "080600000000000000") ++ body.getBytes("UTF-8")
    val mP = operators.Multimodal.resizeThumb(3L, png)
    assert(mP.format == "png" && mP.body_len == 100)
    assert(mP.thumb_checksum == expect(body), "PNG body offset or sampling off")
    // JPEG with a COM segment before SOF0 — the walk must skip it and
    // end the header exactly at the SOF payload boundary
    val jpeg = hx("ffd8" + "ffe000104a46494600010100004800480000" +
      "fffe0008677261667421" + "ffc00011" + "08" + "0155" + "0207" +
      "03011100021101031101") ++ body.getBytes("UTF-8")
    val mJ = operators.Multimodal.resizeThumb(1L, jpeg)
    assert(mJ.format == "jpeg" && mJ.body_len == 100 &&
      mJ.thumb_checksum == expect(body), "JPEG segment walk off")
    // body shorter than the tile: nearest-neighbor positions repeat
    val gif = hx("474946383761" + "4001" + "f000" + "f00000") ++
      "abcdefgh".getBytes("UTF-8")
    val mG = operators.Multimodal.resizeThumb(2L, gif)
    assert(mG.format == "gif" && mG.body_len == 8 &&
      mG.thumb_checksum == expect("abcdefgh"), "short-body resample off")
  }

  test("JaroWinkler: textbook values, boost gate, floor transpositions") {
    import spark.implicits._
    // Expected values are DuckDB's jaro_winkler_similarity outputs
    // (probed in round 5) == the Winkler reference implementation:
    // greedy flag matching, t = mismatches/2 floored, boost only at
    // jaro > 0.7, empty strings => 0.0.
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // 2 mismatches -> t=1
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964), // no common prefix
      ("abcvwxyz", "cabvwxyz", 0.9583333333333334),    // odd k: t = 3/2 = 1
      ("abcdxxxxxx", "abcdyyyyyy", 0.6),  // jaro <= 0.7: prefix-4 boost NOT applied
      ("aaaaaaaaab", "aaaaaaaaba", 0.98),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("", "", 0.0), ("ab", "ba", 0.0))
    val got = cases.toDF("a", "b", "want")
      .select(jaroWinkler($"a", $"b").as("got"), $"want")
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"jaro_winkler mismatch: got ${r.getDouble(0)} want ${r.getDouble(1)}"))
    val n = Seq((Option("x"), None: Option[String]))
      .toDF("a", "b").select(jaroWinkler($"a", $"b").as("j")).collect()
    assert(n.head.isNullAt(0))
  }

  test("hilbert_index: bijective on the full order-4 grid, every step an axis neighbor") {
    import spark.implicits._
    val bits = 4
    val n = 1 << bits
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x, y)))
    val got = grid.toDF("x", "y")
      .select($"x", $"y", hilbertIndex($"x", $"y", bits).as("d"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // bijection: 256 distinct positions covering exactly [0, 256)
    val ds: Seq[Long] = got.map(_._3).sorted.toSeq
    assert(ds == (0L until (n.toLong * n)).toSeq)
    // locality (the property Morton lacks): consecutive curve positions
    // are ALWAYS axis-adjacent — |dx| + |dy| == 1 for every step
    val byD = got.map(t => t._3 -> ((t._1, t._2))).toMap
    (1L until (n.toLong * n)).foreach { d =>
      val (x1, y1) = byD(d - 1)
      val (x2, y2) = byD(d)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
    // interpreted path agrees with codegen (eval vs doGenCode)
    val expr = graft.functions.NativeExpressions.HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Literal(3),
      org.apache.spark.sql.catalyst.expressions.Literal(5), bits)
    assert(expr.eval(null) == byD.find(_._2 == ((3, 5))).get._1)
  }

  test("q243 vs q138: hilbert scans no more buckets than morton on the same box") {
    // sf0.01: sf0.001's custkeys all fall below the box's x-range
    // (x = custkey % 4096 <= 150 < 256), which would make the
    // comparison vacuous
    val dir = "/root/testdata/sf0.01"
    val hil = graft.operators.Layout.q243HilbertSkipping(spark, dir).collect()
    val mor = graft.operators.Layout.q138ZorderSkipping(spark, dir).collect()
    val hScan = hil.count(_.getBoolean(6))
    val mScan = mor.count(_.getBoolean(6))
    assert(hScan > 0, "the box must hit something")
    assert(hScan <= mScan,
      s"hilbert scanned $hScan buckets, morton $mScan — locality claim broken")
    // both layouts partition the same row population
    assert(hil.map(_.getLong(1)).sum == mor.map(_.getLong(1)).sum)
  }
}
