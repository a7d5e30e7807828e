package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Document deduplication for LLM training-data pipelines: exact
  * (hash-groupBy), n-gram Jaccard with stop-shingle capping, and
  * MinHash+LSH banding. Not in the reference (its dedup surface is the
  * keyed window dedup, SURVEY.md §2.4 A3) — added per the north-star
  * extension list (BASELINE.json).
  *
  * Determinism design: MinHash usually uses random permutations; here each
  * hash family member is `md5(i + ":" + shingle)` and the signature is the
  * lexicographic min — fully deterministic, identical in any engine, so
  * the DuckDB oracle can hash-check real MinHash/LSH output.
  *
  * Scale design: exact dedup is one hash-shuffle on md5(text). Jaccard
  * pairing joins on shingles, which explodes on hot shingles — so q18 caps
  * shingle document-frequency (stop-shingle removal, standard practice);
  * the true 100 TB path is q19's LSH banding, where the join key is a band
  * bucket and cost is proportional to collisions, not |docs|².
  */
object Dedup {

  /** Synthetic re-crawl twin ids live at doc_id + TwinOffset (the q17
    * scheme every dedup-family query reuses). The offset sits far above
    * any plausible doc_id — at the old +100000 a corpus past 100k rows
    * would silently collide twin ids with genuine doc_ids (both engines
    * collide identically, so hashes stay green and nothing fails loudly).
    * Every Scala arm references this constant; the paired SQL oracles
    * carry the literal 1000000000 in lockstep.
    */
  val TwinOffset = 1000000000L

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** spread variant for the CPU-bound sketch queries (see Tables.loadSpread) */
  private def tSpread(s: SparkSession, dir: String, n: String) = Tables.loadSpread(s, dir, n)

  /** Word k-shingles of a whitespace-tokenized text column (empty array
    * when the doc has fewer than k tokens). Native single-pass expression
    * — see NativeExpressions.WordShingles for why not transform/sequence.
    */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.NativeExpressions.wordShingles(text, k)

  /** Distinct (doc_id, shingle) pairs. Dedup happens per-doc in the
    * array BEFORE exploding (doc_id is unique per row), so no global
    * distinct shuffle is needed — the generate output is already the
    * distinct set.
    */
  def docShingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(shingles(col("text"), k))).as("sh"))

  /** q17: exact dedup via content-hash groupBy — the survivor (min doc_id)
    * per distinct md5(text), with the cluster size. One shuffle on the
    * 128-bit content hash; at 100 TB this is the canonical first pass.
    * The test corpus is 500 unique texts, so the input is the corpus
    * UNIONed with a deterministic partial re-crawl (every 10th document
    * re-fetched under a new id — the duplication shape crawl pipelines
    * actually see): 50 of the 500 clusters have n_copies = 2, so the
    * collapse branch is exercised, not just the pass-through.
    */
  def q17DedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"text")
    val recrawl = docs.filter($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + TwinOffset)
    docs.unionByName(recrawl)
      .groupBy(md5($"text").as("content_hash"))
      .agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select($"keep_doc_id", $"n_copies")
      .orderBy($"keep_doc_id")
  }

  private val q17Sql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
      |FROM corpus
      |GROUP BY md5(text)
      |ORDER BY keep_doc_id""".stripMargin

  // Shared DuckDB CTE: distinct word-3-shingles per doc.
  private val shinglesCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM toks WHERE len(t) >= 3)""".stripMargin

  val ShingleDfCap = 50

  /** The df-capped shingle inverted-index pair machinery shared by q18
    * (Jaccard) and q158 (containment): (doc, shingle) pairs capped at
    * [[ShingleDfCap]] docs per shingle, self-joined on the shingle key.
    * Returns (inter, sz): per-pair shared-shingle counts and per-doc
    * capped set sizes — the two sufficient statistics every set-overlap
    * metric in the family derives from.
    */
  private def cappedShinglePairs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // The (doc, shingle) set feeds four consumers (freq filter, sizes,
    // both join sides) — persist it once instead of re-exploding per
    // consumer; ~|docs|·|shingles| rows, comfortably in memory per
    // executor even at large scale since it is partitioned by shingle.
    val sh = docShingles(tSpread(s, dir, "documents"))
    val keep = sh.groupBy($"sh").count()
      .filter($"count" <= ShingleDfCap).select($"sh")
    val shf = sh.join(broadcast(keep), "sh").persist()
    val sz = shf.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // explicit .as aliases (not dataset-id disambiguation, which emits the
    // "trivially true predicate" analyzer warning on self-joins)
    val a = shf.select($"doc_id".as("doc_a"), $"sh").as("a")
    val b = shf.select($"doc_id".as("doc_b"), $"sh").as("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") && $"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_common"))
    (inter, sz)
  }

  /** DuckDB mirror of [[cappedShinglePairs]]: emits `inter` and `sz`. */
  private val cappedPairsCtes =
    s"""$shinglesCte,
      |keep AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $ShingleDfCap),
      |shf AS (SELECT sh.doc_id, sh.sh FROM sh JOIN keep USING (sh)),
      |sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  /** q18: n-gram Jaccard near-dup pairs. Shingle-frequency cap bounds
    * the self-join fan-out; Jaccard is exact small-integer arithmetic so
    * the double is engine-identical.
    */
  def q18DedupJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (inter, sz) = cappedShinglePairs(s, dir)
    val jac = $"n_common".cast("double") / ($"na" + $"nb" - $"n_common")
    inter
      .join(sz.select($"doc_id", $"n".as("na")), $"doc_a" === $"doc_id").drop("doc_id")
      .join(sz.select($"doc_id", $"n".as("nb")), $"doc_b" === $"doc_id").drop("doc_id")
      .select($"doc_a", $"doc_b", $"n_common", jac.as("jaccard"))
      .filter($"jaccard" >= 0.6)
      .orderBy($"doc_a", $"doc_b")
  }

  private val q18Sql =
    s"""WITH $cappedPairsCtes
      |SELECT doc_a, doc_b, n_common,
      |  CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
      |FROM inter
      |JOIN sz sa ON sa.doc_id = doc_a
      |JOIN sz sb ON sb.doc_id = doc_b
      |WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q158: CONTAINMENT dedup — the asymmetric twin of Jaccard (q18/q19).
    * containment(A→B) = |A∩B| / |A| detects quoting, excerpting and
    * wholesale inclusion: a 200-word doc pasted into a 5,000-word doc
    * has Jaccard ≈ 0.04 — invisible to every symmetric metric in the
    * family — but containment ≈ 1.0. Candidates come from q18's
    * df-capped shingle inverted-index join, which is the RIGHT generator
    * here: shared-shingle candidates catch contained pairs that MinHash
    * bands structurally miss (a small doc's signature is dominated by
    * its own shingles, so it rarely band-collides with its container).
    * Scoring adds the two directional ratios and classifies each pair:
    * near_dup (Jaccard wins first — mutual ≥0.8 containment implies
    * Jaccard ≥ 2/3), a_in_b, b_in_a. All ratios are exact IEEE
    * divisions of integer counts — engine-identical with no rounding.
    * Scale: identical to q18 — one shuffle on the capped shingle key,
    * pair volume bounded by the df cap.
    */
  def q158Containment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (inter, sz) = cappedShinglePairs(s, dir)
    val jac = $"n_common".cast("double") / ($"na" + $"nb" - $"n_common")
    inter
      .join(sz.select($"doc_id", $"n".as("na")), $"doc_a" === $"doc_id").drop("doc_id")
      .join(sz.select($"doc_id", $"n".as("nb")), $"doc_b" === $"doc_id").drop("doc_id")
      .select($"doc_a", $"doc_b", $"n_common", jac.as("jaccard"),
        ($"n_common".cast("double") / $"na").as("cont_a"),
        ($"n_common".cast("double") / $"nb").as("cont_b"))
      .filter($"jaccard" >= 0.6 || $"cont_a" >= 0.8 || $"cont_b" >= 0.8)
      .withColumn("relation",
        when($"jaccard" >= 0.6, "near_dup")
          .when($"cont_a" >= 0.8, "a_in_b")
          .otherwise("b_in_a"))
      .orderBy($"doc_a", $"doc_b")
  }

  private val q158Sql =
    s"""WITH $cappedPairsCtes,
      |scored AS (
      |  SELECT doc_a, doc_b, n_common,
      |    CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard,
      |    CAST(n_common AS DOUBLE) / sa.n AS cont_a,
      |    CAST(n_common AS DOUBLE) / sb.n AS cont_b
      |  FROM inter
      |  JOIN sz sa ON sa.doc_id = doc_a
      |  JOIN sz sb ON sb.doc_id = doc_b)
      |SELECT doc_a, doc_b, n_common, jaccard, cont_a, cont_b,
      |  CASE WHEN jaccard >= 0.6 THEN 'near_dup'
      |       WHEN cont_a >= 0.8 THEN 'a_in_b'
      |       ELSE 'b_in_a' END AS relation
      |FROM scored
      |WHERE jaccard >= 0.6 OR cont_a >= 0.8 OR cont_b >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q204: COMPLETE Jaccard >= tau similarity self-join via PPJoin-style
    * prefix filtering (Xiao et al., "Efficient Similarity Joins for
    * Near Duplicate Detection", WWW'08) — the guaranteed-no-misses
    * member of the set-similarity family. q18's df-cap and q19's LSH
    * bands are both LOSSY candidate generators (a pair whose shared
    * shingles are all hot, or that never band-collides, is silently
    * dropped); prefix filtering is exact: order every doc's shingles by
    * GLOBAL document frequency ascending (rarest first, ties on the
    * shingle), and any pair with Jaccard >= tau MUST share a shingle in
    * their first n - ceil(tau*n) + 1 (pigeonhole on the overlap bound
    * |A∩B| >= tau/(1+tau)*(|A|+|B|)) — so joining on prefix shingles
    * alone finds every qualifying pair. Rare-first ordering is what
    * makes it cheap: prefix posting lists are the SHORT ones by
    * construction. The length filter (tau*|b| <= |a| <= |b|/tau, exact
    * integer form 5a >= 3b && 5b >= 3a) prunes inside the join; exact
    * intersection counts then verify ONLY the candidates. All
    * arithmetic on the prefix boundary is integer ((3n+4) div 5 =
    * ceil(3n/5)) — no FP boundary can disagree between engines.
    * Measured at sf0.01: 116 candidate pairs from 5,000 docs vs ~12M
    * for the naive length-filtered all-pairs — and the 25 result pairs
    * are the PROVABLY complete tau=0.6 answer on the full (uncapped)
    * shingle universe. Scale: two shuffles (df join, prefix self-join)
    * plus the candidate-bounded verify join; the df table and per-doc
    * ranking are scan-shaped.
    */
  def q204PpjoinExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = tSpread(s, dir, "documents")
    val sh = docShingles(docs).persist()
    val df = sh.groupBy($"sh").agg(count(lit(1)).as("df"))
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val wDoc = Window.partitionBy($"doc_id").orderBy($"df".asc, $"sh".asc)
    val pfx = sh.join(df, "sh").join(sz, "doc_id")
      .withColumn("pos", row_number().over(wDoc))
      .filter($"pos" <= $"n" - expr("(3 * n + 4) div 5") + 1)
      .select($"doc_id", $"sh", $"pos", $"n")
    // POSITIONAL filter (the "PP" in PPJoin) inside the candidate join:
    // a shared prefix token at positions (pa, pb) caps the overlap at
    // 1 + min(na-pa, nb-pb); Jaccard >= 0.6 needs overlap >=
    // ceil(3(na+nb)/8), and u >= ceil(x/8) ⇔ 8u >= x for integers — so
    // the whole bound is one integer-multiply predicate. Complete: the
    // FIRST shared token always carries the maximal cap, so a
    // qualifying pair always survives via it. Measured at 10×-sf0.1:
    // 1.93M → 0.69M candidates; at sf0.01 the 25 survivors are exactly
    // the 25 result pairs — zero false positives.
    val cand = pfx.as("a")
      .join(pfx.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          lit(5) * col("a.n") >= lit(3) * col("b.n") &&
          lit(5) * col("b.n") >= lit(3) * col("a.n") &&
          lit(8) * (lit(1) + least(col("a.n") - col("a.pos"),
            col("b.n") - col("b.pos"))) >=
            lit(3) * (col("a.n") + col("b.n")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify by per-doc ARRAY intersection — one codegen'd pass per
    // candidate, never the posting-list explosion (candidate × |doc|
    // rows through a shuffle: measured 17× at 10× data before this)
    val arrs = docs.select($"doc_id",
      array_distinct(shingles($"text")).as("arr"))
    val scored = cand
      .join(arrs.select($"doc_id".as("doc_a"), $"arr".as("arr_a")), Seq("doc_a"))
      .join(arrs.select($"doc_id".as("doc_b"), $"arr".as("arr_b")), Seq("doc_b"))
      .select($"doc_a", $"doc_b",
        size(array_intersect($"arr_a", $"arr_b")).cast("long").as("n_common"),
        size($"arr_a").as("na"), size($"arr_b").as("nb"))
    val jac = $"n_common".cast("double") / ($"na" + $"nb" - $"n_common")
    scored
      .select($"doc_a", $"doc_b", $"n_common", jac.as("jaccard"))
      .filter($"jaccard" >= 0.6)
      .orderBy($"doc_a", $"doc_b")
  }

  private val q204Sql =
    s"""WITH $shinglesCte,
      |df AS (SELECT sh.sh, count(*) AS df FROM sh GROUP BY sh.sh),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |ranked AS (
      |  SELECT s.doc_id, s.sh,
      |    row_number() OVER (PARTITION BY s.doc_id
      |      ORDER BY d.df ASC, s.sh ASC) AS pos,
      |    z.n
      |  FROM sh s JOIN df d ON s.sh = d.sh JOIN sz z ON s.doc_id = z.doc_id),
      |pfx AS (SELECT doc_id, sh, pos, n FROM ranked
      |        WHERE pos <= n - ((3 * n + 4) // 5) + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM pfx a JOIN pfx b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  WHERE 5 * a.n >= 3 * b.n AND 5 * b.n >= 3 * a.n
      |    AND 8 * (1 + least(a.n - a.pos, b.n - b.pos))
      |        >= 3 * (a.n + b.n)),
      |arrs AS (SELECT doc_id, list(sh) AS arr, count(*) AS n
      |         FROM sh GROUP BY doc_id),
      |scored AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(len(list_intersect(a.arr, b.arr)) AS BIGINT) AS n_common,
      |    a.n AS na, b.n AS nb
      |  FROM cand c
      |  JOIN arrs a ON a.doc_id = c.doc_a
      |  JOIN arrs b ON b.doc_id = c.doc_b)
      |SELECT doc_a, doc_b, n_common,
      |  CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
      |FROM scored
      |WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q308

  /** q308 geometry: τ = 2 edits over 48-char document keys, so PassJoin
    * partitions every string into τ + 1 = 3 segments of ~16 chars. */
  val EdTau = 2
  val EdParts = EdTau + 1

  /** q308: COMPLETE edit-distance threshold self-join via PassJoin
    * segment matching (Li, Deng & Feng, "PASS-JOIN: A Partition-based
    * Method for Similarity Joins", VLDB'11) — the EDIT-DISTANCE member
    * of the exact-join family next to q204's set-Jaccard PPJoin.
    * q92/q147 SCORE constructed pairs; this JOINS: find every string
    * pair within τ = $EdTau$ edits without an all-pairs verify.
    * Pigeonhole: partition every string into τ + 1 segments — τ edits
    * cannot touch all of them, so for any qualifying pair (a, b) at
    * least one segment of b survives UNEDITED inside a, shifted by at
    * most τ positions (each indel shifts later characters by one). So
    * candidates = exact matches between b's segments and a's substrings
    * of the same length within ±τ of the segment's home position —
    * then the BANDED `levenshtein(·,·,τ+1)` threshold DP (O(τ·len),
    * not O(len²)) verifies only those. Gram-prefix filtering (ED-Join,
    * the first cut of this operator) DEGENERATES on this corpus — the
    * ~30-word vocabulary gives 5-grams only ~5k distinct values over
    * 5.5k strings, and the rare-first prefix join still emitted 0.73M
    * candidates at sf0.1 and ~15× that at 10× data; exact ~16-char
    * segment matching is the entropy the grams don't have: measured
    * 22k candidates for 55k strings (8.2k of them true pairs), flat
    * per-string cost. Segment geometry is a |lengths|×3-row broadcast
    * table; probe substrings are (2τ+1)·(τ+1)·(2τ+1)-bounded per
    * string; every shuffle keys on (part, length, substring). The
    * oracle proves end-to-end completeness by brute force over the
    * length-filtered pair universe. Corpus: 48-char document keys plus
    * re-crawl twins (every 10th doc, one char deleted + one
    * substituted — exactly τ edits), the q17 twin scheme.
    */
  def q308EdJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents")
      .select($"doc_id".as("id"), substring($"text", 1, 48).as("k"))
    val twins = base.filter($"id" % 10 === 0)
      .select(($"id" + TwinOffset).as("id"),
        concat(substring($"k", 1, 4), substring($"k", 6, 48)).as("kd"))
      .select($"id",
        concat(substring($"kd", 1, 19), lit("q"), substring($"kd", 21, 48)).as("k"))
    val u = base.unionByName(twins)
      .withColumn("lk", length($"k"))
      .persist()
    // segment geometry per (length, part): part lengths differ by at
    // most 1 (first parts get floor(l/3), the last l mod 3 get +1);
    // p1 = 1, p2 = 1 + m1, p3 = l + 1 - m3. A |distinct lengths| × 3
    // table — broadcast-sized at any corpus scale.
    val geom = u.select($"lk".as("l")).distinct()
      .select($"l", explode(sequence(lit(1), lit(EdParts))).as("i"))
      .withColumn("m",
        when($"i" <= lit(EdParts) - $"l" % EdParts, floor($"l" / EdParts))
          .otherwise(floor($"l" / EdParts) + 1).cast("int"))
      .withColumn("p",
        when($"i" === 1, lit(1))
          .when($"i" === 2, lit(1) + floor($"l" / EdParts))
          .otherwise($"l" + 1 -
            when(lit(EdParts) <= lit(EdParts) - $"l" % EdParts,
              floor($"l" / EdParts))
              .otherwise(floor($"l" / EdParts) + 1)).cast("int"))
    // index side: every string's own 3 segments
    val idx = u.join(broadcast(geom), $"lk" === $"l")
      .select($"id", $"l", $"i", expr("substring(k, p, m)").as("seg"))
    // probe side: for each partner length within ±τ and each part, the
    // substrings at the segment's home position shifted by -τ..τ
    val probe = u
      .select($"id", $"lk", $"k",
        explode(sequence($"lk" - EdTau, $"lk" + EdTau)).as("l"))
      .join(broadcast(geom), Seq("l"))
      .select($"id", $"lk", $"k", $"l", $"i", $"m",
        explode(sequence($"p" - EdTau, $"p" + EdTau)).as("st"))
      .filter($"st" >= 1 && $"st" + $"m" - 1 <= $"lk")
      .select($"id", $"l", $"i", expr("substring(k, st, m)").as("sub"))
      .distinct()
    // localCheckpoint: the candidate id-pair set is two longs per row —
    // cutting the segment-join lineage keeps the verify plan flat
    val cand = probe.as("a")
      .join(idx.as("b"),
        col("a.i") === col("b.i") && col("a.l") === col("b.l") &&
          col("a.sub") === col("b.seg") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("doc_a"),
        greatest(col("a.id"), col("b.id")).as("doc_b"))
      .distinct()
      .localCheckpoint()
    cand
      .join(u.select($"id".as("doc_a"), $"k".as("ka"), $"lk".as("la")), Seq("doc_a"))
      .join(u.select($"id".as("doc_b"), $"k".as("kb"), $"lk".as("lb")), Seq("doc_b"))
      .filter(abs($"la" - $"lb") <= EdTau)
      .select($"doc_a", $"doc_b",
        levenshtein($"ka", $"kb", EdTau + 1).cast("long").as("lev"))
      .filter($"lev" >= 0 && $"lev" <= EdTau)
      .orderBy($"doc_a", $"doc_b")
  }

  private val q308Sql =
    s"""WITH base AS (
      |  SELECT doc_id AS id, substring(text, 1, 48) AS k FROM documents),
      |twins AS (
      |  SELECT id + 1000000000 AS id,
      |    substring(kd, 1, 19) || 'q' || substring(kd, 21) AS k
      |  FROM (SELECT id, substring(k, 1, 4) || substring(k, 6) AS kd
      |        FROM base WHERE id % 10 = 0)),
      |u AS (SELECT *, len(k) AS lk
      |      FROM (SELECT * FROM base UNION ALL SELECT * FROM twins))
      |SELECT a.id AS doc_a, b.id AS doc_b,
      |  CAST(levenshtein(a.k, b.k) AS BIGINT) AS lev
      |FROM u a JOIN u b ON a.id < b.id
      |WHERE abs(a.lk - b.lk) <= $EdTau AND levenshtein(a.k, b.k) <= $EdTau
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q311

  /** q311 corpus rule: every 10th document enters the suffix pool — the
    * cap that keeps the oracle's brute-force suffix sort (one string
    * per suffix) tractable; the Spark arm never materializes a suffix. */
  val SufMod = 10

  /** q311 base depth: the initial rank orders suffixes by their first
    * 32 chars in ONE range-partitioned pass over the distinct windows,
    * replacing doubling rounds h = 1..16. */
  val SufBase = 32

  /** q311: DISTRIBUTED SUFFIX RANKING by prefix doubling (Manber &
    * Myers 1990 — the O(n log n) suffix-array construction; the
    * distributed shape is the standard Spark/MPI re-expression, e.g.
    * Flick & Aluru SC'15). q290/q304 (ExactSubstr) work on fixed-width
    * anchor grams; a suffix ARRAY is the full-generality structure
    * underneath that family — ordered suffixes give arbitrary-length
    * repeated-substring queries, and this query computes the exact
    * lexicographic rank of every suffix of the document pool without
    * ever materializing a suffix string. The doubling invariant: after
    * round h, rank(doc,pos) orders suffixes by their first 2h chars; a
    * round refines ranks by the pair (rank(p), rank(p+h)) — one keyed
    * self-join — then densifies via [[GlobalRank]] over the DISTINCT
    * pairs (range-partitioned, never a single-partition window).
    * Out-of-range lookups take sentinel −1 < every char code, giving
    * exactly binary-string comparison semantics (shorter prefix sorts
    * first), which is what the oracle's ORDER BY on materialized
    * suffix strings does under ASCII. Rounds stop at the partition-
    * refinement fixpoint: the distinct-rank count is monotone and a
    * round that splits nothing can never split anything later (equal
    * ranks then mean truly identical suffixes — cross-document shared
    * tails — which the final output rank tie-breaks by (doc, pos),
    * matching the oracle). Per-round cost: one equi-join + one
    * distinct + one range-partitioned rank over n rows, log(maxlen)
    * rounds; localCheckpoint per round keeps plan depth constant (the
    * q133 discipline).
    */
  def q311SuffixRanks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // round 12: the permutation is read from the [[SuffixIndex]]
    // artifact (built once per corpus fingerprint by the SAME
    // construction below) — q311's oracle still proves the committed
    // ranks equal brute-force sorted-suffix truth, and q315 (the LCP
    // layer) reads the same artifact.
    val ranks = SuffixIndex.ranks(s, dir)
    val docs = suffixPoolDocs(t(s, dir, "documents"))
    ranks
      .filter($"rank" <= 30 || $"rank" % 2500 === 1)
      .join(docs, Seq("doc_id"))
      .select($"rank", $"doc_id", $"pos",
        expr("substring(text, pos, 40)").as("head40"))
      .orderBy($"rank")
  }

  /** The q311 suffix pool: every [[SufMod]]-th non-empty document. */
  private[graft] def suffixPoolDocs(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % SufMod === 0 && length(col("text")) >= 1)
      .select(col("doc_id"), col("text"))

  /** The full (rank, doc_id, pos) suffix permutation q311 samples from —
    * exposed so SuffixRankSpec can check the WHOLE permutation, not just
    * the oracle-carried sample. Returns (ranks, pool docs).
    */
  private[graft] def suffixRanksFull(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = suffixPoolDocs(t(s, dir, "documents")).persist()
    (suffixRanksOf(s, docs), docs)
  }

  /** The prefix-doubling construction over an explicit pool-docs frame —
    * the seam the [[SuffixIndex]] artifact's build shares with the
    * in-query form above.
    */
  private[operators] def suffixRanksOf(
      s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val maxLen = docs.agg(max(length($"text"))).head().getInt(0)
    // base case at depth SufBase instead of the textbook single char:
    // one range-partitioned rank over the distinct 32-char windows
    // replaces doubling rounds h = 1..16 (substring comparison is
    // byte-order, identical to the rank-pair order those rounds
    // induce; a window shorter than SufBase chars is the whole
    // remaining suffix and sorts prefix-first, same as the sentinel
    // semantics)
    val grams = docs
      .select($"doc_id", explode(sequence(lit(1), length($"text"))).as("pos"),
        $"text")
      .select($"doc_id", $"pos",
        expr(s"substring(text, pos, $SufBase)").as("g"))
    val (baseRank, _) = GlobalRank.withGlobalRankCounted(
      grams.select($"g").distinct(), "r0", $"g".asc)
    var cur = grams.join(baseRank, Seq("g"))
      .select($"doc_id", $"pos", $"r0".as("r"))
      .localCheckpoint()
    val n = cur.count()
    var h = SufBase
    var prevDistinct = 0L
    var stable = false
    var dense = false // alternate: arithmetic-encode, then densify
    while (h < maxLen && !stable) {
      val shifted = cur.select($"doc_id", ($"pos" - h).as("pos"), $"r".as("r2"))
      val paired = cur.join(shifted, Seq("doc_id", "pos"), "left")
        .select($"doc_id", $"pos", $"r", coalesce($"r2", lit(-1L)).as("r2"))
      if (dense) {
        val (ranked, nDistinct) = GlobalRank.withGlobalRankCounted(
          paired.select($"r", $"r2").distinct(), "nr", $"r".asc, $"r2".asc)
        cur = paired.join(ranked, Seq("r", "r2"))
          .select($"doc_id", $"pos", $"nr".as("r"))
          .localCheckpoint()
        stable = nDistinct == prevDistinct || nDistinct == n
        prevDistinct = nDistinct
      } else {
        // the refined rank only needs to EMBED the (r, r2) lexicographic
        // order, not be dense — r·M + r2 + 2 with M > max(r2) + 2 is a
        // strictly monotone encoding and costs a projection instead of a
        // distinct + global rank + join-back. Values stay ≤ (n+2)²
        // (< 2^63 for any n < 3e9) because the PREVIOUS round was dense;
        // alternating restores density before a second composition could
        // overflow. Fixpoint detection happens on dense rounds only.
        val m = n + 3
        cur = paired
          .select($"doc_id", $"pos", ($"r" * m + $"r2" + 2).as("r"))
          .localCheckpoint()
      }
      dense = !dense
      h *= 2
    }
    val (fin, _) = GlobalRank.withGlobalRankCounted(
      cur, "rank", $"r".asc, $"doc_id".asc, $"pos".asc)
    fin.select($"rank", $"doc_id", $"pos")
  }

  /** q311's oracle — shared verbatim with q322 ([[SuffixIndex]]'s merge
    * algebra), whose Spark arm must produce the same full-pool
    * permutation by merging a committed base with a freshly-ranked
    * delta.
    */
  private[graft] def q311SqlShared: String = q311Sql

  private val q311Sql =
    s"""WITH s AS (
      |  SELECT doc_id, i AS pos, substring(text, i) AS suf,
      |    substring(text, i, 40) AS head40
      |  FROM documents, unnest(generate_series(1, len(text))) AS t(i)
      |  WHERE doc_id % $SufMod = 0),
      |r AS (
      |  SELECT doc_id, pos, head40,
      |    CAST(row_number() OVER (ORDER BY suf, doc_id, pos) AS BIGINT)
      |      AS rank
      |  FROM s)
      |SELECT rank, doc_id, pos, head40 FROM r
      |WHERE rank <= 30 OR rank % 2500 = 1
      |ORDER BY rank""".stripMargin

  val NumHashes = 8
  val BandSize = 2 // 4 bands of 2 rows

  /** (doc_id, shs, sig) from a (doc_id, text) frame — shingle array and
    * minhash signature in ONE scan pass (shingle-less docs dropped; the
    * native expression computes the signature without exploding).
    * Shared by the in-query dedup family and the [[LshIndex]] build.
    */
  private[operators] def signDocs(df: DataFrame): DataFrame = {
    import graft.functions.NativeExpressions.minhashSignature
    df.select(col("doc_id"), array_distinct(shingles(col("text"))).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("doc_id"), col("shs"),
        minhashSignature(col("shs"), NumHashes).as("sig"))
  }

  /** (doc_id, band, bkey) LSH band rows of a signed frame — all band
    * keys in one pass over the signature array (posexplode; a per-band
    * union would recompute the signatures once per band).
    */
  private[operators] def bandRows(signed: DataFrame): DataFrame = {
    val bandKeys = array((0 until NumHashes / BandSize).map { bnd =>
      md5(concat_ws("|",
        (0 until BandSize).map(r =>
          element_at(col("sig"), bnd * BandSize + r + 1)): _*))
    }: _*)
    signed.select(col("doc_id"), posexplode(bandKeys))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
  }

  /** q19: MinHash + LSH banding. Signature_i = min over shingles of
    * md5(i + ":" + shingle); 4 bands of 2 signature rows; docs sharing a
    * band bucket become candidates, then true Jaccard verifies. The join
    * is on band buckets — the piece that survives 1000 executors and
    * billions of docs — not on raw shingles.
    */
  /** The dedup family's one corpus scan, persisted: (doc_id, text_len,
    * shs, sig) — shingle arrays AND minhash signatures are computed once
    * at cache materialization (sig guarded null for shingle-less docs).
    * q19 filters and self-joins on top of it; q46 reads text_len from
    * it. Both construct the IDENTICAL plan, so Spark's cache manager
    * serves the second caller from the first's cache — q46 no longer
    * pays a second single-task decompression of the text column.
    */
  private[operators] def corpusDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.NativeExpressions.minhashSignature
    tSpread(s, dir, "documents")
      .select($"doc_id", length($"text").as("text_len"),
        array_distinct(shingles($"text")).as("shs"))
      .select($"doc_id", $"text_len", $"shs",
        when(size($"shs") > 0, minhashSignature($"shs", NumHashes)).as("sig"))
      .persist()
  }

  def q19DedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // q19's own contract orders the pair list; internal consumers (the
    // label chain) take the UNSORTED pairs — a DataFrame orderBy's range
    // sampling re-executes the whole verify subtree, a pure waste when
    // the next stage is an order-free groupBy/collect.
    minhashPairs(s, dir).orderBy($"doc_a", $"doc_b")
  }

  private[operators] def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Signature computed in ONE pass inside the scan projection (custom
    // Expression) — no explode, no |docs|x|shingles| shuffle. The only
    // shuffles left are the band-bucket join and the final sort.
    val docs = corpusDocs(s, dir)
      .filter(size($"shs") > 0)
      .select($"doc_id", $"shs", $"sig")
    val bands = bandRows(docs)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // Verify candidates with exact set intersection on the shingle arrays
    // (array_intersect on the two broadcast-joined arrays — no re-explode).
    cand
      .join(docs.select($"doc_id".as("doc_a"), $"shs".as("shs_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"shs".as("shs_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"shs_a", $"shs_b")).cast("long").as("n_common"),
        size($"shs_a").as("na"), size($"shs_b").as("nb"))
      .filter($"n_common" > 0)
      .select($"doc_a", $"doc_b", $"n_common",
        ($"n_common".cast("double") / ($"na" + $"nb" - $"n_common")).as("jaccard"))
  }

  /** Shared oracle CTE chain: shingles → minhash signatures → LSH bands
    * → candidate pairs → verified jaccard (used by q19 and q40).
    */
  private[operators] def minhashCtesShared: String = minhashCtes

  /** The MinHash-LSH relational chain (shingles → signatures → bands →
    * candidates → exact-Jaccard verify) over a named source relation,
    * CTE names prefixed with `p` so the chain composes next to other
    * band machinery (q317 runs it beside the dHash chain over a shared
    * twin-corpus CTE).
    */
  private[operators] def minhashCtesOver(src: String, p: String): String = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"min(md5('$i:' || sh)) AS s$i").mkString(", ")
    val bandSelects = (0 until NumHashes / BandSize).map { bnd =>
      val cols = (0 until BandSize).map(r => s"s${bnd * BandSize + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $bnd AS band, md5($cols) AS bkey FROM ${p}sig"
    }.mkString("\n  UNION ALL ")
    s"""${p}toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM $src),
      |${p}sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM ${p}toks WHERE len(t) >= 3),
      |${p}sig AS (SELECT doc_id, $sigExprs FROM ${p}sh GROUP BY doc_id),
      |${p}bands AS (
      |  $bandSelects),
      |${p}cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM ${p}bands x JOIN ${p}bands y
      |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |${p}sz AS (SELECT doc_id, count(*) AS n FROM ${p}sh GROUP BY doc_id),
      |${p}inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
      |  FROM ${p}cand c
      |  JOIN ${p}sh a ON a.doc_id = c.doc_a
      |  JOIN ${p}sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
      |  GROUP BY 1, 2),
      |${p}verified AS (
      |  SELECT doc_a, doc_b, n_common,
      |    CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
      |  FROM ${p}inter
      |  JOIN ${p}sz sa ON sa.doc_id = doc_a
      |  JOIN ${p}sz sb ON sb.doc_id = doc_b)""".stripMargin
  }

  private lazy val minhashCtes: String = minhashCtesOver("documents", "")

  private val q19Sql =
    s"""WITH $minhashCtes
      |SELECT doc_a, doc_b, n_common, jaccard
      |FROM verified
      |ORDER BY doc_a, doc_b""".stripMargin

  val SimhashBits = 32

  /** q20: SimHash near-dup. Token hash = first 8 hex chars of md5(token);
    * bit b contributes +count/-count to component b; the sign vector packs
    * into a 32-bit value; near-dups share at least one of four 8-bit bands
    * and have Hamming distance <= 2. Bit extraction is pure arithmetic on
    * hex-digit positions so any engine reproduces it bit-for-bit.
    */
  def q20DedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.NativeExpressions.simhash32
    // One-pass SimHash inside the scan projection (custom Expression) —
    // replaces explode + groupBy with 32 bit-sum aggregates. The oracle
    // SQL keeps the 32-aggregate formulation and must agree bit-for-bit.
    val sigs = tSpread(s, dir, "documents")
      .select($"doc_id", simhash32(split($"text", " ")).as("simhash"))
      .persist()
    val withBands = sigs.select($"doc_id", $"simhash",
        posexplode(array((0 until 4).map(k =>
          (floor($"simhash" / math.pow(2, 8 * k).toLong).cast("long") % 256)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    withBands.as("x").join(withBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter($"hamming" <= 2)
      .orderBy($"doc_a", $"doc_b")
  }

  private val q20Sql = {
    val bitSums = (0 until SimhashBits).map { b =>
      val nib = s"(strpos('0123456789abcdef', substring(h, ${b / 4 + 1}, 1)) - 1)"
      val bit = s"(CAST(floor($nib / ${math.pow(2, b % 4).toInt}) AS BIGINT) % 2)"
      s"sum(cnt * ($bit * 2 - 1)) AS c$b"
    }.mkString(",\n    ")
    val pack = (0 until SimhashBits)
      .map(b => s"CASE WHEN c$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    val bandSelects = (0 until 4).map(k =>
      s"SELECT doc_id, simhash, $k AS band, CAST(floor(simhash / ${1L << (8 * k)}) AS BIGINT) % 256 AS bkey FROM sigs")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
      |  SELECT doc_id, tok, count(*) AS cnt,
      |    substring(md5(tok), 1, 8) AS h
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |comp AS (
      |  SELECT doc_id,
      |    $bitSums
      |  FROM toks GROUP BY doc_id),
      |sigs AS (SELECT doc_id, $pack AS simhash FROM comp),
      |bands AS (
      |  $bandSelects)
      |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |  bit_count(xor(x.simhash, y.simhash)) AS hamming
      |FROM bands x JOIN bands y
      |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
      |WHERE bit_count(xor(x.simhash, y.simhash)) <= 2
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q44: 64-bit SimHash near-dup with 4 tables of 16-bit bands — the
    * corpus-scale geometry q20's 32-bit/8-bit-band layout can't reach:
    * 2¹⁶ = 65,536 buckets per band means within-bucket pairing is
    * O(n²/65,536) per band (vs n²/256), and by pigeonhole any pair at
    * Hamming distance <= 3 still agrees on at least one of the 4 bands —
    * the standard simhash dedup contract (Charikar '02 / the Google
    * near-dup setup: 64-bit fingerprints, k-band exact-match tables).
    * The 64-bit signature packs into one long (bit 63 handled with
    * unsigned shifts); the oracle mirrors band keys directly so no
    * engine touches a 2⁶³ literal.
    */
  def q44DedupSimhash64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.NativeExpressions.simhash64
    val sigs = tSpread(s, dir, "documents")
      .select($"doc_id", simhash64(split($"text", " ")).as("simhash"))
      .persist()
    val withBands = sigs.select($"doc_id", $"simhash",
        posexplode(array((0 until 4).map(k =>
          shiftrightunsigned($"simhash", 16 * k).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    withBands.as("x").join(withBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .orderBy($"doc_a", $"doc_b")
  }

  private val q44Sql = {
    val bitSums = (0 until 64).map { b =>
      val nib = s"(strpos('0123456789abcdef', substring(h, ${b / 4 + 1}, 1)) - 1)"
      val bit = s"(CAST(floor($nib / ${math.pow(2, b % 4).toInt}) AS BIGINT) % 2)"
      s"sum(cnt * ($bit * 2 - 1)) AS c$b"
    }.mkString(",\n    ")
    val bandKeys = (0 until 4).map { k =>
      (0 until 16).map(j => s"CASE WHEN c${16 * k + j} > 0 THEN ${1L << j} ELSE 0 END")
        .mkString("(", " + ", s") AS bk$k")
    }.mkString(",\n    ")
    val bandSelects = (0 until 4).map(k =>
      s"SELECT doc_id, $k AS band, bk$k AS bkey FROM sigs").mkString("\n  UNION ALL ")
    val hamming = (0 until 4)
      .map(k => s"bit_count(xor(a.bk$k, b.bk$k))").mkString(" + ")
    s"""WITH toks AS (
      |  SELECT doc_id, tok, count(*) AS cnt,
      |    substring(md5(tok), 1, 16) AS h
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |comp AS (
      |  SELECT doc_id,
      |    $bitSums
      |  FROM toks GROUP BY doc_id),
      |sigs AS (SELECT doc_id,
      |    $bandKeys
      |  FROM comp),
      |bands AS (
      |  $bandSelects),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
      |SELECT doc_a, doc_b, CAST($hamming AS INTEGER) AS hamming
      |FROM cand
      |JOIN sigs a ON a.doc_id = doc_a
      |JOIN sigs b ON b.doc_id = doc_b
      |WHERE $hamming <= 3
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Connected components over an undirected near-dup pair list, with the
    * canonical label = component minimum. The result is the same fixed
    * point in any evaluation order, so it is engine-deterministic.
    *
    * Adaptive execution: the pair graph of a dedup pass is typically
    * minuscule relative to the corpus (it holds only near-duplicates), so
    * when it fits comfortably on the driver we run union-find locally —
    * one collect, zero iterative jobs. Past the threshold we fall back to
    * distributed min-label propagation (one join + one aggregation per
    * iteration, iterations ~ graph diameter) — the loop that scales to
    * billions of edges.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      driverEdgeLimit: Long = 2000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edgeRows = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
    val n = edgeRows.persist().count()
    if (n <= driverEdgeLimit) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edgeRows.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      edgeRows.unpersist()
      val out = parent.keys.toSeq.map(k => (k, find(k))).sortBy(_._1)
      spark.createDataFrame(out).toDF("doc_id", "canonical_id")
    } else {
      // hand the CACHED edge rows down — building the loop's edge table
      // from the original `pairs` lineage would recompute the entire
      // upstream candidate+verify chain (cache hits match by plan), and
      // the threshold count's cache would leak
      val out = distributedCC(edgeRows, maxIter)
      edgeRows.unpersist() // loop labels are materialized; cache is dead
      out
    }
  }

  private def distributedCC(pairs: DataFrame, maxIter: Int): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionByName(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .persist()
    var labels = edges.select(col("a").as("doc_id"))
      .distinct().withColumn("label", col("doc_id")).persist()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "a"), "a")
        .groupBy(col("b").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist()
      changed = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
        .filter(col("label") =!= col("old")).count()
      // next is materialized by the count above; the previous iteration's
      // labels are dead — release them so a deep graph doesn't accumulate
      // one cached copy of the label table per iteration
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.select(col("doc_id"), col("label").as("canonical_id"))
  }

  /** THE shared label chain of the dedup family: LSH-verified Jaccard
    * pairs (the q19 production path) -> connected components ->
    * (doc_id, canonical_id). q40 emits it, q46 consumes it, and q134
    * re-runs it with the driver shortcut disabled — one definition, so
    * the reuse is structural, not an accident of persist().
    */
  private[operators] def nearDupLabels(s: SparkSession, dir: String,
      driverEdgeLimit: Long = 2000000L): DataFrame = {
    import s.implicits._
    val pairs = minhashPairs(s, dir) // unsorted: CC is order-free
      .filter($"jaccard" >= 0.6)
      .select($"doc_a", $"doc_b")
    connectedComponents(pairs, driverEdgeLimit = driverEdgeLimit)
  }

  /** q40: near-dup clustering — connected components over the
    * LSH-verified Jaccard pairs (the q19 production path, not the
    * all-pairs baseline); each document maps to its component's minimum
    * doc_id (the canonical survivor a dedup pipeline keeps). Oracle:
    * recursive-CTE transitive closure + min per node over the same
    * minhash CTE chain.
    */
  def q40DedupComponents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    nearDupLabels(s, dir).orderBy($"doc_id")
  }

  /** q134: the DISTRIBUTED connected-components branch, oracle-carried.
    * q40 takes the driver union-find shortcut whenever the pair graph
    * fits (<= 2M edges) — which it always does at gate scale, so the
    * >2M-edge min-label-propagation loop (the branch that actually runs
    * at 100 TB) would otherwise only ever be exercised by unit tests.
    * This query forces `driverEdgeLimit = 0` over the SAME pairs and
    * must hash-match the SAME oracle as q40: a green row here is the
    * proof that the production branch computes the identical fixed
    * point, not just the shortcut.
    */
  def q134CcDistributed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    nearDupLabels(s, dir, driverEdgeLimit = 0L).orderBy($"doc_id")
  }

  private val q40Sql =
    s"""WITH RECURSIVE $minhashCtes,
      |pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.6),
      |edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach AS (
      |  SELECT DISTINCT a AS src, a AS dst FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
      |SELECT src AS doc_id, min(dst) AS canonical_id
      |FROM reach
      |GROUP BY src
      |ORDER BY doc_id""".stripMargin

  /** q46: survivor selection — the last stage of a production dedup
    * pipeline (pairs → components → ONE kept doc per cluster). Every
    * document joins its component label (left join: singletons form their
    * own cluster); within a cluster the survivor is the longest text,
    * doc_id ascending as the tiebreak — a deterministic rule both engines
    * evaluate identically (the corpus is ASCII, so char-length agrees
    * across engines). Cost beyond q40: one broadcast-joinable label table
    * + one window pass over the corpus, partitioned by cluster.
    */
  def q46DedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = nearDupLabels(s, dir)
    // same cached scan the label chain used — no second text read
    val docs = corpusDocs(s, dir).select($"doc_id", $"text_len")
    val w = Window.partitionBy($"cluster_id").orderBy($"text_len".desc, $"doc_id".asc)
    docs.join(broadcast(labels), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"canonical_id", $"doc_id"))
      .withColumn("is_survivor", row_number().over(w) === 1)
      .select($"doc_id", $"cluster_id", $"text_len", $"is_survivor")
      .orderBy($"doc_id")
  }

  private val q46Sql =
    s"""WITH RECURSIVE $minhashCtes,
      |pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.6),
      |edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach AS (
      |  SELECT DISTINCT a AS src, a AS dst FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      |labels AS (SELECT src AS doc_id, min(dst) AS canonical_id FROM reach GROUP BY src),
      |clustered AS (
      |  SELECT d.doc_id, COALESCE(l.canonical_id, d.doc_id) AS cluster_id,
      |         length(d.text) AS text_len
      |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
      |SELECT doc_id, cluster_id, CAST(text_len AS INTEGER) AS text_len,
      |  (row_number() OVER (PARTITION BY cluster_id
      |     ORDER BY text_len DESC, doc_id ASC) = 1) AS is_survivor
      |FROM clustered
      |ORDER BY doc_id""".stripMargin

  /** q76: INCREMENTAL dedup — the production re-crawl shape. A corpus
    * system does not re-dedup 100 TB per day: the base corpus's minhash
    * signatures/bands are a persisted index (maintained by the q15
    * upsert/MERGE machinery), and each day's delta is signed alone and
    * PROBED against it. Here the split is deterministic (doc_id % 5 == 0
    * is "today's crawl"); the base side reads the [[LshIndex]] artifact
    * (the persisted band tables, filtered to yesterday's docs), and the
    * join topology is the incremental one:
    * delta bands ⋈ base bands only — no base×base pairs (already
    * deduped when indexed), no delta×delta (that is q19 run on the
    * delta). Candidate volume scales with |delta|·collision-rate, not
    * |corpus|² — the property that makes daily dedup affordable.
    * Candidates verify by exact shingle intersection, same as q19.
    */
  def q76IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Since round 11 the documented posture IS the implementation: the
    // base corpus's band index is the persisted [[LshIndex]] artifact
    // (filtered to "yesterday's" docs — the index as of the last run),
    // so only the DELTA is shingled and signed; the base side is a
    // parquet read, and verification fetches the shingles of ONLY the
    // candidate base docs (a semi-join on the corpus — O(candidates),
    // never a base re-scan).
    val deltaDocs = signDocs(
      tSpread(s, dir, "documents").filter($"doc_id" % 5 === 0)
        .select($"doc_id", $"text")).persist()
    val baseBands = LshIndex.bands(s, dir).filter($"doc_id" % 5 =!= 0)
    val cand = bandRows(deltaDocs).as("x")
      .join(baseBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("new_doc"), col("y.doc_id").as("dup_of"))
      .distinct()
    val baseShs = t(s, dir, "documents")
      .join(cand.select($"dup_of".as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select($"doc_id".as("dup_of"), array_distinct(shingles($"text")).as("shs_b"))
    cand
      .join(deltaDocs.select($"doc_id".as("new_doc"), $"shs".as("shs_a")), "new_doc")
      .join(baseShs, "dup_of")
      .select($"new_doc", $"dup_of",
        size(array_intersect($"shs_a", $"shs_b")).cast("long").as("n_common"),
        size($"shs_a").as("na"), size($"shs_b").as("nb"))
      .filter($"n_common" > 0)
      .select($"new_doc", $"dup_of", $"n_common",
        ($"n_common".cast("double") / ($"na" + $"nb" - $"n_common")).as("jaccard"))
      .orderBy($"new_doc", $"dup_of")
  }

  // shared with q160 (the streaming twin must equal the same batch answer)
  private[graft] val q76Sql =
    s"""WITH $minhashCtes,
      |inc AS (
      |  SELECT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS new_doc,
      |         CASE WHEN doc_a % 5 = 0 THEN doc_b ELSE doc_a END AS dup_of,
      |         n_common, jaccard
      |  FROM verified
      |  WHERE (doc_a % 5 = 0) <> (doc_b % 5 = 0))
      |SELECT new_doc, dup_of, n_common, jaccard
      |FROM inc
      |ORDER BY new_doc, dup_of""".stripMargin

  private val BlockLen = 16

  /** q99: block-level exact-substring dedup with a GLOBAL keep-first
    * policy (the Lee et al. 2021 "Deduplicating Training Data" ExactSubstr
    * pass, at fixed 16-word block granularity so the match set is
    * SQL-auditable): every 16-word block hashes once in the scan
    * projection; the first occurrence corpus-wide — ordered by (doc_id,
    * block position), an engine-independent total order — survives, and
    * later occurrences are marked for removal. Per document the pass
    * reports how much of it is someone else's text. One shuffle on the
    * block key, one window inside it, one re-group by doc: the shape any
    * 100-TB corpus pays for span-level dedup (the window's per-key group
    * is occurrence-count-sized — boilerplate-hot keys are exactly the
    * point, and a count-based partial pre-agg would bound them).
    */
  def q99BlockDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blocks = tSpread(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks",
        explode(sequence(lit(0), size($"toks") - 1, lit(BlockLen))).as("st"))
      .select($"doc_id", ($"st" / BlockLen).cast("long").as("block_idx"),
        array_join(slice($"toks", $"st" + 1, lit(BlockLen)), " ").as("block"))
    val w = Window.partitionBy($"block").orderBy($"doc_id".asc, $"block_idx".asc)
    blocks
      .withColumn("keep", row_number().over(w) === 1)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when($"keep", 0L).otherwise(1L)).as("n_removed"),
        md5(array_join(
          sort_array(collect_list(when($"keep",
            format_string("%09d", $"block_idx")))), "|")).as("kept_idx_hash"))
      .orderBy($"doc_id")
  }

  private val q99Sql =
    """WITH b AS (
      |  SELECT doc_id, CAST(st / 16 AS BIGINT) AS block_idx,
      |    array_to_string(list_slice(toks, st + 1, st + 16), ' ') AS block
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
      |          unnest(generate_series(0, len(string_split(text, ' ')) - 1, 16))
      |            AS st
      |        FROM documents)),
      |k AS (
      |  SELECT doc_id, block_idx,
      |    row_number() OVER (PARTITION BY block
      |      ORDER BY doc_id, block_idx) = 1 AS keep
      |  FROM b)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
      |  md5(coalesce(array_to_string(list_sort(
      |    list(printf('%09d', block_idx)) FILTER (WHERE keep)), '|'), ''))
      |    AS kept_idx_hash
      |FROM k
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  private val SpanLen = 8

  /** q103: cross-document repeated-span finder — every overlapping
    * 8-word span that occurs in >= 2 DISTINCT documents, with its doc
    * and occurrence counts: the audit view behind q99's removal policy
    * (q99 answers "how much of each doc is duplicated"; this answers
    * "WHICH text is duplicated, and how hot is it" — the
    * boilerplate-template report every corpus curation run reads).
    * Spans group by their literal text at this scale so the output is
    * human-readable; at 100 TB the group key becomes the span hash
    * (collision-negligible) and the text a `min(span)` exemplar —
    * byte-identical plan shape, one shuffle either way.
    */
  def q103SharedSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tSpread(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= SpanLen)
      .select($"doc_id",
        explode(sequence(lit(0), size($"toks") - SpanLen)).as("st"), $"toks")
      .select($"doc_id",
        array_join(slice($"toks", $"st" + 1, lit(SpanLen)), " ").as("span"))
      .groupBy($"span")
      .agg(count_distinct($"doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      .filter($"n_docs" >= 2)
      .orderBy($"n_docs".desc, $"n_occ".desc, $"span".asc)
  }

  private val q103Sql =
    """WITH sp AS (
      |  SELECT doc_id,
      |    array_to_string(list_slice(toks, st + 1, st + 8), ' ') AS span
      |  FROM (SELECT doc_id, toks,
      |          unnest(generate_series(0, len(toks) - 8)) AS st
      |        FROM (SELECT doc_id, string_split(text, ' ') AS toks
      |              FROM documents)
      |        WHERE len(toks) >= 8))
      |SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_occ
      |FROM sp
      |GROUP BY span
      |HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY n_docs DESC, n_occ DESC, span ASC""".stripMargin

  // ---------------------------------------------------------------- q301

  /** q301: INCREMENTAL CONNECTED COMPONENTS — the continuous-ingestion
    * form of the q40 label chain, completing the incremental trio
    * (q292 SemDeDup, q293 DSIR, and now the dedup GRAPH): base labels
    * are a materialized artifact (CC over base×base pairs only — what
    * the pre-delta pipeline already holds); an appended batch adds
    * only the DELTA-TOUCHING pairs, and the union's labels come from a
    * QUOTIENT construction instead of a corpus re-run:
    *
    *   1. map each delta-pair endpoint to its current label (its base
    *      component's canonical id, or itself);
    *   2. run CC on the label-level edge list — a graph whose size is
    *      the AFFECTED components + delta docs, never the corpus;
    *   3. remap every doc through the quotient labels.
    *
    * Contracting each base component to its canonical node preserves
    * connectivity exactly (a quotient graph), and min-label propagation
    * over labels-that-are-min-doc_ids yields the union component's min
    * doc_id — so the result EQUALS the full q40 recompute over all
    * pairs, which is precisely what the oracle runs (the q40 reach CTE
    * over the whole union pair set). At production cadence only the
    * delta band join (q76's measured shape) and the label-level CC run
    * — O(delta + affected), never O(corpus).
    */
  def q301IncrementalCc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val isDelta = (c: Column) => c % 10 === 7
    val pairs = minhashPairs(s, dir).filter($"jaccard" >= 0.6)
      .select($"doc_a", $"doc_b").persist()
    val basePairs = pairs.filter(!isDelta($"doc_a") && !isDelta($"doc_b"))
    val deltaPairs = pairs.filter(isDelta($"doc_a") || isDelta($"doc_b"))
      .persist()
    val baseLabels = connectedComponents(basePairs).persist()
    val quotientEdges = deltaPairs
      .join(baseLabels.select($"doc_id".as("doc_a"), $"canonical_id".as("la0")),
        Seq("doc_a"), "left")
      .join(baseLabels.select($"doc_id".as("doc_b"), $"canonical_id".as("lb0")),
        Seq("doc_b"), "left")
      .select(coalesce($"la0", $"doc_a").as("doc_a"),
        coalesce($"lb0", $"doc_b").as("doc_b"))
      .filter($"doc_a" =!= $"doc_b")
    val quotientLabels = connectedComponents(quotientEdges)
      .select($"canonical_id".as("lf"), $"doc_id".as("l0"))
    val deltaNodes = deltaPairs.select($"doc_a".as("doc_id"))
      .unionByName(deltaPairs.select($"doc_b".as("doc_id"))).distinct()
    val universe = baseLabels.select($"doc_id", $"canonical_id".as("l0"))
      .unionByName(deltaNodes.join(baseLabels, Seq("doc_id"), "left_anti")
        .select($"doc_id", $"doc_id".as("l0")))
    val out = universe.join(quotientLabels, Seq("l0"), "left")
      .select($"doc_id",
        when(isDelta($"doc_id"), lit("delta")).otherwise(lit("base")).as("src"),
        coalesce($"lf", $"l0").as("canonical_id"))
      .orderBy($"doc_id")
    out
  }

  private val q301Sql =
    s"""WITH RECURSIVE $minhashCtes,
      |pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.6),
      |edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach AS (
      |  SELECT DISTINCT a AS src, a AS dst FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
      |SELECT src AS doc_id,
      |  CASE WHEN src % 10 = 7 THEN 'delta' ELSE 'base' END AS src,
      |  min(dst) AS canonical_id
      |FROM reach
      |GROUP BY 1, 2
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q290

  /** Minimum duplicated-span length (tokens) for q290 — also the anchor
    * k-gram width, so every qualifying span contains at least one
    * aligned anchor match and the candidate generator is complete.
    */
  val ExactSubstrMinLen = 8

  /** Anchor-gram document-frequency cap for q290: an anchor seen in
    * more than this many documents is boilerplate the pair join must
    * not fan out on (the q18/q186 df-cap discipline). Spans consisting
    * ONLY of over-cap anchors are dropped — the documented trade every
    * bucketed ExactSubstr makes (Lee et al. shard by suffix bucket for
    * the same reason).
    */
  val ExactSubstrDfCap = 20

  /** q290: EXACT-SUBSTRING MAXIMAL-SPAN DEDUP (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" —
    * ExactSubstr, re-expressed bucketed instead of suffix-array): for
    * every document pair, the MAXIMAL exactly-shared token spans of
    * length ≥ [[ExactSubstrMinLen]], with both start offsets — the
    * canonical LLM dedup pass that TRIMS duplicated regions rather
    * than dropping whole near-dup documents (q103 reports fixed
    * 8-gram spans; this finds the maximal extent). Never all-pairs:
    * anchor k-grams ([[ExactSubstrMinLen]]-token, md5-keyed) are
    * df-capped, the join is on the anchor key, and maximality falls
    * out of DIAGONAL RUN-GROUPING instead of bidirectional probing —
    * aligned matches (pos_a − pos_b constant) with consecutive pos_a
    * are one shared span: overlapping equal k-grams imply the union
    * span is equal, and a run's end is exactly where extension fails
    * (an extendable span would extend the anchor run too). Each run
    * costs one window over (doc_a, doc_b, diagonal) — pair-local,
    * shuffle-partitioned by pair, O(matches log matches) at any
    * corpus size.
    */
  /** Span-eligible tokenization of a (doc_id, text) frame — the shared
    * first stage of the ExactSubstr family (q290/q304/q314 and the
    * [[TrimIndex]] artifact's both arms).
    */
  private[operators] def exactSubstrToks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= ExactSubstrMinLen)

  /** Anchor-gram postings (doc_id, pos, g) of a tokenized frame. */
  private[operators] def exactSubstrGrams(toks: DataFrame): DataFrame = {
    val L = ExactSubstrMinLen
    toks
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - (L - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(array_join(slice(col("t"), col("pos"), lit(L)), " ")).as("g"))
  }

  /** Diagonal run-grouping: aligned matches (doc_a, doc_b, pa, pb, diag)
    * → maximal shared spans (doc_a, doc_b, a_start, b_start, span_len).
    */
  private[operators] def exactSubstrSpanRuns(m: DataFrame): DataFrame = {
    val L = ExactSubstrMinLen
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    m
      .withColumn("rid", col("pa") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("rid"))
      .agg(min(col("pa")).as("a_start"),
        (max(col("pa")) - min(col("pa")) + L).cast("long").as("span_len"))
      .select(col("doc_a"), col("doc_b"),
        col("a_start").cast("long").as("a_start"),
        (col("a_start") - col("diag")).cast("long").as("b_start"),
        col("span_len"))
  }

  /** Maximal spans over a kept-anchor posting frame (doc_id, pos, g):
    * the anchor-key self-join (doc_a < doc_b) plus run grouping.
    */
  private[operators] def exactSubstrSpansFromPostings(gf: DataFrame): DataFrame = {
    val m = gf.select(col("doc_id").as("doc_a"), col("pos").as("pa"), col("g")).as("a")
      .join(gf.select(col("doc_id").as("doc_b"), col("pos").as("pb"), col("g")).as("b"),
        col("a.g") === col("b.g") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("diag"))
    exactSubstrSpanRuns(m)
  }

  /** The b-side position cover of a span set — every (doc_id, pos) the
    * trim removes.
    */
  private[operators] def exactSubstrBCover(spans: DataFrame): DataFrame =
    spans
      .select(col("doc_b").as("doc_id"),
        explode(sequence(col("b_start"),
          col("b_start") + col("span_len") - 1)).as("pos"))
      .distinct()

  /** The q290 span machinery, factored for its consumer q304: returns
    * (toks — persisted (doc_id, t) over span-eligible docs, spans —
    * (doc_a, doc_b, a_start, b_start, span_len) maximal shared spans).
    */
  private def exactSubstrSpans(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val toks = exactSubstrToks(
      tSpread(s, dir, "documents").select($"doc_id", $"text")).persist()
    val grams = exactSubstrGrams(toks)
    val keep = grams.groupBy($"g")
      .agg(count_distinct($"doc_id").as("nd"))
      .filter($"nd" >= 2 && $"nd" <= ExactSubstrDfCap)
      .select($"g")
    val gf = grams.join(broadcast(keep), "g")
    (toks, exactSubstrSpansFromPostings(gf))
  }

  def q290ExactSubstring(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (toks, spans) = exactSubstrSpans(s, dir)
    spans
      .join(toks.select($"doc_id".as("doc_a"), $"t"), "doc_a")
      .select($"doc_a", $"doc_b", $"a_start", $"b_start", $"span_len",
        array_join(slice($"t", $"a_start".cast("int"),
          $"span_len".cast("int")), " ").as("span"))
      .orderBy($"doc_a", $"doc_b", $"a_start", $"b_start")
  }

  /** Shared DuckDB CTE chain for the ExactSubstr family (q290 report,
    * q304 trim): tokenization → anchor grams → df-capped keep → aligned
    * matches → diagonal runs → maximal spans.
    */
  private[operators] def exactSubstrCtesShared: String = exactSubstrCtes

  /** The same chain restricted to the [[SufMod]] suffix pool — q323's
    * anchor arm (the pool-world ExactSubstr the LCP cover must contain).
    */
  private[operators] def exactSubstrCtesPool: String =
    exactSubstrCtesWith(s"doc_id % $SufMod = 0 AND ")

  private val exactSubstrCtes: String = exactSubstrCtesWith("")

  private def exactSubstrCtesWith(extraWhere: String): String = {
    val L = ExactSubstrMinLen
    s"""toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE ${extraWhere}len(string_split(text, ' ')) >= $L),
      |grams AS (
      |  SELECT doc_id, i AS pos,
      |    md5(array_to_string(list_slice(t, i, i + ${L - 1}), ' ')) AS g
      |  FROM (SELECT doc_id, t,
      |          unnest(generate_series(1, len(t) - ${L - 1})) AS i
      |        FROM toks)),
      |keep AS (
      |  SELECT g FROM grams GROUP BY g
      |  HAVING count(DISTINCT doc_id) BETWEEN 2 AND $ExactSubstrDfCap),
      |m AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
      |    a.pos - b.pos AS diag
      |  FROM (SELECT grams.* FROM grams JOIN keep USING (g)) a
      |  JOIN (SELECT grams.* FROM grams JOIN keep USING (g)) b
      |    ON a.g = b.g AND a.doc_id < b.doc_id),
      |runs AS (
      |  SELECT doc_a, doc_b, pa, pb, diag,
      |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
      |                            ORDER BY pa) AS rid
      |  FROM m),
      |spans AS (
      |  SELECT doc_a, doc_b,
      |    CAST(min(pa) AS BIGINT) AS a_start,
      |    CAST(min(pa) - diag AS BIGINT) AS b_start,
      |    CAST(max(pa) - min(pa) + $L AS BIGINT) AS span_len
      |  FROM runs GROUP BY doc_a, doc_b, diag, rid)""".stripMargin
  }

  private val q290Sql = {
    s"""WITH $exactSubstrCtes
      |SELECT s.doc_a, s.doc_b, s.a_start, s.b_start, s.span_len,
      |  array_to_string(list_slice(t.t, CAST(s.a_start AS INT),
      |    CAST(s.a_start + s.span_len - 1 AS INT)), ' ') AS span
      |FROM spans s JOIN toks t ON t.doc_id = s.doc_a
      |ORDER BY s.doc_a, s.doc_b, s.a_start, s.b_start""".stripMargin
  }

  // ---------------------------------------------------------------- q304

  /** q304: EXACTSUBSTR TRIM — the CONSUMER half of q290 (Lee et al.'s
    * pipeline doesn't just report duplicated spans, it REWRITES the
    * corpus): every position covered by the b-side of a maximal shared
    * span is removed — doc_b > doc_a always, so each duplicated span's
    * FIRST (lowest-doc-id) occurrence is the one retained — and the
    * cleaned corpus re-assembles from the surviving positions. Output
    * is one row per document: original/removed/kept token counts (the
    * token-mass conservation removed + kept = original is a column
    * identity the hash enforces) plus an md5 of the re-joined kept
    * text, so a single resurrected or mis-dropped token anywhere in
    * the corpus breaks the gate. Scale shape: the removal set
    * materializes one row per removed token position — the same
    * byte-range bookkeeping Lee et al.'s suffix-array pipeline emits —
    * and every join keys on (doc_id, pos); nothing is pairwise.
    * Overlap caveat (inherent to ExactSubstr): when two spans overlap
    * in the canonical doc, the canonical copy itself can lose tokens
    * to the other span's removal — the trim guarantees no b-side
    * occurrence survives, not that every span text survives somewhere
    * ([[graft.ExactSubstrSpec]] pins both the conservation and the
    * no-resurrection invariants).
    */
  /** (doc_id, pos) — every token position the trim removes (the b-side
    * cover of the maximal-span set). Shared by q304 and q300's funnel
    * trim stage. Round 12 (VERDICT r11 "What's wrong" #2): the set is
    * no longer re-derived per query — [[TrimIndex]] materializes it as
    * a versioned artifact (built once per corpus fingerprint, O(delta)
    * append for new document files), and both consumers read the
    * committed parquet. The artifact is a pure function of the source
    * bytes via the exact derivation above, so the consumers' DuckDB
    * oracles — which re-derive the removal set relationally — are
    * untouched, and q314 oracle-carries the append algebra itself.
    */
  private[operators] def exactSubstrRemovedPositions(s: SparkSession, dir: String): DataFrame =
    TrimIndex.removedPositions(s, dir)

  /** q304's per-document trim accounting over an explicit removal set —
    * factored so q314 (the append-algebra oracle) reuses the exact
    * output shape on its composed removal set.
    */
  private[operators] def trimAccounting(
      s: SparkSession, docs: DataFrame, removed: DataFrame): DataFrame = {
    import s.implicits._
    val rem = removed.persist()
    val allToks = docs
      .select($"doc_id", split($"text", " ").as("t"))
      .persist()
    val tokpos = allToks
      .select($"doc_id", posexplode($"t"))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"), $"col".as("tok"))
    val keptAgg = tokpos.join(rem, Seq("doc_id", "pos"), "left_anti")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct($"pos", $"tok"))),
            x => x.getField("tok")), " ")).as("kept_hash"))
    val remCnt = rem.groupBy($"doc_id").agg(count(lit(1)).as("removed_tokens"))
    allToks.select($"doc_id", size($"t").cast("long").as("n_tokens"))
      .join(remCnt, Seq("doc_id"), "left")
      .join(keptAgg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"removed_tokens", lit(0L)).as("removed_tokens"),
        coalesce($"kept_tokens", lit(0L)).as("kept_tokens"),
        coalesce($"kept_hash", md5(lit(""))).as("kept_hash"))
      .orderBy($"doc_id")
  }

  def q304ExactSubstrTrim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trimAccounting(s, t(s, dir, "documents").select($"doc_id", $"text"),
      exactSubstrRemovedPositions(s, dir))
  }

  /** q304's oracle — shared verbatim with q314 (the TrimIndex append
    * algebra), whose Spark arm must equal the same full-corpus trim.
    */
  private[operators] def q304SqlShared: String = q304Sql

  private val q304Sql =
    s"""WITH $exactSubstrCtes,
      |rem0 AS (
      |  SELECT doc_b AS doc_id, b_start,
      |    unnest(generate_series(1, CAST(span_len AS INT))) AS o
      |  FROM spans),
      |rem AS (SELECT DISTINCT doc_id, b_start + o - 1 AS pos FROM rem0),
      |alltoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tokpos AS (
      |  SELECT doc_id, t[i] AS tok, CAST(i AS BIGINT) AS pos
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
      |        FROM alltoks)),
      |kept AS (
      |  SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
      |  WHERE NOT EXISTS (SELECT 1 FROM rem r
      |                    WHERE r.doc_id = tp.doc_id AND r.pos = tp.pos)),
      |ka AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
      |    md5(array_to_string(list(tok ORDER BY pos), ' ')) AS kept_hash
      |  FROM kept GROUP BY doc_id),
      |rc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS removed_tokens
      |       FROM rem GROUP BY doc_id)
      |SELECT a.doc_id, CAST(len(a.t) AS BIGINT) AS n_tokens,
      |  coalesce(rc.removed_tokens, CAST(0 AS BIGINT)) AS removed_tokens,
      |  coalesce(ka.kept_tokens, CAST(0 AS BIGINT)) AS kept_tokens,
      |  coalesce(ka.kept_hash, md5('')) AS kept_hash
      |FROM alltoks a
      |LEFT JOIN rc USING (doc_id)
      |LEFT JOIN ka USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q220

  /** Fixed doc-slice budget for the q220 band-geometry gauge: both
    * verify arms run entirely inside the [[LshGaugeDocCap]] smallest-
    * md5(doc_id) documents (the q53/q231/q253 fixed-sample rule), so
    * the gauge costs O(cap · shingles-per-doc) at ANY corpus size. A
    * band-geometry ESTIMATE never needed its pair set to scale with
    * the corpus — the pre-round-10 form re-joined full shingle sets
    * per candidate pair over the whole corpus and measured 8.8× at
    * 10× data. At the correctness-gate SFs (≤ cap docs) the slice IS
    * the corpus, so outputs there are unchanged.
    */
  val LshGaugeDocCap = 1000

  /** q220: LSH banding quality gauge — the dedup family's missing
    * MEASUREMENT (q53/q75/q171/q175 gauge every ANN tier; nothing
    * gauged the MinHash bands): how many true near-dup pairs do the
    * q19 bands actually surface, and how much junk rides along? Truth
    * side: the df-capped inverted index (q18's generator) verified
    * with FULL-shingle-set Jaccard ≥ 0.6; banded side: the q19
    * band-collision pairs verified with the SAME full-set Jaccard —
    * identical numerators and denominators on both sides, so recall =
    * found-truth / truth and precision = true-dups / band-collisions
    * compare like for like. One row out: the counts, the recall the
    * 4-band/4-row signature delivers, and the precision cost of
    * banding. At 100 TB the audit costs one q18 pass + one q19 pass
    * over the [[LshGaugeDocCap]] md5-ranked doc slice — the number
    * that decides band geometry BEFORE a corpus-wide dedup run,
    * measured instead of assumed, at O(slice) cost at any corpus.
    */
  def q220LshQuality(s: SparkSession, dir: String): DataFrame =
    lshQualityGauge(s, dir, LshGaugeDocCap)

  /** The gauge with an explicit slice budget (spec hook: the cap is a
    * parameter so the sampled-slice floor can be locked at a cap that
    * BINDS on the test corpus, not only at the production default).
    */
  def lshQualityGauge(
      s: SparkSession, dir: String, docCap: Int): DataFrame = {
    import s.implicits._
    import graft.functions.NativeExpressions.minhashSignature
    // orderBy().limit() → TakeOrdered (cap-sized heap per task), then
    // the slice broadcasts into the text scan: only sampled docs are
    // ever shingled or signed.
    val sample = tSpread(s, dir, "documents")
      .select($"doc_id")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
      .limit(docCap)
    val docs = tSpread(s, dir, "documents")
      .join(broadcast(sample), "doc_id")
      .select($"doc_id", array_distinct(shingles($"text")).as("shs"))
      .filter(size($"shs") > 0)
      .select($"doc_id", $"shs", minhashSignature($"shs", NumHashes).as("sig"))
      .persist()
    // truth arm: the q18 machinery (df-capped inverted index, full-set
    // Jaccard verify) restricted to the slice. The df cap counts within
    // the slice — at gate SFs the slice is the corpus, so identical.
    val sh = docs.select($"doc_id", explode($"shs").as("sh"))
    val keep = sh.groupBy($"sh").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" <= ShingleDfCap).select($"sh")
    val shf = sh.join(broadcast(keep), "sh")
    val candT = shf.select($"doc_id".as("doc_a"), $"sh").as("a")
      .join(shf.select($"doc_id".as("doc_b"), $"sh").as("b"),
        col("a.sh") === col("b.sh") && $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    val truth = candT
      .join(docs.select($"doc_id".as("doc_a"), $"shs".as("sa")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"shs".as("sb")), "doc_b")
      .select($"doc_a", $"doc_b",
        (size(array_intersect($"sa", $"sb")).cast("double") /
          (size($"sa") + size($"sb") -
            size(array_intersect($"sa", $"sb")))).as("jac"))
      .filter($"jac" >= 0.6).select($"doc_a", $"doc_b").persist()
    // banded arm: the q19 machinery (band-bucket collision candidates,
    // full-set Jaccard verify) over the SAME slice.
    val bandKeys = array((0 until NumHashes / BandSize).map { bnd =>
      md5(concat_ws("|",
        (0 until BandSize).map(r => element_at($"sig", bnd * BandSize + r + 1)): _*))
    }: _*)
    val bands = docs.select($"doc_id", posexplode(bandKeys))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val candB = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val banded = candB
      .join(docs.select($"doc_id".as("doc_a"), $"shs".as("sa")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"shs".as("sb")), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"sa", $"sb")).cast("long").as("n_common"),
        size($"sa").as("na"), size($"sb").as("nb"))
      .filter($"n_common" > 0)
      .select($"doc_a", $"doc_b",
        ($"n_common".cast("double") / ($"na" + $"nb" - $"n_common")).as("jaccard"))
      .persist()
    val bandedDup = banded.filter($"jaccard" >= 0.6)
      .select($"doc_a", $"doc_b").persist()
    val nTruth = truth.count()
    val nBanded = banded.count()
    val nDup = bandedDup.count()
    val nMissed = truth.join(bandedDup, Seq("doc_a", "doc_b"), "left_anti")
      .count()
    truth.unpersist(false); banded.unpersist(false); bandedDup.unpersist(false)
    docs.unpersist(false)
    Seq((nTruth, nBanded, nDup, nMissed))
      .toDF("n_truth", "n_banded", "n_banded_dup", "n_missed")
      .select($"n_truth", $"n_banded", $"n_banded_dup", $"n_missed",
        when($"n_truth" > 0,
          round(($"n_truth" - $"n_missed").cast("double") / $"n_truth", 6))
          .as("recall"),
        when($"n_banded" > 0,
          round($"n_banded_dup".cast("double") / $"n_banded", 6))
          .as("prec"))
  }

  private lazy val q220Sql = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"min(md5('$i:' || sh)) AS s$i").mkString(", ")
    val bandSelects = (0 until NumHashes / BandSize).map { bnd =>
      val cols = (0 until BandSize)
        .map(r => s"s${bnd * BandSize + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $bnd AS band, md5($cols) AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH samp AS (
      |  SELECT doc_id FROM documents
      |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
      |  LIMIT $LshGaugeDocCap),
      |sdocs AS (
      |  SELECT d.doc_id, d.text FROM documents d JOIN samp USING (doc_id)),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM sdocs),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM toks WHERE len(t) >= 3),
      |keep AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $ShingleDfCap),
      |shf AS (SELECT sh.doc_id, sh.sh FROM sh JOIN keep USING (sh)),
      |candt AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |szf AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |jact AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(count(*) AS DOUBLE) / (sa.n + sb.n - count(*)) AS jac
      |  FROM candt c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
      |  JOIN szf sa ON sa.doc_id = c.doc_a
      |  JOIN szf sb ON sb.doc_id = c.doc_b
      |  GROUP BY c.doc_a, c.doc_b, sa.n, sb.n),
      |truth AS (SELECT doc_a, doc_b FROM jact WHERE jac >= 0.6),
      |sig AS (SELECT doc_id, $sigExprs FROM sh GROUP BY doc_id),
      |bands AS (
      |  $bandSelects),
      |candb AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |interb AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
      |  FROM candb c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
      |  GROUP BY 1, 2),
      |banded AS (
      |  SELECT i.doc_a, i.doc_b,
      |    CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jac
      |  FROM interb i
      |  JOIN szf sa ON sa.doc_id = i.doc_a
      |  JOIN szf sb ON sb.doc_id = i.doc_b),
      |bdup AS (SELECT doc_a, doc_b FROM banded WHERE jac >= 0.6),
      |missed AS (SELECT * FROM truth EXCEPT SELECT * FROM bdup),
      |nn AS (SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
      |  (SELECT CAST(count(*) AS BIGINT) FROM banded) AS n_banded,
      |  (SELECT CAST(count(*) AS BIGINT) FROM bdup) AS n_banded_dup,
      |  (SELECT CAST(count(*) AS BIGINT) FROM missed) AS n_missed)
      |SELECT n_truth, n_banded, n_banded_dup, n_missed,
      |  CASE WHEN n_truth > 0 THEN
      |    round(CAST(n_truth - n_missed AS DOUBLE) / n_truth, 6) END AS recall,
      |  CASE WHEN n_banded > 0 THEN
      |    round(CAST(n_banded_dup AS DOUBLE) / n_banded, 6) END AS prec
      |FROM nn""".stripMargin
  }

  // ---------------------------------------------------------------- q229

  /** q229: SOURCE-CONTAMINATION MATRIX — where the near-duplicates
    * actually come from: the q19 banded pairs aggregated into a
    * symmetric source×source matrix of candidate and verified-dup
    * counts. Within-source mass is ordinary redundancy; CROSS-source
    * mass is the signal a curation pipeline acts on — mirrored dumps,
    * syndicated content, one source scraping another — and decides
    * which source to keep when q46-style survivor selection has to
    * pick. Cost at 100 TB: the pair stream is already band-bounded
    * (never all-pairs); the matrix aggregation adds one
    * sources²-bounded groupBy on top — the report is O(pairs), and the
    * source lookup rides two joins against the (doc_id, source)
    * projection.
    */
  def q229SourceContamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = t(s, dir, "documents").select($"doc_id", $"source")
    minhashPairs(s, dir)
      .join(src.select($"doc_id".as("doc_a"), $"source".as("sa")), "doc_a")
      .join(src.select($"doc_id".as("doc_b"), $"source".as("sb")), "doc_b")
      .select(least($"sa", $"sb").as("src_a"),
        greatest($"sa", $"sb").as("src_b"), $"jaccard")
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("n_cand"),
        sum(when($"jaccard" >= 0.6, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("cross_source", $"src_a" =!= $"src_b")
      .orderBy($"src_a", $"src_b")
  }

  private lazy val q229Sql = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"min(md5('$i:' || sh)) AS s$i").mkString(", ")
    val bandSelects = (0 until NumHashes / BandSize).map { bnd =>
      val cols = (0 until BandSize)
        .map(r => s"s${bnd * BandSize + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $bnd AS band, md5($cols) AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shinglesCte,
      |szf AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |sig AS (SELECT doc_id, $sigExprs FROM sh GROUP BY doc_id),
      |bands AS (
      |  $bandSelects),
      |candb AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |interb AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
      |  FROM candb c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
      |  GROUP BY 1, 2),
      |banded AS (
      |  SELECT i.doc_a, i.doc_b,
      |    CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jac
      |  FROM interb i
      |  JOIN szf sa ON sa.doc_id = i.doc_a
      |  JOIN szf sb ON sb.doc_id = i.doc_b),
      |pairs AS (
      |  SELECT least(da.source, db.source) AS src_a,
      |    greatest(da.source, db.source) AS src_b, p.jac
      |  FROM banded p
      |  JOIN documents da ON da.doc_id = p.doc_a
      |  JOIN documents db ON db.doc_id = p.doc_b)
      |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_cand,
      |  CAST(sum(CASE WHEN jac >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  src_a <> src_b AS cross_source
      |FROM pairs GROUP BY src_a, src_b
      |ORDER BY src_a, src_b""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q229_source_contamination", Seq("EXT-dedup", "A2", "J1"),
      "source-contamination matrix: banded near-dup pairs aggregated source x source, cross-source mass flagged",
      q229SourceContamination, Some(q229Sql)),
    GraftQuery("q220_lsh_quality", Seq("EXT-dedup", "EXT-approx"),
      "LSH banding quality gauge: band-collision recall/precision vs full-set Jaccard truth, like-for-like denominators",
      q220LshQuality, Some(q220Sql)),
    GraftQuery("q99_block_dedup", Seq("EXT-dedup", "W1"),
      "block-level exact-substring dedup, global keep-first policy",
      q99BlockDedup, Some(q99Sql)),
    GraftQuery("q103_shared_spans", Seq("EXT-dedup", "A2"),
      "cross-document repeated 8-gram span audit (boilerplate report)",
      q103SharedSpans, Some(q103Sql)),
    GraftQuery("q301_incremental_cc", Seq("EXT-dedup", "EXT-incremental"),
      "incremental connected components: materialized base labels + delta-touching pairs + quotient-graph CC == full recompute (oracle runs the full reach)",
      q301IncrementalCc, Some(q301Sql)),
    GraftQuery("q290_exact_substring", Seq("EXT-dedup", "W1", "J1"),
      "ExactSubstr maximal-span dedup (Lee et al.): anchor-gram index + diagonal run-grouping, df-capped, never all-pairs",
      q290ExactSubstring, Some(q290Sql)),
    GraftQuery("q304_exactsubstr_trim", Seq("EXT-dedup"),
      "ExactSubstr trim pass: drop every non-first occurrence of each maximal shared span, re-assemble the cleaned corpus, conserve token mass",
      q304ExactSubstrTrim, Some(q304Sql)),
    GraftQuery("q76_incremental_dedup", Seq("EXT-dedup", "S6"),
      "incremental re-crawl dedup: delta bands probe the base index only",
      q76IncrementalDedup, Some(q76Sql)),
    GraftQuery("q46_dedup_survivors", Seq("EXT-dedup"),
      "dedup survivor selection: cluster labels + longest-text-wins window",
      q46DedupSurvivors, Some(q46Sql)),
    GraftQuery("q40_dedup_components", Seq("EXT-dedup"),
      "near-dup clustering: connected components + canonical ids",
      q40DedupComponents, Some(q40Sql)),
    GraftQuery("q134_cc_distributed", Seq("EXT-dedup"),
      "connected components with the driver shortcut disabled: the >2M-edge min-label propagation branch",
      q134CcDistributed, Some(q40Sql)),
    GraftQuery("q17_dedup_exact", Seq("EXT-dedup"),
      "exact dedup via content-hash groupBy", q17DedupExact, Some(q17Sql)),
    GraftQuery("q18_dedup_jaccard", Seq("EXT-dedup"),
      "n-gram Jaccard near-dup pairs (capped shingle join)", q18DedupJaccard, Some(q18Sql)),
    GraftQuery("q158_containment", Seq("EXT-dedup"),
      "asymmetric containment dedup: directional |A∩B|/|A| ratios classify quoting/inclusion pairs Jaccard misses",
      q158Containment, Some(q158Sql)),
    GraftQuery("q204_ppjoin_exact", Seq("EXT-dedup"),
      "COMPLETE Jaccard>=0.6 self-join via PPJoin prefix filtering: provably no missed pairs, rare-first prefixes bound candidates",
      q204PpjoinExact, Some(q204Sql)),
    GraftQuery("q308_edjoin", Seq("EXT-dedup", "EXT-fuzzy"),
      "COMPLETE edit-distance<=2 self-join via PassJoin segment matching: tau+1 segments, +-tau shifted probe substrings, banded threshold-levenshtein verify on candidates only",
      q308EdJoin, Some(q308Sql)),
    GraftQuery("q311_suffix_ranks", Seq("EXT-dedup", "EXT-text"),
      "distributed suffix ranking by prefix doubling: pair-refine + range-partitioned densify per round, partition-refinement fixpoint stop, no suffix string ever materialized",
      q311SuffixRanks, Some(q311Sql)),
    GraftQuery("q19_dedup_minhash_lsh", Seq("EXT-dedup"),
      "deterministic MinHash + LSH banding", q19DedupMinhashLsh, Some(q19Sql)),
    GraftQuery("q20_dedup_simhash", Seq("EXT-dedup"),
      "SimHash near-dup with banded Hamming search", q20DedupSimhash, Some(q20Sql)),
    GraftQuery("q44_dedup_simhash64", Seq("EXT-dedup"),
      "64-bit SimHash, 4x16-bit band tables (Hamming<=3 guarantee)",
      q44DedupSimhash64, Some(q44Sql)))
}
