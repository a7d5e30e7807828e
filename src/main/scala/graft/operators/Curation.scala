package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Curation QA & provenance operators (round 9, second batch): the
  * audit layer a pretraining corpus runs AFTER selection — free-text
  * PII redaction, plagiarism-style fingerprint attribution, leakage-safe
  * split assignment, a weakly-supervised quality classifier, the
  * token-budget mixture solver, and cross-document novelty scoring.
  * The reference pipeline stops at firmographic marts (models/marts/
  * core/core_companies.sql — no text-safety layer exists there); these
  * are the standard published passes (CCNet/GPT-3 quality filtering,
  * MOSS winnowing, domain-granular splits) re-expressed Spark-first.
  *
  * Engine-determinism discipline throughout = the q82/q162 idioms:
  * md5-derived hashes, per-term rounding to 12 digits REDUCED AS
  * DECIMAL before any float sum, final rounding to 6 digits before
  * every ranking or threshold cut.
  */
object Curation {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- q185

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val CustRe = "Customer#[0-9]{9}"

  /** q185: free-text PII detection + redaction. q49 anonymizes TYPED
    * columns; real corpora leak PII inside prose, so this pass scans
    * free text with detector regexes (email / NANP phone / account id
    * — the FineWeb/CCNet redaction shape), counts hits per type, and
    * rewrites the text with typed placeholders. The ticket text is
    * synthesized deterministically from the customer table (the
    * sandbox corpus itself contains no PII — the detectors must see
    * hits to be tested, and the construction doubles as the
    * "support-ticket ingest" shape). `residual` re-runs every detector
    * over the redacted text and must be 0 — the redaction
    * completeness proof carried into the oracle hash.
    *
    * Scale: pure scan-local projection — regex match + rewrite inside
    * whole-stage codegen, zero shuffles at any corpus size.
    */
  def q185PiiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ticket = concat(
      lit("Ticket from "), $"c_name", lit(" <"),
      lower($"c_mktsegment"), $"c_custkey".cast("string"),
      lit("@example.com> call 555-"),
      lpad(($"c_custkey" % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((($"c_custkey" * 7) % 10000).cast("string"), 4, "0"),
      lit(" account ref "), $"c_nationkey".cast("string"))
    def hits(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0)))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(ticket, EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]"),
        CustRe, "[CUST]")
    t(s, dir, "customer")
      .select($"c_custkey",
        hits(ticket, EmailRe).cast("long").as("n_email"),
        hits(ticket, PhoneRe).cast("long").as("n_phone"),
        hits(ticket, CustRe).cast("long").as("n_custid"),
        redacted.as("redacted"),
        (hits(redacted, EmailRe) + hits(redacted, PhoneRe) +
          hits(redacted, CustRe)).cast("long").as("residual"))
      .orderBy($"c_custkey")
  }

  private val q185Sql =
    s"""WITH tk AS (
      |  SELECT c_custkey,
      |    'Ticket from ' || c_name || ' <' || lower(c_mktsegment) || c_custkey ||
      |    '@example.com> call 555-' ||
      |    lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
      |    lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') ||
      |    ' account ref ' || c_nationkey AS ticket
      |  FROM customer),
      |red AS (
      |  SELECT c_custkey, ticket,
      |    regexp_replace(regexp_replace(regexp_replace(ticket,
      |      '$EmailRe', '[EMAIL]', 'g'),
      |      '$PhoneRe', '[PHONE]', 'g'),
      |      'Customer#[0-9]{9}', '[CUST]', 'g') AS redacted
      |  FROM tk)
      |SELECT c_custkey,
      |  CAST(len(regexp_extract_all(ticket, '$EmailRe')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(ticket, '$PhoneRe')) AS BIGINT) AS n_phone,
      |  CAST(len(regexp_extract_all(ticket, 'Customer#[0-9]{9}')) AS BIGINT) AS n_custid,
      |  redacted,
      |  CAST(len(regexp_extract_all(redacted, '$EmailRe')) +
      |       len(regexp_extract_all(redacted, '$PhoneRe')) +
      |       len(regexp_extract_all(redacted, 'Customer#[0-9]{9}')) AS BIGINT) AS residual
      |FROM red ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q186

  /** Winnowing geometry (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS fingerprinter): char [[WinK]]-grams, guarantee window
    * [[WinW]]; any shared substring of length ≥ K+W-1 = 11 chars is
    * guaranteed to share a fingerprint. [[WinDfCap]] drops
    * boilerplate fingerprints (the q18 df-cap discipline) so the pair
    * join is bounded; [[WinMinShared]] is the report threshold.
    */
  val WinK = 8
  val WinW = 4
  val WinDfCap = 20
  val WinMinShared = 3

  /** q186: winnowing fingerprint attribution — cross-document overlap
    * detection with a POSITIONAL guarantee (every ≥11-char shared run
    * is caught), which set-hash dedup (q19 MinHash) cannot give. Per
    * doc, hash every char 8-gram (substring(md5, 1, 8) — orderable hex)
    * and keep each 4-window's minimum: the winnowed fingerprint set.
    * The whole selection runs as ONE nested higher-order-function
    * projection (transform ∘ array_min ∘ transform) — scan-local,
    * codegen'd, zero shuffle; the fingerprint recomputes each gram
    * hash W times to stay join-free, the right CPU-for-shuffle trade.
    * Then: df-capped inverted index (common fingerprints are
    * boilerplate, dropped), fingerprint-bucket self-join, pairs
    * sharing ≥ 3 fingerprints. The two shuffles are both
    * fingerprint-keyed and df-bounded — the q19 LSH shape, so the
    * pass never goes all-pairs at any corpus size.
    */
  def q186WinnowFingerprints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Fingerprint stage as a KERNEL scan. History of this hot loop:
    // (1) "hash once into an array column, slice per window" — 817 s at
    // sf0.1: Catalyst collapses the projections and inlines the whole
    // gram-hash array into every window lambda, O(len²) md5s; (2) the
    // round-9 in-lambda rehash form — 11.6 s: O(len·W) md5s, but array
    // HOF lambdas evaluate on the INTERPRETED expression path (no
    // codegen), which round 10 measured as the dominant cost across
    // this family (q294's synthesis: 12.5 s HOF → 1.2 s kernel);
    // (3) this mapPartitions kernel — each gram hashed ONCE (O(len)
    // md5s, W× fewer than form 2), sliding-window minima in plain
    // loops, same (doc_id, fp) rows bit-for-bit (text is ASCII, so
    // char-substring md5 ≡ SQL md5; the hex prefix is the same 8
    // chars). Docs shorter than K+W-1 carry no fingerprint.
    val span = WinK + WinW - 2 // last window start = len - (K+W-2)
    val fps = Tables.loadSpread(s, dir, "documents")
      .select($"doc_id", $"text")
      .filter(length($"text") >= WinK + WinW - 1)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexd = "0123456789abcdef".toCharArray
        it.flatMap { case (id, text) =>
          val len = text.length
          val nGrams = len - WinK + 1
          val g = new Array[String](nGrams)
          var i = 0
          while (i < nGrams) {
            md.reset()
            val dg = md.digest(text.substring(i, i + WinK).getBytes("UTF-8"))
            val sb = new java.lang.StringBuilder(8)
            var b = 0
            while (b < 4) {
              val v = dg(b) & 0xff
              sb.append(hexd(v >> 4)); sb.append(hexd(v & 15)); b += 1
            }
            g(i) = sb.toString
            i += 1
          }
          val nWin = len - span
          val seen = new scala.collection.mutable.LinkedHashSet[String]
          var j = 0
          while (j < nWin) {
            var m = g(j); var k = 1
            while (k < WinW) {
              val c = g(j + k); if (c.compareTo(m) < 0) m = c; k += 1
            }
            seen += m
            j += 1
          }
          seen.iterator.map(fp => (id, fp))
        }
      }
      .toDF("doc_id", "fp")
      .persist()
    val keep = fps.groupBy($"fp").agg(count(lit(1)).as("df"))
      .filter($"df" <= WinDfCap).select($"fp")
    val idx = fps.join(broadcast(keep), Seq("fp"))
    val out = idx.as("a").join(idx.as("b"), Seq("fp"))
      .filter($"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= WinMinShared)
      .orderBy($"doc_a", $"doc_b")
    fps.unpersist(false)
    out
  }

  private val q186Sql =
    s"""WITH fps AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, length(text) - ${WinK + WinW - 2} + 1),
      |    j -> list_min(list_transform(range(j, j + $WinW),
      |         i -> substr(md5(substr(text, i, $WinK)), 1, 8)))))) AS fp
      |  FROM documents WHERE length(text) >= ${WinK + WinW - 1}),
      |keepfp AS (
      |  SELECT fp FROM (SELECT fp, count(*) AS df FROM fps GROUP BY fp)
      |  WHERE df <= $WinDfCap),
      |idx AS (SELECT doc_id, fp FROM fps JOIN keepfp USING (fp))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(count(*) AS BIGINT) AS shared
      |FROM idx a JOIN idx b USING (fp)
      |WHERE a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= $WinMinShared
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q187

  /** q187: leakage-safe train/val/test split. q50 hashes each doc_id
    * independently — near-duplicate documents land in different splits
    * and the eval set leaks into training (the published failure every
    * dedup paper warns about). The fix: assign splits at the
    * NEAR-DUP-CLUSTER granularity — here the identity class of the
    * full 4-hash MinHash signature over word 3-shingles (signature
    * equality ⇒ overwhelmingly near-dup; 19 multi-doc classes exist at
    * sf0.01) — keyed by the cluster representative (min doc_id), so
    * every member inherits ONE split. `naive_leak` marks docs whose
    * cluster WOULD have straddled splits under per-doc hashing — the
    * measured leak the policy closes. Shape: one scan-local shingle +
    * signature projection, one signature-keyed shuffle for the two
    * window aggregates — no join, no component iteration (signature
    * identity needs no transitive closure).
    */
  def q187LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def splitOf(c: Column): Column = {
      val h = substring(md5(c.cast("string")), 1, 1)
      when(h <= "b", "train").when(h <= "d", "val").otherwise("test")
    }
    val toks = Tables.load(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
    val sh = toks.select($"doc_id",
      explode(array_distinct(transform(
        sequence(lit(1), size($"t") - 2),
        i => concat(element_at($"t", i), lit(" "),
          element_at($"t", i + 1), lit(" "),
          element_at($"t", i + 2))))).as("s"))
    val sig = sh.groupBy($"doc_id").agg(
        concat(
          min(md5(concat(lit("0:"), $"s"))), min(md5(concat(lit("1:"), $"s"))),
          min(md5(concat(lit("2:"), $"s"))), min(md5(concat(lit("3:"), $"s"))))
          .as("ck"))
      .withColumn("naive", splitOf($"doc_id"))
    val w = Window.partitionBy($"ck")
    sig.select($"doc_id",
        min($"doc_id").over(w).as("rep"),
        count(lit(1)).over(w).as("n_cluster"),
        (min($"naive").over(w) =!= max($"naive").over(w)).as("naive_leak"))
      .withColumn("split", splitOf($"rep"))
      .select($"doc_id", $"rep", $"n_cluster", $"split", $"naive_leak")
      .orderBy($"doc_id")
  }

  private val q187Sql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(t) - 2 + 1),
      |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS s
      |  FROM toks),
      |sig AS (
      |  SELECT doc_id,
      |    min(md5('0:' || s)) || min(md5('1:' || s)) ||
      |    min(md5('2:' || s)) || min(md5('3:' || s)) AS ck
      |  FROM sh GROUP BY doc_id),
      |lab AS (
      |  SELECT doc_id, ck,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
      |         ELSE 'test' END AS naive
      |  FROM sig),
      |cl AS (
      |  SELECT doc_id,
      |    min(doc_id) OVER (PARTITION BY ck) AS rep,
      |    CAST(count(*) OVER (PARTITION BY ck) AS BIGINT) AS n_cluster,
      |    min(naive) OVER (PARTITION BY ck) <> max(naive) OVER (PARTITION BY ck)
      |      AS naive_leak
      |  FROM lab)
      |SELECT doc_id, rep, n_cluster,
      |  CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
      |       WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
      |       ELSE 'test' END AS split,
      |  naive_leak
      |FROM cl ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q188

  /** Weak-label threshold: stopword-occurrence ratio at which a doc is
    * heuristically "high quality" (median of the sf0.01 corpus ≈ 0.061
    * — the threshold splits the corpus roughly in half, which is what
    * gives the NB weights signal in both classes).
    */
  val NbStopThresh = 0.06

  /** q188: weakly-supervised Naive-Bayes quality classifier — the
    * CCNet/GPT-3 quality-filter shape (train a cheap linear classifier
    * on heuristic labels, score everything, keep/route by posterior)
    * with NB instead of fastText so training is CLOSED-FORM counts:
    * label docs by a stopword-ratio heuristic, count per-(token,label)
    * occurrences, Laplace-smooth into per-token log-likelihood-ratio
    * weights, score each doc as prior + Σ llr(token). Every ln() is
    * rounded to 12 digits and summed as DECIMAL (the q82 device), the
    * posterior margin rounded to 6 before the sign cut, so the
    * classification is engine-exact. `disagree` marks docs where the
    * learned classifier overrules its own teacher — the signal used to
    * iterate real quality filters. Shape: the weight table is
    * VOCABULARY-sized (df-capped in a real corpus) and broadcasts; the
    * only full shuffle is the (doc,token) count any indexer pays.
    */
  def q188NbQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.loadSpread(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("t"))
      .select($"doc_id", $"t",
        (size(filter($"t", x => x === "the" || x === "a")).cast("double") /
          size($"t")).as("ratio"))
      .select($"doc_id", $"t", ($"ratio" >= NbStopThresh).as("weak_good"))
    val toks = docs.select($"doc_id", $"weak_good", explode($"t").as("tok"))
      .persist()
    val cls = toks.groupBy($"tok").agg(
      sum(when($"weak_good", 1L).otherwise(0L)).as("cg"),
      sum(when($"weak_good", 0L).otherwise(1L)).as("cb"))
    val tot = toks.agg(
      sum(when($"weak_good", 1L).otherwise(0L)).as("tg"),
      sum(when($"weak_good", 0L).otherwise(1L)).as("tb"),
      countDistinct($"tok").as("v"),
      countDistinct(when($"weak_good", $"doc_id")).as("ng"),
      countDistinct(when(!$"weak_good", $"doc_id")).as("nb"))
    val wts = cls.crossJoin(broadcast(tot)).select($"tok",
      round(log(($"cg" + 1).cast("double") / ($"tg" + $"v")) -
            log(($"cb" + 1).cast("double") / ($"tb" + $"v")), 12)
        .cast("decimal(20,12)").as("llr"),
      round(log($"ng".cast("double") / $"nb"), 12)
        .cast("decimal(20,12)").as("prior"))
    val out = toks.join(broadcast(wts), Seq("tok"))
      .groupBy($"doc_id", $"weak_good")
      .agg(round((first($"prior") + sum($"llr")).cast("double"), 6).as("score"))
      .select($"doc_id", $"weak_good", ($"score" >= 0).as("nb_good"), $"score")
      .withColumn("disagree", $"weak_good" =!= $"nb_good")
      .orderBy($"doc_id")
    out
  }

  private val q188Sql =
    s"""WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |lab AS (
      |  SELECT doc_id, t,
      |    CAST(len(list_filter(t, x -> x IN ('the', 'a'))) AS DOUBLE) / len(t)
      |      >= $NbStopThresh AS weak_good
      |  FROM d),
      |toks AS (SELECT doc_id, weak_good, unnest(t) AS tok FROM lab),
      |cls AS (
      |  SELECT tok,
      |    CAST(sum(CASE WHEN weak_good THEN 1 ELSE 0 END) AS BIGINT) AS cg,
      |    CAST(sum(CASE WHEN weak_good THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM toks GROUP BY tok),
      |tot AS (
      |  SELECT
      |    CAST(sum(CASE WHEN weak_good THEN 1 ELSE 0 END) AS BIGINT) AS tg,
      |    CAST(sum(CASE WHEN weak_good THEN 0 ELSE 1 END) AS BIGINT) AS tb,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS v,
      |    CAST(count(DISTINCT CASE WHEN weak_good THEN doc_id END) AS BIGINT) AS ng,
      |    CAST(count(DISTINCT CASE WHEN NOT weak_good THEN doc_id END) AS BIGINT) AS nb
      |  FROM toks),
      |wts AS (
      |  SELECT tok,
      |    CAST(round(ln((cg + 1) / CAST(tg + v AS DOUBLE)) -
      |               ln((cb + 1) / CAST(tb + v AS DOUBLE)), 12)
      |      AS DECIMAL(20,12)) AS llr,
      |    CAST(round(ln(ng / CAST(nb AS DOUBLE)), 12) AS DECIMAL(20,12)) AS prior
      |  FROM cls CROSS JOIN tot),
      |scored AS (
      |  SELECT doc_id, weak_good,
      |    round(CAST(first(prior) + sum(llr) AS DOUBLE), 6) AS score
      |  FROM toks JOIN wts USING (tok) GROUP BY doc_id, weak_good)
      |SELECT doc_id, weak_good, score >= 0 AS nb_good, score,
      |  weak_good <> (score >= 0) AS disagree
      |FROM scored ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q189

  /** Max epoch cap for q189: no source may be repeated more than 4×
    * (the published over-sampling guard — Muennighoff et al. 2023 show
    * value decays past ~4 epochs of repeated data).
    */
  val MixMaxEpochs = 4.0

  /** q189: token-budget mixture solver — the data-recipe arithmetic a
    * pretraining run does before any job is launched (the LLaMA /
    * DoReMi table): given per-source token counts, a uniform target
    * weight over the 20 sources, and a total budget of 2× the corpus,
    * compute per-source epochs capped at [[MixMaxEpochs]], the
    * achieved token counts, and each source's fulfillment of its
    * target. Under-filled targets (small sources hitting the epoch
    * cap) surface as fulfillment < 1 — the number the recipe designer
    * rebalances against. One groupBy(source) + a 1-row broadcast; the
    * solver is O(sources) no matter the corpus size.
    */
  def q189TokenBudgetMixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perSrc = t(s, dir, "documents")
      .select($"source", size(split($"text", " ")).cast("long").as("n"))
      .groupBy($"source").agg(sum($"n").as("tokens"))
      .persist()
    val tot = perSrc.agg(sum($"tokens").as("total"),
      count(lit(1)).as("n_src"))
    val out = perSrc.crossJoin(broadcast(tot))
      .select($"source", $"tokens",
        (($"total" * 2).cast("double") / $"n_src").as("target"))
      .select($"source", $"tokens",
        round($"target").cast("long").as("target_tokens"),
        round(least($"target" / $"tokens", lit(MixMaxEpochs)), 6).as("epochs"))
      .withColumn("achieved_tokens",
        round($"epochs" * $"tokens").cast("long"))
      .withColumn("fulfillment",
        round($"achieved_tokens".cast("double") / $"target_tokens", 6))
      .orderBy($"source")
    out
  }

  private val q189Sql =
    s"""WITH perSrc AS (
      |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total,
      |          CAST(count(*) AS BIGINT) AS n_src FROM perSrc),
      |tgt AS (
      |  SELECT source, tokens,
      |    CAST(total * 2 AS DOUBLE) / n_src AS target
      |  FROM perSrc CROSS JOIN tot),
      |ep AS (
      |  SELECT source, tokens,
      |    CAST(round(target) AS BIGINT) AS target_tokens,
      |    round(least(target / tokens, $MixMaxEpochs), 6) AS epochs,
      |    target
      |  FROM tgt)
      |SELECT source, tokens, target_tokens, epochs,
      |  CAST(round(epochs * tokens) AS BIGINT) AS achieved_tokens,
      |  round(CAST(round(epochs * tokens) AS BIGINT) / CAST(target_tokens AS DOUBLE), 6)
      |    AS fulfillment
      |FROM ep ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q190

  /** q190: cross-document n-gram novelty — for each doc (in doc_id =
    * arrival order), the fraction of its DISTINCT word trigrams never
    * seen in any earlier document. The standard curriculum /
    * memorization-risk signal: low-novelty docs are re-treads of
    * earlier content (candidates for down-weighting), novelty ≈ 1 docs
    * introduce new material. first-seen attribution = min(doc_id) per
    * trigram — ONE trigram-keyed window, then one doc-keyed aggregate;
    * both shuffles carry the distinct (doc, trigram) set, which is
    * what any inverted index materializes anyway. At 100 TB the
    * trigram key space is huge but uniform — no skew funnel; df-style
    * capping is unnecessary because nothing joins back to docs.
    */
  def q190NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Tables.loadSpread(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id",
        explode(array_distinct(transform(
          sequence(lit(1), size($"t") - 2),
          i => concat(element_at($"t", i), lit(" "),
            element_at($"t", i + 1), lit(" "),
            element_at($"t", i + 2))))).as("g"))
    val w = Window.partitionBy($"g")
    sh.select($"doc_id", (min($"doc_id").over(w) === $"doc_id").as("novel"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tri"),
        sum(when($"novel", 1L).otherwise(0L)).as("novel"))
      .select($"doc_id", $"n_tri", $"novel",
        round($"novel" / $"n_tri", 6).as("novelty"))
      .orderBy($"doc_id")
  }

  private val q190Sql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(t) - 2 + 1),
      |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS g
      |  FROM toks),
      |fs AS (
      |  SELECT doc_id,
      |    min(doc_id) OVER (PARTITION BY g) = doc_id AS novel
      |  FROM sh)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
      |  CAST(sum(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT) AS novel,
      |  round(sum(CASE WHEN novel THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
      |    AS novelty
      |FROM fs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- registry

  // ---------------------------------------------------------------- q205

  /** q205: Pareto-frontier (skyline) document selection — "the documents
    * no other document beats on BOTH length and lexical diversity", the
    * multi-objective form of curation ranking (q24-style scalar scores
    * force a weighting; the skyline is the weight-free answer every
    * scalarization would pick from). Dimensions are exact integers:
    * x = n_chars, y = unique-token permille ((1000·distinct) div total —
    * floor division, no FP boundary), deliberately anti-correlated
    * (long docs repeat more), so the frontier is a real curve (31 docs
    * at sf0.01), not a corner point. Scale shape — the naive NOT EXISTS
    * is O(n²), dead at corpus scale; this plan is three passes:
    * (1) coarse fixed-width x-buckets (width 256, data-independent) →
    * per-bucket max y, a scan-shaped agg over ≤ max_chars/256 rows;
    * (2) suffix-max over strictly-higher buckets via the tiny
    * bucket-level self-join, broadcast back: any point with y <=
    * suffix-max is dominated by SOME higher-bucket point and drops in
    * the scan — provably sound (higher bucket => strictly greater x),
    * and provably complete (every true skyline point survives);
    * (3) exact dominance anti-join among the few survivors. The oracle
    * states the O(n²) definition directly — the gate proves the pruned
    * plan equals the definition.
    */
  def q205Skyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = t(s, dir, "documents")
      .select($"doc_id", $"n_chars".as("x"),
        expr("(1000 * size(array_distinct(split(text, ' ')))) div size(split(text, ' '))")
          .as("y"))
      .persist()
    val bmax = pts.groupBy(expr("x div 256").as("b"))
      .agg(max($"y").as("maxy"))
    val sufmax = bmax.as("lo")
      .join(bmax.as("hi"), col("hi.b") > col("lo.b"))
      .groupBy(col("lo.b").as("b")).agg(max(col("hi.maxy")).as("sufmax"))
    val surv = pts
      .join(broadcast(sufmax), expr("x div 256") === $"b", "left")
      .filter($"sufmax".isNull || $"y" > $"sufmax")
      .select($"doc_id", $"x", $"y")
    val sky = surv.as("p").join(surv.as("q"),
        col("q.x") >= col("p.x") && col("q.y") >= col("p.y") &&
          (col("q.x") > col("p.x") || col("q.y") > col("p.y")),
        "left_anti")
    sky.select($"doc_id", $"x".as("n_chars"), $"y".as("uniq_permille"))
      .orderBy($"n_chars".desc, $"doc_id".asc)
  }

  private val q205Sql =
    """WITH pts AS (
      |  SELECT doc_id, n_chars AS x,
      |    (1000 * len(list_distinct(string_split(text, ' '))))
      |      // len(string_split(text, ' ')) AS y
      |  FROM documents)
      |SELECT doc_id, x AS n_chars, y AS uniq_permille
      |FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y))
      |ORDER BY n_chars DESC, doc_id ASC""".stripMargin

  // ---------------------------------------------------------------- q298

  /** Anonymity threshold for q298: groups smaller than this are
    * re-identifiable (the standard k = 5 release rule).
    */
  val KAnonThreshold = 5L

  /** q298: K-ANONYMITY AUDIT — the privacy lane's complement to q185's
    * PII redaction: redaction removes direct identifiers, but a
    * release is still re-identifiable through QUASI-identifier
    * combinations. The audit groups the release by its quasi-identifier
    * tuple (nation, market segment, account balance rounded to the
    * hundred — the generalization a release would publish), counts
    * each equivalence class, and flags classes below [[KAnonThreshold]]
    * — the rows a k-anonymous release must suppress or generalize
    * further. One shuffle on the QI tuple, class table bounded by the
    * generalized domain at any corpus size.
    */
  def q298KAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_nationkey", $"c_mktsegment",
        (floor($"c_acctbal" / 100) * 100).cast("long").as("bal_bin"))
      .groupBy($"c_nationkey", $"c_mktsegment", $"bal_bin")
      .agg(count(lit(1)).as("k"))
      .select($"c_nationkey", $"c_mktsegment", $"bal_bin", $"k",
        ($"k" >= KAnonThreshold).as("anonymous"))
      .orderBy($"c_nationkey", $"c_mktsegment", $"bal_bin")
  }

  private val q298Sql =
    s"""SELECT c_nationkey, c_mktsegment,
      |  CAST(floor(c_acctbal / 100) * 100 AS BIGINT) AS bal_bin,
      |  CAST(count(*) AS BIGINT) AS k,
      |  count(*) >= $KAnonThreshold AS anonymous
      |FROM customer
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q299

  /** q299: DIFFERENTIALLY-PRIVATE COUNT RELEASE — per-nation customer
    * counts released under ε-DP with Laplace(1/ε) noise, the mechanism
    * a data platform runs before publishing corpus statistics. The
    * noise is an md5-seeded inverse-CDF draw (the q151/q162 idiom):
    * u ∈ (0,1) from the first 8 hex digits of md5('dp:' || nation),
    * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) — REPRODUCIBLE, so the
    * release is hash-checkable cross-engine while the mechanism's
    * algebra is exactly Laplace inverse-CDF sampling (a production
    * release swaps the seed source for a CSPRNG; every other line
    * stays). Emits true count, noise, release, and the ε spent —
    * the accounting row a DP ledger ingests. Scan + one bounded
    * groupBy at any scale.
    */
  val DpEpsilon = 1.0

  def q299DpRelease(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val u = (conv(substring(md5(concat(lit("dp:"),
        $"c_nationkey".cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) /
      4294967296.0
    val centered = u - 0.5
    val noise = round(
      lit(-1.0 / DpEpsilon) * signum(centered) * log(lit(1.0) - abs(centered) * 2), 6)
    t(s, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("true_count"))
      .select($"c_nationkey", $"true_count",
        noise.as("noise"),
        round($"true_count" + noise, 6).as("released"),
        lit(DpEpsilon).as("epsilon"))
      .orderBy($"c_nationkey")
  }

  private val q299Sql =
    s"""WITH c AS (
      |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS true_count
      |  FROM customer GROUP BY 1),
      |n AS (
      |  SELECT c_nationkey, true_count,
      |    round(-1.0 / $DpEpsilon *
      |      sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 6) AS noise
      |  FROM (
      |    SELECT *,
      |      (('0x' || substr(md5('dp:' || c_nationkey), 1, 8))::BIGINT + 0.5e0)
      |        / 4294967296e0 AS u
      |    FROM c))
      |SELECT c_nationkey, true_count, noise,
      |  round(true_count + noise, 6) AS released,
      |  $DpEpsilon AS epsilon
      |FROM n
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q300

  /** q300: CURATION FUNNEL — the report every pretraining run starts
    * from: the corpus pushed through the standard filter chain with
    * per-stage survivor counts and token mass, so the cost of each
    * rule is a number before GPU-hours are spent. Stages, each the
    * one-shot form of an operator the registry carries in depth:
    *
    *   0 raw        — the q17 re-crawl corpus (originals + every 10th
    *                  doc re-ingested under a new id);
    *   1 exact_dedup — min-doc_id survivor per md5(text) (q17's rule);
    *   2 lang       — keep `lang = 'en'` (q23's ID over the declared
    *                  column — the funnel reports policy cost, not the
    *                  classifier);
    *   3 length     — keep 20 ≤ tokens ≤ 1000 (the C4 length rule);
    *   4 trim       — the q304 ExactSubstr TRIM (round 11): span-level
    *                  dedup after the document-level stages, the
    *                  Lee-et-al. pipeline order — docs unchanged,
    *                  tokens shrink by the removed-span mass.
    *
    * Stages 0–3 are filters over the previous survivor set — one scan
    * + one content-hash shuffle at any corpus size; stage 4 adds the
    * q290 anchor-gram chain (df-capped, never all-pairs). The monotone
    * (docs, tokens) columns make any stage regression a hash break.
    */
  def q300CurationFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents").select($"doc_id", $"text", $"lang")
    val raw = base.unionByName(
      base.filter($"doc_id" % 10 === 0)
        .withColumn("doc_id", $"doc_id" + Dedup.TwinOffset))
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .persist()
    val s1 = raw
      .withColumn("keep_id", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5($"text"))))
      .filter($"doc_id" === $"keep_id").drop("keep_id").persist()
    val s2 = s1.filter($"lang" === "en")
    val s3 = s2.filter($"n_tokens".between(20, 1000))
    // stage 4 (round 11): the q304 ExactSubstr TRIM — span-level dedup
    // after the document-level stages, the Lee-et-al. pipeline order.
    // Doc count is unchanged (trim rewrites, never drops); the token
    // column shrinks by each survivor's removed-position mass. Removal
    // sets key on original doc_ids; exact-dedup (stage 1) has already
    // collapsed every twin onto its original, so the join is total.
    val rem = Dedup.exactSubstrRemovedPositions(s, dir)
      .groupBy($"doc_id").agg(count(lit(1)).as("rm"))
    val s4 = s3.join(rem, Seq("doc_id"), "left")
      .withColumn("n_tokens", $"n_tokens" - coalesce($"rm", lit(0L)))
      .drop("rm")
    def stage(id: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("docs"), sum($"n_tokens").as("tokens"))
        .select(lit(id).as("stage_id"), lit(name).as("stage"),
          $"docs", $"tokens")
    stage(0, "raw", raw)
      .unionByName(stage(1, "exact_dedup", s1))
      .unionByName(stage(2, "lang_en", s2))
      .unionByName(stage(3, "length_20_1000", s3))
      .unionByName(stage(4, "exactsubstr_trim", s4))
      .orderBy($"stage_id")
  }

  private val q300Sql =
    s"""WITH ${Dedup.exactSubstrCtesShared},
      |rem0 AS (
      |  SELECT doc_b AS doc_id, b_start,
      |    unnest(generate_series(1, CAST(span_len AS INT))) AS o
      |  FROM spans),
      |rc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS rm
      |  FROM (SELECT DISTINCT doc_id, b_start + o - 1 AS pos FROM rem0)
      |  GROUP BY doc_id),
      |raw AS (
      |  SELECT doc_id, text, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM (SELECT doc_id, text, lang FROM documents
      |        UNION ALL
      |        SELECT doc_id + 1000000000, text, lang FROM documents
      |        WHERE doc_id % 10 = 0)),
      |s1 AS (
      |  SELECT * FROM (
      |    SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
      |    FROM raw) WHERE doc_id = keep_id),
      |s2 AS (SELECT * FROM s1 WHERE lang = 'en'),
      |s3 AS (SELECT * FROM s2 WHERE n_tokens BETWEEN 20 AND 1000),
      |s4 AS (
      |  SELECT s3.doc_id, s3.n_tokens - coalesce(rc.rm, 0) AS n_tokens
      |  FROM s3 LEFT JOIN rc USING (doc_id))
      |SELECT * FROM (
      |  SELECT 0 AS stage_id, 'raw' AS stage,
      |    CAST(count(*) AS BIGINT) AS docs, CAST(sum(n_tokens) AS BIGINT) AS tokens FROM raw
      |  UNION ALL
      |  SELECT 1, 'exact_dedup', CAST(count(*) AS BIGINT), CAST(sum(n_tokens) AS BIGINT) FROM s1
      |  UNION ALL
      |  SELECT 2, 'lang_en', CAST(count(*) AS BIGINT), CAST(sum(n_tokens) AS BIGINT) FROM s2
      |  UNION ALL
      |  SELECT 3, 'length_20_1000', CAST(count(*) AS BIGINT), CAST(sum(n_tokens) AS BIGINT) FROM s3
      |  UNION ALL
      |  SELECT 4, 'exactsubstr_trim', CAST(count(*) AS BIGINT), CAST(sum(n_tokens) AS BIGINT) FROM s4)
      |ORDER BY stage_id""".stripMargin

  // ---------------------------------------------------------------- q309

  /** q309 epoch cap: no language may be repeated more than 2× (tighter
    * than q189's 4× so the cap actually binds on this corpus — four of
    * five languages hit it and the redistribution branch is exercised,
    * not just the uniform one). */
  val UniMaxEpochs = 2L

  /** q309: UNIMAX LANGUAGE-SAMPLING ALLOCATION (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining") — the waterfilling step
    * q189's mixture solver stops short of: q189 caps each source's
    * epochs against a FIXED uniform target and reports the shortfall;
    * UniMax REDISTRIBUTES that shortfall, growing every uncapped
    * language's share until the budget is exhausted. Closed form
    * instead of the paper's loop: sort languages by capacity
    * (= epochs·tokens) ascending; language i is capped iff
    * cap_i·(L−i+1) < B − prefix_{i−1}, a condition that is provably
    * monotone down the sort (if it fails at i it fails at every j > i,
    * since cap_j ≥ cap_i and the remaining budget shrinks by ≥ the
    * uniform share), so capped languages form a PREFIX and one window
    * pass + one aggregate decide the whole allocation — no iteration,
    * no driver loop. The flag comparison is pure BIGINT arithmetic
    * (exact in both engines); only the final uniform share divides.
    * The per-language table is |langs|-sized (bounded-dimension, the
    * q255/q189 adjudication), so its windows never see corpus-scaled
    * data; the corpus-sized work is one groupBy(lang) token count.
    */
  def q309UnimaxAllocation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perLang = t(s, dir, "documents")
      .select($"lang", size(split($"text", " ")).cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("n_tokens"))
      .persist()
    // budget = 1.5× the corpus, L = |langs| — driver scalars (q06 shape)
    val tot = perLang.agg(sum($"n_tokens"), count(lit(1))).head()
    val budget = tot.getLong(0) * 3 / 2
    val nLang = tot.getLong(1)
    val wSort = Window.orderBy($"capacity".asc, $"lang".asc)
    val flagged = perLang
      .withColumn("capacity", $"n_tokens" * UniMaxEpochs)
      .withColumn("i", row_number().over(wSort).cast("long"))
      .withColumn("pfx", sum($"capacity").over(
        wSort.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("capped",
        $"capacity" * (lit(nLang) - $"i" + 1) <
          lit(budget) - ($"pfx" - $"capacity"))
      .persist()
    val cappedStats = flagged.agg(
      coalesce(sum(when($"capped", $"capacity")), lit(0L)).as("capped_sum"),
      coalesce(sum(when($"capped", 1L)), lit(0L)).as("n_capped"))
    flagged.crossJoin(broadcast(cappedStats))
      .select($"lang", $"n_tokens", $"capacity", $"capped",
        round(when($"capped", $"capacity".cast("double"))
          .otherwise((lit(budget) - $"capped_sum").cast("double") /
            (lit(nLang) - $"n_capped")), 4).as("alloc"))
      .withColumn("epochs_used", round($"alloc" / $"n_tokens", 6))
      .orderBy($"lang")
  }

  private val q309Sql =
    s"""WITH tok AS (
      |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |    AS n_tokens
      |  FROM documents GROUP BY lang),
      |b AS (SELECT CAST(sum(n_tokens) AS BIGINT) * 3 // 2 AS budget,
      |             CAST(count(*) AS BIGINT) AS l FROM tok),
      |srt AS (
      |  SELECT lang, n_tokens, ${UniMaxEpochs} * n_tokens AS capacity,
      |    CAST(row_number() OVER (ORDER BY ${UniMaxEpochs} * n_tokens, lang)
      |      AS BIGINT) AS i,
      |    sum(${UniMaxEpochs} * n_tokens) OVER (
      |      ORDER BY ${UniMaxEpochs} * n_tokens, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
      |  FROM tok),
      |flag AS (
      |  SELECT s.*, b.budget, b.l,
      |    s.capacity * (b.l - s.i + 1) < b.budget - (s.pfx - s.capacity)
      |      AS capped
      |  FROM srt s CROSS JOIN b),
      |cs AS (
      |  SELECT coalesce(sum(capacity) FILTER (WHERE capped), 0)
      |      AS capped_sum,
      |    coalesce(count(*) FILTER (WHERE capped), 0) AS n_capped
      |  FROM flag)
      |SELECT lang, n_tokens, capacity, capped,
      |  round(CASE WHEN capped THEN CAST(capacity AS DOUBLE)
      |    ELSE CAST(budget - capped_sum AS DOUBLE) / (l - n_capped) END, 4)
      |    AS alloc,
      |  round(round(CASE WHEN capped THEN CAST(capacity AS DOUBLE)
      |    ELSE CAST(budget - capped_sum AS DOUBLE) / (l - n_capped) END, 4)
      |    / n_tokens, 6) AS epochs_used
      |FROM flag CROSS JOIN cs
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q313

  /** q313 geometry: 10 document-length buckets, 15 Sinkhorn rounds,
    * entropic regularization ε = 1 (kernel K = exp(−|i−j|)). */
  val OtBins = 10
  val OtIters = 15

  /** q313: SINKHORN OPTIMAL TRANSPORT between corpus distributions
    * (Cuturi 2013, "Sinkhorn Distances: Lightspeed Computation of
    * Optimal Transport" — the entropic-OT solver behind dataset
    * distribution matching, domain-adaptation reweighting, and
    * doc-length curriculum alignment): compute the entropic transport
    * plan that morphs the ENGLISH document-length distribution into
    * the GERMAN one over $OtBins$ length buckets, with |i−j| ground
    * cost. The solver is the classic matrix-scaling loop — u ← a⊘Kv,
    * v ← b⊘Kᵀu — run a FIXED $OtIters$ rounds so both engines execute
    * the identical arithmetic program. Engine determinism: the kernel
    * entries are round(12)-pinned (the one transcendental, exp of a
    * small negative integer); every matrix-vector product sums
    * round(12)-pinned terms as DECIMAL (order-free — the q82
    * discipline, here applied INSIDE an iteration, where a float sum's
    * engine-dependent order would compound across rounds); the
    * divisions and the final plan products are fixed-order IEEE.
    * Zero-mass bins short-circuit to 0 (0/s never evaluates). Scale:
    * the corpus is touched once, in the length-bucket groupBy; the
    * solver runs on bins²-sized frames (bounded-dimension, the
    * q266/q154 adjudication) for log-rounds of tiny keyed joins.
    * After the final v-update the COLUMN marginals match b to ~1e−12
    * while rows still carry the entropic residual — the asymmetry is
    * Sinkhorn's signature and the spec locks it.
    */
  def q313SinkhornOt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .filter($"lang".isin("en", "de"))
      .select(least(lit(OtBins - 1),
        floor(size(split($"text", " ")) / 10)).cast("int").as("b"), $"lang")
    val counts = docs.groupBy($"b").agg(
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("na"),
      sum(when($"lang" === "de", 1L).otherwise(0L)).as("nb"))
    // The corpus is touched exactly once (the length-bucket groupBy
    // above); everything after is OtBins-bounded — 10 marginal values
    // and a 10×10 kernel — so the 15 scaling rounds run DRIVER-SIDE on
    // the collected histogram (the decile-edges/offset-map bounded-
    // collect class; round 11 ran them as 30 localCheckpointed 10-row
    // jobs and paid ~7 s of pure scheduling). Every operation below
    // replicates the engine arithmetic bit-for-bit: round(x, n) =
    // BigDecimal.valueOf(x).setScale(n, HALF_UP) (Spark's Round on
    // DoubleType), the DECIMAL(28,12) sums are exact BigDecimal sums of
    // the 12dp-rounded terms (valueOf + setScale(12) recovers the exact
    // 12dp decimal: the double is within 1e-16 of it, far inside the
    // 5e-13 rounding granularity), divisions and the (ui·kij)·vj
    // product keep the Spark expression's association order, and
    // exp = java.lang.Math.exp — the same JVM intrinsic Spark's codegen
    // calls. The DuckDB oracle is untouched and re-proves equality per
    // gate run.
    val hist = counts.collect()
    val na = Array.fill(OtBins)(0L)
    val nb = Array.fill(OtBins)(0L)
    hist.foreach { r =>
      val b = r.getInt(0); na(b) = r.getLong(1); nb(b) = r.getLong(2)
    }
    val ta = na.sum
    val tb = nb.sum
    // degenerate-corpus guard (ADVICE r11): an empty language slice
    // would zero the marginals and emit a silent all-zero plan
    require(ta > 0 && tb > 0,
      s"q313 needs both language slices non-empty, got en=$ta de=$tb")
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def rnd(x: Double, sc: Int): Double =
      JBD.valueOf(x).setScale(sc, RM.HALF_UP).doubleValue
    def exact12(x: Double): JBD = JBD.valueOf(x).setScale(12, RM.HALF_UP)
    val a = Array.tabulate(OtBins)(i => na(i).toDouble / ta.toDouble)
    val bm = Array.tabulate(OtBins)(j => nb(j).toDouble / tb.toDouble)
    val km = Array.tabulate(OtBins, OtBins)((i, j) =>
      rnd(math.exp(-math.abs(i - j).toDouble), 12))
    val u = Array.fill(OtBins)(1.0)
    val v = Array.fill(OtBins)(1.0)
    for (_ <- 1 to OtIters) {
      for (i <- 0 until OtBins) {
        var su = JBD.ZERO
        for (j <- 0 until OtBins) su = su.add(exact12(rnd(km(i)(j) * v(j), 12)))
        u(i) = if (a(i) > 0) a(i) / su.doubleValue else 0.0
      }
      for (j <- 0 until OtBins) {
        var sv = JBD.ZERO
        for (i <- 0 until OtBins) sv = sv.add(exact12(rnd(km(i)(j) * u(i), 12)))
        v(j) = if (bm(j) > 0) bm(j) / sv.doubleValue else 0.0
      }
    }
    def p(i: Int, j: Int): Double = (u(i) * km(i)(j)) * v(j)
    var costSum = JBD.ZERO
    for (i <- 0 until OtBins; j <- 0 until OtBins)
      costSum = costSum.add(exact12(rnd(p(i, j) * math.abs(i - j).toDouble, 12)))
    val cost = rnd(costSum.doubleValue, 8)
    val rows = for (i <- 0 until OtBins; j <- 0 until OtBins)
      yield (i, j, rnd(p(i, j), 8), rnd(a(i), 8), rnd(bm(j), 8), cost)
    rows.toDF("i", "j", "plan", "mass_en", "mass_de", "transport_cost")
      .orderBy($"i", $"j")
  }

  private def q313Sql: String = {
    val rounds = (1 to OtIters).map { t =>
      s"""u$t AS MATERIALIZED (
         |  SELECT ab.i, CASE WHEN ab.a > 0 THEN ab.a / CAST(s.s AS DOUBLE)
         |    ELSE 0.0e0 END AS ui
         |  FROM ab JOIN (
         |    SELECT k.i, sum(CAST(round(k.kij * v.vj, 12) AS DECIMAL(28,12)))
         |      AS s
         |    FROM k JOIN v${t - 1} v ON k.j = v.j GROUP BY k.i) s
         |    ON s.i = ab.i),
         |v$t AS MATERIALIZED (
         |  SELECT ab.i AS j, CASE WHEN ab.bm > 0
         |    THEN ab.bm / CAST(s.s AS DOUBLE) ELSE 0.0e0 END AS vj
         |  FROM ab JOIN (
         |    SELECT k.j, sum(CAST(round(k.kij * u.ui, 12) AS DECIMAL(28,12)))
         |      AS s
         |    FROM k JOIN u$t u ON k.i = u.i GROUP BY k.j) s
         |    ON s.j = ab.i)""".stripMargin
    }.mkString(",\n")
    s"""WITH counts AS MATERIALIZED (
      |  SELECT least(${OtBins - 1},
      |      CAST(floor(len(string_split(text, ' ')) / 10) AS INT)) AS b,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS na,
      |    sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS nb
      |  FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
      |tot AS MATERIALIZED (SELECT sum(na) AS ta, sum(nb) AS tb FROM counts),
      |spine AS MATERIALIZED (SELECT unnest(generate_series(0, ${OtBins - 1})) AS i),
      |ab AS MATERIALIZED (
      |  SELECT spine.i,
      |    CAST(coalesce(counts.na, 0) AS DOUBLE) / tot.ta AS a,
      |    CAST(coalesce(counts.nb, 0) AS DOUBLE) / tot.tb AS bm
      |  FROM spine LEFT JOIN counts ON counts.b = spine.i CROSS JOIN tot),
      |k AS MATERIALIZED (
      |  SELECT a.i, b.i AS j, round(exp(-abs(a.i - b.i)), 12) AS kij
      |  FROM spine a CROSS JOIN spine b),
      |v0 AS MATERIALIZED (SELECT i AS j, 1.0e0 AS vj FROM spine),
      |$rounds,
      |plan AS MATERIALIZED (
      |  SELECT k.i, k.j, u.ui * k.kij * v.vj AS p
      |  FROM k JOIN u$OtIters u ON k.i = u.i JOIN v$OtIters v ON k.j = v.j),
      |cost AS MATERIALIZED (
      |  SELECT round(CAST(sum(CAST(round(p * abs(i - j), 12)
      |    AS DECIMAL(28,12))) AS DOUBLE), 8) AS transport_cost FROM plan)
      |SELECT plan.i, plan.j, round(plan.p, 8) AS plan,
      |  round(a2.a, 8) AS mass_en, round(b2.bm, 8) AS mass_de,
      |  cost.transport_cost
      |FROM plan
      |JOIN ab a2 ON a2.i = plan.i
      |JOIN ab b2 ON b2.i = plan.j
      |CROSS JOIN cost
      |ORDER BY plan.i, plan.j""".stripMargin
  }

  // ---------------------------------------------------------------- q319

  /** q319 geometry: a position starts a noise span with probability
    * [[ScStartP]] = 0.05 = corruption-rate 0.15 / mean-span 3 (T5's
    * defaults), span length 1 + md5-lane % [[ScLenMod]] (uniform 1..5,
    * mean 3). Deterministic md5 coins (the q264/q299 idiom).
    */
  val ScLenMod = 5
  val ScStartHex = "0ccccccd" // 0.05 of the 32-bit lane

  /** q319: SPAN-CORRUPTION BATCH PREP (T5 / UL2 denoising objective —
    * Raffel et al. 2020 §3.1.4) — the per-document accounting a
    * pretraining data loader needs BEFORE a batch is shaped: noise-span
    * starts are drawn per position from deterministic md5 coins, spans
    * extend 1..[[ScLenMod]] tokens (clipped at the document end), and
    * OVERLAPPING spans merge (the standard implementation detail —
    * each maximal noised run becomes ONE sentinel). Per doc: token
    * count, noised-token count, merged-span (=sentinel) count, and the
    * resulting encoder/decoder lengths — inputs = kept + one sentinel
    * per span, targets = noised + one sentinel per span + EOS — the
    * exact numbers that size a packed batch (q297's packer consumes
    * lengths like these). Scale shape: one explode over token
    * positions, the run-grouping window keyed per doc (q290's rid
    * device), everything else per-doc aggregates.
    */
  def q319SpanCorruption(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .filter($"n" >= 1)
      .persist()
    val pos = docs
      .select($"doc_id", $"n", explode(sequence(lit(1L), $"n")).as("i"))
      .withColumn("h", md5(concat(lit("sc:"), $"doc_id".cast("string"),
        lit(":"), $"i".cast("string"))))
    val starts = pos
      .filter(substring($"h", 1, 8) < ScStartHex)
      .withColumn("len",
        lit(1L) + conv(substring($"h", 9, 8), 16, 10).cast("long") % ScLenMod)
    val covered = starts
      .select($"doc_id",
        explode(sequence($"i", least($"i" + $"len" - 1, $"n"))).as("pos"))
      .distinct()
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val runs = covered
      .withColumn("rid", $"pos" - row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_noised"), count_distinct($"rid").as("n_spans"))
    docs.join(runs, Seq("doc_id"), "left")
      .select($"doc_id", $"n".as("n_tokens"),
        coalesce($"n_noised", lit(0L)).as("n_noised"),
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        ($"n" - coalesce($"n_noised", lit(0L)) +
          coalesce($"n_spans", lit(0L))).as("inputs_len"),
        (coalesce($"n_noised", lit(0L)) +
          coalesce($"n_spans", lit(0L)) + 1).as("targets_len"))
      .orderBy($"doc_id")
  }

  private val q319Sql =
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 1),
      |pos AS (
      |  SELECT doc_id, n, i, md5('sc:' || doc_id || ':' || i) AS h
      |  FROM (SELECT doc_id, n, unnest(generate_series(1, n)) AS i FROM d)),
      |st AS (
      |  SELECT doc_id, n, i,
      |    1 + (('0x' || substr(h, 9, 8))::BIGINT % $ScLenMod) AS len
      |  FROM pos WHERE substr(h, 1, 8) < '$ScStartHex'),
      |cov AS (
      |  SELECT DISTINCT doc_id, i + o AS p
      |  FROM st, unnest(generate_series(0, least(len - 1, n - i))) AS t(o)),
      |runs AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_noised,
      |    CAST(count(DISTINCT rid) AS BIGINT) AS n_spans
      |  FROM (SELECT doc_id, p,
      |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rid
      |        FROM cov)
      |  GROUP BY 1)
      |SELECT d.doc_id, d.n AS n_tokens,
      |  coalesce(r.n_noised, 0) AS n_noised,
      |  coalesce(r.n_spans, 0) AS n_spans,
      |  CAST(d.n - coalesce(r.n_noised, 0) + coalesce(r.n_spans, 0) AS BIGINT)
      |    AS inputs_len,
      |  CAST(coalesce(r.n_noised, 0) + coalesce(r.n_spans, 0) + 1 AS BIGINT)
      |    AS targets_len
      |FROM d LEFT JOIN runs r USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q320

  /** q320 geometry: [[DrmRounds]] multiplicative-weights rounds with
    * step [[DrmEta]]; each round's domain weights mix with uniform at
    * [[DrmSmooth]] ([[DrmKeep]] = 1 − smooth is its OWN constant so
    * both engines use the identical double literal, never a computed
    * 1.0 − 0.1).
    */
  val DrmRounds = 8
  val DrmEta = 1.0
  val DrmSmooth = 0.1
  val DrmKeep = 0.9

  /** q320: DOREMI DOMAIN REWEIGHTING (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
    * the Group-DRO mixture optimizer, batch-shaped): domains are the
    * `lang` column; per-document EXCESS LOSS is max(0, proxy − ref)
    * cross-entropy under q307's two bigram LMs (ref = the in-domain
    * slice's model, proxy = the general slice's — reusing
    * [[TextAnalysis.mooreLewisScores]] verbatim); each round draws a
    * weight-proportional sample per domain (deterministic md5 coins,
    * the q299 unit-line device — inclusion probability IS the current
    * weight, so the minibatch composition tracks the mixture exactly
    * as DoReMi's sampler does), measures the sampled per-domain mean
    * excess, and updates weights by multiplicative weights with
    * uniform smoothing: α ← norm(α·(1 + η·λ̄))·(1−c) + c/|D| — the
    * rational first-order form of DoReMi's exponentiated gradient
    * (Arora et al.'s MWU), chosen because exp of DATA-DEPENDENT
    * arguments at 12dp pinning would expose cross-engine libm ulp
    * differences where pure +,·,/ are IEEE-identical by construction. Output is
    * the whole trajectory — one row per (round, domain) with the
    * sample size, the measured excess, and the weight — so a single
    * drifted round anywhere breaks the hash. Engine determinism: the
    * per-round update runs DRIVER-SIDE on the |domains|-row collect
    * (the q313 bounded-solver class; the corpus-sized work is the one
    * scoring pass plus one filtered groupBy per round over the pooled
    * doc-stats frame), with sums as exact DECIMAL(18,6)/(18,12)
    * reductions, round = BigDecimal HALF_UP (Spark's Round), and the
    * update rule is transcendental-free (see above).
    */
  def q320Doremi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scores = TextAnalysis.mooreLewisScores(s, dir)
    val coins = (1 to DrmRounds).map { t =>
      ((conv(substring(md5(concat(lit(s"drm:$t:"), $"doc_id".cast("string"))),
        1, 8), 16, 10).cast("long").cast("double") + lit(0.5)) /
        lit(4294967296.0)).as(s"u$t")
    }
    val pool = scores
      .join(t(s, dir, "documents").select($"doc_id", $"lang"), Seq("doc_id"))
      .select(Seq($"doc_id", $"lang",
        round(greatest(lit(0.0), $"ce_gen" - $"ce_in"), 6).as("excess")) ++
        coins: _*)
      .persist()
    val langs = pool.select($"lang").distinct()
      .as[String].collect().sorted
    require(langs.nonEmpty, "q320 needs a non-empty scored pool")
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def rnd(x: Double, sc: Int): Double =
      JBD.valueOf(x).setScale(sc, RM.HALF_UP).doubleValue
    val ndD = langs.length.toDouble
    var alpha = langs.map(l => l -> rnd(1.0 / ndD, 12)).toMap
    val out = Seq.newBuilder[(Int, String, Long, Double, Double)]
    langs.foreach(l => out += ((0, l, 0L, 0.0, alpha(l))))
    for (t <- 1 to DrmRounds) {
      val aCol = langs.tail.foldLeft(
        when($"lang" === langs.head, lit(alpha(langs.head)))) {
        (c, l) => c.when($"lang" === l, lit(alpha(l)))
      }.otherwise(lit(0.0))
      val rows = pool.filter(col(s"u$t") < aCol)
        .groupBy($"lang")
        .agg(sum($"excess".cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .as("se"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
      val lam = langs.map { l =>
        l -> rows.get(l).map { case (se, n) => se.doubleValue / n.toDouble }
          .getOrElse(0.0)
      }.toMap
      val ap = langs.map(l =>
        l -> rnd(alpha(l) * rnd(1.0 + DrmEta * lam(l), 12), 12)).toMap
      var sBD = JBD.ZERO
      langs.foreach(l => sBD = sBD.add(
        JBD.valueOf(ap(l)).setScale(12, RM.HALF_UP)))
      val sD = sBD.doubleValue
      alpha = langs.map(l =>
        l -> rnd(DrmKeep * (ap(l) / sD) + DrmSmooth / ndD, 12)).toMap
      langs.foreach { l =>
        out += ((t, l, rows.get(l).map(_._2).getOrElse(0L),
          rnd(lam(l), 6), alpha(l)))
      }
    }
    out.result().toDF("round", "lang", "n_sampled", "lambda", "weight")
      .orderBy($"round", $"lang")
  }

  private def q320Sql: String = {
    val coinCols = (1 to DrmRounds).map { t =>
      s"(('0x' || substr(md5('drm:$t:' || s.doc_id), 1, 8))::BIGINT + 0.5e0)" +
        s" / 4294967296e0 AS u$t"
    }.mkString(",\n|    ")
    val rounds = (1 to DrmRounds).map { t =>
      s"""s$t AS (
        |  SELECT p.lang, sum(CAST(p.excess AS DECIMAL(18,6))) AS se,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM pool p JOIN r${t - 1} r ON r.lang = p.lang
        |  WHERE p.u$t < r.alpha
        |  GROUP BY 1),
        |e$t AS (
        |  SELECT r.lang, r.alpha,
        |    coalesce(CAST(s.se AS DOUBLE) / s.n, 0.0e0) AS lam,
        |    coalesce(s.n, 0) AS n
        |  FROM r${t - 1} r LEFT JOIN s$t s ON s.lang = r.lang),
        |a$t AS (
        |  SELECT lang, n, lam,
        |    round(alpha * round(1.0 + $DrmEta * lam, 12), 12) AS ap
        |  FROM e$t),
        |r$t AS MATERIALIZED (
        |  SELECT lang, n, lam,
        |    round($DrmKeep * (ap /
        |      (SELECT CAST(sum(CAST(ap AS DECIMAL(18,12))) AS DOUBLE) FROM a$t))
        |      + $DrmSmooth / (SELECT CAST(count(*) AS DOUBLE) FROM r0), 12)
        |      AS alpha
        |  FROM a$t)""".stripMargin
    }.mkString(",\n")
    val outs = (1 to DrmRounds).map(t =>
      s"SELECT $t AS round, lang, n AS n_sampled, round(lam, 6) AS lambda," +
        s" alpha AS weight FROM r$t")
      .mkString("\nUNION ALL ")
    s"""WITH ${TextAnalysis.mlAggCtes},
      |pool AS MATERIALIZED (
      |  SELECT s.doc_id, d.lang,
      |    round(greatest(0.0e0, s.ce_gen - s.ce_in), 6) AS excess,
      |    $coinCols
      |  FROM agg s JOIN documents d ON d.doc_id = s.doc_id),
      |r0 AS MATERIALIZED (
      |  SELECT lang,
      |    round(1.0 / (SELECT CAST(count(DISTINCT lang) AS DOUBLE) FROM pool),
      |      12) AS alpha
      |  FROM (SELECT DISTINCT lang FROM pool)),
      |$rounds
      |SELECT 0 AS round, lang, CAST(0 AS BIGINT) AS n_sampled,
      |  0.0e0 AS lambda, alpha AS weight FROM r0
      |UNION ALL $outs
      |ORDER BY round, lang""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q320_doremi", Seq("EXT-curation", "EXT-text", "A2"),
      "DoReMi domain reweighting: per-domain excess loss under q307's two LMs, weight-proportional md5-coin minibatches, multiplicative-weights trajectory with uniform smoothing",
      q320Doremi, Some(q320Sql)),
    GraftQuery("q319_span_corruption", Seq("EXT-curation", "EXT-text"),
      "T5/UL2 span-corruption batch prep: md5-coin span starts, clipped 1..5 lengths, overlapping spans merged to sentinels, encoder/decoder length accounting",
      q319SpanCorruption, Some(q319Sql)),
    GraftQuery("q313_sinkhorn_ot", Seq("EXT-curation", "EXT-approx"),
      "Sinkhorn entropic optimal transport between corpus length distributions: fixed-round matrix scaling, decimal-pinned kernel products inside the iteration, bins-squared bounded frames",
      q313SinkhornOt, Some(q313Sql)),
    GraftQuery("q309_unimax_allocation", Seq("EXT-curation", "A2"),
      "UniMax language-sampling waterfilling: epochs-capped capacities, monotone capped-prefix closed form, BIGINT-exact cap decisions, budget-exhausting redistribution",
      q309UnimaxAllocation, Some(q309Sql)),
    GraftQuery("q300_curation_funnel", Seq("EXT-curation", "A2", "EXT-dedup"),
      "curation funnel report: raw -> exact-dedup -> lang -> length with per-stage doc/token mass, one scan + one hash shuffle",
      q300CurationFunnel, Some(q300Sql)),
    GraftQuery("q298_k_anonymity", Seq("EXT-anonymize", "A2", "EXT-curation"),
      "k-anonymity audit: quasi-identifier equivalence classes counted, sub-threshold classes flagged for suppression",
      q298KAnonymity, Some(q298Sql)),
    GraftQuery("q299_dp_release", Seq("EXT-anonymize", "A2", "EXT-approx"),
      "epsilon-DP count release: Laplace inverse-CDF noise from reproducible md5 uniforms, accounting columns carried",
      q299DpRelease, Some(q299Sql)),
    GraftQuery("q205_skyline", Seq("EXT-curation", "J3"),
      "Pareto-frontier (skyline) doc selection: bucket-pruned plan proven equal to the O(n^2) definition",
      q205Skyline, Some(q205Sql)),
    GraftQuery("q185_pii_redact", Seq("EXT-anonymize", "F7", "EXT-text"),
      "free-text PII detection + redaction with a hash-carried completeness proof (residual = 0)",
      q185PiiRedact, Some(q185Sql)),
    GraftQuery("q186_winnow_fingerprints", Seq("EXT-dedup", "EXT-text"),
      "MOSS winnowing fingerprints: positional-guarantee overlap pairs via df-capped inverted index",
      q186WinnowFingerprints, Some(q186Sql)),
    GraftQuery("q187_leakage_safe_split", Seq("EXT-curation", "EXT-dedup"),
      "leakage-safe split at near-dup-cluster granularity + measured naive-split leak",
      q187LeakageSafeSplit, Some(q187Sql)),
    GraftQuery("q188_nb_quality", Seq("EXT-curation", "EXT-text"),
      "weakly-supervised Naive-Bayes quality classifier: closed-form training, exact-decimal scoring",
      q188NbQuality, Some(q188Sql)),
    GraftQuery("q189_token_budget_mixture", Seq("EXT-curation"),
      "token-budget mixture solver: capped epochs per source against a uniform target recipe",
      q189TokenBudgetMixture, Some(q189Sql)),
    GraftQuery("q190_ngram_novelty", Seq("EXT-curation", "EXT-text"),
      "cross-document n-gram novelty scoring by first-seen attribution",
      q190NgramNovelty, Some(q190Sql)))
}
