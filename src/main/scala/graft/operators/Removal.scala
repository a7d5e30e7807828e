package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** The unified removal ledger (round 14 — VERDICT r13 "Next round" #4):
  * the repo grew three independent corpus-scrub policies, each with its
  * own removal bookkeeping and its own rewrite consumer —
  *
  *  - ANCHOR-GRAM ExactSubstr ([[TrimIndex]].removed — token positions,
  *    whole corpus, keep-first-occurrence; q304/q314 rewrite),
  *  - LCP TRIM ([[SuffixIndex]].cover — char intervals over the suffix
  *    pool, both-copies policy; q323/q325 rewrite),
  *  - DECONTAMINATION (q58's benchmark-trigram overlap — whole-doc
  *    drops; flag-only until now) —
  *
  * which is exactly how production pipelines end up rewriting the same
  * corpus three times. The ledger normalizes all three into ONE
  * char-interval table with a `source` provenance column, and the one
  * consumer ([[q326RemovalScrub]]) applies the whole policy stack in a
  * single rewrite pass. The hash-locked theorem: rewriting once by the
  * UNION of the ledger's intervals equals COMPOSING the three
  * independent rewrites (the oracle keeps the sources separate and
  * filters kept chars through three independent NOT-EXISTS tests —
  * set-intersection of keeps — while the engine unions intervals first
  * and anti-joins once; hash equality is the union ≡ composition
  * proof, and the per-source char counts are each locked alongside it,
  * the conservation check per source).
  *
  * Normalization details: anchor TOKEN positions map to char intervals
  * through the single-space join offsets (q323's mapping — token i of
  * doc d starts at 1 + Σ_{j<i}(len_j + 1); computed as ONE
  * doc-partitioned running sum over the tokens of REMOVED-touched docs
  * only, never a per-position list re-join); LCP intervals come from
  * the committed artifact as-is; a contaminated doc contributes the
  * whole-doc interval [1, len]. Two of the three sources read committed
  * artifacts, so the ledger costs one artifact read each plus the q58
  * broadcast semi-join — nothing is re-derived.
  *
  * Scale shape at 100 TB: every stage keys on doc_id (artifact reads,
  * one window over touched docs' tokens, the benchmark-gram broadcast,
  * one interval anti-join); the char-explode rewrite pays only for
  * TOUCHED documents — untouched docs short-circuit to md5(text) — and
  * the ledger itself is O(removed mass), the same bookkeeping the
  * individual policies already carried, now carried once.
  */
object Removal {

  /** Decontamination threshold (q58's): a training doc sharing ≥ this
    * many distinct trigrams with the benchmark set is dropped whole.
    */
  val ContamMinShared = 3

  /** The ledger: (doc_id, st, en, source) — per-source DISJOINT char
    * removal intervals over the corpus, source ∈
    * {anchor, lcp, decontam}.
    */
  private[operators] def ledger(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")

    // anchor: committed token-position cover -> char intervals. The
    // running char-offset sum only visits tokens of docs the trim
    // touched (rem's doc set), and per-token intervals are disjoint by
    // construction (tokens are disjoint; the joining spaces stay).
    val rem = TrimIndex.removedPositions(s, dir)
    val remDocs = rem.select($"doc_id").distinct()
    val tokpos = docs.join(remDocs, Seq("doc_id"))
      .select($"doc_id", posexplode(split($"text", " ")))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"),
        length($"col").cast("long").as("tlen"))
    val woff = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val anchorIv = tokpos
      .withColumn("cstart",
        lit(1L) + coalesce(sum($"tlen" + 1L).over(woff), lit(0L)))
      .join(rem, Seq("doc_id", "pos"))
      .filter($"tlen" > 0)
      .select($"doc_id", $"cstart".as("st"), ($"cstart" + $"tlen" - 1).as("en"),
        lit("anchor").as("source"))

    // lcp: the committed cover intervals, verbatim (pool docs only —
    // the policy's own scope)
    val lcpIv = SuffixIndex.cover(s, dir)
      .select($"doc_id", $"st", $"en", lit("lcp").as("source"))

    // decontam: q58's rule — benchmark = doc_id % 50 == 7; a training
    // doc with >= ContamMinShared distinct shared trigrams drops whole.
    // Benchmark-gram set is eval-suite-sized -> broadcast (q58's plan).
    val grams = Tables.loadSpread(s, dir, "documents")
      .select($"doc_id", explode(array_distinct(Dedup.shingles($"text", 3))).as("g"))
    val bench = grams.filter($"doc_id" % 50 === 7).select($"g").distinct()
    val contam = grams.filter($"doc_id" % 50 =!= 7)
      .join(broadcast(bench), "g")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= ContamMinShared)
      .select($"doc_id")
    val decontamIv = docs.join(contam, Seq("doc_id"))
      .filter(length($"text") >= 1)
      .select($"doc_id", lit(1L).as("st"),
        length($"text").cast("long").as("en"), lit("decontam").as("source"))

    anchorIv.unionByName(lcpIv).unionByName(decontamIv)
  }

  /** q326: UNIFIED REMOVAL SCRUB — one corpus rewrite applying all
    * three removal policies from the [[ledger]] (see object doc).
    * Output per document: char counts removed by each source (the
    * per-source conservation checks), the union mass, and the
    * kept-char count + md5 of the once-rewritten text — a single
    * resurrected or doubly-dropped CHARACTER anywhere breaks the gate,
    * as does any disagreement between union-rewrite (engine) and
    * composed-rewrites (oracle). Untouched documents short-circuit to
    * md5(text): only the removal-touched minority pays the
    * char-explode, which is what lets one scrub pass price at
    * O(touched) instead of O(corpus chars).
    */
  def q326RemovalScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", $"text").persist()
    val led = ledger(s, dir).persist()
    val mass = $"en" - $"st" + 1
    val perSrc = led.groupBy($"doc_id").agg(
      sum(when($"source" === "anchor", mass).otherwise(0L)).as("anchor_chars"),
      sum(when($"source" === "lcp", mass).otherwise(0L)).as("lcp_chars"),
      sum(when($"source" === "decontam", mass).otherwise(0L)).as("decontam_chars"))
    val uni = SuffixIndex.unionIntervals(led.select($"doc_id", $"st", $"en"))
      .persist()
    val uniCnt = uni.groupBy($"doc_id").agg(sum(mass).as("union_chars"))
    val touched = uni.select($"doc_id").distinct()
    val tDocs = docs.join(touched, Seq("doc_id"))
    val chars = tDocs
      .select($"doc_id",
        explode(sequence(lit(1L), length($"text").cast("long"))).as("cpos"),
        $"text")
      .select($"doc_id", $"cpos",
        expr("substring(text, CAST(cpos AS INT), 1)").as("ch"))
    val kept = chars
      .join(uni.select($"doc_id".as("did"), $"st", $"en"),
        $"doc_id" === $"did" && $"cpos".between($"st", $"en"), "left_anti")
    val keptAgg = kept.groupBy($"doc_id")
      .agg(count(lit(1)).as("kept_chars"),
        md5(array_join(
          transform(array_sort(collect_list(struct($"cpos", $"ch"))),
            x => x.getField("ch")), "")).as("kept_hash"))
    val touchedOut = tDocs
      .select($"doc_id", length($"text").cast("long").as("n_chars"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_chars",
        coalesce($"kept_chars", lit(0L)).as("kept_chars"),
        coalesce($"kept_hash", md5(lit(""))).as("kept_hash"))
    val untouchedOut = docs.join(touched, Seq("doc_id"), "left_anti")
      .select($"doc_id", length($"text").cast("long").as("n_chars"),
        length($"text").cast("long").as("kept_chars"),
        md5($"text").as("kept_hash"))
    touchedOut.unionByName(untouchedOut)
      .join(perSrc, Seq("doc_id"), "left")
      .join(uniCnt, Seq("doc_id"), "left")
      .select($"doc_id", $"n_chars",
        coalesce($"anchor_chars", lit(0L)).as("anchor_chars"),
        coalesce($"lcp_chars", lit(0L)).as("lcp_chars"),
        coalesce($"decontam_chars", lit(0L)).as("decontam_chars"),
        coalesce($"union_chars", lit(0L)).as("union_chars"),
        $"kept_chars", $"kept_hash")
      .orderBy($"doc_id")
  }

  /** The oracle re-derives all three sources relationally (the anchor
    * chain is q304's, the LCP chain q323's, the trigram chain q58's)
    * and — deliberately — does NOT union them: kept chars pass three
    * independent NOT-EXISTS filters, i.e. the COMPOSITION of the three
    * rewrites in original coordinates. The engine unions intervals and
    * anti-joins once; hash equality is the union-rewrite ≡
    * composed-rewrites theorem, per-source counts the conservation
    * checks.
    */
  private def q326Sql: String =
    s"""WITH ${Dedup.exactSubstrCtesShared},
      |${SuffixIndex.lcpCoverCtes},
      |arem0 AS (
      |  SELECT doc_b AS doc_id, b_start,
      |    unnest(generate_series(1, CAST(span_len AS INT))) AS o
      |  FROM spans),
      |arem AS (SELECT DISTINCT doc_id, b_start + o - 1 AS pos FROM arem0),
      |atoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |apos AS MATERIALIZED (
      |  SELECT DISTINCT x.doc_id, CAST(x.cs + q.k AS BIGINT) AS cpos
      |  FROM (SELECT a.doc_id, a.pos,
      |          coalesce(len(array_to_string(
      |            list_slice(t.t, 1, CAST(a.pos - 1 AS INT)), ' ')), 0) +
      |            CASE WHEN a.pos = 1 THEN 1 ELSE 2 END AS cs,
      |          len(t.t[CAST(a.pos AS INT)]) AS tl
      |        FROM arem a JOIN atoks t USING (doc_id)) x,
      |    unnest(generate_series(0, x.tl - 1)) q(k)
      |  WHERE x.tl > 0),
      |dtoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |dg3 AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      |  FROM dtoks WHERE len(t) >= 3),
      |dbench AS (SELECT DISTINCT g FROM dg3 WHERE doc_id % 50 = 7),
      |contam AS (
      |  SELECT doc_id FROM dg3 JOIN dbench USING (g)
      |  WHERE doc_id % 50 <> 7
      |  GROUP BY doc_id HAVING count(*) >= $ContamMinShared),
      |dpos AS MATERIALIZED (
      |  SELECT c.doc_id, CAST(u.i AS BIGINT) AS cpos
      |  FROM contam c JOIN documents d USING (doc_id),
      |    unnest(generate_series(1, len(d.text))) u(i)),
      |acnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
      |         FROM apos GROUP BY 1),
      |lcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
      |         FROM cover GROUP BY 1),
      |dcnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
      |         FROM dpos GROUP BY 1),
      |upos AS MATERIALIZED (
      |  SELECT doc_id, cpos FROM apos
      |  UNION SELECT doc_id, cpos FROM cover
      |  UNION SELECT doc_id, cpos FROM dpos),
      |ucnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
      |         FROM upos GROUP BY 1),
      |tchd AS (SELECT DISTINCT doc_id FROM upos),
      |chars AS (
      |  SELECT d.doc_id, CAST(u.i AS BIGINT) AS cpos,
      |    substr(d.text, CAST(u.i AS INT), 1) AS ch
      |  FROM documents d JOIN tchd USING (doc_id),
      |    unnest(generate_series(1, len(d.text))) u(i)),
      |kept AS MATERIALIZED (
      |  SELECT c.doc_id, c.cpos, c.ch FROM chars c
      |  WHERE NOT EXISTS (SELECT 1 FROM apos a
      |                    WHERE a.doc_id = c.doc_id AND a.cpos = c.cpos)
      |    AND NOT EXISTS (SELECT 1 FROM cover v
      |                    WHERE v.doc_id = c.doc_id AND v.cpos = c.cpos)
      |    AND NOT EXISTS (SELECT 1 FROM dpos p
      |                    WHERE p.doc_id = c.doc_id AND p.cpos = c.cpos)),
      |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kc,
      |         md5(string_agg(ch, '' ORDER BY cpos)) AS kh
      |       FROM kept GROUP BY 1)
      |SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars,
      |  coalesce(acnt.c, 0) AS anchor_chars,
      |  coalesce(lcnt.c, 0) AS lcp_chars,
      |  coalesce(dcnt.c, 0) AS decontam_chars,
      |  coalesce(ucnt.c, 0) AS union_chars,
      |  CASE WHEN t.doc_id IS NULL THEN CAST(len(d.text) AS BIGINT)
      |       ELSE coalesce(ka.kc, 0) END AS kept_chars,
      |  CASE WHEN t.doc_id IS NULL THEN md5(d.text)
      |       ELSE coalesce(ka.kh, md5('')) END AS kept_hash
      |FROM documents d
      |LEFT JOIN tchd t USING (doc_id)
      |LEFT JOIN acnt USING (doc_id)
      |LEFT JOIN lcnt USING (doc_id)
      |LEFT JOIN dcnt USING (doc_id)
      |LEFT JOIN ucnt USING (doc_id)
      |LEFT JOIN ka USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q326_removal_scrub", Seq("EXT-dedup", "EXT-text"),
      "unified removal ledger: anchor-gram spans, LCP cover intervals and decontamination drops as one provenance-tagged char-interval table, applied in a single rewrite proven equal to composing the three policies",
      q326RemovalScrub, Some(q326Sql)))
}
