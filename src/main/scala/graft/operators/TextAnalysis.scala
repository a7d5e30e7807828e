package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Text analysis for training-data curation: token statistics, quality
  * scoring, regex tokenization, stopword-profile language ID, and document
  * fingerprinting — the north-star text extensions (BASELINE.json).
  *
  * Every measure is integer counting + a fixed-order arithmetic formula:
  * no transcendental functions, so the doubles are IEEE-identical across
  * engines and the oracle can hash-check them. All single-pass narrow
  * projections — at 100 TB these run at scan speed with no shuffle
  * (final ORDER BY aside, which exists for oracle determinism).
  */
object TextAnalysis {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  /** q23: per-document token/char statistics and a composite quality score
    * (length + lexical-diversity + stopword-balance), the
    * filter-before-training staple.
    */
  def q23TextStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    val nTokens = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val nStop = graft.functions.NativeExpressions.countInSet(toks, Stopwords)
    t(s, dir, "documents")
      .select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        nTokens.as("n_tokens"),
        nUniq.as("n_unique_tokens"),
        nStop.as("n_stopwords"),
        (nUniq.cast("double") / nTokens).as("lexical_diversity"),
        (nStop.cast("double") / nTokens).as("stopword_ratio"),
        ((nUniq.cast("double") / nTokens) * 0.5 +
          (nStop.cast("double") / nTokens) * 0.3 +
          when(nTokens >= 20 && nTokens <= 1000, 0.2).otherwise(0.0))
          .as("quality_score"))
      .orderBy($"doc_id")
  }

  private val q23Sql = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
      |    len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) AS n_stopwords
      |  FROM documents)
      |SELECT doc_id, n_chars, n_tokens, n_unique_tokens, n_stopwords,
      |  CAST(n_unique_tokens AS DOUBLE) / n_tokens AS lexical_diversity,
      |  CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
      |  (CAST(n_unique_tokens AS DOUBLE) / n_tokens) * 0.5 +
      |  (CAST(n_stopwords AS DOUBLE) / n_tokens) * 0.3 +
      |  (CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN 0.2 ELSE 0.0 END) AS quality_score
      |FROM base
      |ORDER BY doc_id""".stripMargin
  }

  /** Tokenizer regex shared by Spark and the oracle: letter runs, digit
    * runs, or single non-space symbols — the BPE-ish pre-tokenization
    * shape.
    */
  val TokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** q24: token counting two ways — whitespace tokens vs regex
    * pre-tokenization — plus their ratio (a cheap tokens-per-word proxy
    * for BPE fertility). Runs over a HETEROGENEOUS corpus: the prose
    * documents (fertility 1.0 — clean lowercase words) unioned with
    * entity strings from the customer table ("customer#000000042" →
    * 3 regex tokens per whitespace word, fertility 3.0) — the mix a
    * curation pipeline sees, where fertility is exactly the signal that
    * separates prose from id-heavy text.
    */
  def q24TokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ws = size(split($"text", " ")).cast("long")
    val re = size(regexp_extract_all($"text", lit(TokenRegex), lit(0))).cast("long")
    val prose = t(s, dir, "documents").select($"doc_id", $"text")
    val entities = t(s, dir, "customer")
      .select(($"c_custkey" + 1000000L).as("doc_id"), lower($"c_name").as("text"))
    prose.unionByName(entities)
      .select($"doc_id", ws.as("ws_tokens"), re.as("re_tokens"),
        (re.cast("double") / ws).as("fertility"))
      .orderBy($"doc_id")
  }

  private val q24Sql =
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT c_custkey + 1000000, lower(c_name) FROM customer)
      |SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '$TokenRegex')) AS re_tokens,
      |  CAST(len(regexp_extract_all(text, '$TokenRegex')) AS DOUBLE) /
      |    len(string_split(text, ' ')) AS fertility
      |FROM corpus
      |ORDER BY doc_id""".stripMargin

  /** Stopword profiles per language for the n-gram-free heuristic
    * language ID (tiny fixed lists — the deterministic skeleton of a real
    * fasttext-style classifier).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "une"))

  /** Per-language probe documents (stopword-dense sentences from each
    * profile) appended to the corpus so each detection path has a
    * positive example.
    */
  val ProbeSentences: Seq[(Long, String, String)] = Seq(
    (2000001L, "en", "the cat of a house and the dog in a garden is to play"),
    (2000002L, "es", "el gato de la casa que juega y corre en un jardin"),
    (2000003L, "de", "der hund und die katze das haus ist ein garten zu sehen"),
    (2000004L, "fr", "le chien et la maison de un chat est une belle chose"))

  /** q25: heuristic language ID — score = matching-stopword count per
    * language profile; argmax with fixed precedence (en>es>de>fr, 'und'
    * when all zero), compared against the labeled lang column.
    */
  def q25LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    val scores = LangProfiles.map { case (l, ws) =>
      l -> graft.functions.NativeExpressions.countInSet(toks, ws)
    }
    val scoreCols = scores.map { case (l, c) => c.as(s"score_$l") }
    // The synthetic corpus never contains the es/de/fr stopwords, so the
    // non-English score columns would be identically zero — union four
    // deterministic probe sentences (one per profile) so every profile's
    // detection path is exercised and verifiable.
    val probes = ProbeSentences.toDF("doc_id", "lang", "text")
    val base = t(s, dir, "documents").select($"doc_id", $"lang", $"text")
      .unionByName(probes)
      .select(($"doc_id" +: $"lang".as("labeled_lang") +: scoreCols): _*)
    val best = LangProfiles.map(p => col(s"score_${p._1}")).reduce(greatest(_, _))
    // right fold => en-first precedence: en wins ties over es, etc.
    val predicted = LangProfiles.reverse.foldLeft(lit("und"): Column) {
      case (el, (l, _)) => when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(el)
    }
    base
      .select($"doc_id", $"labeled_lang",
        col("score_en"), col("score_es"), col("score_de"), col("score_fr"),
        predicted.as("predicted_lang"))
      .withColumn("matches_label", $"predicted_lang" === $"labeled_lang")
      .orderBy($"doc_id")
  }

  private val q25Sql = {
    def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
    val scoreExprs = LangProfiles.map { case (l, ws) =>
      s"len(list_filter(string_split(text, ' '), x -> x IN (${lst(ws)}))) AS score_$l"
    }.mkString(",\n    ")
    val probeValues = ProbeSentences.map { case (id, l, txt) =>
      s"($id, '$l', '$txt')"
    }.mkString(", ")
    s"""WITH corpus AS (
      |  SELECT doc_id, lang, text FROM documents
      |  UNION ALL
      |  SELECT * FROM (VALUES $probeValues) t(doc_id, lang, text)),
      |scored AS (
      |  SELECT doc_id, lang AS labeled_lang,
      |    $scoreExprs
      |  FROM corpus),
      |best AS (
      |  SELECT *, greatest(score_en, score_es, score_de, score_fr) AS best_score
      |  FROM scored)
      |SELECT doc_id, labeled_lang, score_en, score_es, score_de, score_fr,
      |  CASE WHEN best_score = 0 THEN 'und'
      |       WHEN score_en = best_score THEN 'en'
      |       WHEN score_es = best_score THEN 'es'
      |       WHEN score_de = best_score THEN 'de'
      |       ELSE 'fr' END AS predicted_lang,
      |  (CASE WHEN best_score = 0 THEN 'und'
      |       WHEN score_en = best_score THEN 'en'
      |       WHEN score_es = best_score THEN 'es'
      |       WHEN score_de = best_score THEN 'de'
      |       ELSE 'fr' END) = labeled_lang AS matches_label
      |FROM best
      |ORDER BY doc_id""".stripMargin
  }

  /** q26: document fingerprinting — md5 of whitespace-normalized
    * lowercased text (the canonical-form fingerprint used for
    * cross-corpus dedup joins), plus a short prefix fingerprint and a
    * length bucket for sharding.
    */
  def q26Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val normalized = trim(regexp_replace(lower($"text"), "\\s+", " "))
    t(s, dir, "documents")
      .select($"doc_id",
        md5(normalized).as("fingerprint"),
        substring(md5(normalized), 1, 8).as("short_fp"),
        floor(length($"text") / 100).cast("long").as("len_bucket"))
      .orderBy($"doc_id")
  }

  private val q26Sql =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
      |  substring(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8) AS short_fp,
      |  CAST(floor(length(text) / 100) AS BIGINT) AS len_bucket
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q43: intra-document repetition signals (the Gopher/C4-style
    * quality-filter family): shingle duplication ratio and the hottest
    * shingle's share of the document. High values flag boilerplate /
    * template text before training. Integer counting + fixed-order
    * division — engine-exact.
    */
  def q43Repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.NativeExpressions.repetitionStats
    // One-pass per-row multiset stats (no explode, no shuffle) — the
    // explode → double-groupBy formulation this replaced shuffled
    // |docs|·|shingles| rows twice; differential-tested in
    // NativeExpressionsSpec.
    t(s, dir, "documents")
      .select($"doc_id", repetitionStats(Dedup.shingles($"text")).as("r"))
      .filter($"r".isNotNull)
      .select($"doc_id", $"r.n_items".as("n_shingles"),
        $"r.n_distinct".as("n_distinct"),
        (lit(1.0) - $"r.n_distinct".cast("double") / $"r.n_items").as("dup_ratio"),
        ($"r.max_count".cast("double") / $"r.n_items").as("top_shingle_share"))
      .orderBy($"doc_id")
  }

  private val q43Sql =
    """WITH exploded AS (
      |  SELECT doc_id, len(t) - 2 AS n_shingles,
      |    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |  WHERE len(t) >= 3),
      |per_shingle AS (
      |  SELECT doc_id, n_shingles, sh, count(*) AS c
      |  FROM exploded GROUP BY doc_id, n_shingles, sh)
      |SELECT doc_id, n_shingles, count(*) AS n_distinct,
      |  1.0 - CAST(count(*) AS DOUBLE) / n_shingles AS dup_ratio,
      |  CAST(max(c) AS DOUBLE) / n_shingles AS top_shingle_share
      |FROM per_shingle
      |GROUP BY doc_id, n_shingles
      |ORDER BY doc_id""".stripMargin

  /** q48: composite keep/reject filter — the C4/Gopher-style rule chain a
    * curation pipeline actually ships: every rule is named, every
    * rejection carries its reasons (comma-joined in fixed rule order, so
    * the audit trail is deterministic), and `keep` is simply "no reasons".
    * All rules are integer counts and single-divide ratios over one scan
    * projection — scan-speed, no shuffle, engine-identical doubles.
    */
  def q48QualityFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    val nTokens = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val nStop = graft.functions.NativeExpressions.countInSet(toks, Stopwords)
    val nChars = length($"text").cast("long")
    val nSym = length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("long")
    val rules: Seq[(String, Column)] = Seq(
      "too_short" -> (nTokens < 20),
      "too_long" -> (nTokens > 10000),
      "low_diversity" -> (nUniq.cast("double") / nTokens < 0.3),
      "stopword_sparse" -> (nStop < 2),
      "symbol_heavy" -> (nSym.cast("double") / nChars > 0.1))
    val reasons = concat_ws(",", rules.map { case (n, c) =>
      when(c, lit(n)) }: _*) // concat_ws drops the NULLs of passing rules
    t(s, dir, "documents")
      .select($"doc_id", nTokens.as("n_tokens"), reasons.as("reasons"))
      .withColumn("keep", $"reasons" === "")
      .orderBy($"doc_id")
  }

  private val q48Sql = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_unique,
      |    len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) AS n_stop,
      |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_sym
      |  FROM documents),
      |flagged AS (
      |  SELECT doc_id, n_tokens,
      |    concat_ws(',',
      |      CASE WHEN n_tokens < 20 THEN 'too_short' END,
      |      CASE WHEN n_tokens > 10000 THEN 'too_long' END,
      |      CASE WHEN CAST(n_unique AS DOUBLE) / n_tokens < 0.3 THEN 'low_diversity' END,
      |      CASE WHEN n_stop < 2 THEN 'stopword_sparse' END,
      |      CASE WHEN CAST(n_sym AS DOUBLE) / n_chars > 0.1 THEN 'symbol_heavy' END) AS reasons
      |  FROM base)
      |SELECT doc_id, n_tokens, reasons, (reasons = '') AS keep
      |FROM flagged
      |ORDER BY doc_id""".stripMargin
  }

  val ShardTokenBudget = 2048L

  /** q51: shard packing — assign documents to fixed-token-budget training
    * shards. Greedy running-sum packing WITHIN each train/val/test split
    * (the q50 hash assignment): shard index = the 2048-token bucket the
    * document's cumulative start offset falls in. Partitioned by split so
    * the window never needs a global sort — at corpus scale the
    * partitioning key would also carry a hash prefix (split, doc_id mod
    * N) so each packer sees a bounded slice; the within-slice plan is
    * identical. Deterministic: ordering is (doc_id), arithmetic is
    * integer.
    */
  def q51ShardPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = substring(md5($"doc_id".cast("string")), 1, 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"split").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"),
        when(h <= "b", "train").when(h <= "d", "val").otherwise("test").as("split"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .select($"doc_id", $"split", $"n_tokens", $"cum_tokens",
        // integer DIV, not double /: exact at any cumulative size (the
        // double path rounds past 2^53 tokens)
        expr(s"(cum_tokens - n_tokens) DIV $ShardTokenBudget").as("shard_idx"))
      .orderBy($"doc_id")
  }

  private val q51Sql =
    s"""WITH assigned AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
      |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, split, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM assigned)
      |SELECT doc_id, split, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  CAST((cum_tokens - n_tokens) // $ShardTokenBudget AS BIGINT) AS shard_idx
      |FROM packed
      |ORDER BY doc_id""".stripMargin

  /** q58: benchmark decontamination — the flag-before-train pass every
    * serious pretraining pipeline runs (the GPT-3/WMT n-gram overlap
    * check): a training candidate is contaminated when it shares word
    * n-grams with the held-out benchmark set. Benchmark = the docs with
    * doc_id % 50 == 7 (deterministic stand-in for an eval suite);
    * n_shared counts the candidate's DISTINCT trigrams that appear
    * anywhere in the benchmark; is_contaminated applies a ≥3 threshold
    * separating true near-dup leakage (n_shared up to ~40 here) from
    * incidental single-trigram collisions (median 1). Plan shape for
    * 100 TB: the benchmark gram set is eval-suite-sized → broadcast; the
    * corpus side is one scan-local explode + broadcast semi-join +
    * groupBy(doc) — no corpus-vs-corpus shuffle at all.
    */
  def q58Decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables.loadSpread(s, dir, "documents")
      .select($"doc_id",
        explode(array_distinct(Dedup.shingles($"text", 3))).as("g"))
    val bench = grams.filter($"doc_id" % 50 === 7).select($"g").distinct()
    val hits = grams.filter($"doc_id" % 50 =!= 7)
      .join(broadcast(bench), "g")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    t(s, dir, "documents").filter($"doc_id" % 50 =!= 7).select($"doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_shared", lit(0L)).as("n_shared"),
        (coalesce($"n_shared", lit(0L)) >= 3).as("is_contaminated"))
      .orderBy($"doc_id")
  }

  private val q58Sql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g3 AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      |  FROM toks WHERE len(t) >= 3),
      |bench AS (SELECT DISTINCT g FROM g3 WHERE doc_id % 50 = 7),
      |hits AS (
      |  SELECT doc_id, count(*) AS n_shared
      |  FROM g3 JOIN bench USING (g)
      |  WHERE doc_id % 50 <> 7
      |  GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(h.n_shared, 0) AS n_shared,
      |  COALESCE(h.n_shared, 0) >= 3 AS is_contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 7) d
      |LEFT JOIN hits h USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** q59: deterministic mixture resampling — hit a target language
    * mixture (uniform here) by Bernoulli-downsampling each
    * over-represented class with a hash-derived keep decision:
    * keep_rate(lang) = min_class_count / count(lang), and a doc is kept
    * iff its md5 prefix, read as a uniform in [0,1), falls under the
    * rate. No RNG — membership is recomputable from the id alone, stable
    * across reruns and backfills (the q50 property, applied to mixture
    * weighting). The comparison stays in HEX-STRING space (8-char
    * lowercase prefixes compare lexicographically == numerically) so no
    * engine parses hex; the rate-1.0 class short-circuits to kept
    * (a 2^32 threshold would print 9 hex chars and break the compare).
    * Plan: one tiny class-count agg broadcast back over a scan-local
    * filter — the only shuffle is the 5-row aggregation.
    */
  def q59MixtureSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"lang")
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("cnt"))
    // global min via an unpartitioned window over the class-count table —
    // it has one row PER CLASS (a handful), so the single-partition
    // window is free and the plan stays join-free
    val rates = counts
      .withColumn("min_cnt", min($"cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select($"lang",
        ($"min_cnt".cast("double") / $"cnt").as("keep_rate"),
        ($"cnt" === $"min_cnt").as("keep_all"))
    val thresh = format_string("%08x",
      floor($"keep_rate" * lit(4294967296.0)).cast("bigint"))
    docs.join(broadcast(rates), "lang")
      .select($"doc_id", $"lang", round($"keep_rate", 6).as("keep_rate"),
        when($"keep_all", lit(true))
          .otherwise(substring(md5($"doc_id".cast("string")), 1, 8) < thresh)
          .as("kept"))
      .orderBy($"doc_id")
  }

  private val q59Sql =
    """WITH counts AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
      |mn AS (SELECT min(cnt) AS min_cnt FROM counts),
      |rates AS (
      |  SELECT lang, CAST(min_cnt AS DOUBLE) / cnt AS keep_rate,
      |    cnt = min_cnt AS keep_all
      |  FROM counts CROSS JOIN mn)
      |SELECT d.doc_id, d.lang, round(r.keep_rate, 6) AS keep_rate,
      |  CASE WHEN r.keep_all THEN TRUE
      |       ELSE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
      |         printf('%08x', CAST(floor(r.keep_rate * 4294967296.0) AS BIGINT))
      |  END AS kept
      |FROM documents d JOIN rates r USING (lang)
      |ORDER BY d.doc_id""".stripMargin

  /** q61: per-class vocabulary statistics — the corpus pass a tokenizer
    * build (BPE seeding, vocab pruning) runs first: collection frequency
    * (total occurrences) and document frequency per (lang, token), top-10
    * tokens per lang by cf with a total tiebreak (cf desc, df desc, token
    * asc — token is unique within the group, so the cut is
    * engine-independent). Plan: one explode + one shuffle on
    * (lang, token) with partial aggregation doing the heavy combining
    * map-side — at 100 TB the shuffled volume is the VOCABULARY (bounded),
    * not the token stream; the top-k window runs per lang on the
    * already-aggregated table.
    */
  def q61VocabStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy($"cf".desc, $"df".desc, $"token".asc)
    Tables.loadSpread(s, dir, "documents")
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("token"))
      .groupBy($"lang", $"token")
      .agg(count(lit(1)).as("cf"), countDistinct($"doc_id").as("df"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .orderBy($"lang", $"rank")
  }

  private val q61Sql =
    """SELECT lang, token, cf, df, rank
      |FROM (
      |  SELECT lang, token, cf, df,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY cf DESC, df DESC, token ASC) AS rank
      |  FROM (
      |    SELECT lang, token, count(*) AS cf, count(DISTINCT doc_id) AS df
      |    FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |          FROM documents)
      |    GROUP BY lang, token))
      |WHERE rank <= 10
      |ORDER BY lang, rank""".stripMargin

  val ShardSlices = 8

  /** q62: shard packing at corpus scale — the hash-prefix sub-partitioned
    * variant q51's Scaladoc promises: the packing window is partitioned by
    * (split, slice = doc_id % [[ShardSlices]]), so each packer sees a
    * bounded slice regardless of corpus size (q51's per-split window
    * funnels a whole split through ONE task — fine at test scale, a
    * straggler at 100 TB). The cost: shard identity becomes
    * (split, slice, idx) — shards never span slices, so up to one
    * partially-filled shard per slice instead of one per split; the
    * trade every distributed packer makes. Same deterministic
    * arithmetic, window parallelism now scales with ShardSlices.
    */
  def q62ShardPackSliced(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = substring(md5($"doc_id".cast("string")), 1, 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"split", $"slice").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"),
        when(h <= "b", "train").when(h <= "d", "val").otherwise("test").as("split"),
        // % (Remainder), not pmod: matches the oracle's % (and the doc'd
        // formula) on any sign of doc_id
        ($"doc_id" % ShardSlices).as("slice"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .select($"doc_id", $"split", $"slice", $"n_tokens",
        // integer DIV, not double /: exact at any cumulative size (the
        // double path rounds past 2^53 tokens)
        expr(s"(cum_tokens - n_tokens) DIV $ShardTokenBudget").as("shard_idx"))
      .orderBy($"doc_id")
  }

  private val q62Sql =
    s"""WITH assigned AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
      |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
      |         ELSE 'test' END AS split,
      |    doc_id % $ShardSlices AS slice
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, split, slice, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY split, slice ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM assigned)
      |SELECT doc_id, split, CAST(slice AS BIGINT) AS slice,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST((cum_tokens - n_tokens) // $ShardTokenBudget AS BIGINT) AS shard_idx
      |FROM packed
      |ORDER BY doc_id""".stripMargin

  /** q64: TF-IDF keyword extraction — top-3 terms per document by
    * tf·idf, the relevance primitive behind search indexing, topic
    * labeling, and keyword-based quality filters. tf = term count /
    * document length; idf = ln(N / df) over the corpus. The score is
    * ROUNDED to 6 digits BEFORE ranking (libm ln is not guaranteed
    * bit-identical across engines; ranking on the rounded value with a
    * token tiebreak makes the top-3 cut engine-independent — the same
    * discipline as the cosine rounding in q21/q22). Plan: one explode →
    * (doc, token) count; df and doc length derive from it (token-keyed
    * agg broadcasts — vocabulary-sized); one window per doc.
    */
  def q64TfIdf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.loadSpread(s, dir, "documents")
    val nDocs = lit(docs.count())
    val counts = docs
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
      .persist()
    val docLen = counts.groupBy($"doc_id").agg(sum($"cnt").as("n_tokens"))
    val df = counts.groupBy($"token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
      .orderBy($"tfidf".desc, $"token".asc)
    counts
      .join(docLen, "doc_id")
      .join(broadcast(df), "token")
      .select($"doc_id", $"token",
        round(($"cnt".cast("double") / $"n_tokens") *
          log(nDocs.cast("double") / $"df"), 6).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .orderBy($"doc_id", $"rank")
  }

  private val q64Sql =
    """WITH counts AS (
      |  SELECT doc_id, token, count(*) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY doc_id, token),
      |doclen AS (SELECT doc_id, sum(cnt) AS n_tokens FROM counts GROUP BY doc_id),
      |df AS (SELECT token, count(*) AS df FROM counts GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT c.doc_id, c.token,
      |    round((CAST(cnt AS DOUBLE) / n_tokens) * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf
      |  FROM counts c
      |  JOIN doclen USING (doc_id)
      |  JOIN df USING (token)
      |  CROSS JOIN n)
      |SELECT doc_id, token, tfidf, rank
      |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY tfidf DESC, token ASC) AS rank
      |      FROM scored)
      |WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** q65: per-source document cap — the domain-cap curation operator (no
    * crawl source may contribute more than K documents): rank each
    * source's docs by md5(doc_id) — a deterministic uniform draw, unique
    * because doc_id is — and keep the first 10. Exact-K per class
    * (complementing q59's rate-based Bernoulli, which targets a mixture
    * but not a hard cap). One window per source; at corpus scale the
    * rank can early-stop via a per-partition top-K before the shuffle.
    */
  def q65SourceCap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      .orderBy($"h".asc)
    t(s, dir, "documents")
      .select($"doc_id", $"source", md5($"doc_id".cast("string")).as("h"))
      .withColumn("sample_rank", row_number().over(w))
      .filter($"sample_rank" <= 10)
      .select($"doc_id", $"source", $"sample_rank")
      .orderBy($"doc_id")
  }

  private val q65Sql =
    """SELECT doc_id, source, sample_rank
      |FROM (SELECT doc_id, source,
      |        row_number() OVER (PARTITION BY source
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC) AS sample_rank
      |      FROM documents)
      |WHERE sample_rank <= 10
      |ORDER BY doc_id""".stripMargin

  /** q70: heavy hitters via a Misra-Gries summary, validated against the
    * exact counts. q61's vocabulary pass shuffles the full key domain —
    * the right plan while the vocabulary is bounded, and a dead end when
    * the key domain grows with the corpus (URLs, n-grams, user ids). The
    * MG branch is the corpus-scale shape: k=127 counters per task over
    * the RAW token stream, partial summaries merged associatively, so
    * the shuffle carries 32×127 counters regardless of domain size.
    *
    * The guarantee (est >= true - n/(k+1), see [[SketchAggregates]])
    * makes the sketch oracle-checkable on this data: every (lang, token)
    * key above 1% of the stream — the 30 common English tokens; English
    * is ~43% of documents, so its tokens sit at 1.1-1.6% while every
    * other language's sit below 0.7% — MUST survive the summary
    * (1% > n/(k+1) = 0.78%). The query emits the exact heavy-hitter list
    * semi-joined against the MG candidate set: if MG ever dropped a
    * guaranteed key, rows go missing and the driver's DuckDB compare
    * (which computes the exact list only) fails. The 155-key domain vs
    * 127 counters keeps the eviction path genuinely exercised.
    */
  def q70HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def stream = Tables.loadSpread(s, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("tok"))
    val mgKeys = stream
      .agg(graft.functions.SketchAggregates
        .misraGries(concat_ws("|", $"lang", $"tok"), 127).as("hh"))
      .select(explode($"hh").as("e")).select($"e.key".as("mk"))
    // exact branch: the validation baseline the sketch is judged against
    // (a second scan — at corpus scale only the MG branch would run)
    val n = org.apache.spark.sql.expressions.Window.partitionBy()
    stream.groupBy($"lang", $"tok").agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum($"cnt").over(n))
      .filter($"cnt" * 100 > $"n")
      .join(mgKeys, concat_ws("|", $"lang", $"tok") === $"mk", "left_semi")
      .select($"lang", $"tok", $"cnt")
      .orderBy($"lang", $"tok")
  }

  private val q70Sql =
    """WITH u AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |c AS (SELECT lang, tok, count(*) AS cnt FROM u GROUP BY lang, tok)
      |SELECT lang, tok, cnt FROM c
      |WHERE cnt * 100 > (SELECT CAST(sum(cnt) AS BIGINT) FROM c)
      |ORDER BY lang, tok""".stripMargin

  /** q78: token-budget mixture trimming — the down-weighting half of
    * data mixing (q59 is the rate half): the over-represented language
    * is cut to a token BUDGET, not a row rate, because training mixtures
    * are specified in tokens. Docs are md5-ranked within language (the
    * deterministic "random" order every sampling op here uses) and kept
    * greedily while the running token total stays within budget (strict:
    * a doc that would cross the line is dropped, as are all after it —
    * the md5 order makes that cut unbiased). English gets 8,000 tokens
    * (always trims on this corpus); the rest get 50,000 (always keep) —
    * both branches live at every SF. Every doc is emitted with its keep
    * decision for auditability. Plan: one shuffle on lang + one running
    * window per lang — the q51 packing shape; at corpus scale the same
    * hash-sliced sub-partitioning as q62 bounds the window state.
    */
  def q78TokenBudgetTrim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.loadSpread(s, dir, "documents")
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .withColumn("budget",
        when($"lang" === "en", 8000L).otherwise(50000L))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("kept", $"cum_tokens" <= $"budget")
      .select($"doc_id", $"lang", $"n_tokens", $"cum_tokens", $"kept")
      .orderBy($"doc_id")
  }

  private val q78Sql =
    """SELECT doc_id, lang, n_tokens, cum_tokens, cum_tokens <= budget AS kept
      |FROM (
      |  SELECT doc_id, lang, n_tokens,
      |    CASE WHEN lang = 'en' THEN 8000 ELSE 50000 END AS budget,
      |    CAST(sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tokens
      |  FROM (SELECT doc_id, lang,
      |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** q84: Zipf profile of the per-language token distribution — the
    * corpus-health diagnostic (natural language follows freq ∝ 1/rank;
    * a slope far from that flags template spam, truncation, or broken
    * tokenization). Per language: rank tokens by collection frequency,
    * fit ln(cf) against ln(rank) over the top 30 ranks by least
    * squares. Determinism discipline: both axes are ROUNDED to 6 digits
    * (ln is libm), all four regression sums run as DECIMAL (exact,
    * order-independent), and only the final slope division happens in
    * double (one correctly-rounded op) — so no engine-ordering effect
    * can move the result. Plan: the q61 vocabulary shuffle (bounded by
    * the vocab) + one tiny per-language aggregate; at corpus scale the
    * cf counts come from the same pass q61 already runs.
    */
  def q84ZipfProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy($"cf".desc, $"tok".asc)
    val ranked = Tables.loadSpread(s, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("cf"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 30)
      .select($"lang",
        round(log($"rank".cast("double")), 6).cast("decimal(9,6)").as("x"),
        round(log($"cf".cast("double")), 6).cast("decimal(9,6)").as("y"))
    ranked.groupBy($"lang")
      .agg(count(lit(1)).cast("decimal(4,0)").as("n"),
        sum($"x").cast("decimal(16,6)").as("sx"),
        sum($"y").cast("decimal(16,6)").as("sy"),
        sum(($"x" * $"y").cast("decimal(20,12)")).cast("decimal(24,12)").as("sxy"),
        sum(($"x" * $"x").cast("decimal(20,12)")).cast("decimal(24,12)").as("sxx"))
      .select($"lang", $"n".cast("long").as("n_terms"),
        round(
          ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
            ($"n" * $"sxx" - $"sx" * $"sx").cast("double"), 6).as("zipf_slope"))
      .orderBy($"lang")
  }

  private val q84Sql =
    """WITH c AS (
      |  SELECT lang, tok, count(*) AS cf
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY lang, tok),
      |r AS (
      |  SELECT lang,
      |    CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(9,6)) AS x,
      |    CAST(round(ln(CAST(cf AS DOUBLE)), 6) AS DECIMAL(9,6)) AS y
      |  FROM (SELECT *, row_number() OVER (PARTITION BY lang
      |          ORDER BY cf DESC, tok ASC) AS rank
      |        FROM c)
      |  WHERE rank <= 30),
      |a AS (
      |  SELECT lang, CAST(count(*) AS DECIMAL(4,0)) AS n,
      |    CAST(sum(x) AS DECIMAL(16,6)) AS sx,
      |    CAST(sum(y) AS DECIMAL(16,6)) AS sy,
      |    CAST(sum(CAST(x * y AS DECIMAL(20,12))) AS DECIMAL(24,12)) AS sxy,
      |    CAST(sum(CAST(x * x AS DECIMAL(20,12))) AS DECIMAL(24,12)) AS sxx
      |  FROM r GROUP BY lang)
      |SELECT lang, CAST(n AS BIGINT) AS n_terms,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |        CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
      |FROM a
      |ORDER BY lang""".stripMargin

  /** q88: bigram language-model scoring (CCNet-style perplexity
    * filtering): train an add-one-smoothed bigram LM on the corpus
    * itself, score every document by its mean negative log-likelihood
    * per bigram, and flag the worst decile — the classic
    * "perplexity against an in-domain LM" quality gate. The LM is two
    * broadcast-sized count tables (the vocabulary is bounded even when
    * the corpus is not — exactly why this scales to 100 TB: the n·tokens
    * scoring pass joins against broadcast counts, no shuffle of the
    * corpus itself beyond the per-doc agg). Bigrams are built in-array
    * with zip_with (one pass, codegen) before the explode. The mean NLL
    * is rounded to 6 digits before the decile cut so cross-engine
    * float-sum drift (~1e-13 on a ~1-5 nat value) cannot flip ordering.
    * The worst-decile flag is per-DOCUMENT — data-scaled — so it must
    * NOT come from a global ntile window (single-partition sort of the
    * corpus): ntile(10)'s first tile is exactly the first ceil(n/10)
    * rows of (nll DESC, doc_id ASC), so the flag is `sort key <=
    * boundary key` against the ceil(n/10)-th row — found by a bounded
    * top-k (TakeOrdered keeps a ceil(n/10)-row heap per task, never a
    * global sort) whose 1-row boundary broadcasts. (doc_id is unique,
    * so the boundary key is unambiguous; the oracle still says
    * `ntile(10) = 1`.)
    */
  def q88BigramLm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents").select($"doc_id", split($"text", " ").as("t"))
    val uni = toks.select(explode($"t").as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // NOT persisted although bg feeds both the count table and the
    // scoring join: measured 2.4–2.8 s with a cache vs 1.7–1.8 s
    // without at sf0.1 — the codegen'd split+zip_with+explode replay is
    // cheaper than materializing 400k cached rows (row-format
    // conversion + memory store) and breaking the whole-stage pipeline
    val bg = toks.select($"doc_id",
        explode(zip_with(
          slice($"t", lit(1), size($"t") - 1),
          slice($"t", lit(2), size($"t") - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
    val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val scored = bg
      .join(broadcast(c2), Seq("w1", "w2"))
      .join(broadcast(uni), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(($"c2" + 1).cast("double") / ($"c1" + $"v"))), 6)
          .as("nll_per_bigram"))
      // persisted so the count, the top-k boundary pass and the final
      // flagging pass all read the 1-row-per-doc result, not the LM
      // join pipeline three times
      .persist()
    // ntile(10)'s first tile is always ceil(n/10) rows (n = 10q+r: the
    // first r tiles get q+1), so decile==1  <=>  rank <= ceil(n/10)
    val tile1 = ((scored.count() + 9) / 10).toInt
    // ascending sort key equivalent to (nll DESC, doc_id ASC)
    def key(nll: Column, id: Column): Column =
      struct((-nll).as("k1"), id.as("k2"))
    val bound = scored
      .orderBy($"nll_per_bigram".desc, $"doc_id".asc).limit(tile1)
      .agg(max(key($"nll_per_bigram", $"doc_id")).as("b"))
    scored.crossJoin(broadcast(bound))
      .select($"doc_id", $"n_bigrams", $"nll_per_bigram",
        (key($"nll_per_bigram", $"doc_id") <= $"b").as("flag_high_ppl"))
      .orderBy($"doc_id")
  }

  private val q88Sql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
      |        FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY 1),
      |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
      |bgs AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
      |  FROM toks),
      |bg AS (SELECT doc_id, struct_extract(b, 'w1') AS w1,
      |         struct_extract(b, 'w2') AS w2 FROM bgs),
      |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      |       FROM bg GROUP BY 1, 2),
      |scored AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    round(avg(-ln((c2.c2 + 1) / CAST(uni.c1 + v.v AS DOUBLE))), 6)
      |      AS nll_per_bigram
      |  FROM bg JOIN c2 USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
      |  GROUP BY doc_id)
      |SELECT doc_id, n_bigrams, nll_per_bigram,
      |  ntile(10) OVER (ORDER BY nll_per_bigram DESC, doc_id ASC) = 1
      |    AS flag_high_ppl
      |FROM scored
      |ORDER BY doc_id""".stripMargin

  /** Hashed-feature bucket count for DSIR (q162) — the knob that keeps
    * the importance model a BROADCASTABLE table (B rows) at any corpus
    * size, the whole point of the hashed-n-gram construction.
    */
  val DsirBuckets = 256

  /** q162: DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling" — the
    * reference pipeline's curation layer has no selection step, this is
    * the standard one a pretraining corpus adds). Mechanics, all
    * engine-deterministic:
    *
    *  1. hashed n-gram features: every unigram + bigram md5-hashes into
    *     one of [[DsirBuckets]] buckets, so BOTH distribution models are
    *     fixed-width count vectors no matter the corpus size;
    *  2. target distribution = the `lang = 'en'` slice (stand-in for
    *     "high-quality domain"), raw distribution = the whole corpus;
    *     add-one smoothing over the B buckets; per-bucket log-likelihood
    *     ratio rounded to 6 digits and REDUCED TO DECIMAL (the q84
    *     idiom) so per-doc sums are exact integer-decimal arithmetic,
    *     not float-order-dependent;
    *  3. per-doc importance log-weight = Σ_b n_b·lr_b (exact decimal);
    *  4. Gumbel-top-⌈n/5⌉ resampling: key = logw + round(Gumbel(u),6)
    *     with u an md5-derived uniform (the q151 inverse-CDF idiom) —
    *     EXACTLY sampling-without-replacement ∝ w, yet reproducible.
    *
    * Scale shape: two scan-shaped gram passes (count + per-doc), a
    * B-row broadcast for the ratio table, and the keep cut via the q88
    * bounded-heap TakeOrdered boundary — no global sort, no window over
    * an unpartitioned frame. At 100 TB the only growing state is the
    * per-doc score table.
    */
  /** q162's gram pass: per-(doc, bucket) hashed-feature counts for an
    * explicit (doc_id, lang, text) source — shared with the incremental
    * arm (q293), which featurizes ONLY the delta batch through it.
    */
  def dsirDocBuckets(docs: DataFrame): DataFrame = {
    val b = lit(DsirBuckets)
    val toks = docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
    toks.select(col("doc_id"), col("lang"),
        explode(concat(col("t"),
          zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
            slice(col("t"), lit(2), size(col("t")) - 1),
            (x, y) => concat(x, lit("_"), y)))).as("g"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % b).as("bkt"))
      .groupBy(col("doc_id"), col("lang"), col("bkt"))
      .agg(count(lit(1)).as("nb"))
  }

  /** q162's importance model: the ≤[[DsirBuckets]]-row log-likelihood-
    * ratio table from a per-(doc, bucket) count table.
    */
  def dsirModel(db: DataFrame): DataFrame = {
    val b = lit(DsirBuckets)
    val raw = db.groupBy(col("bkt")).agg(sum(col("nb")).as("cr"))
    val tgt = db.filter(col("lang") === "en")
      .groupBy(col("bkt")).agg(sum(col("nb")).as("ct"))
    val tot = db.agg(
      sum(col("nb")).as("tr"),
      sum(when(col("lang") === "en", col("nb")).otherwise(0L)).as("tt"))
    raw.join(tgt, Seq("bkt"), "left").crossJoin(tot)
      .select(col("bkt"),
        round(log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("tt") + b)) -
              log((col("cr") + 1).cast("double") / (col("tr") + b)), 6)
          .cast("decimal(12,6)").as("lr"))
  }

  /** q162's scoring stage: per-doc exact-decimal log-weight + Gumbel
    * key against a (frozen or fresh) broadcast model.
    */
  def dsirScore(db: DataFrame, lr: DataFrame): DataFrame =
    db.join(broadcast(lr), Seq("bkt"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("nb")).as("n_grams"), sum(col("nb") * col("lr")).as("lw"))
      .select(col("doc_id"), col("lang"), col("n_grams"),
        col("lw").cast("decimal(30,6)").as("lw"),
        // Gumbel(u) = -ln(-ln(u)), u ∈ (0,1) md5-seeded per doc
        (col("lw").cast("decimal(30,6)") +
          round(-log(-log((conv(substring(md5(concat(lit("dsir:"),
              col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) /
            4294967296.0)), 6).cast("decimal(12,6)")).as("k"))

  /** The Gumbel-top-⌈n/5⌉ cut over a scored table: TakeOrdered boundary
    * broadcast back as a literal comparison — no global sort.
    */
  def dsirKeepCut(s: SparkSession, scored: DataFrame): DataFrame = {
    import s.implicits._
    val keepN = ((scored.count() + 4) / 5).toInt // ⌈n/5⌉, the DSIR budget
    def key(k: Column, id: Column): Column = struct((-k).as("k1"), id.as("k2"))
    val bound = scored.orderBy($"k".desc, $"doc_id".asc).limit(keepN)
      .agg(max(key($"k", $"doc_id")).as("b"))
    scored.crossJoin(broadcast(bound))
      .select($"doc_id", $"lang", $"n_grams",
        $"lw".cast("double").as("logw"),
        (key($"k", $"doc_id") <= $"b").as("keep"))
  }

  def q162DsirResample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // per-(doc, bucket) counts feed BOTH the global models and the
    // per-doc scoring join — one aggregation, reused
    val db = dsirDocBuckets(
      t(s, dir, "documents").select($"doc_id", $"lang", $"text")).persist()
    val scored = dsirScore(db, dsirModel(db)).persist()
    val out = dsirKeepCut(s, scored).orderBy($"doc_id")
    db.unpersist(false)
    out
  }

  /** Training-sequence length (tokens) for the q297 packing audit —
    * the GPT-style fixed context window documents are concatenated
    * into.
    */
  val PackSeqLen = 2048L

  /** q297: SEQUENCE-PACKING AUDIT — the LAST step of a training-data
    * pipeline: documents are concatenated in a deterministic order
    * (doc_id) into one token stream and CHUNKED into fixed
    * [[PackSeqLen]]-token sequences (boundary straddling allowed —
    * exactly how GPT-style pretraining packs; no bin-packing
    * heuristic, no padding except the final tail). The audit emits
    * each document's token interval mapped to its first/last sequence
    * and whether it straddles a boundary — the map a dataloader needs
    * to attribute a training example back to its documents. The
    * global running token count uses the [[GlobalRank]] range-
    * partitioned prefix device, NEVER an empty-partitionSpec window —
    * the plan stays parallel at any corpus size (P-row offset table,
    * P = shuffle partitions).
    */
  def q297SequencePacking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tk = t(s, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
    GlobalRank.withGlobalPrefixSums(tk, Seq("n_tokens" -> "cum"), $"doc_id")
      .select($"doc_id", $"n_tokens",
        floor(($"cum" - $"n_tokens") / PackSeqLen).cast("long").as("seq_first"),
        floor(($"cum" - 1) / PackSeqLen).cast("long").as("seq_last"))
      .withColumn("straddles", $"seq_last" > $"seq_first")
      .orderBy($"doc_id")
  }

  private val q297Sql =
    s"""WITH tk AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    sum(n_tokens) OVER (ORDER BY doc_id) AS cum
      |  FROM tk)
      |SELECT doc_id, n_tokens,
      |  CAST((cum - n_tokens) // $PackSeqLen AS BIGINT) AS seq_first,
      |  CAST((cum - 1) // $PackSeqLen AS BIGINT) AS seq_last,
      |  (cum - 1) // $PackSeqLen > (cum - n_tokens) // $PackSeqLen AS straddles
      |FROM c
      |ORDER BY doc_id""".stripMargin

  /** q293: INCREMENTAL DSIR — q292's O(delta) cadence applied to
    * importance resampling (the "SemDeDup/DSIR" pair the round-9
    * verdict asked for): the hashed-n-gram importance model FREEZES on
    * the base corpus (doc_id % 10 ≠ 7 — the q161/q292 split), exactly
    * the production posture (Xie et al. train the model once on fixed
    * target/raw samples; batches are scored, never re-modeled). An
    * appended batch then costs
    *
    *   1. one O(|delta|) featurize+score pass against the ≤256-row
    *      frozen broadcast model — per-doc scores are independent
    *      given the model, so delta scores ≡ their full-recompute
    *      values by construction;
    *   2. the global Gumbel-top-⌈n/5⌉ budget re-cut over the UNION of
    *      the materialized base score table and the fresh delta scores
    *      — an O(n) read of a 5-column score table + a bounded-heap
    *      boundary, never a base re-featurization (the gram pass is
    *      ~30× the bytes of the score table).
    *
    * THE ORACLE RUNS THE FULL RECOMPUTE (model on base, every doc
    * featurized and scored from scratch, one global cut); hash
    * equality proves incremental scoring + budget re-cut ≡ full — the
    * q292 contract shape for the selection family's other member.
    */
  def q293IncrementalDsir(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id", $"lang", $"text")
    val dbBase = dsirDocBuckets(docs.filter($"doc_id" % 10 =!= 7)).persist()
    val lrFrozen = dsirModel(dbBase)
    // production: baseScored is a materialized table; here both arms
    // run in one gate query, so the base arm scores from its own pass
    val baseScored = dsirScore(dbBase, lrFrozen)
    val deltaScored = dsirScore(
      dsirDocBuckets(docs.filter($"doc_id" % 10 === 7)), lrFrozen)
    val out = dsirKeepCut(s, baseScored.unionByName(deltaScored).persist())
      .select($"doc_id",
        when($"doc_id" % 10 === 7, lit("delta")).otherwise(lit("base")).as("src"),
        $"lang", $"n_grams", $"logw", $"keep")
      .orderBy($"doc_id")
    dbBase.unpersist(false)
    out
  }

  private val q293Sql =
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, lang, unnest(list_concat(t,
      |    list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1]))) AS g
      |  FROM toks),
      |hb AS (SELECT doc_id, lang,
      |         ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS bkt
      |       FROM grams),
      |db AS (SELECT doc_id, lang, bkt, CAST(count(*) AS BIGINT) AS nb
      |       FROM hb GROUP BY 1, 2, 3),
      |dbb AS (SELECT * FROM db WHERE doc_id % 10 <> 7),
      |raw AS (SELECT bkt, CAST(sum(nb) AS BIGINT) AS cr FROM dbb GROUP BY 1),
      |tgt AS (SELECT bkt, CAST(sum(nb) AS BIGINT) AS ct
      |        FROM dbb WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS tr,
      |          CAST(sum(nb) FILTER (WHERE lang = 'en') AS BIGINT) AS tt
      |        FROM dbb),
      |lr AS (
      |  SELECT raw.bkt,
      |    CAST(round(ln((COALESCE(ct, 0) + 1) / CAST(tt + $DsirBuckets AS DOUBLE)) -
      |               ln((cr + 1) / CAST(tr + $DsirBuckets AS DOUBLE)), 6)
      |      AS DECIMAL(12,6)) AS lr
      |  FROM raw LEFT JOIN tgt USING (bkt) CROSS JOIN tot),
      |scored AS (
      |  SELECT doc_id, lang, CAST(sum(nb) AS BIGINT) AS n_grams,
      |    CAST(sum(nb * lr) AS DECIMAL(30,6)) AS lw
      |  FROM db JOIN lr USING (bkt) GROUP BY 1, 2),
      |keyed AS (
      |  SELECT *, lw + CAST(round(-ln(-ln(
      |      (('0x' || substr(md5('dsir:' || doc_id), 1, 8))::BIGINT + 0.5e0)
      |        / 4294967296e0)), 6) AS DECIMAL(12,6)) AS k
      |  FROM scored),
      |n AS (SELECT CAST(ceil(count(*) / 5.0e0) AS BIGINT) AS keep_n FROM keyed)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 10 = 7 THEN 'delta' ELSE 'base' END AS src,
      |  lang, n_grams, CAST(lw AS DOUBLE) AS logw,
      |  row_number() OVER (ORDER BY k DESC, doc_id ASC) <= keep_n AS keep
      |FROM keyed CROSS JOIN n
      |ORDER BY doc_id""".stripMargin

  private val q162Sql =
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, lang, unnest(list_concat(t,
      |    list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1]))) AS g
      |  FROM toks),
      |hb AS (SELECT doc_id, lang,
      |         ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS bkt
      |       FROM grams),
      |db AS (SELECT doc_id, lang, bkt, CAST(count(*) AS BIGINT) AS nb
      |       FROM hb GROUP BY 1, 2, 3),
      |raw AS (SELECT bkt, CAST(sum(nb) AS BIGINT) AS cr FROM db GROUP BY 1),
      |tgt AS (SELECT bkt, CAST(sum(nb) AS BIGINT) AS ct
      |        FROM db WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS tr,
      |          CAST(sum(nb) FILTER (WHERE lang = 'en') AS BIGINT) AS tt
      |        FROM db),
      |lr AS (
      |  SELECT raw.bkt,
      |    CAST(round(ln((COALESCE(ct, 0) + 1) / CAST(tt + $DsirBuckets AS DOUBLE)) -
      |               ln((cr + 1) / CAST(tr + $DsirBuckets AS DOUBLE)), 6)
      |      AS DECIMAL(12,6)) AS lr
      |  FROM raw LEFT JOIN tgt USING (bkt) CROSS JOIN tot),
      |scored AS (
      |  SELECT doc_id, lang, CAST(sum(nb) AS BIGINT) AS n_grams,
      |    CAST(sum(nb * lr) AS DECIMAL(30,6)) AS lw
      |  FROM db JOIN lr USING (bkt) GROUP BY 1, 2),
      |keyed AS (
      |  SELECT *, lw + CAST(round(-ln(-ln(
      |      (('0x' || substr(md5('dsir:' || doc_id), 1, 8))::BIGINT + 0.5e0)
      |        / 4294967296e0)), 6) AS DECIMAL(12,6)) AS k
      |  FROM scored),
      |n AS (SELECT CAST(ceil(count(*) / 5.0e0) AS BIGINT) AS keep_n FROM keyed)
      |SELECT doc_id, lang, n_grams, CAST(lw AS DOUBLE) AS logw,
      |  row_number() OVER (ORDER BY k DESC, doc_id ASC) <= keep_n AS keep
      |FROM keyed CROSS JOIN n
      |ORDER BY doc_id""".stripMargin

  /** Minimum bigram occurrences for a q207 collocation candidate — the
    * standard low-count PMI guard (rare pairs have unboundedly inflated
    * PMI; Church & Hanks' original collocation work cuts them first).
    */
  private val PmiMinCount = 5

  /** q207: PMI collocation mining — corpus-level "which word pairs
    * co-occur far beyond chance", the association-measure complement to
    * q88 (which SCORES documents under a bigram LM; this RANKS the
    * bigrams themselves — the vocabulary-building pass that decides
    * which adjacent pairs should merge into phrases before tokenizer
    * training, word2vec-style phrase promotion). PMI(a,b) =
    * ln(P(a,b) / (P(a)P(b))) over adjacent-pair events, computed from
    * four exact integer sufficient statistics (c2, c1a, c1b, N, B) with
    * a TEXTUALLY mirrored multiply/divide order in both engines (the
    * products round identically in IEEE; ln differences hide under the
    * 6-digit round that lands BEFORE the rank — house discipline). The
    * [[PmiMinCount]] cut comes before the joins, so the scored set is
    * small; top-30 via orderBy().limit() = TakeOrderedAndProject (every
    * task keeps a 30-row heap — the q89 device, never a global sort),
    * with the rank window running over 30 survivors only. Scale: two
    * scan-shaped aggs (unigrams, bigrams) + broadcast joins of the
    * count-filtered candidates; at open-vocabulary corpus scale the
    * unigram broadcast swaps for a shuffle join, nothing else moves.
    */
  def q207PmiCollocations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents").select($"doc_id", split($"text", " ").as("t"))
    // vocabulary-sized and read three times (N, both join sides):
    // persist, unlike the exploded bigram stream (q88's measured rule —
    // replaying codegen'd split+zip_with beats caching the explosion)
    val uni = toks.select(explode($"t").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
      .persist()
    val bg = toks.select(
      explode(zip_with(
        slice($"t", lit(1), size($"t") - 1),
        slice($"t", lit(2), size($"t") - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bb"))
      .select($"bb.w1".as("w1"), $"bb.w2".as("w2"))
    val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      .filter($"c2" >= PmiMinCount)
    val nTok = uni.agg(sum($"c1").cast("double").as("n"))
    // every doc emits exactly len-1 bigrams (len >= 1 always: split of
    // any string is non-empty), so B = N - |docs| — no bigram re-scan
    val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("d"))
    val nBg = nTok.crossJoin(nDocs)
      .select(($"n" - $"d").cast("double").as("b"))
    val scored = c2
      .join(broadcast(uni.select($"w".as("w1"), $"c1".as("c1a"))), Seq("w1"))
      .join(broadcast(uni.select($"w".as("w2"), $"c1".as("c1b"))), Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBg))
      .select($"w1", $"w2", $"c2",
        round(log((($"c2".cast("double") * $"n") * $"n") /
          (($"b" * $"c1a") * $"c1b")), 6).as("pmi"))
    val top = scored.orderBy($"pmi".desc, $"w1".asc, $"w2".asc).limit(30)
    val w = Window.orderBy($"pmi".desc, $"w1".asc, $"w2".asc)
    top.withColumn("rank", row_number().over(w))
      .select($"rank", $"w1", $"w2", $"c2", $"pmi")
      .orderBy($"rank")
  }

  private val q207Sql =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |uni AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM (
      |    SELECT unnest(t) AS w FROM toks) GROUP BY w),
      |bg AS (
      |  SELECT t[i] AS w1, t[i+1] AS w2 FROM toks,
      |    LATERAL (SELECT unnest(range(1, len(t))) AS i)),
      |c2t AS (
      |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg
      |  GROUP BY 1, 2 HAVING count(*) >= $PmiMinCount),
      |n AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM uni),
      |b AS (SELECT CAST(n.n - (SELECT count(*) FROM documents) AS DOUBLE) AS b
      |      FROM n),
      |scored AS (
      |  SELECT c.w1, c.w2, c.c2,
      |    round(ln(((CAST(c.c2 AS DOUBLE) * n.n) * n.n)
      |      / ((b.b * u1.c1) * u2.c1)), 6) AS pmi
      |  FROM c2t c
      |  JOIN uni u1 ON c.w1 = u1.w
      |  JOIN uni u2 ON c.w2 = u2.w
      |  CROSS JOIN n CROSS JOIN b)
      |SELECT rank, w1, w2, c2, pmi FROM (
      |  SELECT w1, w2, c2, pmi,
      |    row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS rank
      |  FROM scored)
      |WHERE rank <= 30
      |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q226

  /** q226: QUANTILE NORMALIZATION across sources — the multi-source
    * score-alignment pass: each document's within-source rank maps to
    * the pooled distribution's value at the same quantile, so "top
    * decile of src3" and "top decile of src7" mean the same thing even
    * when the sources' raw n_chars distributions differ (the
    * batch-effect correction genomics runs before cross-batch
    * comparison; here it is what makes per-source quality cutoffs
    * comparable before a q65/q189-style mixture). All index arithmetic
    * is integer-exact: within-source rank r of n_h rows maps to pooled
    * index ⌈(2r−1)·N / (2·n_h)⌉ (nearest-rank at quantile (r−½)/n_h,
    * computed as (a+b−1) div b — no floats anywhere), and the pooled
    * value lookup is a rank-keyed join. The pooled ranking uses the
    * GlobalRank range-partition device, never a single-partition
    * window; within-source windows partition by source. Output is the
    * deterministic doc_id % 37 sample of the full mapping.
    */
  def q226QuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents").select($"doc_id", $"source", $"n_chars")
      .persist()
    val bySrc = Window.partitionBy($"source")
      .orderBy($"n_chars".asc, $"doc_id".asc)
    val ranked = d.withColumn("r", row_number().over(bySrc))
      .withColumn("n_h", count(lit(1)).over(Window.partitionBy($"source")))
    val (pooled, nTot) = GlobalRank.withGlobalRankCounted(
      d.select($"n_chars".as("pool_chars"), $"doc_id".as("pool_doc")),
      "grank", $"pool_chars".asc, $"pool_doc".asc)
    val mapped = ranked
      .withColumn("idx",
        (((lit(2L) * $"r" - 1) * lit(nTot) + lit(2L) * $"n_h" - 1) /
          (lit(2L) * $"n_h")).cast("long"))
      .join(pooled.select($"grank".as("idx"), $"pool_chars"), Seq("idx"))
      .select($"doc_id", $"source", $"n_chars", $"r".cast("long").as("r"),
        $"n_h", $"idx", $"pool_chars".as("norm_chars"))
    mapped.filter($"doc_id" % 37 === 0).orderBy($"doc_id")
  }

  private val q226Sql =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS r,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_h
      |  FROM d),
      |pooled AS (
      |  SELECT n_chars AS pool_chars,
      |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
      |      AS grank
      |  FROM d),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM d),
      |mapped AS (
      |  SELECT doc_id, source, n_chars, r, n_h,
      |    ((2 * r - 1) * nt + 2 * n_h - 1) // (2 * n_h) AS idx
      |  FROM ranked CROSS JOIN n)
      |SELECT m.doc_id, m.source, m.n_chars, CAST(m.r AS BIGINT) AS r,
      |  m.n_h, m.idx, p.pool_chars AS norm_chars
      |FROM mapped m JOIN pooled p ON p.grank = m.idx
      |WHERE m.doc_id % 37 = 0
      |ORDER BY m.doc_id""".stripMargin

  /** q271: FORCAST READABILITY — the readability formula built for
    * NON-PROSE text (technical manuals, forms — and token-salad
    * training corpora like this one): grade = 20 − M/10 where M is the
    * monosyllabic-word count per 150 words, i.e. 20 − 15·(mono/words).
    * Flesch/FOG need sentence boundaries this corpus doesn't have;
    * FORCAST is the standard sentence-free alternative, which is
    * exactly the situation web-scraped training text is in after
    * boilerplate stripping. Syllables are the vowel-group proxy
    * (runs of [aeiouy] per word) — integer-exact, computed INSIDE the
    * scan projection with array lambdas (split → transform →
    * filter): no explode, no shuffle until the bounded per-source
    * rollup. Per-source output: mean grade (decimal-pinned per-doc
    * grades), corpus syllables/word and complex-word ratio from
    * integer-exact sums.
    */
  def q271ForcastReadability(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val words = filter(split($"text", " "), w => w =!= "")
    val syl = transform($"words", w => size(regexp_extract_all(w,
      lit("[aeiouy]+"), lit(0))))
    val perDoc = Tables.loadSpread(s, dir, "documents")
      .select($"doc_id", $"source", words.as("words"))
      .select($"doc_id", $"source",
        size($"words").cast("long").as("nw"),
        syl.as("syl"))
      .select($"doc_id", $"source", $"nw",
        aggregate($"syl", lit(0L), (acc, x) => acc + x).as("nsyl"),
        size(filter($"syl", c => c === 1)).cast("long").as("mono"),
        size(filter($"syl", c => c >= 3)).cast("long").as("complex"))
      .withColumn("grade",
        round(lit(20.0) - lit(15.0) *
          ($"mono".cast("double") / $"nw".cast("double")), 6))
    perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"grade".cast(dec6)).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_grade"),
        round(sum($"nsyl").cast("double") / sum($"nw").cast("double"), 6)
          .as("syllables_per_word"),
        round(sum($"complex").cast("double") / sum($"nw").cast("double"), 6)
          .as("complex_ratio"))
      .orderBy($"source")
  }

  private val q271Sql =
    """WITH per_doc AS (
      |  SELECT doc_id, source, nw,
      |    list_sum(syl) AS nsyl,
      |    len(list_filter(syl, c -> c = 1)) AS mono,
      |    len(list_filter(syl, c -> c >= 3)) AS cx,
      |    round(20e0 - 15e0 *
      |      (CAST(len(list_filter(syl, c -> c = 1)) AS DOUBLE) /
      |       CAST(nw AS DOUBLE)), 6) AS grade
      |  FROM (
      |    SELECT doc_id, source,
      |      CAST(len(words) AS BIGINT) AS nw,
      |      list_transform(words,
      |        w -> len(regexp_extract_all(w, '[aeiouy]+'))) AS syl
      |    FROM (
      |      SELECT doc_id, source,
      |        list_filter(string_split(text, ' '), w -> w <> '') AS words
      |      FROM documents)))
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(sum(CAST(grade AS DECIMAL(18,6))) AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE), 6) AS mean_grade,
      |  round(CAST(sum(nsyl) AS DOUBLE) / CAST(sum(nw) AS DOUBLE), 6)
      |    AS syllables_per_word,
      |  round(CAST(sum(cx) AS DOUBLE) / CAST(sum(nw) AS DOUBLE), 6)
      |    AS complex_ratio
      |FROM per_doc
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** q283: TERM BURSTINESS — the corpus-linguistics dispersion profile
    * (Church & Gale '95): content words BURST (when a doc mentions a
    * term once it mentions it again), function words spread evenly, so
    * dispersion separates topical vocabulary from glue — and for
    * training-data curation, a term whose dispersion EXCEEDS the
    * corpus's own profile flags template/boilerplate injection. Two
    * integer-exact measures per term: burstiness = cf/df (mean
    * occurrences per CONTAINING doc) and the index of dispersion
    * D = var/mean over ALL docs (zeros included) = (N·Σtf² − cf²)/
    * (N·cf), Poisson ⇒ D ≈ 1. One tf scan, one vocabulary-bounded
    * rollup, a 1-row N attach; every sum is a long, the two divisions
    * are the only doubles, round(6)-pinned.
    */
  def q283TermBurstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = Tables.loadSpread(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val n = Tables.loadSpread(s, dir, "documents")
      .agg(countDistinct($"doc_id").as("nd"))
    val byTerm = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"),
        sum($"tf" * $"tf").as("tf2"))
    byTerm.crossJoin(broadcast(n))
      .select($"term", $"df", $"cf",
        round($"cf".cast("double") / $"df".cast("double"), 6)
          .as("burstiness"),
        round(($"nd".cast("double") * $"tf2".cast("double") -
            $"cf".cast("double") * $"cf".cast("double")) /
          ($"nd".cast("double") * $"cf".cast("double")), 6)
          .as("dispersion"))
      .orderBy($"term")
  }

  private val q283Sql =
    """WITH tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |    FROM documents)
      |  WHERE term <> '' GROUP BY 1, 2),
      |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
      |      FROM documents),
      |by_term AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df,
      |    CAST(sum(tf) AS BIGINT) AS cf,
      |    CAST(sum(tf * tf) AS BIGINT) AS tf2
      |  FROM tf GROUP BY 1)
      |SELECT term, df, cf,
      |  round(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness,
      |  round((CAST(nd AS DOUBLE) * CAST(tf2 AS DOUBLE) -
      |      CAST(cf AS DOUBLE) * CAST(cf AS DOUBLE)) /
      |    (CAST(nd AS DOUBLE) * CAST(cf AS DOUBLE)), 6) AS dispersion
      |FROM by_term CROSS JOIN n
      |ORDER BY term""".stripMargin

  // ---------------------------------------------------------------- q306

  /** The q306 reference-corpus rule: every third document (doc_id % 3 =
    * 0) plays the clean reference the language model trains on — the
    * CCNet posture where the LM comes from a trusted corpus (Wikipedia
    * in the paper) and scores the whole crawl.
    */
  val PplRefMod = 3

  /** q306: CCNET-STYLE PERPLEXITY FILTER (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data" — the LM-perplexity bucketing every modern pretraining
    * corpus runs): an add-one-smoothed BIGRAM language model trains on
    * the reference slice, every document scores by its mean negative
    * log-likelihood per bigram (log-space only — no exp, so the one
    * transcendental is ln of a rational, the q82 BM25 cross-engine
    * precedent), and the corpus splits into CCNet's head/middle/tail
    * terciles by the corpus-wide score sort. The tercile assignment is
    * the one total-order stage and uses [[GlobalRank]]'s
    * range-partition + P-row-offset device, NEVER a single-partition
    * window — exactly how a 100 TB corpus would be perplexity-sorted.
    * Joins key on (w1, w2)/(w1) — n-gram-count shaped, collision-rate
    * bound; the model tables are reference-vocabulary sized.
    */
  def q306CcnetPerplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"doc_id", split(lower($"text"), " ").as("w"))
      .filter(size($"w") >= 2)
      .persist()
    val bi = toks
      .select($"doc_id", $"w", explode(sequence(lit(1), size($"w") - 1)).as("i"))
      .select($"doc_id", element_at($"w", $"i").as("w1"),
        element_at($"w", $"i" + 1).as("w2"))
    val isRef = (c: Column) => c % PplRefMod === 0
    val c2 = bi.filter(isRef($"doc_id"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val refUni = toks.filter(isRef($"doc_id"))
      .select(explode($"w").as("w1"))
      .persist()
    val c1 = refUni.groupBy($"w1").agg(count(lit(1)).as("c1"))
    // |V|: the reference vocabulary — a driver scalar, the q06 HWM shape
    val vocab = refUni.select($"w1").distinct().count().toDouble
    val scored = bi
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .select($"doc_id",
        (-log((coalesce($"c2", lit(0L)) + lit(1L)).cast("double") /
          (coalesce($"c1", lit(0L)).cast("double") + lit(vocab)))).as("nll"))
    val agg = scored.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg($"nll"), 6).as("avg_nll"))
    val (ranked, n) = graft.operators.GlobalRank.withGlobalRankCounted(
      agg, "rk", $"avg_nll".asc, $"doc_id".asc)
    ranked
      .select($"doc_id", $"n_bigrams", $"avg_nll",
        when($"rk" * 3 <= n, lit("head"))
          .when($"rk" * 3 <= 2 * n, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy($"doc_id")
  }

  private val q306Sql =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bi AS (
      |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
      |        FROM toks)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi
      |       WHERE doc_id % $PplRefMod = 0 GROUP BY w1, w2),
      |uni AS (SELECT unnest(w) AS w1 FROM toks WHERE doc_id % $PplRefMod = 0),
      |c1 AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY w1),
      |v AS (SELECT CAST(count(DISTINCT w1) AS DOUBLE) AS vocab FROM uni),
      |sc AS (
      |  SELECT bi.doc_id,
      |    -ln((coalesce(c2.c2, 0) + 1) /
      |        (coalesce(c1.c1, 0) + (SELECT vocab FROM v))) AS nll
      |  FROM bi
      |  LEFT JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
      |  LEFT JOIN c1 ON bi.w1 = c1.w1),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    round(avg(nll), 6) AS avg_nll
      |  FROM sc GROUP BY doc_id),
      |rk AS (
      |  SELECT *, row_number() OVER (ORDER BY avg_nll, doc_id) AS rk,
      |    (SELECT count(*) FROM agg) AS n
      |  FROM agg)
      |SELECT doc_id, n_bigrams, avg_nll,
      |  CASE WHEN rk * 3 <= n THEN 'head'
      |       WHEN rk * 3 <= 2 * n THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM rk
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q307

  /** q307 slice assignment: doc_id ≡ 0 (mod 3) is the IN-DOMAIN corpus
    * (the same trusted slice q306's CCNet filter trains on), ≡ 1 is the
    * GENERAL corpus standing in for the raw crawl's background
    * distribution, and ≡ 2 is the candidate POOL being scored — three
    * disjoint slices, so neither model ever trains on a document it
    * scores.
    */
  val MlPoolMod = 2

  /** q307: MOORE–LEWIS CROSS-ENTROPY DIFFERENCE SELECTION (Moore &
    * Lewis 2010, "Intelligent Selection of Language Model Training
    * Data" — the classic domain-targeted data-selection method, and the
    * perplexity-DIFFERENCE counterpart to q306's single-model CCNet
    * filter): train an add-one bigram LM on the in-domain slice and a
    * second one on the general slice, score every pool document by
    * H_in(d) − H_gen(d) (mean per-bigram NLL difference), and select
    * the lowest-scoring quartile — documents that look like the target
    * domain AND unlike the background, which a raw perplexity filter
    * (q306) cannot distinguish from merely-easy text. Same engine
    * devices as q306: log-space only (ln of a rational per bigram), the
    * model count tables are n-gram-shaped keyed joins, and the one
    * corpus-wide total-order (the selection cut) runs on
    * [[GlobalRank]]'s range-partition + P-row-offset device, never a
    * single-partition window. DSIR (q162) is the hashed-FEATURE
    * importance sampler; this is the LM-likelihood member of the same
    * selection family.
    */
  def q307MooreLewis(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = mooreLewisScores(s, dir)
    val (ranked, n) = graft.operators.GlobalRank.withGlobalRankCounted(
      agg, "rk", $"ce_diff".asc, $"doc_id".asc)
    ranked
      .select($"doc_id", $"n_bigrams", $"ce_in", $"ce_gen", $"ce_diff",
        ($"rk" * 4 <= n).as("selected"))
      .orderBy($"doc_id")
  }

  /** q307's per-document cross-entropy table (doc_id, n_bigrams, ce_in,
    * ce_gen, ce_diff) over the pool slice. Round 13 (VERDICT r12 "Next
    * round" #6): the two-LM scoring pass runs once per corpus
    * fingerprint inside the [[MlIndex]] artifact build; both consumers
    * (q307 selection, q320 DoReMi) read the committed table, and their
    * oracles still re-derive the scores relationally per gate run.
    */
  private[operators] def mooreLewisScores(s: SparkSession, dir: String): DataFrame =
    MlIndex.scores(s, dir)

  /** The scoring derivation over an explicit (doc_id, text) frame — the
    * seam [[MlIndex.build]] commits.
    */
  private[operators] def mooreLewisScoresOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val toks = docs
      .select($"doc_id", split(lower($"text"), " ").as("w"))
      .filter(size($"w") >= 2)
      .persist()
    val bi = toks
      .select($"doc_id", $"w", explode(sequence(lit(1), size($"w") - 1)).as("i"))
      .select($"doc_id", element_at($"w", $"i").as("w1"),
        element_at($"w", $"i" + 1).as("w2"))
      .persist()
    // one add-one bigram model per training slice (the q306 estimator,
    // parameterized by slice): bigram counts, context counts, |V|
    def model(m: Int, tag: String): (DataFrame, DataFrame, Double) = {
      val c2 = bi.filter($"doc_id" % 3 === m)
        .groupBy($"w1", $"w2").agg(count(lit(1)).as(s"c2_$tag"))
      val uni = toks.filter($"doc_id" % 3 === m)
        .select(explode($"w").as("w1")).persist()
      val c1 = uni.groupBy($"w1").agg(count(lit(1)).as(s"c1_$tag"))
      val vocab = uni.select($"w1").distinct().count().toDouble
      uni.unpersist(false)
      (c2, c1, vocab)
    }
    val (inC2, inC1, inV) = model(0, "in")
    val (genC2, genC1, genV) = model(1, "gen")
    def nll(c2: Column, c1: Column, v: Double): Column =
      -log((coalesce(c2, lit(0L)) + lit(1L)).cast("double") /
        (coalesce(c1, lit(0L)).cast("double") + lit(v)))
    val scored = bi.filter($"doc_id" % 3 === MlPoolMod)
      .join(inC2, Seq("w1", "w2"), "left")
      .join(inC1, Seq("w1"), "left")
      .join(genC2, Seq("w1", "w2"), "left")
      .join(genC1, Seq("w1"), "left")
      .select($"doc_id",
        nll($"c2_in", $"c1_in", inV).as("nll_in"),
        nll($"c2_gen", $"c1_gen", genV).as("nll_gen"))
    scored.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg($"nll_in"), 6).as("ce_in"),
        round(avg($"nll_gen"), 6).as("ce_gen"),
        round(avg($"nll_in" - $"nll_gen"), 6).as("ce_diff"))
  }

  private val q307Sql =
    s"""WITH $mlAggCtes,
      |rk AS (
      |  SELECT *, row_number() OVER (ORDER BY ce_diff, doc_id) AS rk,
      |    (SELECT count(*) FROM agg) AS n
      |  FROM agg)
      |SELECT doc_id, n_bigrams, ce_in, ce_gen, ce_diff,
      |  rk * 4 <= n AS selected
      |FROM rk
      |ORDER BY doc_id""".stripMargin

  /** The q307 relational chain through `agg` (per-doc ce_in/ce_gen/
    * ce_diff over the pool slice) — shared with q320's oracle.
    */
  private[operators] def mlAggCtes: String =
    s"""toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bi AS (
      |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
      |        FROM toks)),
      |in_c2 AS (SELECT w1, w2, count(*) AS c2_in FROM bi
      |          WHERE doc_id % 3 = 0 GROUP BY w1, w2),
      |in_uni AS (SELECT unnest(w) AS w1 FROM toks WHERE doc_id % 3 = 0),
      |in_c1 AS (SELECT w1, count(*) AS c1_in FROM in_uni GROUP BY w1),
      |in_v AS (SELECT CAST(count(DISTINCT w1) AS DOUBLE) AS v FROM in_uni),
      |gen_c2 AS (SELECT w1, w2, count(*) AS c2_gen FROM bi
      |           WHERE doc_id % 3 = 1 GROUP BY w1, w2),
      |gen_uni AS (SELECT unnest(w) AS w1 FROM toks WHERE doc_id % 3 = 1),
      |gen_c1 AS (SELECT w1, count(*) AS c1_gen FROM gen_uni GROUP BY w1),
      |gen_v AS (SELECT CAST(count(DISTINCT w1) AS DOUBLE) AS v FROM gen_uni),
      |sc AS (
      |  SELECT bi.doc_id,
      |    -ln((coalesce(in_c2.c2_in, 0) + 1) /
      |        (coalesce(in_c1.c1_in, 0) + (SELECT v FROM in_v))) AS nll_in,
      |    -ln((coalesce(gen_c2.c2_gen, 0) + 1) /
      |        (coalesce(gen_c1.c1_gen, 0) + (SELECT v FROM gen_v))) AS nll_gen
      |  FROM bi
      |  LEFT JOIN in_c2 ON bi.w1 = in_c2.w1 AND bi.w2 = in_c2.w2
      |  LEFT JOIN in_c1 ON bi.w1 = in_c1.w1
      |  LEFT JOIN gen_c2 ON bi.w1 = gen_c2.w1 AND bi.w2 = gen_c2.w2
      |  LEFT JOIN gen_c1 ON bi.w1 = gen_c1.w1
      |  WHERE bi.doc_id % 3 = $MlPoolMod),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    round(avg(nll_in), 6) AS ce_in,
      |    round(avg(nll_gen), 6) AS ce_gen,
      |    round(avg(nll_in - nll_gen), 6) AS ce_diff
      |  FROM sc GROUP BY doc_id)""".stripMargin

  // ---------------------------------------------------------------- q310

  /** q310 absolute discount D = 0.75 (the Chen & Goodman default; 0.75
    * is exactly representable in binary, so the subtraction is
    * bit-deterministic in both engines). */
  val KnDiscount = 0.75

  /** q310: INTERPOLATED KNESER–NEY BIGRAM LM (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated form — the smoothing inside KenLM,
    * which is what CCNet actually ships): the estimator upgrade over
    * q306's add-one. Add-one hammers every unseen bigram with the same
    * 1/(c1+V) mass; KN discounts each SEEN bigram by a fixed D and
    * redistributes exactly the freed mass (D·N1+(w1,·)/c(w1)) over a
    * CONTINUATION distribution — P_cont(w2) ∝ how many distinct
    * contexts w2 follows, the "San Francisco" device that stops
    * frequent-but-bound words from soaking up backoff mass. All
    * sufficient statistics are integer tables derived from ONE bigram
    * count: c(w1,w2), c(w1) = Σc, N1+(w1,·), N1+(·,w2), N1+(·,·) —
    * n-gram-count-shaped keyed joins, the q306 scale argument.
    * Deviation, documented: the continuation distribution carries a +1
    * over (N1+(·,·) + V + 1) so OOV words score finitely (KenLM's
    * <unk> role); unseen CONTEXTS back off to P_cont alone. Log-space
    * only; same GlobalRank tercile cut as q306 so the two estimators'
    * bucketings are directly comparable.
    */
  def q310KneserNey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"doc_id", split(lower($"text"), " ").as("w"))
      .filter(size($"w") >= 2)
      .persist()
    val bi = toks
      .select($"doc_id", $"w", explode(sequence(lit(1), size($"w") - 1)).as("i"))
      .select($"doc_id", element_at($"w", $"i").as("w1"),
        element_at($"w", $"i" + 1).as("w2"))
      .persist()
    val isRef = (c: Column) => c % PplRefMod === 0
    val c2 = bi.filter(isRef($"doc_id"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      .persist()
    // context totals + fan-out from the ONE bigram-count table
    val ctx = c2.groupBy($"w1")
      .agg(sum($"c2").as("c1"), count(lit(1)).as("n1p_fwd"))
    val bwd = c2.groupBy($"w2").agg(count(lit(1)).as("n1p_bwd"))
    val n1pAll = c2.count().toDouble
    val vocab = toks.filter(isRef($"doc_id"))
      .select(explode($"w").as("t")).distinct().count().toDouble
    val pcont = (coalesce($"n1p_bwd", lit(0L)) + 1).cast("double") /
      lit(n1pAll + vocab + 1)
    val pkn = when(coalesce($"c1", lit(0L)) > 0,
      (greatest(coalesce($"c2", lit(0L)).cast("double") - KnDiscount, lit(0.0))
        + lit(KnDiscount) * $"n1p_fwd" * pcont) / $"c1")
      .otherwise(pcont)
    val scored = bi
      .join(c2, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(bwd, Seq("w2"), "left")
      .select($"doc_id", (-log(pkn)).as("nll"))
    val agg = scored.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg($"nll"), 6).as("avg_nll"))
    val (ranked, n) = graft.operators.GlobalRank.withGlobalRankCounted(
      agg, "rk", $"avg_nll".asc, $"doc_id".asc)
    ranked
      .select($"doc_id", $"n_bigrams", $"avg_nll",
        when($"rk" * 3 <= n, lit("head"))
          .when($"rk" * 3 <= 2 * n, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy($"doc_id")
  }

  private val q310Sql =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bi AS (
      |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
      |        FROM toks)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi
      |       WHERE doc_id % $PplRefMod = 0 GROUP BY w1, w2),
      |ctx AS (SELECT w1, sum(c2) AS c1, count(*) AS n1p_fwd
      |        FROM c2 GROUP BY w1),
      |bwd AS (SELECT w2, count(*) AS n1p_bwd FROM c2 GROUP BY w2),
      |gl AS (SELECT CAST(count(*) AS DOUBLE) AS n1p_all FROM c2),
      |uni AS (SELECT unnest(w) AS t FROM toks WHERE doc_id % $PplRefMod = 0),
      |v AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS vocab FROM uni),
      |sc AS (
      |  SELECT bi.doc_id,
      |    -ln(CASE WHEN coalesce(ctx.c1, 0) > 0 THEN
      |      (greatest(CAST(coalesce(c2.c2, 0) AS DOUBLE) - $KnDiscount, 0.0)
      |       + $KnDiscount * ctx.n1p_fwd *
      |         ((coalesce(bwd.n1p_bwd, 0) + 1) /
      |          ((SELECT n1p_all FROM gl) + (SELECT vocab FROM v) + 1)))
      |      / ctx.c1
      |    ELSE (coalesce(bwd.n1p_bwd, 0) + 1) /
      |         ((SELECT n1p_all FROM gl) + (SELECT vocab FROM v) + 1)
      |    END) AS nll
      |  FROM bi
      |  LEFT JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
      |  LEFT JOIN ctx ON bi.w1 = ctx.w1
      |  LEFT JOIN bwd ON bi.w2 = bwd.w2),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    round(avg(nll), 6) AS avg_nll
      |  FROM sc GROUP BY doc_id),
      |rk AS (
      |  SELECT *, row_number() OVER (ORDER BY avg_nll, doc_id) AS rk,
      |    (SELECT count(*) FROM agg) AS n
      |  FROM agg)
      |SELECT doc_id, n_bigrams, avg_nll,
      |  CASE WHEN rk * 3 <= n THEN 'head'
      |       WHEN rk * 3 <= 2 * n THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM rk
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q321

  /** q321 geometry: [[JmIters]] EM iterations from λ₀ = 0.5; slices are
    * the q307 layout (train % 3 = 0, HELD-OUT % 3 = 1 for tuning,
    * % 3 = 2 evaluation).
    */
  val JmIters = 6

  /** q321: JELINEK–MERCER INTERPOLATION EM (Jelinek & Mercer 1980;
    * Chen & Goodman 1999 §2.4 — deleted-interpolation weight tuning,
    * the third estimator on the LM shelf next to add-one q306 and
    * Kneser–Ney q310): p(w2|w1) = λ·p_ML(w2|w1) + (1−λ)·p_uni(w2),
    * with λ fit by EM on a HELD-OUT slice the counts never saw. The
    * E-step responsibility of the bigram component is λ·p_bi / p —
    * divisions of fixed per-event probabilities only, so the whole EM
    * loop is TRANSCENDENTAL-FREE (the q320 lesson: exp/ln inside an
    * iteration would expose cross-engine libm ulps; the one ln in this
    * query is the REPORTING column, pinned at q306's proven 6dp).
    * M-step: λ' = mean responsibility, as a DECIMAL-exact sum of
    * 12dp-rounded terms over the held-out events, updated DRIVER-SIDE
    * (one scalar per round — the q313/q320 bounded-solver class; the
    * corpus-sized work is the count-table derivation plus ONE
    * aggregation per round over the persisted event frame). Output:
    * the λ trajectory with the held-out mean NLL at each iterate — the
    * monotone-likelihood curve EM guarantees, every point hash-locked.
    */
  def q321JelinekMercer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"doc_id", split(lower($"text"), " ").as("w"))
      .filter(size($"w") >= 2)
      .persist()
    val bi = toks
      .select($"doc_id", $"w", explode(sequence(lit(1), size($"w") - 1)).as("i"))
      .select($"doc_id", element_at($"w", $"i").as("w1"),
        element_at($"w", $"i" + 1).as("w2"))
    // train-slice sufficient statistics (ML bigram + add-one unigram)
    val c2 = bi.filter($"doc_id" % 3 === 0)
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val uni = toks.filter($"doc_id" % 3 === 0)
      .select(explode($"w").as("w2")).persist()
    val c1 = uni.groupBy($"w2".as("w1")).agg(count(lit(1)).as("c1"))
    val cu = uni.groupBy($"w2").agg(count(lit(1)).as("cu"))
    val nTrain = uni.count().toDouble
    val vocab = uni.select($"w2").distinct().count().toDouble
    uni.unpersist(false)
    // held-out events with their two fixed component probabilities:
    // p_bi = ML c2/c1 (0 where the context or pair is unseen),
    // p_uni = add-one (cu+1)/(N+V) — strictly positive, so the mixture
    // never zeroes and responsibilities stay defined
    val ev = bi.filter($"doc_id" % 3 === 1)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cu, Seq("w2"), "left")
      .select(
        when($"c1".isNotNull && $"c2".isNotNull,
          $"c2".cast("double") / $"c1".cast("double"))
          .otherwise(lit(0.0)).as("pb"),
        ((coalesce($"cu", lit(0L)) + lit(1L)).cast("double") /
          lit(nTrain + vocab)).as("pu"))
      .persist()
    val nEv = ev.count()
    require(nEv > 0, "q321 needs a non-empty held-out slice")
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def rnd(x: Double, sc: Int): Double =
      JBD.valueOf(x).setScale(sc, RM.HALF_UP).doubleValue
    var lambda = 0.5
    val out = Seq.newBuilder[(Int, Double, Double)]
    for (it <- 0 to JmIters) {
      // ONE aggregation per iterate: the reporting NLL at the CURRENT
      // λ (6dp — the q306 ln/avg parity) and the E-step responsibility
      // sum for the NEXT λ share the same pass over the event frame
      val mix = lit(lambda) * $"pb" + lit(1.0 - lambda) * $"pu"
      val r = ev.agg(
        round(avg(-log(mix)), 6),
        sum(round(lit(lambda) * $"pb" / mix, 12)
          .cast(org.apache.spark.sql.types.DecimalType(28, 12))))
        .head()
      out += ((it, lambda, r.getDouble(0)))
      if (it < JmIters)
        lambda = rnd(r.getDecimal(1).doubleValue / nEv.toDouble, 12)
    }
    out.result().toDF("iter", "lambda", "heldout_nll")
      .orderBy($"iter")
  }

  private def q321Sql: String = {
    def mix(l: String) = s"($l * pb + (1.0 - $l) * pu)"
    val iters = (1 to JmIters).map { it =>
      val prev = s"(SELECT l FROM lam${it - 1})"
      s"""lam$it AS MATERIALIZED (
        |  SELECT round(CAST(sum(CAST(round($prev * pb /
        |      ${mix(prev)}, 12) AS DECIMAL(28,12))) AS DOUBLE) /
        |    (SELECT CAST(count(*) AS DOUBLE) FROM ev), 12) AS l
        |  FROM ev)""".stripMargin
    }.mkString(",\n")
    val rows = (0 to JmIters).map { it =>
      s"""SELECT $it AS iter, (SELECT l FROM lam$it) AS lambda,
        |  (SELECT round(avg(-ln((SELECT l FROM lam$it) * pb +
        |     (1.0 - (SELECT l FROM lam$it)) * pu)), 6) FROM ev)
        |  AS heldout_nll""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bi AS (
      |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
      |        FROM toks)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi
      |       WHERE doc_id % 3 = 0 GROUP BY w1, w2),
      |tuni AS (SELECT unnest(w) AS w2 FROM toks WHERE doc_id % 3 = 0),
      |c1 AS (SELECT w2 AS w1, count(*) AS c1 FROM tuni GROUP BY w2),
      |cu AS (SELECT w2, count(*) AS cu FROM tuni GROUP BY w2),
      |nv AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |              CAST(count(DISTINCT w2) AS DOUBLE) AS v FROM tuni),
      |ev AS MATERIALIZED (
      |  SELECT
      |    CASE WHEN c1.c1 IS NOT NULL AND c2.c2 IS NOT NULL
      |         THEN CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)
      |         ELSE 0.0e0 END AS pb,
      |    (coalesce(cu.cu, 0) + 1) / (SELECT n + v FROM nv) AS pu
      |  FROM bi
      |  LEFT JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
      |  LEFT JOIN c1 ON bi.w1 = c1.w1
      |  LEFT JOIN cu ON bi.w2 = cu.w2
      |  WHERE bi.doc_id % 3 = 1),
      |lam0 AS (SELECT 0.5e0 AS l),
      |$iters
      |$rows
      |ORDER BY iter""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q321_jelinek_mercer", Seq("EXT-text", "EXT-curation"),
      "Jelinek-Mercer interpolation EM on a held-out slice: transcendental-free responsibilities, DECIMAL-pinned M-step, lambda + held-out NLL trajectory",
      q321JelinekMercer, Some(q321Sql)),
    GraftQuery("q310_kneser_ney", Seq("EXT-text", "EXT-curation"),
      "interpolated Kneser-Ney bigram LM: absolute discount + continuation-count backoff from one bigram-count table, tercile cut via the range-partitioned global rank",
      q310KneserNey, Some(q310Sql)),
    GraftQuery("q307_moore_lewis", Seq("EXT-text", "EXT-curation"),
      "Moore-Lewis cross-entropy difference selection: in-domain vs general add-one bigram LMs over disjoint slices, lowest-quartile cut via the range-partitioned global rank",
      q307MooreLewis, Some(q307Sql)),
    GraftQuery("q306_ccnet_perplexity", Seq("EXT-text", "EXT-curation"),
      "CCNet perplexity filter: add-one bigram LM trained on the reference slice, mean per-bigram NLL, head/middle/tail terciles via the range-partitioned global rank",
      q306CcnetPerplexity, Some(q306Sql)),
    GraftQuery("q283_term_burstiness",
      Seq("EXT-text", "EXT-curation", "A2"),
      "Church-Gale term burstiness + index of dispersion: integer-exact tf sufficient statistics, vocabulary-bounded rollup",
      q283TermBurstiness, Some(q283Sql)),
    GraftQuery("q271_forcast_readability",
      Seq("EXT-text", "EXT-curation", "A2"),
      "FORCAST readability (sentence-free): vowel-group syllables via scan-local array lambdas, per-source grade/complexity rollup",
      q271ForcastReadability, Some(q271Sql)),
    GraftQuery("q226_quantile_normalize", Seq("EXT-curation", "EXT-text", "W1"),
      "quantile normalization across sources: integer-exact nearest-rank mapping onto the pooled distribution, GlobalRank pooled ranking",
      q226QuantileNormalize, Some(q226Sql)),
    GraftQuery("q207_pmi_collocations", Seq("EXT-text", "A2"),
      "PMI collocation mining: exact integer sufficient stats, low-count guard, heap top-30",
      q207PmiCollocations, Some(q207Sql)),
    GraftQuery("q162_dsir_resample", Seq("EXT-curation", "EXT-text", "EXT-approx"),
      "DSIR importance resampling: hashed n-gram likelihood ratios, Gumbel top-(n/5) draw",
      q162DsirResample, Some(q162Sql)),
    GraftQuery("q297_sequence_packing", Seq("EXT-text", "EXT-curation", "W1"),
      "GPT-style sequence packing audit: global token stream chunked at 2048, per-doc sequence map via the range-partitioned prefix device",
      q297SequencePacking, Some(q297Sql)),
    GraftQuery("q293_incremental_dsir", Seq("EXT-curation", "EXT-text", "EXT-incremental"),
      "O(delta) DSIR: base-frozen importance model, delta-only featurize+score, global budget re-cut over the score-table union; oracle runs the full recompute",
      q293IncrementalDsir, Some(q293Sql)),
    GraftQuery("q88_bigram_lm", Seq("EXT-text", "EXT-approx"),
      "add-one bigram LM perplexity scoring; worst-decile flag",
      q88BigramLm, Some(q88Sql)),
    GraftQuery("q84_zipf_profile", Seq("EXT-text", "A2"),
      "per-language Zipf slope (decimal-reduced log-log least squares)",
      q84ZipfProfile, Some(q84Sql)),
    GraftQuery("q78_token_budget_trim", Seq("EXT-text", "EXT-split"),
      "per-language token-budget mixture trim (md5-ordered greedy cut)",
      q78TokenBudgetTrim, Some(q78Sql)),
    GraftQuery("q70_heavy_hitters", Seq("EXT-text", "EXT-approx"),
      "Misra-Gries heavy hitters: guaranteed superset of >1% keys (exact-verified)",
      q70HeavyHitters, Some(q70Sql)),
    GraftQuery("q64_tfidf_keywords", Seq("EXT-text"),
      "TF-IDF top-3 keyword extraction per document (rounded-rank stable)",
      q64TfIdf, Some(q64Sql)),
    GraftQuery("q65_source_cap", Seq("EXT-text", "EXT-split"),
      "per-source document cap via deterministic hash ranking (exact K)",
      q65SourceCap, Some(q65Sql)),
    GraftQuery("q62_shard_pack_sliced", Seq("EXT-text", "EXT-split"),
      "hash-sliced shard packing: bounded per-packer windows at corpus scale",
      q62ShardPackSliced, Some(q62Sql)),
    GraftQuery("q61_vocab_stats", Seq("EXT-text"),
      "per-language vocabulary stats: cf/df + deterministic top-10 per class",
      q61VocabStats, Some(q61Sql)),
    GraftQuery("q58_decontaminate", Seq("EXT-text", "EXT-dedup"),
      "benchmark n-gram decontamination (broadcast bench grams, thresholded)",
      q58Decontaminate, Some(q58Sql)),
    GraftQuery("q59_mixture_sample", Seq("EXT-text", "EXT-split"),
      "deterministic hash-Bernoulli resampling to a target language mixture",
      q59MixtureSample, Some(q59Sql)),
    GraftQuery("q51_shard_pack", Seq("EXT-text", "EXT-split"),
      "fixed-token-budget shard packing per split (running-sum window)",
      q51ShardPack, Some(q51Sql)),
    GraftQuery("q48_quality_filter", Seq("EXT-text"),
      "C4/Gopher-style keep/reject filter with per-rule reasons",
      q48QualityFilter, Some(q48Sql)),
    GraftQuery("q23_text_stats", Seq("EXT-text"),
      "token/char stats + quality score", q23TextStats, Some(q23Sql)),
    GraftQuery("q24_token_count", Seq("EXT-text"),
      "whitespace vs regex token counting", q24TokenCount, Some(q24Sql)),
    GraftQuery("q25_lang_id", Seq("EXT-text"),
      "stopword-profile language ID", q25LangId, Some(q25Sql)),
    GraftQuery("q26_fingerprint", Seq("EXT-text"),
      "document fingerprinting (normalized md5)", q26Fingerprint, Some(q26Sql)),
    GraftQuery("q43_repetition", Seq("EXT-text"),
      "Gopher-style intra-doc repetition signals", q43Repetition, Some(q43Sql)))
}
