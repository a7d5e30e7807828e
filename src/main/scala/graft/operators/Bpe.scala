package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Byte-pair-encoding merge TRAINING — the tokenizer-build pass every
  * LLM data pipeline runs before anything is tokenized.
  *
  * The scale shape is the whole point: the corpus-sized work is ONE
  * aggregation (distinct word -> count), and every merge iteration after
  * that runs on the VOCABULARY table — bounded by the language, not the
  * corpus — so training the merges on 100 TB costs one shuffle plus K
  * vocabulary-local rounds. Each round:
  *
  *   1. adjacent symbol pairs, weighted by word frequency (zip_with over
  *      the symbol array — q88's bigram build, no explode of the corpus);
  *   2. the most frequent pair via orderBy().limit(1) (TakeOrdered — the
  *      round-5 lint shape, never a global window);
  *   3. the merge applied with plain string `replace` on a
  *      DOUBLE-delimiter symbol string ("·h··e··l··l··o·" — every
  *      symbol wrapped as ·sym·, so adjacent symbols meet at "··"): the
  *      pair pattern "·l··r·" never shares a delimiter with the next
  *      occurrence, so one left-to-right non-overlapping replace IS
  *      greedy BPE application even for adjacent repeats of the merged
  *      pair ("·a··b··a··b·" → [ab, ab], where a SINGLE-delimiter
  *      encoding's first match would consume the shared middle "·" and
  *      yield [ab, a, b]). Flanking delimiters still make a pair match
  *      whole symbols only ("·l··l·" cannot match inside "·ll·").
  *
  * Ranks tie-break on (pair_count desc, lhs, rhs), so the learned merge
  * table is engine-deterministic; the oracle unrolls the same K rounds
  * as generated CTEs. localCheckpoint per round keeps the plan depth
  * constant (the q133 discipline). No end-of-word marker: merges here
  * are within-word only, stated rather than assumed.
  */
object Bpe {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val BpeMerges = 5

  def q136BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = t(s, dir, "documents")
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .select(regexp_replace($"w", "(.)", "·$1·").as("sym"), $"wc")
      .persist() // the one corpus-sized pass
    var vocab: DataFrame = words
    val steps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- 1 to BpeMerges) {
      val arr = split(regexp_replace($"sym", "^·|·$", ""), "··")
      val pairs = vocab
        .select($"wc", explode(zip_with(
          slice(arr, lit(1), size(arr) - 1), slice(arr, lit(2), size(arr) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy($"p.l".as("lhs"), $"p.r".as("rhs"))
        .agg(sum($"wc").as("pair_count"))
      val top1 = pairs
        .orderBy($"pair_count".desc, $"lhs".asc, $"rhs".asc).limit(1)
      steps += top1.select(lit(i).as("merge_step"), $"lhs", $"rhs",
        concat($"lhs", $"rhs").as("merged"), $"pair_count")
      vocab = vocab.crossJoin(broadcast(top1))
        .select(expr(
          "replace(sym, concat('·', lhs, '··', rhs, '·')," +
            " concat('·', lhs, rhs, '·'))").as("sym"), $"wc")
        .localCheckpoint()
    }
    steps.reduce(_ unionByName _).orderBy($"merge_step")
  }

  private val q136Sql = {
    def round(i: Int) =
      s"""pairs$i AS (
         |  SELECT p[1] AS lhs, p[2] AS rhs, CAST(sum(wc) AS BIGINT) AS pair_count
         |  FROM (
         |    SELECT wc, unnest(list_zip(a[1:len(a)-1], a[2:])) AS p
         |    FROM (SELECT wc, string_split(trim(sym, '·'), '··') AS a
         |          FROM vocab${i - 1}))
         |  GROUP BY 1, 2),
         |top$i AS (SELECT lhs, rhs, pair_count FROM pairs$i
         |          ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
         |vocab$i AS (
         |  SELECT replace(sym, '·'||lhs||'··'||rhs||'·', '·'||lhs||rhs||'·') AS sym, wc
         |  FROM vocab${i - 1} CROSS JOIN top$i)""".stripMargin
    val rounds = (1 to BpeMerges).map(round).mkString(",\n")
    val tops = (1 to BpeMerges).map(i =>
      s"SELECT $i AS merge_step, lhs, rhs, lhs||rhs AS merged, pair_count FROM top$i")
      .mkString("\nUNION ALL\n")
    s"""WITH vocab0 AS (
       |  SELECT regexp_replace(w, '(.)', '·\\1·', 'g') AS sym,
       |    CAST(count(*) AS BIGINT) AS wc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> ''
       |  GROUP BY 1),
       |$rounds
       |$tops
       |ORDER BY merge_step""".stripMargin
  }

  /** q152: BPE ENCODING — the apply side of q136: tokenize the corpus
    * with the learned merge table and report per-language token
    * economics (tokens/word, chars/token — the numbers that price a
    * training run and pick a vocabulary size). The scale shape mirrors
    * training: merges apply to the DISTINCT-WORD vocabulary (carrying
    * the word key through the K double-delimiter `replace` rounds —
    * same greedy left-to-right semantics in both engines, q136's
    * trick), and the corpus is touched exactly twice — once to build
    * per-(lang, word) counts, once never: the stats are a
    * vocabulary-sized join (broadcast at corpus scale) + exact integer
    * sums. Every symbol is wrapped ·sym·, so token counts derive from
    * the delimiter count ((len(sym) − len(strip ·)) / 2) — the whole
    * encode is string arithmetic, no arrays materialized per corpus row.
    */
  def q152BpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = t(s, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"lang", $"w").agg(count(lit(1)).as("cnt"))
      .persist() // the one corpus-sized pass
    var vocab = corpus.groupBy($"w").agg(sum($"cnt").as("wc"))
      .select($"w",
        regexp_replace($"w", "(.)", "·$1·").as("sym"),
        $"wc")
    for (_ <- 1 to BpeMerges) {
      val arr = split(regexp_replace($"sym", "^·|·$", ""), "··")
      val pairs = vocab
        .select($"wc", explode(zip_with(
          slice(arr, lit(1), size(arr) - 1), slice(arr, lit(2), size(arr) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy($"p.l".as("lhs"), $"p.r".as("rhs"))
        .agg(sum($"wc").as("pair_count"))
      val top1 = pairs
        .orderBy($"pair_count".desc, $"lhs".asc, $"rhs".asc).limit(1)
      vocab = vocab.crossJoin(broadcast(top1))
        .select($"w", expr(
          "replace(sym, concat('·', lhs, '··', rhs, '·')," +
            " concat('·', lhs, rhs, '·'))").as("sym"), $"wc")
        .localCheckpoint()
    }
    // every symbol is wrapped ·sym·, so tokens = delimiters / 2
    val toks = vocab.select($"w",
      ((length($"sym") - length(translate($"sym", "·", ""))) / 2)
        .cast("long").as("ntok"),
      length($"w").cast("long").as("nchar"))
    corpus.join(broadcast(toks), Seq("w"))
      .groupBy($"lang")
      .agg(sum($"cnt").as("n_words"),
        sum($"cnt" * $"ntok").as("n_tokens"),
        sum($"cnt" * $"nchar").as("n_chars"))
      .select($"lang", $"n_words", $"n_tokens",
        round($"n_tokens".cast("double") / $"n_words", 6)
          .as("tokens_per_word"),
        round($"n_chars".cast("double") / $"n_tokens", 6)
          .as("chars_per_token"))
      .orderBy($"lang")
  }

  private val q152Sql = {
    def round(i: Int) =
      s"""pairs$i AS (
         |  SELECT p[1] AS lhs, p[2] AS rhs, CAST(sum(wc) AS BIGINT) AS pair_count
         |  FROM (
         |    SELECT wc, unnest(list_zip(a[1:len(a)-1], a[2:])) AS p
         |    FROM (SELECT wc, string_split(trim(sym, '·'), '··') AS a
         |          FROM vocab${i - 1}))
         |  GROUP BY 1, 2),
         |top$i AS (SELECT lhs, rhs FROM pairs$i
         |          ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
         |vocab$i AS (
         |  SELECT w, replace(sym, '·'||lhs||'··'||rhs||'·', '·'||lhs||rhs||'·') AS sym, wc
         |  FROM vocab${i - 1} CROSS JOIN top$i)""".stripMargin
    val rounds = (1 to BpeMerges).map(round).mkString(",\n")
    s"""WITH corpus AS (
       |  SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> ''
       |  GROUP BY 1, 2),
       |vocab0 AS (
       |  SELECT w, regexp_replace(w, '(.)', '·\\1·', 'g') AS sym,
       |    CAST(sum(cnt) AS BIGINT) AS wc
       |  FROM corpus
       |  GROUP BY 1, 2),
       |$rounds,
       |toks AS (
       |  SELECT w,
       |    CAST((length(sym) - length(replace(sym, '·', ''))) // 2 AS BIGINT)
       |      AS ntok,
       |    CAST(length(w) AS BIGINT) AS nchar
       |  FROM vocab$BpeMerges)
       |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
       |  CAST(sum(cnt * ntok) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(cnt * ntok) AS DOUBLE) / sum(cnt), 6) AS tokens_per_word,
       |  round(CAST(sum(cnt * nchar) AS DOUBLE) / sum(cnt * ntok), 6)
       |    AS chars_per_token
       |FROM corpus JOIN toks USING (w)
       |GROUP BY lang
       |ORDER BY lang""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q136_bpe_train", Seq("EXT-text", "A2"),
      "BPE merge training: one corpus pass, K vocabulary-local merge rounds, engine-deterministic merge table",
      q136BpeTrain, Some(q136Sql)),
    GraftQuery("q152_bpe_encode", Seq("EXT-text", "A2", "J1"),
      "BPE encode with the learned merges: vocabulary-local apply, per-language token economics",
      q152BpeEncode, Some(q152Sql)))
}
