package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // ---------------------------------------------------------------- q316

  /** q316 geometry. Candidate pieces are substrings up to
    * [[UlmMaxPiece]] chars; the seed keeps the [[UlmSeedN]] most
    * frequent plus every single char (coverage); pruning keeps the
    * [[UlmVocabTarget]] highest-count multi-char pieces (single chars
    * are never pruned — SentencePiece's required-character rule); the
    * trainer runs on the [[UlmTrainWords]] most frequent word types ≤
    * [[UlmMaxWordLen]] chars (the standard trainer input is a
    * frequency-cut word table, which also bounds every lattice frame
    * by the LANGUAGE, not the corpus). [[UlmRounds]] squaring rounds
    * give the (I+A)^16 closure — enough for any ≤ 16-edge path.
    */
  val UlmMaxPiece = 6
  val UlmSeedN = 256
  val UlmVocabTarget = 64
  val UlmTrainWords = 5000
  val UlmMaxWordLen = 16
  val UlmRounds = 4

  /** One lattice edge of the unigram trainer's per-word Viterbi: word,
    * corpus weight, word length, span [a, b), the piece it spells, and
    * the piece's pinned probability.
    */
  final case class UlmEdge(
      w: String, wc: Long, wl: Int, a: Int, b: Int, piece: String, p: Double)

  /** q316: UNIGRAM-LM TOKENIZER TRAINER (Kudo 2018, SentencePiece's
    * second model next to BPE q136/q153) — the tokenizer family's
    * missing member (VERDICT r11 "What's missing" #3). Viterbi hard-EM
    * over the candidate-piece lattice of every word type:
    *
    *  - E-step: each word's BEST segmentation under current piece
    *    probabilities. The lattice DP is not run positionally —
    *    max-product path weight is an idempotent semiring, so the
    *    whole per-word DP is the matrix closure (I+A)^(2^k) computed
    *    by [[UlmRounds]] SQUARING rounds of one keyed join + one
    *    (max)-aggregation each: log(maxlen) rounds instead of a
    *    per-position sweep, every frame bounded by word-type count ×
    *    len². Identity (pause) steps multiply by 1.0 — exact, and
    *    harmless under max. An edge is ON an optimal path iff
    *    (f[a]·p)·g[b] = Z with f/g/Z read from the SAME closure (row
    *    0 / column len / corner) — every float on both sides of that
    *    equality is produced by the identical operation tree in
    *    Spark and DuckDB (products inside max-aggregations, then one
    *    pinned two-multiply chain), so the comparison is
    *    engine-deterministic; ties credit every co-optimal edge once
    *    (uniform edge credit across co-optimal segmentations — the
    *    hard-EM analogue of lattice expected counts).
    *  - M-step: piece count = Σ word-freq over its optimal edges
    *    (exact long sums), probability = round(cnt/total, 12) — the
    *    q313 pinning discipline.
    *  - Prune after iteration 1 (vocab shrinks monotonically —
    *    [[graft.UnigramLmSpec]] locks it), then one more iteration on
    *    the pruned vocabulary.
    *
    * Corpus-sized work is ONE word-count aggregation (q136's shape);
    * everything after runs on the frequency-cut type table. Output:
    * the final vocabulary with use counts and pinned probabilities.
    */
  def q316UnigramLm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // round 12: the trainer runs once per corpus fingerprint inside the
    // [[UlmIndex]] artifact build (tokenizers are trained once and
    // shipped — the SuffixIndex/SemCodebook posture); q316 reads the
    // committed vocabulary and its oracle still replays the full
    // trainer relationally per gate run. q318 encodes with the same
    // artifact.
    UlmIndex.vocab(s, dir)
      .select($"piece", $"cnt".as("n_uses"), $"p".as("prob"))
      .orderBy($"piece")
  }

  /** The full trainer over an explicit (doc_id, text) frame — the seam
    * [[UlmIndex.build]] shares with q316's oracle contract. Returns the
    * final vocabulary (piece, cnt, p) with pinned probabilities.
    */
  private[operators] def unigramTrain(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    // all three vocabulary cuts below are CONSTANT-bounded (TrainWords /
    // SeedN / VocabTarget), so they are orderBy().limit() TakeOrdered
    // heaps — the ivfCodebookOf shape — never a global rank
    val words = docs
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") >= 1 && length($"w") <= UlmMaxWordLen)
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .orderBy($"wc".desc, $"w".asc).limit(UlmTrainWords)
      .select($"w", $"wc", length($"w").as("wl"))
      .persist()
    // seed: every substring occurrence ≤ UlmMaxPiece chars, corpus-weighted
    val occ = words
      .select($"w", $"wc", $"wl", explode(sequence(lit(1), $"wl")).as("i"))
      .select($"wc",
        explode(sequence(lit(1), least(lit(UlmMaxPiece), $"wl" - $"i" + 1))).as("l"),
        $"w", $"i")
      .select(expr("substring(w, i, l)").as("piece"), $"wc")
    val pieceCnt = occ.groupBy($"piece").agg(sum($"wc").as("cnt")).persist()
    val seed = pieceCnt
      .orderBy($"cnt".desc, $"piece".asc).limit(UlmSeedN)
      .unionByName(pieceCnt.filter(length($"piece") === 1))
      .distinct() // a single char inside the top-SeedN would union twice
      .persist()

    // (piece, cnt) → (piece, p): pinned normalization (scalar-attach)
    def probsOf(cnts: DataFrame): DataFrame = {
      val tot = cnts.agg(sum($"cnt").as("tot"))
      cnts.crossJoin(broadcast(tot))
        .select($"piece",
          round($"cnt".cast("double") / $"tot".cast("double"), 12).as("p"))
    }

    // One Viterbi-EM iteration: vocab (piece, p) → optimal-edge counts.
    //
    // Round 13 REWRITE (ADVICE r12, validated at 10× scale): the first
    // cut recovered optimal edges by testing (fv·p)·gv === zv over a
    // balanced squaring-round closure — two differently-parenthesized
    // FP product trees. The position-cover guard added for that hazard
    // FIRED on the 10× scale-smoke corpus (183 word positions lost
    // every co-optimal edge to ulp non-associativity), so the recovery
    // is now ASSOCIATION-INDEPENDENT by construction: a per-word
    // topological Viterbi where f(j) is the max over single-multiply
    // candidates f(a)·p — the stored max IS one of those candidate
    // doubles — and both the backward on-path markers and the credit
    // test compare f(a)·p against f(b) as the IDENTICAL operation tree.
    // No equality ever spans two parenthesizations, so no ulp can drop
    // (or admit) an edge. The lattice is bounded (≤ MaxWordLen
    // positions × ≤ MaxPiece lengths ≤ 96 edges over ≤ TrainWords
    // types), so the per-word DP is exactly the per-element scalar work
    // the mapGroups/mapPartitions family exists for — and one
    // groupByKey shuffle replaces the old closure's four squaring
    // joins. The oracle replays the same DP as MaxWordLen relaxation
    // rounds + backward marker rounds (identical candidate sets ⇒
    // identical doubles ⇒ identical credited sets, cross-engine).
    def emIter(vocab: DataFrame): DataFrame = {
      val edges = words
        .select($"w", $"wc", $"wl", explode(sequence(lit(0), $"wl" - 1)).as("a"))
        .select($"w", $"wc", $"wl", $"a",
          explode(sequence(lit(1), least(lit(UlmMaxPiece), $"wl" - $"a"))).as("l"))
        .select($"w", $"wc", $"wl", $"a", ($"a" + $"l").as("b"),
          expr("substring(w, a + 1, l)").as("piece"))
        .join(vocab, Seq("piece"))
        .select($"w", $"wc", $"wl".cast("int").as("wl"), $"a".cast("int").as("a"),
          $"b".cast("int").as("b"), $"piece", $"p")
        .as[UlmEdge]
      val credited = edges.groupByKey(_.w).flatMapGroups { (w, it) =>
        val es = it.toArray
        val wl = es.head.wl
        // forward: positions are a DAG in ascending order, so one
        // topological pass gives final f(j) from already-final f(a);
        // -1 marks unreachable (every real path value is ≥ 0)
        val f = Array.fill(wl + 1)(-1.0)
        f(0) = 1.0
        var j = 1
        while (j <= wl) {
          var best = -1.0
          es.foreach { e =>
            if (e.b == j && f(e.a) >= 0) {
              val c = f(e.a) * e.p
              if (c > best) best = c
            }
          }
          f(j) = best
          j += 1
        }
        // backward: node j is on some optimal path iff an edge (j, k)
        // to an on-path k achieves f(k) exactly — the single-multiply
        // identical-tree test
        val on = Array.fill(wl + 1)(false)
        on(wl) = f(wl) >= 0
        var i = wl - 1
        while (i >= 0) {
          on(i) = es.exists(e =>
            e.a == i && on(e.b) && f(e.a) >= 0 && f(e.a) * e.p == f(e.b))
          i -= 1
        }
        def onPath(e: UlmEdge): Boolean =
          on(e.b) && f(e.a) >= 0 && f(e.a) * e.p == f(e.b)
        // loud tripwire (ADVICE r12): with identical-tree equalities the
        // cover is complete by construction (the stored max is one of
        // its candidates); if this ever fires, the recovery regressed
        if (f(wl) >= 0) {
          val cov = Array.fill(wl)(false)
          es.foreach(e => if (onPath(e)) {
            var k = e.a; while (k < e.b) { cov(k) = true; k += 1 }
          })
          require(cov.forall(identity),
            s"unigram EM: word '$w' has positions no credited edge covers " +
              "- the association-independent recovery invariant broke")
        }
        es.iterator.filter(onPath).map(e => (e.piece, e.wc))
      }.toDF("piece", "wc")
      credited.groupBy($"piece").agg(sum($"wc").as("cnt"))
        .localCheckpoint()
    }

    val c1 = emIter(probsOf(seed)).persist()
    val vocab2Cnt = c1.filter(length($"piece") > 1)
      .orderBy($"cnt".desc, $"piece".asc).limit(UlmVocabTarget)
      .select($"piece", $"cnt")
      .unionByName(seed.filter(length($"piece") === 1).select($"piece")
        .join(c1, Seq("piece"), "left")
        .select($"piece", coalesce($"cnt", lit(0L)).as("cnt")))
    val c2 = emIter(probsOf(vocab2Cnt)).persist()
    val tot2 = c2.agg(sum($"cnt").as("tot"))
    c2.crossJoin(broadcast(tot2))
      .select($"piece", $"cnt",
        round($"cnt".cast("double") / $"tot".cast("double"), 12).as("p"))
  }

  /** The oracle replays the identical trainer: same seed ranks, the
    * same per-word Viterbi as MaxWordLen relaxation + backward marker
    * rounds (generated CTE blocks, MATERIALIZED so each level evaluates
    * once), same identical-tree equalities and normalizations.
    */
  private def q316Sql: String =
    s"""WITH $ulmTrainCtes
      |SELECT piece, cnt AS n_uses,
      |  round(CAST(cnt AS DOUBLE) /
      |        CAST((SELECT sum(cnt) FROM cnt2) AS DOUBLE), 12) AS prob
      |FROM cnt2
      |ORDER BY piece""".stripMargin

  /** The trainer's full relational chain through `cnt2` (the final
    * counts) — shared by q316's and q318's oracles.
    */
  private def ulmTrainCtes: String = {
    def emBlock(i: Int, vocabCte: String): String = {
      // forward Viterbi as MaxWordLen relaxation rounds: after round r,
      // f(j ≤ r) is final (lattice edges only go forward), and the
      // final f(j) is the max over EXACTLY the single-multiply
      // candidates fa·p the Spark DP sees — identical doubles, so the
      // identical-tree on-path equalities below decide identically
      val fRounds = (1 to UlmMaxWordLen).map { k =>
        s"""f${i}_$k AS MATERIALIZED (
          |  SELECT n.w, n.j,
          |    greatest(n.fv, coalesce(max(
          |      CASE WHEN fa.fv >= 0 THEN fa.fv * e.p END), -1e0)) AS fv
          |  FROM f${i}_${k - 1} n
          |  LEFT JOIN edges$i e ON e.w = n.w AND e.b = n.j
          |  LEFT JOIN f${i}_${k - 1} fa ON fa.w = e.w AND fa.j = e.a
          |  GROUP BY n.w, n.j, n.fv)""".stripMargin
      }.mkString(",\n")
      val fL = s"f${i}_$UlmMaxWordLen"
      // backward on-path markers: ≤ MaxWordLen edges per path
      val onRounds = (1 to UlmMaxWordLen).map { k =>
        s"""on${i}_$k AS MATERIALIZED (
          |  SELECT w, j FROM on${i}_${k - 1}
          |  UNION
          |  SELECT e.w, e.a AS j
          |  FROM edges$i e
          |  JOIN on${i}_${k - 1} o ON o.w = e.w AND o.j = e.b
          |  JOIN $fL fa ON fa.w = e.w AND fa.j = e.a
          |  JOIN $fL fb ON fb.w = e.w AND fb.j = e.b
          |  WHERE fa.fv >= 0 AND fa.fv * e.p = fb.fv)""".stripMargin
      }.mkString(",\n")
      s"""pos$i AS (
        |  SELECT w, wc, wl, unnest(generate_series(0, wl - 1)) AS a FROM words),
        |edges$i AS MATERIALIZED (
        |  SELECT e.w, e.wc, e.wl, e.a, e.b, e.piece, v.p
        |  FROM (SELECT p.w, p.wc, p.wl, p.a, p.a + l.l AS b,
        |          substr(p.w, CAST(p.a + 1 AS INT), CAST(l.l AS INT)) AS piece
        |        FROM pos$i p
        |        CROSS JOIN (SELECT unnest(generate_series(1, $UlmMaxPiece)) AS l) l
        |        WHERE p.a + l.l <= p.wl) e
        |  JOIN $vocabCte v USING (piece)),
        |f${i}_0 AS MATERIALIZED (
        |  SELECT w, d.j, CASE WHEN d.j = 0 THEN 1e0 ELSE -1e0 END AS fv
        |  FROM (SELECT w, unnest(generate_series(0, wl)) AS j FROM words) d),
        |$fRounds,
        |on${i}_0 AS MATERIALIZED (
        |  SELECT f.w, f.j FROM $fL f JOIN words USING (w)
        |  WHERE f.j = wl AND f.fv >= 0),
        |$onRounds,
        |cnt$i AS MATERIALIZED (
        |  SELECT e.piece, CAST(sum(e.wc) AS BIGINT) AS cnt
        |  FROM edges$i e
        |  JOIN on${i}_$UlmMaxWordLen o ON o.w = e.w AND o.j = e.b
        |  JOIN $fL fa ON fa.w = e.w AND fa.j = e.a
        |  JOIN $fL fb ON fb.w = e.w AND fb.j = e.b
        |  WHERE fa.fv >= 0 AND fa.fv * e.p = fb.fv
        |  GROUP BY 1)""".stripMargin
    }
    s"""wraw AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS wc, len(w) AS wl
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) u
      |  WHERE len(w) >= 1 AND len(w) <= $UlmMaxWordLen
      |  GROUP BY w),
      |words AS MATERIALIZED (
      |  SELECT w, wc, wl FROM (
      |    SELECT *, row_number() OVER (ORDER BY wc DESC, w ASC) AS wr FROM wraw)
      |  WHERE wr <= $UlmTrainWords),
      |occ AS (
      |  SELECT substr(p.w, CAST(p.i AS INT), CAST(l.l AS INT)) AS piece, p.wc
      |  FROM (SELECT w, wc, wl, unnest(generate_series(1, wl)) AS i FROM words) p
      |  CROSS JOIN (SELECT unnest(generate_series(1, $UlmMaxPiece)) AS l) l
      |  WHERE p.i + l.l - 1 <= p.wl),
      |pc AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM occ GROUP BY 1),
      |seed AS MATERIALIZED (
      |  SELECT piece, cnt FROM (
      |    SELECT *, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS pr FROM pc)
      |  WHERE pr <= $UlmSeedN OR len(piece) = 1),
      |vocab1 AS (
      |  SELECT piece,
      |    round(CAST(cnt AS DOUBLE) /
      |          CAST((SELECT sum(cnt) FROM seed) AS DOUBLE), 12) AS p
      |  FROM seed),
      |${emBlock(1, "vocab1")},
      |v2base AS MATERIALIZED (
      |  SELECT piece, cnt FROM (
      |    SELECT *, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS cr
      |    FROM cnt1 WHERE len(piece) > 1)
      |  WHERE cr <= $UlmVocabTarget
      |  UNION ALL
      |  SELECT s.piece, coalesce(c.cnt, 0) AS cnt
      |  FROM seed s LEFT JOIN cnt1 c USING (piece)
      |  WHERE len(s.piece) = 1),
      |vocab2 AS (
      |  SELECT piece,
      |    round(CAST(cnt AS DOUBLE) /
      |          CAST((SELECT sum(cnt) FROM v2base) AS DOUBLE), 12) AS p
      |  FROM v2base),
      |${emBlock(2, "vocab2")}""".stripMargin
  }

  // ---------------------------------------------------------------- q318

  /** q318: UNIGRAM-LM ENCODE — the apply side of q316 (what q152 is to
    * q136): every distinct corpus word ≤ [[UlmMaxWordLen]] chars is
    * Viterbi-segmented under the COMMITTED [[UlmIndex]] vocabulary and
    * the per-language token economics (tokens/word, chars/token — the
    * numbers that price a training run) roll up from the type table.
    * The best segmentation's TOKEN COUNT needs a deterministic
    * tie-break among co-optimal paths, so the closure runs in the
    * tropical-LEX semiring: entries carry (v, −ntok) structs, multiply
    * is (product, sum), and the max is lexicographic — probability
    * first, then FEWEST tokens (struct max; associative, so the same
    * [[UlmRounds]] squaring rounds apply, and DuckDB's struct max
    * reproduces the order exactly). A word whose every segmentation
    * has pinned probability 0 (all its pieces pruned to zero mass)
    * still encodes — all path values tie at 0.0 and the lex tie-break
    * picks the fewest-token cover, identically in both engines.
    * Corpus-sized work is ONE (lang, word)-count scan; the closure is
    * vocabulary-sized.
    *
    * Unencodable words are DROPPED, by design (ADVICE r12): a corpus
    * word containing a character the trained vocabulary has no piece
    * for (possible — single-char coverage comes only from the
    * frequency-cut [[UlmTrainWords]] types) has no lattice path, so the
    * inner join on `enc` excludes it from every per-language count.
    * SentencePiece would emit `<unk>` and count it; these economics
    * price only the encodable mass. The drop is deterministic and
    * mirrored exactly in the oracle (same inner join), so the gate
    * hashes the same statistic both sides.
    */
  def q318UnigramEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    unigramEconomics(s, dir)
      .select($"lang", $"n_words", $"n_tokens",
        round($"n_tokens".cast("double") / $"n_words", 6).as("tokens_per_word"),
        round($"n_chars".cast("double") / $"n_tokens", 6).as("chars_per_token"))
      .orderBy($"lang")
  }

  /** (lang, n_words, n_tokens, n_chars) over the encodable corpus words
    * under the committed [[UlmIndex]] vocabulary — q318's economics
    * aggregate, factored so q324 (tokenizer-true UniMax) prices its
    * budget from the SAME table q318 reports.
    */
  private[operators] def unigramEconomics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = UlmIndex.vocab(s, dir).select($"piece", $"p")
    val lw = t(s, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("w"))
      .filter(length($"w") >= 1 && length($"w") <= UlmMaxWordLen)
      .groupBy($"lang", $"w").agg(count(lit(1)).as("cnt"))
      .persist()
    val ewords = lw.select($"w").distinct()
      .withColumn("wl", length($"w")).persist()
    val edges = ewords
      .select($"w", $"wl", explode(sequence(lit(0), $"wl" - 1)).as("a"))
      .select($"w", $"wl", $"a",
        explode(sequence(lit(1), least(lit(UlmMaxPiece), $"wl" - $"a"))).as("l"))
      .select($"w", $"a", ($"a" + $"l").as("b"),
        expr("substring(w, a + 1, l)").as("piece"))
      .join(vocab, Seq("piece"))
    var m = edges
      .select($"w", $"a".as("i"), $"b".as("j"),
        struct($"p".as("v"), lit(-1).as("nt")).as("m"))
      .unionByName(ewords
        .select($"w", explode(sequence(lit(0), $"wl")).as("i"))
        .select($"w", $"i", $"i".as("j"),
          struct(lit(1.0).as("v"), lit(0).as("nt")).as("m")))
      .localCheckpoint()
    for (k <- 1 to UlmRounds) {
      val sq = m.as("x").join(m.as("y"),
          col("x.w") === col("y.w") && col("x.j") === col("y.i"))
        .select(col("x.w").as("w"), col("x.i").as("i"), col("y.j").as("j"),
          struct((col("x.m.v") * col("y.m.v")).as("v"),
            (col("x.m.nt") + col("y.m.nt")).as("nt")).as("m"))
        .groupBy($"w", $"i", $"j").agg(max($"m").as("m"))
      m = if (k % 2 == 0 || k == UlmRounds) sq.localCheckpoint() else sq
    }
    val enc = m.join(ewords, Seq("w"))
      .filter($"i" === 0 && $"j" === $"wl")
      .select($"w", (-$"m.nt").cast("long").as("ntok"),
        $"wl".cast("long").as("nchar"))
    lw.join(enc, Seq("w"))
      .groupBy($"lang")
      .agg(sum($"cnt").as("n_words"),
        sum($"cnt" * $"ntok").as("n_tokens"),
        sum($"cnt" * $"nchar").as("n_chars"))
  }

  private def q318Sql: String =
    s"""WITH $ulmEncodeCtes
      |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
      |  CAST(sum(cnt * ntok) AS BIGINT) AS n_tokens,
      |  round(CAST(sum(cnt * ntok) AS DOUBLE) /
      |        CAST(sum(cnt) AS DOUBLE), 6) AS tokens_per_word,
      |  round(CAST(sum(cnt * len(w)) AS DOUBLE) /
      |        CAST(sum(cnt * ntok) AS DOUBLE), 6) AS chars_per_token
      |FROM lw JOIN enc USING (w)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** The encode chain through `lw` (per-language word-type counts) and
    * `enc` (per-word optimal token counts) — shared by q318's and
    * q324's oracles.
    */
  private def ulmEncodeCtes: String = {
    val rounds = (1 to UlmRounds).map { k =>
      s"""e$k AS MATERIALIZED (
        |  SELECT x.w, x.i, y.j,
        |    max(struct_pack(v := x.m.v * y.m.v, nt := x.m.nt + y.m.nt)) AS m
        |  FROM e${k - 1} x JOIN e${k - 1} y ON x.w = y.w AND x.j = y.i
        |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    s"""$ulmTrainCtes,
      |vocabF AS (
      |  SELECT piece,
      |    round(CAST(cnt AS DOUBLE) /
      |          CAST((SELECT sum(cnt) FROM cnt2) AS DOUBLE), 12) AS p
      |  FROM cnt2),
      |lw AS (
      |  SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) u
      |  WHERE len(w) >= 1 AND len(w) <= $UlmMaxWordLen
      |  GROUP BY 1, 2),
      |ew AS (SELECT w, len(w) AS wl FROM (SELECT DISTINCT w FROM lw)),
      |epos AS (SELECT w, wl, unnest(generate_series(0, wl - 1)) AS a FROM ew),
      |eed AS MATERIALIZED (
      |  SELECT e.w, e.a, e.b, v.p
      |  FROM (SELECT p.w, p.a, p.a + l.l AS b,
      |          substr(p.w, CAST(p.a + 1 AS INT), CAST(l.l AS INT)) AS piece
      |        FROM epos p
      |        CROSS JOIN (SELECT unnest(generate_series(1, $UlmMaxPiece)) AS l) l
      |        WHERE p.a + l.l <= p.wl) e
      |  JOIN vocabF v USING (piece)),
      |e0 AS MATERIALIZED (
      |  SELECT w, a AS i, b AS j, struct_pack(v := p, nt := -1) AS m FROM eed
      |  UNION ALL
      |  SELECT w, d.i, d.i, struct_pack(v := 1e0, nt := 0)
      |  FROM (SELECT w, unnest(generate_series(0, wl)) AS i FROM ew) d),
      |$rounds,
      |enc AS (
      |  SELECT m.w, CAST(-(m.m.nt) AS BIGINT) AS ntok
      |  FROM e$UlmRounds m JOIN ew USING (w)
      |  WHERE m.i = 0 AND m.j = wl)""".stripMargin
  }

  // ---------------------------------------------------------------- q324

  /** q324: TOKENIZER-TRUE UNIMAX ALLOCATION (VERDICT r12 "Next round"
    * #7) — q309 waterfills per-language budgets priced in WHITESPACE
    * words; a real pretraining run buys TRAINED-TOKENIZER tokens, and
    * the two currencies diverge per language exactly by q318's
    * tokens_per_word. This query re-runs q309's closed-form
    * waterfilling (capacity = [[Curation.UniMaxEpochs]] × tokens,
    * budget = 1.5× corpus, capped languages form a provable prefix of
    * the capacity sort) over [[unigramEconomics]] — the per-language
    * token masses the committed [[UlmIndex]] vocabulary actually
    * yields — so the allocation is in the units the cluster bills.
    * n_words/n_tokens are BY CONSTRUCTION q318's own totals (same
    * frame), which [[graft.UnigramLmSpec]] asserts; the solver is
    * |langs|-sized, the corpus-sized work is q318's one (lang,
    * word)-count scan, and the closure is vocabulary-bounded.
    */
  def q324TokenizerUnimax(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perLang = unigramEconomics(s, dir)
      .select($"lang", $"n_words", $"n_tokens").persist()
    val tot = perLang.agg(sum($"n_tokens"), count(lit(1))).head()
    val budget = tot.getLong(0) * 3 / 2
    val nLang = tot.getLong(1)
    val wSort = Window.orderBy($"capacity".asc, $"lang".asc)
    val flagged = perLang
      .withColumn("capacity", $"n_tokens" * Curation.UniMaxEpochs)
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
      .select($"lang", $"n_words", $"n_tokens", $"capacity", $"capped",
        round(when($"capped", $"capacity".cast("double"))
          .otherwise((lit(budget) - $"capped_sum").cast("double") /
            (lit(nLang) - $"n_capped")), 4).as("alloc_tokens"))
      .withColumn("epochs_used", round($"alloc_tokens" / $"n_tokens", 6))
      .withColumn("tokens_per_word",
        round($"n_tokens".cast("double") / $"n_words", 6))
      .orderBy($"lang")
  }

  private def q324Sql: String = {
    val E = Curation.UniMaxEpochs
    s"""WITH $ulmEncodeCtes,
      |econ AS (
      |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
      |    CAST(sum(cnt * ntok) AS BIGINT) AS n_tokens
      |  FROM lw JOIN enc USING (w) GROUP BY lang),
      |b AS (SELECT CAST(sum(n_tokens) AS BIGINT) * 3 // 2 AS budget,
      |             CAST(count(*) AS BIGINT) AS l FROM econ),
      |srt AS (
      |  SELECT lang, n_words, n_tokens, $E * n_tokens AS capacity,
      |    CAST(row_number() OVER (ORDER BY $E * n_tokens, lang)
      |      AS BIGINT) AS i,
      |    sum($E * n_tokens) OVER (
      |      ORDER BY $E * n_tokens, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
      |  FROM econ),
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
      |SELECT lang, n_words, n_tokens, capacity, capped,
      |  round(CASE WHEN capped THEN CAST(capacity AS DOUBLE)
      |    ELSE CAST(budget - capped_sum AS DOUBLE) / (l - n_capped) END, 4)
      |    AS alloc_tokens,
      |  round(round(CASE WHEN capped THEN CAST(capacity AS DOUBLE)
      |    ELSE CAST(budget - capped_sum AS DOUBLE) / (l - n_capped) END, 4)
      |    / n_tokens, 6) AS epochs_used,
      |  round(CAST(n_tokens AS DOUBLE) / n_words, 6) AS tokens_per_word
      |FROM flag CROSS JOIN cs
      |ORDER BY lang""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q324_tokenizer_unimax", Seq("EXT-text", "A2", "W2"),
      "tokenizer-true UniMax: q309's closed-form waterfilling re-priced in trained-tokenizer tokens from the committed unigram vocabulary's per-language economics",
      q324TokenizerUnimax, Some(q324Sql)),
    GraftQuery("q318_unigram_encode", Seq("EXT-text", "A2", "J1"),
      "unigram-LM encode with the committed vocabulary: tropical-lex (probability, fewest-tokens) matrix-closure Viterbi, per-language token economics",
      q318UnigramEncode, Some(q318Sql)),
    GraftQuery("q136_bpe_train", Seq("EXT-text", "A2"),
      "BPE merge training: one corpus pass, K vocabulary-local merge rounds, engine-deterministic merge table",
      q136BpeTrain, Some(q136Sql)),
    GraftQuery("q152_bpe_encode", Seq("EXT-text", "A2", "J1"),
      "BPE encode with the learned merges: vocabulary-local apply, per-language token economics",
      q152BpeEncode, Some(q152Sql)),
    GraftQuery("q316_unigram_lm", Seq("EXT-text", "A2"),
      "unigram-LM (SentencePiece) tokenizer trainer: Viterbi hard-EM over the piece lattice via max-product matrix-closure squaring rounds, prune + retrain, pinned probabilities",
      q316UnigramLm, Some(q316Sql)))
}
