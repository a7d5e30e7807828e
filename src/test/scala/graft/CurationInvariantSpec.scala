package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-3/4 curation operators — properties
  * the oracle hash-compare cannot establish (both engines could be wrong
  * the same way), checked directly against the operator definitions.
  */
class CurationInvariantSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q67: funnel step counts are monotonically non-increasing") {
    val users = operators.Relational.q67Funnel(spark, dir)
      .orderBy("step").collect().map(_.getLong(1))
    assert(users.length == 3)
    assert(users(0) >= users(1) && users(1) >= users(2),
      s"funnel widened: ${users.mkString(",")}")
    assert(users(0) > 0)
  }

  test("q66: clipped values sit inside the [p05, p95] band; flag is consistent") {
    import spark.implicits._
    val out = operators.Extended.q66Winsorize(spark, dir)
    // re-derive the band per type and check every clipped value within it
    val stats = Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
    val joined = out.join(stats, "event_type")
    assert(joined.filter($"clipped" < $"lo" || $"clipped" > $"hi").count() == 0)
    assert(joined.filter($"was_clipped" =!= ($"value" < $"lo" || $"value" > $"hi"))
      .count() == 0)
    // a p05/p95 clip must touch roughly 10% of rows — not 0, not half
    val n = out.count().toDouble
    val c = out.filter($"was_clipped").count().toDouble
    assert(c / n > 0.02 && c / n < 0.25, s"clip fraction ${c / n}")
  }

  test("q62: packing never exceeds budget + one document; shard_idx non-decreasing") {
    import spark.implicits._
    val out = operators.TextAnalysis.q62ShardPackSliced(spark, dir)
    val perShard = out.groupBy($"split", $"slice", $"shard_idx")
      .agg(sum($"n_tokens").as("tok"), max($"n_tokens").as("mx"))
    // greedy running-sum packing overfills a shard by at most the one
    // document that crosses the boundary
    assert(perShard.filter($"tok" >
      lit(operators.TextAnalysis.ShardTokenBudget) + $"mx").count() == 0)
    // within a (split, slice), shard_idx follows doc_id order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"split", $"slice").orderBy($"doc_id")
    assert(out.withColumn("prev", lag($"shard_idx", 1).over(w))
      .filter($"prev".isNotNull && $"shard_idx" < $"prev").count() == 0)
  }

  test("q59: every minority class keeps everything; the majority downsamples toward it") {
    import spark.implicits._
    val out = operators.TextAnalysis.q59MixtureSample(spark, dir)
    val byLang = out.groupBy($"lang").agg(
        count(lit(1)).as("n"),
        sum(when($"kept", 1L).otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val minCnt = byLang.values.map(_._1).min
    byLang.foreach { case (lang, (n, kept)) =>
      if (n == minCnt) assert(kept == n, s"$lang: min class must keep all")
      else {
        // Bernoulli at rate min/n: expected = minCnt, allow generous slack
        assert(kept <= n, s"$lang kept more than it had")
        assert(math.abs(kept - minCnt) <= math.max(8L, minCnt / 2),
          s"$lang kept $kept, target $minCnt")
      }
    }
  }

  test("q58: benchmark docs never appear; contamination threshold honored") {
    import spark.implicits._
    val out = operators.TextAnalysis.q58Decontaminate(spark, dir)
    assert(out.filter($"doc_id" % 50 === 7).count() == 0)
    assert(out.filter($"is_contaminated" =!= ($"n_shared" >= 3)).count() == 0)
    // the deliberate near-dups in the corpus guarantee real leakage exists
    assert(out.filter($"is_contaminated").count() > 0)
  }

  test("q65: exactly min(10, |source|) docs survive per source, ranks contiguous") {
    import spark.implicits._
    val out = operators.TextAnalysis.q65SourceCap(spark, dir)
    val sizes = Tables.load(spark, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val got = out.groupBy($"source").agg(
      count(lit(1)).as("kept"), max($"sample_rank").as("mxr"))
    val j = got.join(sizes, "source")
    assert(j.filter($"kept" =!= least($"n", lit(10L))).count() == 0)
    assert(j.filter($"mxr" =!= $"kept").count() == 0) // ranks 1..kept
  }

  test("q76: incremental pairs == the cross-split subset of q19's full dedup") {
    import spark.implicits._
    val inc = operators.Dedup.q76IncrementalDedup(spark, dir)
    // orientation: new side is the delta, partner is the base
    assert(inc.filter($"new_doc" % 5 =!= 0).count() == 0)
    assert(inc.filter($"dup_of" % 5 === 0).count() == 0)
    // the incremental probe must find EXACTLY the full run's pairs that
    // straddle the split — nothing missed (recall) and nothing extra
    val full = operators.Dedup.q19DedupMinhashLsh(spark, dir)
      .filter(($"doc_a" % 5 === 0) =!= ($"doc_b" % 5 === 0))
      .select(
        when($"doc_a" % 5 === 0, $"doc_a").otherwise($"doc_b").as("new_doc"),
        when($"doc_a" % 5 === 0, $"doc_b").otherwise($"doc_a").as("dup_of"))
    val got = inc.select($"new_doc", $"dup_of")
    assert(got.except(full).count() == 0 && full.except(got).count() == 0)
  }

  test("q78: kept tokens respect every language budget; the cut is a prefix") {
    import spark.implicits._
    val out = operators.TextAnalysis.q78TokenBudgetTrim(spark, dir).persist()
    try {
      val budget = when($"lang" === "en", 8000L).otherwise(50000L)
      // no kept doc's running total exceeds its language budget
      assert(out.filter($"kept" && $"cum_tokens" > budget).count() == 0)
      // prefix property: a kept doc never has a larger cum than a dropped
      // one within the same language (the greedy cut is one clean line)
      val maxKept = out.filter($"kept").groupBy($"lang")
        .agg(max($"cum_tokens").as("mk"))
      val minDrop = out.filter(!$"kept").groupBy($"lang")
        .agg(min($"cum_tokens").as("md"))
      assert(maxKept.join(minDrop, "lang").filter($"mk" >= $"md").count() == 0)
      // the over-represented language trims; at least one language keeps all
      assert(out.filter($"lang" === "en" && !$"kept").count() > 0)
      val fullLangs = out.groupBy($"lang")
        .agg((count(lit(1)) === sum(when($"kept", 1L).otherwise(0L))).as("all"))
      assert(fullLangs.filter($"all").count() > 0)
    } finally { out.unpersist(); () }
  }

  test("q79: attribution flag, gap bound, and null consistency agree") {
    import spark.implicits._
    val out = operators.Extended.q79Attribution(spark, dir)
    assert(out.filter($"attributed" &&
      ($"gap_s".isNull || $"gap_s" < 0 || $"gap_s" > 604800L)).count() == 0)
    assert(out.filter(!$"attributed" &&
      ($"click_id".isNotNull || $"gap_s".isNotNull)).count() == 0)
    assert(out.filter($"attributed").count() > 0)
  }

  test("q77: drift score is a bounded distance, near zero on stationary halves") {
    val rows = operators.Extended.q77DriftDetect(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val drift = r.getDouble(2)
      // chi-square histogram distance is bounded by 2 (disjoint supports)
      assert(drift >= 0.0 && drift <= 2.0, s"${r.getString(0)}: $drift")
      // the synthetic stream is stationary across the month halves, so a
      // large score here means the formula, not the data, drifted
      assert(drift < 0.2, s"stationary data scored ${r.getString(0)}=$drift")
    }
  }

  test("q82: rare term dominates its query; every doc scored contains a query term") {
    import spark.implicits._
    val out = operators.Retrieval.q82Bm25(spark, dir).collect()
    assert(out.nonEmpty)
    // ranks contiguous from 1 per query, scores non-increasing
    out.groupBy(_.getString(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length),
        s"$qid ranks not contiguous")
      val scores = byRank.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$qid scores increase down the ranking")
    }
    // the rare term's idf must put a dup-containing doc at rank 1
    val dupDocs = Tables.load(spark, dir, "documents")
      .filter(array_contains(split($"text", " "), "dup"))
      .select($"doc_id").as[Long].collect().toSet
    if (dupDocs.nonEmpty) {
      val top = out.filter(r => r.getString(0) == "dup-cleanup" && r.getInt(1) == 1)
      assert(top.forall(r => dupDocs.contains(r.getLong(2))),
        "rank-1 doc for the dup query lacks the rare term")
    }
  }

  test("q84: Zipf slope is negative and fitted over at most 30 ranks") {
    val rows = operators.TextAnalysis.q84ZipfProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(1) <= 30,
        s"${r.getString(0)}: n_terms ${r.getLong(1)}")
      // frequency cannot increase with rank, so the fit must slope down
      assert(r.getDouble(2) < 0.0,
        s"${r.getString(0)}: slope ${r.getDouble(2)} not negative")
    }
  }

  test("q85: flagged rows are the extreme tail, a few percent of the stream") {
    import spark.implicits._
    val out = operators.Extended.q85RobustOutliers(spark, dir)
    val n = Tables.load(spark, dir, "events").count().toDouble
    val flagged = out.count().toDouble
    assert(flagged > 0, "threshold too loose to ever fire")
    assert(flagged / n < 0.15, s"flagged ${flagged / n} of the stream")
    // every flagged value must sit beyond 3.5 robust sigmas of ITS group
    assert(out.filter(abs($"rscore") <= 3.5).count() == 0)
  }

  test("q86: each row of the transition matrix is a probability distribution") {
    import spark.implicits._
    val m = operators.Extended.q86TransitionMatrix(spark, dir).collect()
    assert(m.nonEmpty)
    m.groupBy(_.getString(0)).foreach { case (prev, rows) =>
      val probSum = rows.map(_.getDouble(4)).sum
      assert(math.abs(probSum - 1.0) < 1e-4, s"$prev row sums to $probSum")
      val total = rows.head.getLong(3)
      assert(rows.map(_.getLong(2)).sum == total,
        s"$prev: counts disagree with row_total")
    }
  }

  test("q83: chunks tile every token exactly; hashes match re-derived slices") {
    import spark.implicits._
    val chunks = operators.Retrieval.q83ChunkDocs(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = chunks.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum($"n_tok").as("tok_sum"),
        max($"n_tok").as("max_tok"))
      .collect()
    assert(got.length == docs.size, "every doc must emit chunks")
    got.foreach { r =>
      val n = docs(r.getLong(0)).toLong
      val expChunks = (n + 24 - 1) / 24  // ceil(n / stride)
      assert(r.getLong(1) == expChunks,
        s"doc ${r.getLong(0)}: ${r.getLong(1)} chunks, expected $expChunks")
      assert(r.getLong(3) <= 32, "chunk longer than ChunkLen")
      // stride 24 / len 32: each chunk covers its 24-token stride plus
      // 8 overlap except the tail => tok_sum >= n
      assert(r.getLong(2) >= n, s"doc ${r.getLong(0)} lost tokens")
    }
  }

  test("q158: containment catches a quoted subset that Jaccard misses") {
    import spark.implicits._
    // doc 1 = a long "container"; doc 2 = a verbatim excerpt of it
    // (small |A|, huge |B|: Jaccard tiny, containment(A->B) == 1.0);
    // doc 3 is unrelated filler so the df cap has a corpus to work on
    val words = (1 to 120).map(i => s"w$i")
    val container = words.mkString(" ")
    val excerpt = words.slice(20, 40).mkString(" ")
    val other = (1 to 60).map(i => s"z$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("containment").toString
    Seq((1L, container), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val rows = operators.Dedup.q158Containment(spark, tmp).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))).toMap
    val (jac, contA, contB, rel) = rows((1L, 2L))
    assert(jac < 0.6, s"excerpt pair must be invisible to Jaccard, got $jac")
    assert(contB == 1.0, s"excerpt fully contained, got $contB")
    assert(rel == "b_in_a", s"relation must classify the direction, got $rel")
    assert(contA < 0.8, "container is not contained in the excerpt")
    assert(!rows.contains((1L, 3L)) && !rows.contains((2L, 3L)),
      "unrelated doc must produce no pair")
  }

  test("q283: a bursty term disperses, an evenly spread term does not") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("burst").toString
    // "even" appears once in every doc (Poisson-like, D -> small);
    // "burst" appears 4 times in one doc only (D >> 1)
    Seq((1L, "even burst burst burst burst"), (2L, "even x"),
      (3L, "even x"), (4L, "even x"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = operators.TextAnalysis.q283TermBurstiness(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("even").getDouble(3) == 1.0, "even term: 1 per doc")
    assert(rows("burst").getDouble(3) == 4.0, "burst term: 4 per doc")
    // dispersion: even term var=0 -> D=0; burst term D = (4*16-16)/(4*4)=3
    assert(rows("even").getDouble(4) == 0.0)
    assert(rows("burst").getDouble(4) == 3.0)
    // real corpus: every term has df>0 and D >= 0
    val real = operators.TextAnalysis
      .q283TermBurstiness(spark, "/root/testdata/sf0.001").collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getDouble(4) >= 0.0 &&
      r.getDouble(3) >= 1.0))
  }

  test("q271: FORCAST grades a monosyllabic corpus at exactly grade 5") {
    import spark.implicits._
    // all-monosyllabic text: mono/words = 1 -> grade = 20 - 15 = 5;
    // a polysyllabic doc must grade HIGHER (harder)
    val tmp = java.nio.file.Files.createTempDirectory("forcast").toString
    Seq((1L, "the cat sat on the mat", "a"),
      (2L, "imagination necessitates extraordinary vocabulary", "b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = operators.TextAnalysis
      .q271ForcastReadability(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("a").getDouble(2) == 5.0,
      s"monosyllabic corpus must grade 5.0, got ${rows("a").getDouble(2)}")
    assert(rows("b").getDouble(2) == 20.0,
      "zero monosyllables must grade 20.0")
    assert(rows("b").getDouble(3) > rows("a").getDouble(3),
      "polysyllabic source must have more syllables per word")
    assert(rows("a").getDouble(4) == 0.0 && rows("b").getDouble(4) == 1.0,
      "complex-word ratio must separate the two sources")
    // and the registered query runs on the real corpus
    val real = operators.TextAnalysis
      .q271ForcastReadability(spark, "/root/testdata/sf0.001").collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getDouble(2) >= 5.0 && r.getDouble(2) <= 20.0,
      s"FORCAST grade out of [5,20]: ${r.getDouble(2)}"))
  }
}
