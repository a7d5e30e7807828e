package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector — the deployment-grade registration
  * path for the engine's native expressions (SURVEY.md §2.10 preference
  * order (c): whole-session extension points). Where
  * [[NativeExpressions.registerAll]] mutates one live session's registry,
  * this class is wired by CONFIG so every session in a cluster gets the
  * functions without any application code:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (builder: `.withExtensions(new GraftExtensions)` — tested in
  * ExtensionsSpec.) Each function is injected with an ExpressionInfo so
  * `DESCRIBE FUNCTION` documents it like a builtin.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int =
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Number].intValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    import NativeExpressions._
    ext.injectOptimizerRule(_ => GraftRules.DotProductRewrite)
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[NativeExpressions.type].getName, null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, k) - whitespace word k-grams"),
      (es: Seq[Expression]) => WordShingles(es.head, intArg(es(1)))))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, n) - n md5 min-hashes"),
      (es: Seq[Expression]) => MinHashSignature(es.head, intArg(es(1)))))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(tokens) - 32-bit SimHash"),
      (es: Seq[Expression]) => SimHashN(es.head, 32)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash"),
      (es: Seq[Expression]) => SimHashN(es.head, 64)))
    ext.injectFunction((FunctionIdentifier("cosine_lsh_signature"),
      info("cosine_lsh_signature",
        "cosine_lsh_signature(vec, planes) - random-hyperplane sign bits"),
      (es: Seq[Expression]) => CosineLshSignature(es.head, intArg(es(1)))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential-fold dot product"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("quantize_stats"),
      info("quantize_stats",
        "quantize_stats(vec) - int8 symmetric quantization statistics"),
      (es: Seq[Expression]) => QuantizeStats(es.head)))
    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(items) - per-row multiset statistics"),
      (es: Seq[Expression]) => RepetitionStats(es.head)))
    // aggregate builders return the bare AggregateFunction — the
    // analyzer wraps it into an AggregateExpression, same as builtins
    ext.injectFunction((FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "misra_gries(key, k) - mergeable heavy-hitters summary"),
      (es: Seq[Expression]) =>
        SketchAggregates.MisraGries(es.head, intArg(es(1)))))
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(key, items, bits) - distributed bloom build over xxhash64(key)"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(es.head)),
          es(1), es(2), 0, 0)))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain",
        "might_contain(bloom, key) - bloom membership probe (no false negatives)"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          es.head,
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(es(1))))))
  }
}
