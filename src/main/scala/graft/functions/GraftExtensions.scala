package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer (SURVEY.md §4.2 item 4): wires the
  * engine's native Catalyst expressions into a session at BUILD time —
  * the idiomatic deployment path for an extension library:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  * Unlike `Registry.registerAll` / `VecDot.register` (temp-function
  * registration on an EXISTING session), extension-injected functions are
  * part of the session's own registry from creation, survive
  * `spark.newSession()`, and need no driver-side call in user code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: band-predicate inner joins (no equi key → Spark
    // would BNLJ/cartesian) → bucketed equi-joins; no-op until
    // spark.graft.bandJoin.bucketSize is set to a positive long
    ext.injectOptimizerRule(session => graft.plans.BandJoinRewrite(session))
    // planner strategy for the custom AsOfJoin logical node (sorted-merge
    // backward as-of join); fires only on that node
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_chunk"),
      new ExpressionInfo(
        classOf[ChunkText].getName,
        null,
        "graft_chunk",
        "_FUNC_(text, width, stride) - table-generating chunker: one row " +
          "(chunk_ix, tok_start, n_tok, chunk_text) per width-token window at " +
          "the given stride over whitespace tokens; width/stride must be integer literals",
        ""),
      (exprs: Seq[Expression]) => ChunkText.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[VecDot].getName,
        null,
        "vec_dot",
        "_FUNC_(a, b) - dot product of two array<float> vectors, accumulated in double",
        ""),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(
        classOf[SimHash64].getName,
        null,
        "simhash64",
        "_FUNC_(s) - 64-bit SimHash of a string over whitespace tokens",
        ""),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(
        classOf[MinHashSig].getName,
        null,
        "minhash_sig",
        "_FUNC_(s, k, w) - k-permutation MinHash signature (array<bigint>) over word w-shingles; k and w must be integer literals",
        ""),
      { (exprs: Seq[Expression]) =>
        def lit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig $what must be an integer literal, got $other")
        }
        MinHashSig(exprs(0), lit(exprs(1), "k"), lit(exprs(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(
        classOf[ShingleHashes].getName,
        null,
        "shingle_hashes",
        "_FUNC_(s, w) - distinct 64-bit hashes of the word w-shingles of a string; w must be an integer literal",
        ""),
      { (exprs: Seq[Expression]) =>
        val w = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes w must be an integer literal, got $other")
        }
        ShingleHashes(exprs(0), w)
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(
        classOf[HllDistinct].getName,
        null,
        "hll_distinct",
        "_FUNC_(x[, p]) - mergeable deterministic HLL approximate count-distinct (2^p registers; p an integer literal, default 12)",
        ""),
      { (exprs: Seq[Expression]) =>
        val agg = exprs match {
          case Seq(child) => HllDistinct(child)
          case Seq(child, org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) =>
            HllDistinct(child, v)
          case other => throw new IllegalArgumentException(
            s"hll_distinct expects (value[, p literal]), got $other")
        }
        agg.toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("hash64"),
      new ExpressionInfo(
        classOf[Hash64].getName, null, "hash64",
        "_FUNC_(s) - the library's deterministic 64-bit string hash", ""),
      (exprs: Seq[Expression]) => Hash64(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(
        classOf[BloomBuild].getName, null, "bloom_build",
        "_FUNC_(x, mBits, k) - mergeable Bloom filter over a column (mBits, k integer literals)", ""),
      (exprs: Seq[Expression]) => SketchFunctions.bloomFromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[BloomMightContain].getName, null, "bloom_might_contain",
        "_FUNC_(bloom, hash) - Bloom membership probe; false is definite absence", ""),
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cms_build"),
      new ExpressionInfo(
        classOf[CmsBuild].getName, null, "cms_build",
        "_FUNC_(x[, depth, width]) - mergeable Count-Min frequency sketch", ""),
      (exprs: Seq[Expression]) => SketchFunctions.cmsFromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(
        classOf[CmsEstimate].getName, null, "cms_estimate",
        "_FUNC_(cms, hash) - Count-Min frequency estimate (never under-counts)", ""),
      (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dd_quantiles"),
      new ExpressionInfo(
        classOf[DdQuantiles].getName, null, "dd_quantiles",
        "_FUNC_(x, qs[, alpha]) - DDSketch-style mergeable quantile estimates (array<double>)", ""),
      (exprs: Seq[Expression]) => SketchFunctions.ddFromExprs(exprs)))
  }
}
