package graft

import graft.functions.expressions.{CharNgrams, CosineSimilarity, DamerauLevenshtein, DotProduct, JaroWinkler, WordNgrams}
import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: register graft's native expressions
  * at session build time via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(
      (CosineSimilarity.identifier, CosineSimilarity.info, CosineSimilarity.builder))
    extensions.injectFunction(
      (DotProduct.identifier, DotProduct.info, DotProduct.builder))
    extensions.injectFunction(
      (CharNgrams.identifier, CharNgrams.info, CharNgrams.builder))
    extensions.injectFunction(
      (WordNgrams.identifier, WordNgrams.info, WordNgrams.builder))
    extensions.injectFunction(
      (JaroWinkler.identifier, JaroWinkler.info, JaroWinkler.builder))
    extensions.injectFunction(
      (DamerauLevenshtein.identifier, DamerauLevenshtein.info, DamerauLevenshtein.builder))
    // Rewrite the portable declarative cosine shape to the fused
    // codegen expression automatically.
    extensions.injectOptimizerRule(_ => plans.RewriteCosineToNative)
  }
}
