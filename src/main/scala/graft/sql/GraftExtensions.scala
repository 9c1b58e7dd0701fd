package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions entry point — enable with
  * `spark.sql.extensions=graft.sql.GraftExtensions` (cluster-wide) or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Injects graft's native expressions into the function registry so SQL
  * and `call_function` resolve them like built-ins (codegen included).
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_cosine"),
      ArrayCosine.info,
      (children: Seq[Expression]) => ArrayCosine(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hash60"),
      Hash60.info,
      (children: Seq[Expression]) => Hash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_chargrams"),
      CharGrams.info,
      (children: Seq[Expression]) => CharGrams.build(children)))
    ext.injectFunction((
      FunctionIdentifier("array_sorted_intersect_count"),
      ArraySortedIntersectCount.info,
      (children: Seq[Expression]) =>
        ArraySortedIntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      JaroWinkler.info,
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      NfcNormalize.info,
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_ranges_contain"),
      SortedRangesContain.info,
      (children: Seq[Expression]) =>
        SortedRangesContain(children(0), children(1), children(2))))
  }
}
