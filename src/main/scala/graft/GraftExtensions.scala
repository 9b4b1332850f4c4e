package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{BpeSegment, ChromaFp, DHash60, DotProductDouble, Md5Bits, MinHashSig, SortedLongIntersectCount, WinnowMins}

/** Session-extension entry point: the standard way a cluster deploys
  * this library's custom Catalyst surface without code changes —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every session built from that conf resolves the library's functions
  * natively (analyzer-level, codegen'd — no UDF registry involved).
  * In-process callers can equivalently use
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * The per-session `SortedLongIntersectCount.register` temp-function
  * path stays for embedded use where the session already exists (the
  * driver harness); both bind the same expression class.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(SortedLongIntersectCount.descriptor)
    ext.injectFunction(DotProductDouble.descriptor)
    ext.injectFunction(Md5Bits.descriptor)
    ext.injectFunction(WinnowMins.descriptor)
    ext.injectFunction(DHash60.descriptor)
    ext.injectFunction(ChromaFp.descriptor)
    ext.injectFunction(BpeSegment.descriptor)
    ext.injectFunction(MinHashSig.descriptor)
  }
}
