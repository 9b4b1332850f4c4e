package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all specs: one local session, UTC, small
  * shuffle parallelism (test data is tiny). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  /** The CURRENT physical dir of a generation-swapped index table
    * (graft.ops.DirSwap) — file-layout assertions must look at the
    * committed generation a reader resolves, not the raw live path. */
  def physicalDir(path: String): java.io.File =
    new java.io.File(graft.ops.DirSwap.resolve(spark, path))
}
