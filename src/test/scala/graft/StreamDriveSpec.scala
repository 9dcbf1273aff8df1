package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDrive

/** The narrow-drive pin: a bounded stateful drive runs at the pinned
  * shuffle width, and the session value is restored afterwards — on the
  * happy path AND when the drive throws (a failed streaming query must not
  * leave the whole session narrow). */
class StreamDriveSpec extends AnyFunSuite {
  import TestSpark._

  private val key = "spark.sql.shuffle.partitions"

  test("pins the width for the body and restores the session value") {
    val before = spark.conf.get(key)
    val seen = StreamDrive.narrow(spark, 2)(spark.conf.get(key))
    assert(seen == "2", "body must observe the pinned width")
    assert(spark.conf.get(key) == before, "session width must be restored")
  }

  test("restores the session value when the drive throws") {
    val before = spark.conf.get(key)
    intercept[RuntimeException] {
      StreamDrive.narrow(spark, 2)(throw new RuntimeException("drive died"))
    }
    assert(spark.conf.get(key) == before,
      "a failed drive must not leave the session narrow")
  }

  test("rejects a non-positive width") {
    intercept[IllegalArgumentException] { StreamDrive.narrow(spark, 0)(()) }
  }
}
