package graft

import graft.sources.Tables
import org.apache.spark.sql.types.TimestampType

/** Environment pin (round-8 regression follow-up): Spark 4.1's parquet
  * reader surfaces `events.ts` as TIMESTAMP_NTZ, whose numeric casts the
  * analyzer rejects — that single inference change silently broke the EDW
  * family at the driver. Pin the two facts the driver contract depends on,
  * under a session carrying Verify.scala's exact runtime confs, so the next
  * type-inference change fails here in `sbt test`, not in the driver's
  * CORRECTNESS run. */
class EnvPinSpec extends SparkSpec {

  // Verify.scala builds its own session; replicate its SQL confs on an
  // isolated newSession() (the SparkContext is JVM-wide, SQL confs are
  // per-session, so this is a faithful stand-in for the driver's setup).
  private lazy val verifyLike = {
    val s = SparkSpec.spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.legacy.sizeOfNull", "false")
    s
  }

  test("events.ts loads as TimestampType (LTZ) — never NTZ or raw long") {
    assert(Tables.events(verifyLike, sf).schema("ts").dataType == TimestampType)
  }

  test("entry() returns rows under the Verify session configuration") {
    assert(SparkEntry.entry(verifyLike).count() > 0)
  }
}
