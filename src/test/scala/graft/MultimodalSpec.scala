package graft

import graft.functions.Multimodal
import graft.functions.Multimodal.{MediaRecord, DecodedMedia}

class MultimodalSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("decode stub: deterministic metadata from byte length") {
    val r = MediaRecord(1L, "img/test", "abcd".getBytes("UTF-8"))
    val d = Multimodal.decodeStub(r)
    assert(d == DecodedMedia(1L, "img/test", 4L, 64 + 28 % 513, 64 + 52 % 513, 1 + 4 % 3))
    // same payload -> same decode (no hidden state)
    assert(Multimodal.decodeStub(r) == d)
  }

  test("feature stub: 8-dim, values in [0,1), deterministic") {
    val f = Multimodal.featureStub(MediaRecord(2L, "img/x", new Array[Byte](123)))
    assert(f.feature.length == Multimodal.FeatureDim)
    assert(f.feature.forall(v => v >= 0.0 && v < 1.0))
    assert(f.feature(0) == ((123L * 7) % 1000) / 1000.0)
  }

  test("resize stub: exact target size, cycles source bytes, empty-safe") {
    val out = Multimodal.resizeStub(Array[Byte](1, 2, 3), 7)
    assert(out.toSeq == Seq[Byte](1, 2, 3, 1, 2, 3, 1))
    assert(Multimodal.resizeStub(Array.emptyByteArray, 4).toSeq == Seq[Byte](0, 0, 0, 0))
  }

  test("frame sample stub: n equal frames, remainder dropped, short-payload-safe") {
    val frames = Multimodal.frameSampleStub(Array[Byte](1, 2, 3, 4, 5, 6, 7), 3)
    assert(frames.map(_.toSeq) == Seq(Seq[Byte](1, 2), Seq[Byte](3, 4), Seq[Byte](5, 6)))
    assert(Multimodal.frameSampleStub(Array[Byte](1), 3).isEmpty)
    assert(Multimodal.frameSampleStub(Array[Byte](1, 2), 0).isEmpty)
    assert(Multimodal.frameSampleStub(Array[Byte](1, 2), -1).isEmpty)
    assert(Multimodal.resizeStub(Array[Byte](1), -4).isEmpty)
  }

  test("dataset plumbing: binary payloads decode per-partition, rows preserved") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val media = Multimodal.mediaFromDocuments(docs).repartition(4)
    assert(media.rdd.getNumPartitions == 4)
    val decoded = Multimodal.decodeAll(media)
    assert(decoded.count() == docs.count())
    // payload bytes == utf-8 text bytes for a spot row
    val row = media.filter(_.doc_id == 0L).head()
    val txt = docs.filter($"doc_id" === 0L).select("text").as[String].head()
    assert(row.payload.toSeq == txt.getBytes("UTF-8").toSeq)
  }
}
