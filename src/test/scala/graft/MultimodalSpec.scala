package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

class MultimodalSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq((1L, "abcd" * 100), (2L, "xy")).toDF("doc_id", "text")
  }

  test("binary payload column carries the exact bytes (ASCII: len == chars)") {
    val rows = MultimodalOps.mediaMeta(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("byte_len") == 400L)
    assert(rows(2L).getAs[Long]("byte_len") == 2L)
  }

  test("stub decode is deterministic and keeps the batch shape") {
    val m1 = MultimodalOps.decodeMeta(MultimodalOps.withMediaPayload(docs)).collect()
    val m2 = MultimodalOps.decodeMeta(MultimodalOps.withMediaPayload(docs)).collect()
    assert(m1.map(_.checksum).toSeq == m2.map(_.checksum).toSeq)
    assert(m1.forall(m => m.width >= 16 && m.height >= 16))
    assert(m1.map(_.doc_id).toSet == Set(1L, 2L))
  }

  test("stub resize emits exactly thumbBytes, deterministic, zero-pad for empty") {
    val t = MultimodalOps.resizeThumb(
      MultimodalOps.withMediaPayload(docs), thumbBytes = 32).collect()
      .map(x => x.doc_id -> x).toMap
    assert(t(1L).thumb.length == 32 && t(2L).thumb.length == 32)
    assert(t(1L).src_bytes == 400 && t(2L).src_bytes == 2)
    // short payload: copied verbatim then zero-padded, never stretched
    assert(t(2L).thumb.drop(2).forall(_ == 0))
    val again = MultimodalOps.resizeThumb(
      MultimodalOps.withMediaPayload(docs), thumbBytes = 32).collect()
      .map(x => x.doc_id -> x).toMap
    assert(t(1L).thumb.toSeq == again(1L).thumb.toSeq)
  }

  test("frame sampling is bounded per doc and indexed") {
    val frames = MultimodalOps.sampleFrames(
      MultimodalOps.withMediaPayload(docs), stride = 64, maxFrames = 3).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(1L).length == 3) // 400 bytes / 64 stride, capped at 3
    assert(byDoc(2L).length == 1)
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2))
  }
}
