package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "an image document body"),
    (1L, "an audio document body"),
    (2L, "a video document body with more bytes inside it for framing"),
    (3L, "another image")
  ).toDF("doc_id", "text")

  test("synthesize: binary column + cycling media type") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text").collect()
    assert(media.map(_.media_type).toSeq.sorted ==
      Seq("audio", "image", "image", "video"))
    assert(new String(media.find(_.doc_id == 0).get.media, "UTF-8")
      == "an image document body")
  }

  test("decodeAll: deterministic stub metadata, one output row per input") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val d1 = Multimodal.decodeAll(media, batchSize = 2).collect().sortBy(_.doc_id)
    val d2 = Multimodal.decodeAll(media, batchSize = 64).collect().sortBy(_.doc_id)
    assert(d1.length == 4)
    assert(d1.map(_.width).toSeq == d2.map(_.width).toSeq) // batch size can't change results
    val audio = d1.find(_.media_type == "audio").get
    assert(audio.width == 0 && audio.duration_ms > 0)
    val image = d1.find(_.doc_id == 0).get
    assert(image.width >= 64 && image.height >= 64 && image.duration_ms == 0)
    assert(image.byte_len == "an image document body".length)
    assert(image.feature.length == 8)
  }

  test("resize: aspect-preserving shrink, never upscales") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val decoded = Multimodal.decodeAll(media)
    val resized = Multimodal.resize(decoded, maxSide = 100).collect()
    resized.filter(_.media_type != "audio").foreach { d =>
      assert(math.max(d.width, d.height) <= 100)
      assert(d.width >= 1 && d.height >= 1)
    }
    // audio rows (0×0) pass through untouched
    assert(resized.filter(_.media_type == "audio").forall(d => d.width == 0))
    // aspect ratio approximately preserved for the shrunk rows
    val orig = decoded.collect().map(d => d.doc_id -> d).toMap
    resized.filter(d => math.max(orig(d.doc_id).width, orig(d.doc_id).height) > 100)
      .foreach { d =>
        val o = orig(d.doc_id)
        assert(math.abs(d.width.toDouble / d.height - o.width.toDouble / o.height) < 0.1)
      }
  }

  test("sampleFrames: video rows explode into byte-window frames") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 2)
    val rows = frames.select("doc_id", "frame_idx").as[(Long, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 == 2L)) // only the video doc
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted)
  }
}
