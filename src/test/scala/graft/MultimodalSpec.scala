package graft

import graft.functions.Multimodal
import graft.functions.Multimodal.FakeDecoder
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, sf)

  test("media schema: binary content + typed metadata, 3 kinds") {
    val schema = media.schema
    assert(schema("content").dataType.typeName === "binary")
    val kinds = media.select("kind").distinct().collect()
      .map(_.getString(0)).sorted
    assert(kinds.toSeq === Seq("audio", "image", "video"))
  }

  test("batched decode produces exact deterministic features") {
    val feats = Multimodal.extractFeatures(media.filter(col("media_id") === 3))
      .collect().head
    val content = media.filter(col("media_id") === 3)
      .select("content").collect().head.getAs[Array[Byte]](0)
    assert(feats.features.toSeq === FakeDecoder.decode(content).toSeq)
    assert(feats.features.length === FakeDecoder.FeatureDim)
  }

  test("decode is a distributed per-partition pass (no driver collect)") {
    val ds = Multimodal.extractFeatures(media)
    assert(ds.rdd.getNumPartitions >= 1)
    assert(ds.count() === media.count())
  }

  test("features compose with similarity search") {
    val sparkS = spark
    import sparkS.implicits._
    val feats = Multimodal.extractFeatures(media.limit(50))
      .select(col("media_id").as("vec_id"),
        col("features").as("embedding"))
    val topk = graft.functions.Similarity.topKBruteForce(
      feats.filter(col("vec_id") < 2), feats, k = 3)
    assert(topk.groupBy("q_id").count().collect().forall(_.getLong(1) === 3))
  }

  test("resize plan preserves aspect and respects the bounding box") {
    val r = Multimodal.withResizePlan(media, 256)
      .select("width", "height", "out_width", "out_height").collect()
    r.foreach { row =>
      val (w, h, ow, oh) = (row.getInt(0), row.getInt(1),
        row.getInt(2), row.getInt(3))
      assert(math.max(ow, oh) <= 256)
      assert(math.max(ow, oh) === 256, "long side hits the box")
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.1)
    }
  }

  test("frame sampling: stride-7 indices within range, videos only") {
    val f = Multimodal.sampledFrames(media, 7)
    assert(f.filter(col("frame_idx") % 7 =!= 0).count() === 0)
    assert(f.filter(col("frame_idx") >= col("n_frames")).count() === 0)
    val nonVideo = media.filter(col("kind") =!= "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(f.filter(col("media_id").isInCollection(nonVideo)).count() === 0)
  }

  test("content dedup: digest groups identical payloads, canonical is min id") {
    val d = Multimodal.contentDedup(media).collect()
    assert(d.length === media.count())
    // digest equality == byte equality on this corpus
    val byDigest = d.groupBy(_.getAs[String]("digest"))
    val texts = media.select("media_id", "content").collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap
    byDigest.foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("media_id"))
      assert(ids.map(texts).distinct.length === 1,
        "same digest implies same payload")
      assert(rs.forall(_.getAs[Long]("canonical_id") === ids.min))
      assert(rs.forall(_.getAs[Long]("n_copies") === ids.length.toLong))
      assert(rs.count(_.getAs[Boolean]("is_canonical")) === 1)
    }
  }
  test("resize plan: long side maps to the target box, pads non-negative") {
    import org.apache.spark.sql.functions._
    val plan = functions.Multimodal.mmResizePlan(spark, sf)
    val rows = plan.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(math.max(ow, oh) === 224, "long side fills the box")
      assert(r.getAs[Int]("pad_x") >= 0 && r.getAs[Int]("pad_y") >= 0)
      // aspect preserved up to integer floor: cross products differ by
      // less than one output pixel's worth
      assert(math.abs(ow.toLong * h - oh.toLong * w) < math.max(w, h))
      assert(r.getAs[Boolean]("upscaled") === (math.max(w, h) < 224))
    }
    assert(plan.filter(col("kind") === "audio").count() === 0)
  }

}
