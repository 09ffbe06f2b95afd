package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import Multimodal._

  private lazy val media = syntheticMedia(spark, 30)

  test("decode produces w*h*3 pixel buffers for images only") {
    val imgs = decodeImages(media).collect()
    assert(imgs.nonEmpty)
    assert(imgs.forall(i => i.pixels.length == i.width * i.height * 3))
    assert(imgs.length == media.collect().count(_.media_type == "image"))
  }

  test("resize yields target shape") {
    val r = resizeImages(decodeImages(media), 4, 4).collect()
    assert(r.forall(i => i.width == 4 && i.height == 4 && i.pixels.length == 48))
  }

  test("features are unit-norm and deterministic across partitionings") {
    val f1 = extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.forall(f => math.abs(
      f.embedding.map(x => x.toDouble * x).sum - 1.0) < 1e-3))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.embedding.sameElements(b.embedding) })
  }

  test("frame sampling fans out n frames with even timestamps") {
    val frames = sampleFrames(media, 4).collect()
    val perVid = frames.groupBy(_.media_id)
    assert(perVid.values.forall(_.length == 4))
    val one = perVid.values.head.sortBy(_.frame_index)
    assert(one.head.ts_ms == 0L && one.last.ts_ms == one.last.ts_ms)
    assert(one.map(_.frame_index).toSeq == Seq(0, 1, 2, 3))
  }

  test("repartitionForDecode rebalances by byte size") {
    val df = media.toDF()
    assert(repartitionForDecode(df, mb = 1).rdd.getNumPartitions >= 1)
  }

  test("media features flow into vector similarity ops") {
    import spark.implicits._
    graft.functions.VecOps.register(spark)
    import graft.functions.VecOps._
    import org.apache.spark.sql.functions._
    val f = extractFeatures(media).toDF()
    val sims = f.as("a").join(f.as("b"),
        col("a.media_id") < col("b.media_id"))
      .select(vec_dot(col("a.embedding"), col("b.embedding")).as("sim"))
    assert(sims.count() == 30L * 29 / 2)
    assert(sims.agg(max(abs(col("sim")))).head().getDouble(0) <= 1.0001)
  }
}
