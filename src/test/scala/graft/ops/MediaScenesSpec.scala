package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.PixelDecode

/** Cross-container scene fixtures: the five real decoders must agree
  * pixel-for-pixel on the same planted scene, and the transform family
  * must land at the advertised hash distances. */
class MediaScenesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("all five containers decode to identical pixels and dHash") {
    (0L until 12L).foreach { id =>
      val (w, h, g) = MediaScenes.sceneGray(id, "none")
      val decoded = MediaScenes.Containers.map { c =>
        val img = PixelDecode.decode(MediaScenes.containerBytes(c, w, h, g))
        assert(img != null, s"container $c id $id")
        assert(img.w == w && img.h == h, s"dims $c id $id")
        img
      }
      val ref = decoded.head
      decoded.tail.zip(MediaScenes.Containers.tail).foreach { case (img, c) =>
        assert(java.util.Arrays.equals(img.px, ref.px),
          s"pixels differ: $c vs bmp, id $id")
      }
      // and the pixels ARE the closed form
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          assert((ref.px(3 * (y * w + x)) & 0xff) ==
            MediaScenes.blockVal(id, x / 8, y / 8))
          x += 1
        }
        y += 1
      }
      val hashes = decoded.map(PixelDecode.dhash)
      assert(hashes.distinct.size == 1, s"dHash differs across containers, id $id")
    }
  }

  test("transform family lands at the advertised distances") {
    (0L until 12L).foreach { id =>
      val (w, h, g) = MediaScenes.sceneGray(id, "none")
      val base = PixelDecode.dhash(
        PixelDecode.decode(MediaScenes.bmpBytes(w, h, g)))
      def hashOf(t: String): Long = {
        val (tw, th, tg) = MediaScenes.sceneGray(id, t)
        PixelDecode.dhash(PixelDecode.decode(MediaScenes.bmpBytes(tw, th, tg)))
      }
      // brightness: order-preserving → identical hash
      assert(hashOf("bright") == base, s"bright id $id")
      // 2x nearest upscale: same block at every grid sample → identical
      assert(hashOf("upscale2") == base, s"upscale2 id $id")
      // JPEG re-encode of the same scene: flat blocks → identical
      val jr = PixelDecode.dhash(
        PixelDecode.decode(MediaScenes.jpegBytes(w, h, g)))
      assert(jr == base, s"reenc id $id")
    }
    // jitter moves SOME scenes away from hamming 0
    val dists = (0L until 24L).map { id =>
      val (w, h, g) = MediaScenes.sceneGray(id, "none")
      val base = PixelDecode.dhash(
        PixelDecode.decode(MediaScenes.bmpBytes(w, h, g)))
      val (jw, jh, jg) = MediaScenes.sceneGray(id, "jitter3")
      val j = PixelDecode.dhash(
        PixelDecode.decode(MediaScenes.bmpBytes(jw, jh, jg)))
      java.lang.Long.bitCount(base ^ j)
    }
    assert(dists.exists(_ > 0), "jitter3 never moved a hash")
  }

  test("synthesizeMixed: 7 rows per doc, decodable, spark-side") {
    import spark.implicits._
    val docs = Seq((3L, "s"), (7L, "s")).toDF("doc_id", "source")
    val mixed = MediaScenes.synthesizeMixed(docs, "doc_id", "source")
    assert(mixed.count() == 14)
    val hashes = mixed.select(col("media_id"),
        Multimodal.imageDHash(col("payload")).as("dh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.size == 14 && !hashes.values.exists(_ == 0L))
    // same scene, seven containers (lossy VP8, TIFF included), one hash
    assert((0 to 6).map(i => hashes(30L + i)).distinct.size == 1)
    assert((0 to 6).map(i => hashes(70L + i)).distinct.size == 1)
  }
}
