package graft

import graft.ops.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual-hash image near-dup dedup (q165, SURVEY §2 extension
  * surface): the dHash kernel on the real PPM codec, the exact
  * pigeonhole Hamming banding, and the planted-dup semantics of the
  * registered query.
  */
class ImagePhashSpec extends SparkSpec {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType)))

  private def mediaOf(imgs: Seq[(Long, Array[Byte])]) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(imgs.map { case (id, g) =>
        val rgb = new Array[Byte](g.length * 3)
        g.indices.foreach { i =>
          rgb(i * 3) = g(i); rgb(i * 3 + 1) = g(i); rgb(i * 3 + 2) = g(i)
        }
        Row(id, Multimodal.encodePpm(8, 8, rgb))
      }), payloadSchema)
    Multimodal.asMedia(df, "media_id", "payload", "image/x-portable-pixmap")
  }

  test("dHash packs exactly the horizontal gradient signs of the decoded grid") {
    // a hand-checkable ramp: row r is [r, r+1, ..., r+7] → every
    // gradient is ascending → all 56 bits set; a flat image → 0
    val ramp = Array.tabulate(64)(p => (p / 8 + p % 8).toByte)
    val flat = Array.fill(64)(42.toByte)
    // one targeted descent: flip the bit for row 0, col 3 only
    val dip = ramp.clone(); dip(4) = 0.toByte
    val got = Multimodal.dHash(mediaOf(Seq(1L -> ramp, 2L -> flat, 3L -> dip)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got(1L) == (((1L << 56) - 1, 56)))
    assert(got(2L) == ((0L, 56)))
    // dip at pixel (0,4): gradient (0,3)->(0,4) turns descending (bit 3
    // cleared), gradient (0,4)->(0,5) stays ascending
    assert(got(3L)._1 == (((1L << 56) - 1) & ~(1L << 3)))
  }

  test("hammingPairs is EXACT: equals brute force on random hashes, any maxDist") {
    // half the corpus: scrambled distinct hashes; other half: a 0-4 bit
    // mutation of an earlier hash, so pairs exist at several distances
    val fixed = (0L until 120L).map { i =>
      if (i < 60) (i, (i * 0x9E3779B97F4A7C15L) & ((1L << 56) - 1))
      else {
        var h = ((i - 60) * 0x9E3779B97F4A7C15L) & ((1L << 56) - 1)
        val r2 = new scala.util.Random(i)
        (0 until r2.nextInt(5)).foreach(_ => h ^= 1L << r2.nextInt(56))
        (i, h)
      }
    }
    val df = fixed.toDF("media_id", "dhash")
    for (k <- Seq(0, 2, 4)) {
      val got = Multimodal.hammingPairs(df, bits = 56, maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, ha) <- fixed; (b, hb) <- fixed if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got == want, s"maxDist=$k: got ${got.size}, want ${want.size}")
    }
  }

  test("a planted near-identical image pair is found; a distant one is not") {
    val rng = new scala.util.Random(13)
    val base = Array.fill(64)((rng.nextInt(256)).toByte)
    val nearDup = base.clone(); nearDup(20) = ((base(20) + 40) & 0xff).toByte
    val far = Array.fill(64)((rng.nextInt(256)).toByte)
    val pairs = Multimodal.hammingPairs(
      Multimodal.dHash(mediaOf(Seq(1L -> base, 2L -> nearDup, 3L -> far))),
      bits = 56, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"far image paired: $pairs")
  }

  test("q165 finds the fixture's planted doc near-dups and nothing else") {
    val out = queries.Registry.byName("q165_image_phash_dups")
      .run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "planted near-dups must surface")
    assert(out.forall(_._3 <= 4))
    // the rendered near-dup relation tracks the text near-dup relation:
    // every emitted pair is a high-Jaccard q34 pair (threshold relaxed
    // to the sub-gate 0.7 — rendering sees distinct shingle SETS)
    val jacc = queries.Registry.byName("q34_docs_jaccard_pairs")
      .run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.forall(p => jacc.contains((p._1, p._2))),
      s"non-near-dup pair emitted: ${out.filterNot(p => jacc.contains((p._1, p._2))).take(5).toSeq}")
  }
}
