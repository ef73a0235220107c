package graft

import graft.ops.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** pHash — the DCT robustness rung next to q165's dHash (q167): the
  * fixed-point basis, the median-threshold bit semantics, and the
  * planted TRANSFORMED dup that dHash measurably misses.
  */
class ImagePhashDctSpec extends SparkSpec {

  private val payloadSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType)))

  private def mediaOf(imgs: Seq[(Long, Array[Int])]) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(imgs.map { case (id, g) =>
        val rgb = new Array[Byte](g.length * 3)
        g.indices.foreach { i =>
          val b = g(i).toByte
          rgb(i * 3) = b; rgb(i * 3 + 1) = b; rgb(i * 3 + 2) = b
        }
        Row(id, Multimodal.encodePpm(8, 8, rgb))
      }), payloadSchema)
    Multimodal.asMedia(df, "media_id", "payload", "image/x-portable-pixmap")
  }

  private def hashOf(g: Array[Int]): Long =
    Multimodal.pHash(mediaOf(Seq(1L -> g))).collect().head.getLong(1)

  test("the fixed-point DCT basis matches its defining formula exactly") {
    // guards literal typos in BOTH engines: the SQL oracle embeds the
    // same 64 integers
    for (u <- 0 until 8; x <- 0 until 8) {
      val want = Math.round(Math.cos((2 * x + 1) * u * Math.PI / 16) * 4096)
      assert(Multimodal.DctCoef(u)(x) == want, s"coef($u)($x)")
    }
  }

  test("pHash bits are an independent brute-force DCT recompute") {
    val rng = new scala.util.Random(29)
    val g = Array.fill(64)(rng.nextInt(256))
    // independent path: direct (non-separable) double sum per (u,v)
    val f = for {
      u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0
    } yield (0 until 64).map { p =>
      g(p) * Multimodal.DctCoef(u)(p % 8) * Multimodal.DctCoef(v)(p / 8)
    }.sum
    val med = f.sorted.apply(31)
    val want = f.zipWithIndex.foldLeft(0L) { case (acc, (v, b)) =>
      if (v > med) acc | (1L << b) else acc
    }
    assert(hashOf(g) == want)
  }

  test("a flat image hashes to 0 (every non-DC coefficient ties the median)") {
    assert(hashOf(Array.fill(64)(42)) == 0L)
    assert(hashOf(Array.fill(64)(0)) == 0L)
  }

  test("pHash keeps the ±1-noise transformed dup that dHash measurably loses") {
    // base: seeded-random 2x2 blocks — strong low-frequency structure
    // (pHash-stable) with EQUAL adjacent pixels inside every block
    // (dHash-fragile: a ±1 perturbation flips those gradient signs).
    // copy: +1 on the even checkerboard — the integer stand-in for a
    // global brightness/contrast-ish re-encode wobble.
    val blocks = Array(160, 64, 192, 0, 32, 32, 160, 0,
                       96, 0, 32, 192, 192, 32, 96, 32)
    val base = Array.tabulate(64)(p => blocks((p / 16) * 4 + (p % 8) / 2))
    val noisy = Array.tabulate(64)(p =>
      base(p) + (if ((p % 8 + p / 8) % 2 == 0) 1 else 0))
    val media = mediaOf(Seq(1L -> base, 2L -> noisy))
    def dist(hashes: org.apache.spark.sql.DataFrame): Int = {
      val m = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      java.lang.Long.bitCount(m(1L) ^ m(2L))
    }
    val dh = dist(Multimodal.dHash(media))
    val ph = dist(Multimodal.pHash(media))
    // measured: dHash 17 (misses at q165's maxDist 4 by a wide margin),
    // pHash 0 (caught at q167's maxDist 6 with full margin)
    assert(dh > 4, s"dHash hamming $dh should exceed q165's maxDist")
    assert(ph <= 6, s"pHash hamming $ph should sit inside q167's maxDist")
    assert(ph < dh, s"pHash ($ph) must beat dHash ($dh) on this transform")
    assert(dh == 17 && ph == 0, s"pinned values drifted: dh=$dh ph=$ph")
  }

  test("hammingPairs over pHash at 63 bits equals brute force") {
    val rng = new scala.util.Random(31)
    val imgs = (0L until 40L).map(i => i -> Array.fill(64)(rng.nextInt(256)))
    val hashes = Multimodal.pHash(mediaOf(imgs))
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    for (k <- Seq(0, 6, 12)) {
      val got = Multimodal.hammingPairs(hashes, bits = 63, maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, ha) <- hs; (b, hb) <- hs if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got == want, s"maxDist=$k: got ${got.size}, want ${want.size}")
    }
  }

  test("q167 emits only genuine text near-dups (subset of the q34 relation)") {
    val out = queries.Registry.byName("q167_image_phash_dct_dups")
      .run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "planted near-dups must surface")
    assert(out.forall(_._3 <= 6))
    val jacc = queries.Registry.byName("q34_docs_jaccard_pairs")
      .run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.forall(p => jacc.contains((p._1, p._2))),
      s"non-near-dup pair emitted: ${out.filterNot(p => jacc.contains((p._1, p._2))).take(5).toSeq}")
  }
}
