package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MediaNearDupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash64: identical bytes hash identically; one-byte edit flips few bits") {
    val base = Array.tabulate[Byte](4096)(i => ((i * 31 + 7) % 251).toByte)
    val copy = base.clone()
    assert(Multimodal.aHash64(base) == Multimodal.aHash64(copy))
    val edited = base.clone()
    edited(100) = (edited(100) + 90).toByte
    val d = ham(Multimodal.aHash64(base), Multimodal.aHash64(edited))
    assert(d <= 2, s"single-byte edit should flip at most its cell (+mean drift): $d bits")
  }

  test("aHash64: cell structure — flipping one high-contrast half flips its bits") {
    // low half = 0, high half = 200: bits 0..31 clear, 32..63 set
    val bytes = Array.tabulate[Byte](128)(i => if (i < 64) 0 else 200.toByte)
    val sig = Multimodal.aHash64(bytes)
    assert(sig == 0xFFFFFFFF00000000L, f"got $sig%016x")
    // inverted stream gives the complementary signature
    val inv = bytes.reverse
    assert(Multimodal.aHash64(inv) == 0x00000000FFFFFFFFL)
  }

  test("aHash64: empty and sub-64-byte streams are defined") {
    assert(Multimodal.aHash64(Array.emptyByteArray) == 0L)
    val tiny = Array[Byte](10, 20, 30) // 3 cells hit, bit = above-mean
    val sig = Multimodal.aHash64(tiny)
    assert(java.lang.Long.bitCount(sig) >= 1 && java.lang.Long.bitCount(sig) <= 3)
  }

  test("banded pair search finds exactly the planted re-encoded copies") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val assets = (0L until 40L).map { id =>
      (id, Array.fill[Byte](2048)((rnd.nextInt(200) + 20).toByte))
    }
    // plant: asset 1000+id is a one-byte-perturbed copy of every 10th
    val planted = assets.filter(_._1 % 10 == 0).map { case (id, bytes) =>
      val c = bytes.clone(); c(500) = (c(500) + 40).toByte; (1000L + id, c)
    }
    val media = (assets ++ planted).toDF("id", "content")
    val pairs = Multimodal.mediaNearDupPairs(media, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = assets.filter(_._1 % 10 == 0).map(a => (a._1, 1000L + a._1)).toSet
    assert(pairs == expected, s"missed=${expected -- pairs} extra=${pairs -- expected}")
  }

  test("media index lifecycle: write + append + probe equals the direct cross-slice pair set") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val assets = (0L until 60L).map { id =>
      (id, Array.fill[Byte](1024)((rnd.nextInt(200) + 20).toByte))
    }
    // probe-slice perturbed copies of indexed assets (ids ≡ 2 mod 3 so
    // they land in the probe slice; originals land in index slices)
    val planted = assets.filter(a => a._1 % 10 == 0 && a._1 % 3 != 2)
      .map { case (id, bytes) =>
        val c = bytes.clone(); c(100) = (c(100) + 40).toByte
        (id * 3 + 2 + 3000L, c) // ≡ 2 mod 3 (3000 ≡ 0)
      }
    val media = (assets ++ planted).toDF("id", "content")
    Multimodal.writeMediaIndex(media.filter(col("id") % 3 === 0), "graft_media_spec")
    Multimodal.appendToMediaIndex(media.filter(col("id") % 3 === 1), "graft_media_spec")
    val viaIndex = Multimodal.mediaNearDupAgainstIndex(
        media.filter(col("id") % 3 === 2), "graft_media_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // independent check: the SELF-pair machinery over the whole corpus,
    // restricted to cross-slice (probe, index) orientation
    val allPairs = Multimodal.mediaNearDupPairs(media, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val directCross = allPairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (n, i) => n % 3 == 2 && i % 3 != 2 }
    assert(viaIndex.map(t => (t._1, t._2)) == directCross,
      s"index probe must equal the direct cross-slice set: " +
        s"missed=${directCross -- viaIndex.map(t => (t._1, t._2))}")
    assert(viaIndex.nonEmpty, "planted cross-slice copies must be found")
    // every planted pair surfaced
    val expected = planted.map(p => (p._1, (p._1 - 3000L - 2) / 3)).toSet
    assert(expected.subsetOf(viaIndex.map(t => (t._1, t._2))),
      s"missed=${expected -- viaIndex.map(t => (t._1, t._2))}")
    // wrong maxHamming is rejected against the stored property
    intercept[IllegalArgumentException] {
      Multimodal.mediaNearDupAgainstIndex(media, "graft_media_spec", maxHamming = 2)
    }
  }

  // ---- MediaDecoder.Real (javax.imageio — PNG/JPEG in the base JRE) ----

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JRE has no $fmt writer")
    bos.toByteArray
  }

  /** Vertical gradient (pixel = y·255/(h−1)): cell means rise monotonely
    * through the raster, so only the middle aHash cells sit near the
    * global mean — re-encode noise can flip at most those few bits.
    */
  private def vGradient(w: Int, h: Int, invert: Boolean): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = y * 255 / (h - 1)
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("Real decoder: constant-gray PNG features are closed-form; non-image bytes fail loudly") {
    val png = Multimodal.pngBytes(1234L) // 10x12, gray 210
    val (n, s, m) = Multimodal.MediaDecoder.Real.features(png)
    assert(n == 10 * 12, s"decoded plane must be w*h pixels: $n")
    assert(s == (210L * 120L) % 9973L, s"plane sum mod: $s")
    assert(m == 210.0, s"constant gray must survive decode + luma exactly: $m")
    assert(Multimodal.MediaDecoder.Real.dims(png).contains((10, 12)))
    val ex = intercept[IllegalArgumentException](
      Multimodal.MediaDecoder.Real.features("not an image".getBytes("UTF-8")))
    assert(ex.getMessage.contains("decodable"), ex.getMessage)
  }

  test("Real decoder: a JPEG re-encode of a PNG is a perceptual near-dup, a different image is not") {
    import spark.implicits._
    // A = PNG gradient; B = the SAME pixels re-encoded as (lossy) JPEG —
    // different container bytes, near-identical decoded luma; C inverted
    val a = vGradient(64, 64, invert = false)
    val assets = Seq(
      (1L, encode(a, "png")),
      (2L, encode(a, "jpg")),
      (3L, encode(vGradient(64, 64, invert = true), "png")))
      .toDF("id", "content")
    val sigs = Multimodal.aHashSigs(assets, Multimodal.MediaDecoder.Real)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ham(sigs(1L), sigs(2L)) <= 4,
      s"re-encode must stay within the near-dup budget: ${ham(sigs(1L), sigs(2L))} bits")
    assert(ham(sigs(1L), sigs(3L)) > 30,
      s"inverted gradient must be far: ${ham(sigs(1L), sigs(3L))} bits")
    // the full pair machinery over decoded-luma sigs finds exactly (1,2)
    val pairs = graft.operators.Dedup.sigPairs(
        Multimodal.aHashSigs(assets, Multimodal.MediaDecoder.Real), maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"pairs: $pairs")
  }

  // ---- MediaDecoder.Real audio (javax.sound.sampled — PCM WAV in the base JRE) ----

  test("Real decoder: constant-PCM16 WAV features are closed-form in id") {
    val wav = Multimodal.wavBytes(1234L) // n = 800+1234%211 = 905, g = 1234%256 = 210
    val n = 800 + 1234 % 211
    val g = 1234 % 256
    val (len, s, m) = Multimodal.MediaDecoder.Real.features(wav)
    assert(len == n, s"one plane byte per sample frame: $len vs $n")
    assert(s == (g.toLong * n) % 9973L, s"plane sum mod: $s")
    assert(m == g.toDouble, s"constant amplitude must survive decode exactly: $m")
    assert(Multimodal.MediaDecoder.Real.dims(wav).isEmpty, "audio has no dims")
  }

  test("Real decoder: 16-bit signed PCM maps (s >> 8) + 128; 8-bit unsigned PCM is the raw byte") {
    // hand-rolled non-constant 16-bit WAV: samples -32768, -256, 0, 255, 32512
    // -> high bytes -128, -1, 0, 0, 127 -> plane 0, 127, 128, 128, 255
    def wav16(samples: Seq[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val plane16 = Multimodal.MediaDecoder.Real
      .luma(wav16(Seq(-32768, -256, 0, 255, 32512).map(_.toShort)))
      .map(_ & 0xff).toSeq
    assert(plane16 == Seq(0, 127, 128, 128, 255), s"plane: $plane16")
    // 8-bit unsigned PCM: plane IS the data bytes
    def wav8(bytes: Seq[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + bytes.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + bytes.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
        .put("data".getBytes("US-ASCII")).putInt(bytes.length)
      bytes.foreach(b => bb.put(b.toByte))
      bb.array()
    }
    val plane8 = Multimodal.MediaDecoder.Real.luma(wav8(Seq(0, 5, 128, 255)))
      .map(_ & 0xff).toSeq
    assert(plane8 == Seq(0, 5, 128, 255), s"plane: $plane8")
    // truly undecodable bytes still fail loudly, mentioning both seams
    val ex = intercept[IllegalArgumentException](
      Multimodal.MediaDecoder.Real.luma("neither image nor audio".getBytes("UTF-8")))
    assert(ex.getMessage.contains("javax.sound.sampled"), ex.getMessage)
  }
}
