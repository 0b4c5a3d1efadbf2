package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ext.Audio
import graft.io.Warc

/** Property-based invariants for the binary container codecs (WAV, WARC):
  * round-trip exactness on arbitrary payloads, and TOTALITY under
  * corruption — the parsers' one contract exception is
  * IllegalArgumentException; anything else (NumberFormatException,
  * BufferUnderflow, NegativeArraySize, hangs) is a bug these properties
  * exist to catch.
  */
object AudioCodecProps extends Properties("AudioCodec") {

  private val samplesGen: Gen[Array[Short]] =
    Gen.choose(0, 3000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Short.MinValue, Short.MaxValue)).map(_.toArray))
  private val srGen = Gen.oneOf(8000, 16000, 22050, 44100)

  property("writeWav -> parseWav round trip is exact") =
    forAll(samplesGen, srGen) { (s, sr) =>
      val w = Audio.parseWav(Audio.writeWav(s, sr))
      w.sampleRate == sr && w.channels == 1 && w.bitsPerSample == 16 &&
        w.samples.toSeq == s.toSeq
    }

  property("parseWav is total: one corrupt byte -> parse or IllegalArgumentException") =
    forAll(samplesGen, Gen.choose(0, 1 << 20), Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) {
      (s, pos0, b) =>
        val full = Audio.writeWav(s, 16000)
        val c = full.clone
        c(pos0 % full.length) = b
        try { Audio.parseWav(c); true }
        catch {
          case _: IllegalArgumentException => true
          case _: Throwable => false
        }
    }

  property("parseWav is total under truncation") =
    forAll(samplesGen, Gen.choose(0, 1 << 20)) { (s, cut0) =>
      val full = Audio.writeWav(s, 16000)
      val cut = cut0 % (full.length + 1)
      try {
        val w = Audio.parseWav(java.util.Arrays.copyOf(full, cut))
        w.samples.length <= s.length
      } catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }

  property("resample stride law: ceil(n/stride) samples, every stride-th kept") =
    forAll(samplesGen.suchThat(_.length >= 1), Gen.choose(1, 7)) { (s, stride) =>
      val kept = Audio.parseWav(Audio.writeWav(s, 16000)).samples
        .zipWithIndex.collect { case (v, i) if i % stride == 0 => v }
      kept.length == (s.length + stride - 1) / stride &&
        kept.toSeq == s.indices.collect { case i if i % stride == 0 => s(i) }.toSeq
    }

  property("fingerprint60: signed-positive, deterministic, single-sample edit flips <= 2 adjacent bits") =
    forAll(Gen.choose(61, 2000), Gen.choose(0, 1 << 20), Gen.chooseNum(Short.MinValue, Short.MaxValue)) {
      (n, k0, nv) =>
        val s = Array.tabulate(n)(k => ((k * 48271 + 7) % 65536 - 32768).toShort)
        val fp = Audio.fingerprint60(s)
        val k = k0 % n
        val edited = s.clone; edited(k) = nv
        val fp2 = Audio.fingerprint60(edited)
        val diff = fp ^ fp2
        val f = (61L * k / n).toInt
        // only gradient bits (f-1, f) touch frame f's energy
        val allowed = (if (f >= 1 && f - 1 < 60) 1L << (f - 1) else 0L) |
          (if (f < 60) 1L << f else 0L)
        fp >= 0L && fp2 >= 0L && fp == Audio.fingerprint60(s) &&
          (diff & ~allowed) == 0L
    }
}

object WarcCodecProps extends Properties("WarcCodec") {

  private val payloadGen: Gen[Array[Byte]] =
    Gen.choose(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
  private val uriGen = Gen.alphaNumStr.map(s => "https://e/" + s.take(24))
  private val recsGen = Gen.listOf(Gen.zip(uriGen, payloadGen)).map(_.take(6))

  private def encode(recs: List[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    recs.zipWithIndex.foreach { case ((u, p), i) =>
      Warc.writeRecord(bos, "response", u, s"<urn:prop:$i>", p)
    }
    bos.toByteArray
  }

  property("write N records -> parse N records, payload byte-exact (arbitrary binary payloads)") =
    forAll(recsGen) { recs =>
      val parsed = Warc.parseStream(encode(recs)).toList
      parsed.size == recs.size && parsed.zip(recs).forall { case (r, (u, p)) =>
        r.warc_type == "response" && r.target_uri == u &&
          r.content_length == p.length.toLong && r.payload.toSeq == p.toSeq
      }
    }

  property("parseStream is total under truncation: record prefix or IllegalArgumentException") =
    forAll(recsGen, Gen.choose(0, 1 << 20)) { (recs, cut0) =>
      val full = encode(recs)
      val cut = cut0 % (full.length + 1)
      try {
        Warc.parseStream(java.util.Arrays.copyOf(full, cut)).toList.size <= recs.size
      } catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }

  property("parseStream is total: one corrupt byte -> parse or IllegalArgumentException") =
    forAll(recsGen.suchThat(_.nonEmpty), Gen.choose(0, 1 << 20), Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) {
      (recs, pos0, b) =>
        val full = encode(recs)
        val c = full.clone
        c(pos0 % full.length) = b
        try { Warc.parseStream(c).toList; true }
        catch {
          case _: IllegalArgumentException => true
          case _: Throwable => false
        }
    }
}
