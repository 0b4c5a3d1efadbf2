package graft.ext

import graft.SparkSpec

class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("WAV round trip: writeWav -> parseWav recovers format and samples exactly") {
    val samples = Array.tabulate(500)(k => ((k * 48271) % 65536 - 32768).toShort)
    val wav = Audio.writeWav(samples, 16000)
    val parsed = Audio.parseWav(wav)
    assert(parsed.channels === 1 && parsed.sampleRate === 16000 &&
      parsed.bitsPerSample === 16)
    assert(parsed.samples.toSeq === samples.toSeq)
  }

  test("writeWav output is readable by javax.sound (independent parser agreement)") {
    val samples = Array.tabulate(320)(k => (k * 97 % 65536 - 32768).toShort)
    val wav = Audio.writeWav(samples, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getChannels === 1 && fmt.getSampleRate === 8000f &&
      fmt.getSampleSizeInBits === 16)
    val bytes = in.readAllBytes()
    assert(bytes.length === samples.length * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rec = Array.fill(samples.length)(bb.getShort)
    assert(rec.toSeq === samples.toSeq)
  }

  test("parseWav walks unknown chunks and rejects malformed payloads loudly") {
    // splice a LIST chunk between fmt and data: parser must skip it
    val samples = Array[Short](1, -2, 3)
    val plain = Audio.writeWav(samples, 16000)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(plain, 0, 36) // RIFF header + fmt chunk
    bos.write("LIST".getBytes("US-ASCII")); bos.write(Array[Byte](3, 0, 0, 0))
    bos.write(Array[Byte](7, 8, 9, 0)) // 3-byte chunk + pad to even
    bos.write(plain, 36, plain.length - 36) // data chunk
    val spliced = bos.toByteArray
    // fix the RIFF size field (bytes 4-7, little-endian)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(Audio.parseWav(spliced).samples.toSeq === samples.toSeq)

    intercept[IllegalArgumentException](Audio.parseWav("not audio".getBytes))
    // truncated data chunk must not read past the buffer
    intercept[IllegalArgumentException](
      Audio.parseWav(java.util.Arrays.copyOf(plain, plain.length - 2)))
  }

  test("fingerprint60: gain-invariant-shaped, local edit moves <= 1 bit, signed-positive") {
    val base = Array.tabulate(1220)(k => ((k * 48271 + 5) % 65536 - 32768).toShort)
    val fp = Audio.fingerprint60(base)
    assert(fp >= 0L, "60-bit fingerprint must stay signed-positive")
    assert(fp === Audio.fingerprint60(base.clone()), "deterministic")
    // editing sample 0 only changes frame 0's energy -> only bit 0 can move
    val edited = base.clone(); edited(0) = (edited(0) ^ 7).toShort
    assert(java.lang.Long.bitCount(fp ^ Audio.fingerprint60(edited)) <= 1)
    intercept[IllegalArgumentException](Audio.fingerprint60(new Array[Short](60)))
  }

  test("decodeFeatures: real parse, integer features match a direct computation") {
    val docs = Seq(3L, 10L).map(id => (id, s"t$id", 1L)).toDF("doc_id", "text", "n_chars")
    val out = Audio.decodeFeatures(Audio.wavMediaFromDocuments(spark, docs))
      .collect().map(f => f.media_id -> f).toMap
    for (id <- Seq(3L, 10L)) {
      val s = Audio.synthSamples(id)
      val f = out(id)
      assert(f.sample_rate === 16000 && f.n_samples === s.length)
      assert(f.duration_ms === s.length.toLong * 1000 / 16000)
      assert(f.sum_abs === s.map(v => math.abs(v.toInt).toLong).sum)
      assert(f.max_abs === s.map(v => math.abs(v.toInt)).max)
      val zc = (1 until s.length).count(i => (s(i) >= 0) != (s(i - 1) >= 0))
      assert(f.zero_cross === zc.toLong)
    }
  }

  test("resample: stride-4 decimation keeps every 4th sample at sr/4, real re-encode") {
    val docs = Seq((8L, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val media = Audio.wavMediaFromDocuments(spark, docs)
    val res = Audio.resample(media, stride = 4).collect().head
    val parsed = Audio.parseWav(res.payload)
    val orig = Audio.synthSamples(8L)
    assert(parsed.sampleRate === 4000)
    assert(parsed.samples.toSeq === orig.indices.collect {
      case k if k % 4 == 0 => orig(k)
    }.toSeq)
  }

  test("resampleSinc: length/rate contract, DC preserved, pure tone survives, alias killed") {
    def sine(f: Double, sr: Int, n: Int, amp: Double = 10000.0): Array[Short] =
      Array.tabulate(n)(k => math.rint(amp * math.sin(2 * math.Pi * f * k / sr)).toShort)
    def energy(s: Array[Short]): Double = s.map(v => v.toDouble * v).sum / s.length

    // length and rate: 16 kHz, 1600 samples -> 4 kHz, 400 samples
    val dc = Array.fill(1600)(5000.toShort)
    val dcOut = Audio.resampleSincSamples(dc, 16000, 4000)
    assert(dcOut.length === 400)
    // DC (0 Hz) passes the low-pass untouched away from the zero-padded
    // edges (the kernel sums to ~1 there)
    val interior = dcOut.slice(20, 380)
    assert(interior.forall(v => math.abs(v - 5000) <= 50),
      s"DC drifted: ${interior.min}..${interior.max}")

    // a 500 Hz tone is far below the 2 kHz output Nyquist: energy survives
    val tone = sine(500, 16000, 1600)
    val toneOut = Audio.resampleSincSamples(tone, 16000, 4000)
    val keep = energy(toneOut.slice(20, 380)) / energy(tone)
    assert(keep > 0.8 && keep < 1.2, s"passband energy ratio $keep")

    // a 3.5 kHz tone is ABOVE the output Nyquist: plain decimation aliases
    // it to 500 Hz at full energy; the sinc low-pass must crush it
    val hi = sine(3500, 16000, 1600)
    val hiOut = Audio.resampleSincSamples(hi, 16000, 4000)
    val leak = energy(hiOut.slice(20, 380)) / energy(hi)
    assert(leak < 0.02, s"stopband leak $leak")
    // control: plain stride-4 decimation keeps the aliased tone at full
    // energy — the sinc path above is what crushed it
    assert(energy(hi.indices.collect { case k if k % 4 == 0 => hi(k) }
      .toArray) / energy(hi) > 0.8, "decimation control should alias")

    // upsample: 1:2 preserves the tone too (fc = 1, pure interpolation)
    val up = Audio.resampleSincSamples(tone, 16000, 32000)
    assert(up.length === 3200)
    val upKeep = energy(up.slice(40, 3160)) / energy(tone)
    assert(upKeep > 0.8 && upKeep < 1.2, s"upsample energy ratio $upKeep")

    // polyphase table ≡ direct per-sample evaluation: the q=3 rational
    // (16000→24000) exercises a non-trivial phase table; the reference
    // below is the pre-round-10 inline loop verbatim. Tolerance ±1 LSB:
    // the table groups the kernel multiply as s·(fc·sinc·wnd) instead of
    // ((s·fc)·sinc)·wnd, which can move the pre-rint sum by ulps.
    val poly = Audio.resampleSincSamples(tone, 16000, 24000)
    val direct = {
      val fc = math.min(1.0, 24000.0 / 16000)
      val half = 16 / fc
      val outLen = (tone.length.toLong * 24000 / 16000).toInt
      Array.tabulate(outLen) { j =>
        val x = j.toDouble * 16000 / 24000
        var k = math.ceil(x - half).toInt
        val kEnd = math.floor(x + half).toInt
        var acc = 0.0
        while (k <= kEnd) {
          if (k >= 0 && k < tone.length) {
            val u = k - x
            val t = fc * u
            val sinc = if (t == 0.0) 1.0 else math.sin(math.Pi * t) / (math.Pi * t)
            val wnd = 0.5 * (1.0 + math.cos(math.Pi * u / half))
            acc += tone(k) * fc * sinc * wnd
          }
          k += 1
        }
        val r = math.rint(acc)
        math.max(Short.MinValue.toDouble, math.min(Short.MaxValue.toDouble, r)).toShort
      }
    }
    assert(poly.length === direct.length)
    val maxDiff = poly.zip(direct).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 1, s"polyphase vs direct max diff $maxDiff LSB")

    // Dataset form: real WAV out at the target rate, same kernel
    val docs = Seq((8L, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val media = Audio.wavMediaFromDocuments(spark, docs)
    val res = Audio.resampleSinc(media, outRate = 4000).collect().head
    val parsed = Audio.parseWav(res.payload)
    assert(parsed.sampleRate === 4000)
    assert(parsed.samples.toSeq ===
      Audio.resampleSincSamples(Audio.synthSamples(8L), 16000, 4000).toSeq)
  }

  test("frameEnergies: exact per-frame sums incl. the short tail frame") {
    val docs = Seq((20L, "t", 1L)).toDF("doc_id", "text", "n_chars")
    val out = Audio.frameEnergies(Audio.wavMediaFromDocuments(spark, docs), 400)
      .collect().sortBy(_.frame_idx)
    val s = Audio.synthSamples(20L)
    assert(out.map(_.n_in_frame).sum === s.length)
    for (fe <- out) {
      val slice = s.slice(fe.frame_idx * 400, math.min((fe.frame_idx + 1) * 400, s.length))
      assert(fe.energy === slice.map(v => v.toLong * v).sum)
      assert(fe.n_in_frame === slice.length)
    }
  }

  test("dedup fixture: same-seed clips fingerprint identically; xor-7 edit is a near-dup") {
    // 5 and 106 share seed 5 (106 % 101 = 5), neither % 3 == 0 ->
    // identical clips; 207 shares the seed AND is perturbed -> <= 1 bit off
    val docs = Seq(5L, 106L, 207L).map(id => (id, s"t$id", 1L))
      .toDF("doc_id", "text", "n_chars")
    val sigs = Audio.fingerprints(Audio.dedupWavFromDocuments(spark, docs))
      .as[(Long, Long)].collect().toMap
    assert(sigs(5L) === sigs(106L))
    assert(java.lang.Long.bitCount(sigs(5L) ^ sigs(207L)) <= 1)
  }

  test("audio near-dup: banded pairs == all-pairs hamming scan") {
    val docs = (0L until 40L).map(id => (id, s"t$id", 1L)).toDF("doc_id", "text", "n_chars")
    val media = Audio.dedupWavFromDocuments(spark, docs)
    val sigs = Audio.fingerprints(media).as[(Long, Long)].collect().toMap
    val banded = Audio.audioNearDuplicates(media, maxDist = 3)
      .select($"media_a", $"media_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(banded === brute)
  }

  test("vadSpans: spans are exactly the contiguous unsilenced frame runs") {
    val ids = Seq(4L, 17L)
    val docs = ids.map(id => (id, s"t$id", 1L)).toDF("doc_id", "text", "n_chars")
    val spans = Audio.vadSpans(Audio.speechWavFromDocuments(spark, docs), frameLen = 100)
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(_._1).toList)
    for (id <- ids) {
      val nFrames = (1600 + (id % 7).toInt * 160 + 99) / 100
      val active = (0 until nFrames)
        .filter(f => ((id % 1009) * 2654435761L + f * 97L) % 3 != 0)
      // contiguous runs of the active set
      val expected = active.foldLeft(List.empty[(Int, Int, Int)]) {
        case ((s0, e0, n0) :: rest, f) if f == e0 + 1 => (s0, f, n0 + 1) :: rest
        case (acc, f) => (f, f, 1) :: acc
      }.reverse
      assert(spans(id) === expected, s"clip $id")
    }
  }

  test("audioDedupGroups (hash-first) == CC over the expanded pair graph") {
    val ids = Seq(5L, 106L, 207L, 308L, 7L, 108L, 1L, 2L)
    val docs = ids.map(id => (id, s"t$id", 1L)).toDF("doc_id", "text", "n_chars")
    val media = Audio.dedupWavFromDocuments(spark, docs)
    val fast = Audio.audioDedupGroups(media, maxDist = 3)
      .as[(Long, Long)].collect().toMap
    val expanded = Components.connectedComponents(
      Audio.audioNearDuplicates(media, maxDist = 3)
        .select($"media_a".as("doc_a"), $"media_b".as("doc_b")))
      .as[(Long, Long)].collect().toMap
    assert(fast === expanded)
    assert(fast.get(5L) === Some(5L) && fast.get(106L) === Some(5L))
  }
}
