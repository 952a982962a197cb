package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real WAV (RIFF PCM s16le) container plumbing + integer-exact audio
  * statistics — the audio analog of [[ImageCodec]], retiring the
  * audio half of [[Multimodal.FakeCodec]]'s documented stub. The codec
  * is hand-rolled from the public RIFF/WAVE layout (pure byte
  * arithmetic over the 44-byte canonical header + chunk walk, zero new
  * dependencies) the way [[ImageCodec.Codec]] rides `javax.imageio`.
  *
  * [[SyntheticAudio]] plays [[ImageCodec.SyntheticImages]]' role:
  * payloads are REAL WAV bytes whose s16 samples follow a
  * doc_id-derived formula, so oracles recompute every expected
  * statistic from the formula while the engine decodes actual
  * container bytes — the decode-vs-formula duality that keeps the
  * multimodal plumbing honest without bundling media fixtures.
  *
  * Statistics are INTEGER-exact by construction (peak, Σs², clip and
  * silence counts over s16 samples — no float DSP at an oracle
  * boundary), per the repo's integer-exactness rule.
  */
object AudioCodec {

  /** Hand-rolled RIFF PCM s16le mono codec. Encoding writes the
    * canonical 44-byte header; decoding WALKS the chunk list (a real
    * WAV may carry LIST/fact chunks before data) and validates the
    * magic, format tag, bit depth, and channel count loudly.
    */
  object Wav {
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    def encodeS16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new java.io.ByteArrayOutputStream(44 + dataLen)
      out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
      out.write(le16(1))            // PCM
      out.write(le16(1))            // mono
      out.write(le32(sampleRate))
      out.write(le32(sampleRate * 2)) // byte rate
      out.write(le16(2))            // block align
      out.write(le16(16))           // bits per sample
      out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
      samples.foreach(s => out.write(le16(s & 0xffff)))
      out.toByteArray
    }

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** Returns (sampleRate, samples). Fails loudly on anything that is
      * not mono PCM s16 — a corrupt byte should never silently become
      * a statistic.
      */
    def decodeS16(bytes: Array[Byte]): (Int, Array[Short]) = {
      require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
        tag(bytes, 8) == "WAVE", "decodeS16: not a RIFF/WAVE payload")
      var off = 12
      var rate = -1
      var data: Array[Short] = null
      while (off + 8 <= bytes.length) {
        val id = tag(bytes, off)
        val lenL = u32(bytes, off + 4)
        val body = off + 8
        // a hostile/corrupt length would stall the walk (len = -8 makes
        // off stop advancing) or run it backwards off the array — the
        // loud-failure contract wants the offset and value named. The
        // bound check stays in Long: a declared length near 2^31 would
        // make `body + len` overflow negative in Int and slip past.
        require(lenL <= bytes.length.toLong - body,
          s"decodeS16: corrupt chunk length $lenL ('$id' at offset $off)")
        val len = lenL.toInt
        id match {
          case "fmt " =>
            require(len >= 16, "decodeS16: truncated fmt chunk")
            require(u16(bytes, body) == 1, "decodeS16: not PCM")
            require(u16(bytes, body + 2) == 1, "decodeS16: not mono")
            require(u16(bytes, body + 14) == 16, "decodeS16: not 16-bit")
            rate = u32(bytes, body + 4).toInt
          case "data" =>
            data = Array.tabulate(len / 2)(i => u16(bytes, body + i * 2).toShort)
          case _ => () // LIST/fact/etc: skip
        }
        off = body + len + (len & 1) // chunks are word-aligned
      }
      require(rate > 0 && data != null, "decodeS16: missing fmt or data chunk")
      (rate, data)
    }
  }

  /** Hand-rolled AIFF (IFF FORM/AIFF, PCM s16 BIG-endian mono) codec —
    * the other classic uncompressed container (Apple's, still what
    * `afconvert`/pro-audio interchange emits): same chunk-walk
    * discipline as [[Wav]], with AIFF's two quirks handled exactly —
    * the COMM chunk's sample rate is an 80-bit IEEE 754 EXTENDED
    * float (sign + 15-bit exponent biased 16383 + explicit-leading-1
    * 64-bit mantissa; encoded/decoded here for exact integer rates,
    * loud on anything else), and samples are big-endian where RIFF is
    * little. Zero new dependencies.
    */
  object Aiff {
    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    /** Positive integer → 80-bit extended float (big-endian). */
    private[graft] def ext80(v: Int): Array[Byte] = {
      require(v > 0, s"ext80: rate must be positive, got $v")
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v.toLong)
      val mant = v.toLong << (63 - e)
      val exp = 16383 + e
      be16(exp) ++ (7 to 0 by -1).map(i => ((mant >>> (i * 8)) & 0xff).toByte)
    }

    /** 80-bit extended float → exact positive integer; loud when the
      * value is not an exact integer in range (a fractional archive
      * rate should never silently truncate into a statistic).
      */
    private[graft] def unext80(b: Array[Byte], o: Int): Int = {
      val exp = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      require((exp & 0x8000) == 0, "unext80: negative sample rate")
      var mant = 0L
      var i = 0
      while (i < 8) { mant = (mant << 8) | (b(o + 2 + i) & 0xffL); i += 1 }
      val e = exp - 16383
      require(e >= 0 && e < 31, s"unext80: exponent $e out of integer range")
      val shift = 63 - e
      require(shift >= 0 && (mant << (64 - shift)) == 0L || shift == 0,
        "unext80: fractional sample rate")
      (mant >>> shift).toInt
    }

    def encodeS16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new java.io.ByteArrayOutputStream(54 + dataLen)
      out.write("FORM".getBytes("US-ASCII"))
      out.write(be32(4 + 26 + 16 + dataLen)) // AIFF + COMM(8+18) + SSND(8+8+data)
      out.write("AIFF".getBytes("US-ASCII"))
      out.write("COMM".getBytes("US-ASCII")); out.write(be32(18))
      out.write(be16(1))                  // mono
      out.write(be32(samples.length))     // numSampleFrames
      out.write(be16(16))                 // bits per sample
      out.write(ext80(sampleRate))
      out.write("SSND".getBytes("US-ASCII")); out.write(be32(8 + dataLen))
      out.write(be32(0)); out.write(be32(0)) // offset, blockSize
      samples.foreach(s => out.write(be16(s & 0xffff)))
      out.toByteArray
    }

    private def u16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** Returns (sampleRate, samples); loud on anything that is not
      * mono PCM s16 AIFF, and on COMM/SSND disagreement.
      */
    def decodeS16(bytes: Array[Byte]): (Int, Array[Short]) = {
      require(bytes.length >= 12 && tag(bytes, 0) == "FORM" &&
        tag(bytes, 8) == "AIFF", "Aiff.decodeS16: not a FORM/AIFF payload")
      var off = 12
      var rate = -1
      var nFrames = -1L
      var data: Array[Short] = null
      while (off + 8 <= bytes.length) {
        val id = tag(bytes, off)
        val lenL = u32(bytes, off + 4)
        val body = off + 8
        // same stall/backwards-walk guard as Wav.decodeS16, same
        // Long-domain bound (an Int `body + len` overflows past it)
        require(lenL <= bytes.length.toLong - body,
          s"Aiff.decodeS16: corrupt chunk length $lenL ('$id' at offset $off)")
        val len = lenL.toInt
        id match {
          case "COMM" =>
            require(len >= 18, "Aiff.decodeS16: truncated COMM chunk")
            require(u16(bytes, body) == 1, "Aiff.decodeS16: not mono")
            nFrames = u32(bytes, body + 2)
            require(u16(bytes, body + 6) == 16, "Aiff.decodeS16: not 16-bit")
            rate = unext80(bytes, body + 8)
          case "SSND" =>
            require(len >= 8, "Aiff.decodeS16: truncated SSND chunk")
            // the offset field is u32: guard it in Long BEFORE any Int
            // math — a hostile value near 2^31 becomes a negative Int
            // `skip` whose start/dataLen errors cancel and index past
            // the array instead of failing loudly
            val skipL = u32(bytes, body)
            require(skipL <= (len - 8).toLong,
              s"Aiff.decodeS16: corrupt SSND offset $skipL (chunk length $len)")
            val start = body + 8 + skipL.toInt
            val dataLen = len - 8 - skipL.toInt
            data = Array.tabulate(dataLen / 2)(i =>
              u16(bytes, start + i * 2).toShort)
          case _ => () // NAME/ANNO/etc: skip
        }
        off = body + len + (len & 1) // IFF chunks are word-aligned
      }
      require(rate > 0 && data != null,
        "Aiff.decodeS16: missing COMM or SSND chunk")
      require(nFrames == data.length,
        s"Aiff.decodeS16: COMM declares $nFrames frames, SSND carries " +
          s"${data.length} — refusing a self-inconsistent container")
      (rate, data)
    }
  }

  /** Container auto-detect by magic — "RIFF" → WAV, "FORM" → AIFF —
    * so every audio operator takes MIXED payload columns unchanged
    * (the [[ImageCodec.Codec.decodeGray]] convention); anything else
    * refuses loudly.
    */
  def decodeS16Any(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 4, s"decodeS16Any: ${bytes.length}-byte payload")
    new String(bytes, 0, 4, "US-ASCII") match {
      case "RIFF" => Wav.decodeS16(bytes)
      case "FORM" => Aiff.decodeS16(bytes)
      case m => throw new IllegalArgumentException(
        s"decodeS16Any: unknown container magic '$m' — RIFF/WAVE and " +
          "FORM/AIFF are the real-decode tier; compressed audio stays " +
          "behind requireRealDecode")
    }
  }

  /** Deterministic synthetic-audio fixture: mono 8 kHz clips whose s16
    * samples follow
    *   sample(seed, k) = (((seed·31 + k·17) % 4001) − 2000) · 8
    * with `n(seed) = seed % 50 + 30` samples and seed = doc_id % 101.
    * Values are multiples of 8 in [−16000, 16008] — loud enough that
    * clip/silence thresholds bite on real fractions of each clip.
    */
  object SyntheticAudio {
    val distinctClips = 101L
    val sampleRate = 8000
    def seedOf(id: Long): Long = id % distinctClips
    def nSamplesOf(seed: Long): Int = (seed % 50 + 30).toInt
    def sampleAt(seed: Long, k: Long): Int =
      (((seed * 31 + k * 17) % 4001) - 2000).toInt * 8

    /** (media_id, payload) with REAL WAV bytes, one clip per row. */
    def wavFixture(docs: DataFrame, id: Column): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      docs.select(id.cast("long").as("media_id")).as[Long]
        .map { mid =>
          val seed = seedOf(mid)
          (mid, Wav.encodeS16(sampleRate,
            Array.tabulate(nSamplesOf(seed))(k => sampleAt(seed, k).toShort)))
        }
        .toDF("media_id", "payload")
    }

    /** The SAME clips with the CONTAINER decided by media parity —
      * even ids ship RIFF/WAVE, odd ids FORM/AIFF (big-endian s16,
      * 80-bit-extended rate) — so a mixed-archive operator run gates
      * that the statistics come from the DECODE, not the container
      * (the GIF/PNG rule applied to audio).
      */
    def mixedFixture(docs: DataFrame, id: Column): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      docs.select(id.cast("long").as("media_id")).as[Long]
        .map { mid =>
          val seed = seedOf(mid)
          val samples = Array.tabulate(nSamplesOf(seed))(k =>
            sampleAt(seed, k).toShort)
          val bytes =
            if (mid % 2 == 0) Wav.encodeS16(sampleRate, samples)
            else Aiff.encodeS16(sampleRate, samples)
          (mid, bytes)
        }
        .toDF("media_id", "payload")
    }

    /** The shared oracle prelude: per-doc seed + sample list from the
      * formula — interpolated from the SAME constants the fixture
      * reads, so widening the fixture cannot desynchronize oracles.
      */
    val oracleClips: String =
      s"""clips AS (SELECT doc_id AS media_id,
         |            doc_id % $distinctClips AS seed,
         |            CAST(doc_id % $distinctClips AS BIGINT) % 50 + 30 AS n,
         |            list_transform(
         |              generate_series(0, CAST((doc_id % $distinctClips) % 50 + 29 AS INT)),
         |              k -> (((doc_id % $distinctClips) * 31 + k * 17) % 4001 - 2000) * 8)
         |              AS sm
         |          FROM documents)""".stripMargin
  }

  private def decoded(df: DataFrame, id: Column, payload: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("media_id"), payload.cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (mid, bytes) =>
        val (rate, samples) = decodeS16Any(bytes)
        (mid, rate.toLong, samples.map(_.toInt))
      }
      .toDF("media_id", "sample_rate", "samples")
  }

  /** Real decode → per-clip integer statistics: sample count, peak
    * |s|, total energy Σs², samples at/above the clip threshold, and
    * the leading/trailing silence runs (|s| ≤ silence threshold) a
    * trim pass would cut. All-silent clips trim to lead = n, trail = 0
    * (one cut, not two).
    *
    * Scale shape: the one UDF is the container decode (exactly like
    * the image kind — a codec has no `functions._` equivalent); the
    * statistics are a row-form posexplode feeding ONE media-keyed
    * hash aggregation — samples-per-clip is codec-bounded, and
    * nothing but (media_id, k, s) rows ever shuffles.
    */
  def audioStats(df: DataFrame, id: Column, payload: Column,
                 clipAbs: Int = 15000, silenceAbs: Int = 1600): DataFrame = {
    require(clipAbs > 0 && silenceAbs >= 0, "audioStats: thresholds must be sane")
    val rows = decoded(df, id, payload)
      .select(col("media_id"), col("sample_rate"),
        posexplode(col("samples")).as(Seq("k", "s")))
    rows.groupBy(col("media_id"), col("sample_rate"))
      .agg(count(lit(1)).as("n_samples"),
        max(abs(col("s"))).cast("long").as("peak"),
        sum(col("s") * col("s")).as("energy"),
        sum(when(abs(col("s")) >= clipAbs, 1L).otherwise(0L)).as("n_clipped"),
        min(when(abs(col("s")) > silenceAbs, col("k"))).as("__first_loud"),
        max(when(abs(col("s")) > silenceAbs, col("k"))).as("__last_loud"))
      .select(col("media_id"), col("sample_rate"), col("n_samples"),
        col("peak"), col("energy"), col("n_clipped"),
        coalesce(col("__first_loud").cast("long"), col("n_samples"))
          .as("lead_silence"),
        when(col("__first_loud").isNull, 0L)
          .otherwise(col("n_samples") - 1L - col("__last_loud").cast("long"))
          .as("trail_silence"))
  }

  /** Real decode → fixed-length frame energies (the audio analog of
    * [[ImageCodec.sampleFrames]]): non-overlapping `frameLen`-sample
    * frames, each with its integer energy Σs² and sample count (the
    * last frame may be short). The per-frame energy grid is what VAD /
    * loudness normalization / diarization pipelines consume.
    */
  def frameEnergy(df: DataFrame, id: Column, payload: Column,
                  frameLen: Int = 20): DataFrame = {
    require(frameLen >= 1, s"frameEnergy: frameLen must be >= 1, got $frameLen")
    decoded(df, id, payload)
      .select(col("media_id"), posexplode(col("samples")).as(Seq("k", "s")))
      .groupBy(col("media_id"), (col("k") / frameLen).cast("long").as("frame_idx"))
      .agg(count(lit(1)).as("n_in_frame"),
        sum(col("s") * col("s")).as("energy"))
      .select(col("media_id"), col("frame_idx"), col("n_in_frame"), col("energy"))
  }
}
