package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Aggregators

/** Property-based checks for the pure kernels that every ANN/dedup
  * result rides on. These run the aggregation logic directly (no Spark
  * jobs) so scalacheck can push hundreds of adversarial cases through.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val scoredGen: Gen[List[Aggregators.Scored]] =
    Gen.listOf(for {
      // coarse cos grid so ties actually happen
      c <- Gen.chooseNum(-5, 5).map(_ / 10.0)
      id <- Gen.chooseNum(0L, 30L)
    } yield Aggregators.Scored(c, id))

  /** The window-rank reference: full sort by (cos DESC, id ASC), take k
    * (duplicates kept, exactly like the aggregator).
    */
  private def naiveTopK(xs: List[Aggregators.Scored], k: Int): List[Aggregators.Scored] =
    xs.sortBy(s => (-s.cos, s.neighbor_id)).take(k)

  private val textGen: Gen[String] = {
    val token = Gen.oneOf("a", "bb", "ccc", "é", "😀", "x1", "-")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    for {
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n + 1, sep)
      lead <- Gen.oneOf("", " ", "\n")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString
  }

  /** Independent reference for the shingle kernels: library split +
    * sliding + MessageDigest, no shared code with the production path.
    */
  private def refShingleMd5(text: String, n: Int): List[String] = {
    val toks = text.split("\\s+").toList.filter(_.nonEmpty)
    if (toks.length < n) Nil
    else toks.sliding(n).map { w =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.mkString(" ").getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }.toList
  }

  test("shingle kernels equal the independent split+sliding+digest reference") {
    import graft.functions.ShingleHash40Util
    import org.apache.spark.unsafe.types.UTF8String
    check(Prop.forAll(textGen, Gen.chooseNum(1, 4)) { (text, n) =>
      val ref = refShingleMd5(text, n)
      val hex = ShingleHash40Util.md5Hex(UTF8String.fromString(text), n)
        .toArray[AnyRef](org.apache.spark.sql.types.StringType).map(_.toString).toList
      val h40 = ShingleHash40Util.hashes(UTF8String.fromString(text), n)
        .toLongArray().toList
      hex == ref &&
        h40 == ref.map(h => java.lang.Long.parseLong(h.take(10), 16) + 1L)
    })
  }

  test("TopK equals the sort-based rank for any input and any partitioning") {
    val kGen = Gen.chooseNum(1, 6)
    check(Prop.forAll(scoredGen, kGen, Gen.chooseNum(1, 5)) { (xs, k, nParts) =>
      val agg = new Aggregators.TopK(k)
      // split into nParts partitions, reduce each, then merge in order
      val parts = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts)).toList
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      merged.items.toList == naiveTopK(xs, k)
    })
  }

  test("TopK merge is order-insensitive and the buffer stays bounded") {
    val kGen = Gen.chooseNum(1, 6)
    check(Prop.forAll(scoredGen, scoredGen, kGen) { (a, b, k) =>
      val agg = new Aggregators.TopK(k)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      val ab = agg.merge(ba, bb)
      val ba2 = agg.merge(bb, ba)
      ab.items == ba2.items && ab.items.size <= k &&
        ba.items.size <= k && bb.items.size <= k
    })
  }

  test("CountMin never under-counts and merges order-insensitively") {
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    check(Prop.forAll(tokGen, Gen.chooseNum(1, 4)) { (xs, nParts) =>
      val agg = new Aggregators.CountMin(8, 2)
      val parts = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts)).toList
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      val single = xs.foldLeft(agg.zero)(agg.reduce)
      val exact = xs.groupBy(identity).map { case (t, l) => t -> l.size.toLong }
      merged.cells.sameElements(single.cells) &&
        exact.forall { case (t, c) =>
          Aggregators.CountMin.estimate(merged.cells, t, 8, 2) >= c
        }
    })
  }

  test("HistAgg counts every value once and merges slice-independently") {
    val vGen = Gen.listOf(Gen.chooseNum(-50.0, 150.0))
    check(Prop.forAll(vGen, Gen.chooseNum(1, 4)) { (xs, nParts) =>
      val agg = new graft.functions.Histogram.HistAgg(0.0, 100.0, 10)
      val parts = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts)).toList
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      val single = xs.foldLeft(agg.zero)(agg.reduce)
      merged.bins == single.bins &&
        merged.bins.sum == xs.size && // clamping loses nothing
        merged.bins.length == 10
    })
  }

  test("CountsAgg merges slice-independently and never grows past vocab+1") {
    val vocab = Seq("a", "b", "c")
    val tokGen = Gen.listOf(Gen.listOf(Gen.oneOf("a", "b", "c", "zz", "qq")))
    check(Prop.forAll(tokGen, Gen.chooseNum(1, 4)) { (docs, nParts) =>
      val agg = new graft.functions.KlDrift.CountsAgg(vocab)
      val parts = docs.grouped(math.max(1, (docs.size + nParts - 1) / nParts)).toList
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val single = docs.foldLeft(agg.zero)(agg.reduce)
      merged.counts.sameElements(single.counts) &&
        merged.counts.length == vocab.size + 1 && // OOV bounded: one slot
        merged.counts.sum == docs.map(_.size).sum // every token lands somewhere
    })
  }

  test("CountMin skips null tokens, matching the SQL null-propagation side") {
    val agg = new Aggregators.CountMin(8, 2)
    val withNulls = List("null", null, "a", null, "null")
    val b = withNulls.foldLeft(agg.zero)(agg.reduce)
    val withoutNulls = List("null", "a", "null").foldLeft(agg.zero)(agg.reduce)
    // a null token must not inflate the buckets of the literal "null"
    assert(b.cells.sameElements(withoutNulls.cells))
    assert(Aggregators.CountMin.estimate(b.cells, "null", 8, 2) == 2L)
  }

  test("13-hex md5 rolls are exactly double-representable (p46 premise)") {
    // sampleExactPerGroup scores TopK with roll.toDouble; the order is
    // bit-identical to the SQL oracle ONLY if no roll loses precision
    check(Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val v = java.lang.Long.parseLong(hex, 16)
      v.toDouble.toLong == v
    })
  }

  test("fingerprint is whitespace- and case-insensitive for random texts") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "Beta", "GAMMA", "d", "ee", "zz9")
    val ws = Vector(" ", "  ", "\t", "\n", " \t ", "\r\n")
    def doc(): String = Seq.fill(1 + rnd.nextInt(6))(words(rnd.nextInt(words.size)))
      .mkString(" ")
    def mangle(s: String): String =
      ws(rnd.nextInt(ws.size)) +
        s.split(" ").map(w => if (rnd.nextBoolean()) w.toUpperCase else w.toLowerCase)
          .mkString(ws(rnd.nextInt(ws.size))) + ws(rnd.nextInt(ws.size))
    val pairs = Seq.fill(200)(doc()).map(d => (d, mangle(d))).toDF("a", "b")
    val diff = pairs.filter(
      graft.functions.TextFunctions.fingerprint(col("a")) =!=
        graft.functions.TextFunctions.fingerprint(col("b"))).count()
    assert(diff == 0)
  }

  test("WAV codec round-trips arbitrary s16 clips; residual bound holds for int8 codes") {
    import graft.multimodal.AudioCodec.Wav
    val clipGen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      xs <- Gen.nonEmptyListOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))
    } yield (rate, xs.map(_.toShort).toArray)
    check(Prop.forAll(clipGen) { case (rate, xs) =>
      val (r2, back) = Wav.decodeS16(Wav.encodeS16(rate, xs))
      r2 == rate && back.toSeq == xs.toSeq
    })
    // int8 residual invariant: |127·x − q·m| ≤ m/2 + 1 for the half-up
    // code (the bound the sq_err_num audit rests on), and |q| ≤ 127
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-2000000L, 2000000L))
    check(Prop.forAll(vecGen) { xs =>
      val m = xs.map(math.abs).max
      def q(x: Long): Long =
        if (m == 0) 0L
        else if (x >= 0) (2 * 127 * x + m) / (2 * m)
        else -((2 * 127 * -x + m) / (2 * m))
      xs.forall { x =>
        val qi = q(x)
        math.abs(qi) <= 127 &&
          (m == 0 || math.abs(127 * x - qi * m) <= m / 2 + 1)
      }
    })
  }

  test("UrlTopK: any batch split and order folds to the sorted distinct smallest-k") {
    val urlGen = Gen.listOf(for {
      d <- Gen.chooseNum(0, 8)
      p <- Gen.chooseNum(0, 20)
    } yield s"https://s$d.com/p$p")
    val kGen = Gen.chooseNum(1, 7)
    check(Prop.forAll(urlGen, kGen, Gen.chooseNum(0L, 1000L)) { (urls, k, seed) =>
      val agg = new Aggregators.UrlTopK(k)
      def prio(u: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(u.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val items = urls.map(u => Aggregators.PUrl(prio(u), u))
      // reference: distinct, sorted by (prio, url), first k
      val expect = items.distinct
        .sortBy(x => (x.prio, x.url)).take(k)
      // fold under a seeded random shuffle and arbitrary partition split
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(items)
      val parts = if (shuffled.isEmpty) List(shuffled)
        else shuffled.grouped(1 + rnd.nextInt(shuffled.size)).toList
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge)
      agg.finish(merged).items.toList == expect
    })
  }

  private val warcBodyGen: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "é", "😀", "\n", "x y", "\t", "ß", "—"))
      .map(_.mkString)

  test("WARC byte walk: render∘parse identity + extent tiling for arbitrary records, line ends, separators") {
    val recGen = for {
      b <- warcBodyGen
      uri <- Gen.option(Gen.chooseNum(0, 99).map(i => s"https://e$i.com/p"))
      date <- Gen.option(Gen.const("2026-01-02T03:04:05Z"))
      bareLf <- Gen.oneOf(true, false)
    } yield (b, uri, date, bareLf)
    check(Prop.forAll(Gen.listOf(recGen), Gen.chooseNum(0, 3)) {
      (recs, extraSeps) =>
        // independent reference rendering — library string building,
        // not writeWarc — with per-record CRLF/LF choice and extra
        // inter-record blank lines
        val sb = new StringBuilder
        recs.foreach { case (b, uri, date, bareLf) =>
          val e = if (bareLf) "\n" else "\r\n"
          val n = b.getBytes("UTF-8").length
          sb.append(s"WARC/1.0${e}WARC-Type: conversion$e")
          uri.foreach(u => sb.append(s"WARC-Target-URI: $u$e"))
          date.foreach(dt => sb.append(s"WARC-Date: $dt$e"))
          sb.append(s"Content-Length: $n$e$e$b$e$e")
          sb.append("\n" * extraSeps)
        }
        val bytes = sb.toString.getBytes("UTF-8")
        val out = graft.sources.Warc.parseRecords(7L, bytes).toList
        val fieldsOk =
          out.map(r => (r.body, Option(r.target_uri), Option(r.warc_date))) ==
            recs.map(t => (t._1, t._2, t._3))
        val clOk = out.map(_.content_length) ==
          recs.map(_._1.getBytes("UTF-8").length.toLong)
        val tileOk = out.isEmpty || (out.head.offset == 0L &&
          out.sliding(2).forall {
            case Seq(a, c) => a.offset + a.record_bytes == c.offset
            case _ => true
          } && out.last.offset + out.last.record_bytes == bytes.length.toLong)
        fieldsOk && clOk && tileOk
    })
  }

  test("gzip member walk: extents are exactly the member lengths and tile the compressed stream") {
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    check(Prop.forAll(Gen.listOf(warcBodyGen)) { bodies =>
      val members = bodies.map { b =>
        val n = b.getBytes("UTF-8").length
        gz(s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
          s"Content-Length: $n\r\n\r\n$b\r\n\r\n")
      }
      val raw = members.foldLeft(Array.empty[Byte])(_ ++ _)
      val exts = graft.sources.Warc.memberExtents(7L, raw)
      val lensOk = exts.map(_._2) == members.map(_.length.toLong)
      val tileOk = exts.isEmpty || (exts.head._1 == 0L &&
        exts.sliding(2).forall {
          case Seq(a, c) => a._1 + a._2 == c._1
          case _ => true
        } && exts.last._1 + exts.last._2 == raw.length.toLong)
      lensOk && tileOk
    })
  }

  test("ResolveHrefUtil never throws; output is null or a hierarchical URL; dot segments never survive") {
    import graft.functions.ResolveHrefUtil
    import org.apache.spark.unsafe.types.UTF8String
    val piece = Gen.oneOf("a", "..", ".", "x/y", "/", "//", "https://h.com",
      "http://", "h.com", "?q=1", "#f", "mailto:x@y", "javascript:void(0)",
      ":", "%2e", "é😀", " ", "\t", "a:b", "..//..", "http://h.com/a/b?x#y")
    val junkGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 6)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString
    val baseGen: Gen[String] = Gen.oneOf(
      junkGen,
      junkGen.map(j => "https://host.example" + j),
      junkGen.map(j => "http://h.com:8080/a/b/" + j))
    check(Prop.forAll(baseGen, junkGen, Gen.oneOf(true, false)) {
      (base, ref, pathRel) =>
        val out = ResolveHrefUtil.resolve(
          UTF8String.fromString(base), UTF8String.fromString(ref), pathRel)
        // total: never throws; null or a scheme'd hierarchical URL
        val wellFormed = out == null || {
          val o = out.toString
          val c = o.indexOf("://")
          c > 0 && o.take(c).forall(ch => ch.isLetterOrDigit ||
            ch == '+' || ch == '-' || ch == '.')
        }
        // resolution output never carries live dot segments in its
        // PATH for the forms that RESOLVE a path (protocol-/root-/
        // path-relative); absolute refs pass through verbatim (the
        // canonicalizer's documented no-touch) and query-only refs
        // keep the base path verbatim (§5.3 — the base is presumed
        // already normalized)
        val rt = ref.trim
        val refAbs = rt.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")
        val refQueryOrFrag = rt.startsWith("?") || rt.startsWith("#")
        val noDots = out == null || refAbs || refQueryOrFrag || {
          val o = out.toString
          val auth = o.indexOf("://") + 3
          val pathStart = o.indexOf('/', auth)
          val qs = Seq(o.indexOf('?'), o.indexOf('#'), o.length)
            .filter(_ >= 0).min
          pathStart < 0 || pathStart > qs || {
            val path = o.substring(pathStart, qs)
            !path.split("/", -1).exists(seg => seg == "." || seg == "..")
          }
        }
        wellFormed && noDots
    })
  }

  test("audio decoders are total on hostile bytes: IllegalArgumentException or success, never an index error") {
    import graft.multimodal.AudioCodec
    val magic = Gen.oneOf("RIFF", "FORM", "OggS", "")
    val bytesGen: Gen[Array[Byte]] = for {
      m <- magic
      n <- Gen.chooseNum(0, 120)
      body <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield m.getBytes("US-ASCII") ++ body.toArray
    // seed a few VALID prefixes mutated at one position, the worst case
    val valid = AudioCodec.Wav.encodeS16(8000, Array[Short](1, -2, 300))
    val validA = AudioCodec.Aiff.encodeS16(8000, Array[Short](5, -6))
    val mutatedGen: Gen[Array[Byte]] = for {
      src <- Gen.oneOf(valid, validA)
      i <- Gen.chooseNum(0, src.length - 1)
      b <- Gen.chooseNum(-128, 127).map(_.toByte)
    } yield { val c = src.clone(); c(i) = b; c }
    check(Prop.forAll(Gen.oneOf(bytesGen, mutatedGen)) { bytes =>
      try { AudioCodec.decodeS16Any(bytes); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    })
  }
}
