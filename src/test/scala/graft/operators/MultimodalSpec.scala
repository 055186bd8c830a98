package graft.operators

import org.apache.spark.sql.types.{BinaryType, StructType}

import graft.SparkSpec
import graft.operators.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = syntheticMedia(spark, 60).cache()

  test("media schema: opaque binary payload + typed metadata struct") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType == BinaryType)
    assert(schema("meta").dataType.isInstanceOf[StructType])
  }

  test("decodeAndFeaturize: one feature row per media item, deterministic") {
    val f1 = decodeAndFeaturize(media).collect().sortBy(_.media_id)
    val f2 = decodeAndFeaturize(media).collect().sortBy(_.media_id)
    assert(f1.length == 60)
    assert(f1.map(_.embedding.toSeq).toSeq == f2.map(_.embedding.toSeq).toSeq)
    assert(f1.forall(_.embedding.length == 16))
    assert(f1.forall(_.payload_sha256.length == 64))
  }

  test("featurization survives a repartition (no partition-local hidden state)") {
    val base = decodeAndFeaturize(media).collect().sortBy(_.media_id)
    val repart = decodeAndFeaturize(media.repartition(7)).collect().sortBy(_.media_id)
    assert(base.map(_.payload_sha256).toSeq == repart.map(_.payload_sha256).toSeq)
  }

  test("frame sampling: only videos, every-Nth fixed-size windows") {
    val frames = sampleFrames(media, frameBytes = 32, everyN = 2).collect()
    assert(frames.nonEmpty)
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
    assert(frames.forall(_.frame_index % 2 == 0))
    assert(frames.forall(_.frame_bytes.length <= 32))
  }

  test("featurized media composes with the similarity layer (ANN over extracted embeddings)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val feats = decodeAndFeaturize(media).toDF()
    val q = feats.filter($"media_id" === 0L)
      .select($"embedding".as("q_emb"))
    val top = feats.crossJoin(broadcast(q))
      .filter($"media_id" =!= 0L)
      .select($"media_id",
        round(VectorFunctions.cosineSimilarity($"embedding", $"q_emb"), 6).as("cos"))
      .orderBy($"cos".desc, $"media_id".asc)
      .limit(5)
      .collect()
    assert(top.length == 5)
    assert(top.forall(r => r.getDouble(1) <= 1.0 && r.getDouble(1) >= -1.0))
  }

  test("payload headers are REAL: parsed bytes agree with the metadata") {
    media.collect().foreach { m =>
      val p = m.payload
      def be32(off: Int): Int =
        ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      def le32(off: Int): Int =
        (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
          ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
      m.kind match {
        case "image" =>
          // full 8-byte PNG signature + IHDR dims == metadata dims
          assert(p.take(8).toSeq == Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
            .map(_.toByte))
          assert(new String(p.slice(12, 16), "US-ASCII") == "IHDR")
          assert(be32(16) == m.meta.width && be32(20) == m.meta.height,
            s"IHDR dims ${be32(16)}x${be32(20)} != meta ${m.meta.width}x${m.meta.height}")
        case "audio" =>
          assert(new String(p.slice(8, 16), "US-ASCII") == "WAVEfmt ")
          assert(le32(24) == Multimodal.sampleRateOf(m.media_id))
          // byte rate = rate * channels(1) * 16/8
          assert(le32(28) == 2 * le32(24), "WAV byte rate inconsistent with sample rate")
        case _ =>
          assert(new String(p.slice(8, 12), "US-ASCII") == Multimodal.brandOf(m.media_id))
      }
    }
  }

  test("resize updates metadata and shrinks payloads for images only") {
    val resized = resizeImages(media, 16, 16).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.foreach { m =>
      if (m.kind == "image") {
        assert(m.meta.width == 16 && m.meta.height == 16)
        assert(m.payload.length <= orig(m.media_id).payload.length)
      } else {
        assert(m.payload.toSeq == orig(m.media_id).payload.toSeq)
      }
    }
    // deterministic
    val again = resizeImages(media, 16, 16).collect().sortBy(_.media_id)
    assert(resized.sortBy(_.media_id).map(_.payload.toSeq).toSeq ==
      again.map(_.payload.toSeq).toSeq)
  }

  test("ahash60: matches a naive reference, brightness-invariant, resize/perturb-stable") {
    import graft.functions.AHash60
    def naive(vals: Array[Long]): Long = {
      val nb = vals.length
      val tot = vals.sum
      (0 until 60).foldLeft(0L) { (h, c) =>
        val lo = c * nb / 60; val hi = (c + 1) * nb / 60
        val (cs, cc) =
          if (hi > lo) (vals.slice(lo, hi).sum, (hi - lo).toLong)
          else (vals(math.min(lo, nb - 1)), 1L)
        if (cs * nb > tot * cc) h | (1L << c) else h
      }
    }
    val hdr = Multimodal.pngHeader(0, 0).length
    media.filter(_.kind == "image").collect().foreach { m =>
      val body = m.payload.drop(hdr).map(b => (b & 0xff).toLong)
      // kernel == naive reference on the raw luma
      assert(AHash60.hash(m.payload, hdr, 0, 0) == naive(body),
        s"media ${m.media_id}: kernel disagrees with the reference hash")
      // EXACT brightness invariance: +k shifts cell and global means
      // identically (cs'·nb - tot'·cc == cs·nb - tot·cc)
      assert(naive(body.map(_ + 37L)) == naive(body))
      // box-filter resize stays within the banding guarantee; perturb
      // is near-invariant (measured contract the m05 threshold pins)
      val h0 = AHash60.hash(m.payload, hdr, 0, 0)
      val hr = AHash60.hash(m.payload, hdr, 1, 0)
      val hp = AHash60.hash(m.payload, hdr, 0, 16)
      assert(java.lang.Long.bitCount(h0 ^ hr) <= 5,
        s"media ${m.media_id}: resize hamming ${java.lang.Long.bitCount(h0 ^ hr)} > 5")
      assert(java.lang.Long.bitCount(h0 ^ hp) <= 1,
        s"media ${m.media_id}: perturb hamming ${java.lang.Long.bitCount(h0 ^ hp)} > 1")
      // signature uses only the low 60 bits (signed-long portability)
      assert((h0 >>> 60) == 0L && (hr >>> 60) == 0L && (hp >>> 60) == 0L)
    }
  }

  test("m05 output: planted variant pairs recovered, banding loses nothing at the threshold") {
    import graft.functions.AHash60
    val hdr = Multimodal.pngHeader(0, 0).length
    val pairs = graft.queries.MultimodalQueries.m05PerceptualNearDup
      .run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.nonEmpty)
    val imgs = media.filter(_.kind == "image").collect()
    // every planted (original, variant) pair is in the output — the
    // 6x10-bit bands GUARANTEE recall at hamming <= 5 by pigeonhole
    imgs.foreach { m =>
      val base = m.media_id * 4
      assert(pairs.exists(p => p._1 == base && p._2 == base + 1),
        s"media ${m.media_id}: resize pair missing")
      assert(pairs.exists(p => p._1 == base && p._2 == base + 2),
        s"media ${m.media_id}: re-encode pair missing")
    }
    // completeness: output == brute-force all-pairs at the threshold
    // (banding is a candidate filter, never a recall filter here)
    val items = imgs.flatMap { m =>
      Seq((m.media_id * 4, AHash60.hash(m.payload, hdr, 0, 0)),
        (m.media_id * 4 + 1, AHash60.hash(m.payload, hdr, 1, 0)),
        (m.media_id * 4 + 2, AHash60.hash(m.payload, hdr, 0, 16)))
    }
    val brute = (for {
      (ia, ha) <- items; (ib, hb) <- items if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 5
    } yield (ia, ib, d.toLong)).toSet
    assert(pairs == brute,
      s"banding output differs from brute force: missing ${brute -- pairs}, extra ${pairs -- brute}")
  }

  test("audio_fp60: matches a naive reference; gain/offset EXACTLY invariant; noise in radius") {
    import graft.functions.AudioFp60
    // naive reference, written independently of the kernel's loops
    def naive(vals: Array[Long]): Long = {
      val c = AudioFp60.Frames * AudioFp60.FrameLen
      val nb = vals.length
      val m = Array.tabulate(c) { x =>
        val lo = x * nb / c; val hi = (x + 1) * nb / c
        if (hi > lo) vals.slice(lo, hi).sum * AudioFp60.MicroScale / (hi - lo)
        else vals(math.min(lo, nb - 1)) * AudioFp60.MicroScale
      }
      val e = Array.tabulate(AudioFp60.Frames, AudioFp60.Bands) { (f, b) =>
        math.abs((0 until AudioFp60.FrameLen)
          .map(s => AudioFp60.Basis(b)(s) * m(f * AudioFp60.FrameLen + s)).sum)
      }
      (for {
        f <- 1 until AudioFp60.Frames
        b <- 1 until AudioFp60.Bands
        if (e(f)(b) - e(f)(b - 1)) - (e(f - 1)(b) - e(f - 1)(b - 1)) > 0
      } yield 1L << ((f - 1) * (AudioFp60.Bands - 1) + (b - 1))).foldLeft(0L)(_ | _)
    }
    // every basis row sums to exactly zero — the offset-invariance proof
    AudioFp60.Basis.foreach(row => assert(row.sum == 0L))
    val hdr = Multimodal.wavHeader(8000).length
    media.filter(_.kind == "audio").collect().foreach { m =>
      val body = m.payload.drop(hdr).map(b => (b & 0xff).toLong)
      val h0 = AudioFp60.hash(m.payload, hdr, 0, 1, 0)
      assert(h0 == naive(body),
        s"media ${m.media_id}: kernel disagrees with the reference fingerprint")
      // PROVABLE invariances: positive gain scales every projection by
      // the same factor; constant offset cancels (zero-sum basis rows)
      assert(naive(body.map(_ * 5L)) == h0)
      assert(naive(body.map(_ + 123L)) == h0)
      // the planted re-master (dense noise + gain 3 + offset 7) is
      // EXACT: the every-2nd-sample comb is half DC (cancelled) plus a
      // Nyquist component the low bands reject
      assert(AudioFp60.hash(m.payload, hdr, 2, 3, 7) == h0,
        s"media ${m.media_id}: re-master variant not hash-identical")
      // sparse noise aliases against the cell grid — stays within the
      // 10x6 banding radius (measured contract the m06 threshold pins)
      val hp = AudioFp60.hash(m.payload, hdr, 32, 1, 0)
      assert(java.lang.Long.bitCount(h0 ^ hp) <= 9,
        s"media ${m.media_id}: sparse-noise hamming ${java.lang.Long.bitCount(h0 ^ hp)} > 9")
      // signature uses only the low 60 bits (signed-long portability)
      assert((h0 >>> 60) == 0L && (hp >>> 60) == 0L)
    }
  }

  test("m06 output: all planted variant pairs recovered; banding loses nothing") {
    import graft.functions.AudioFp60
    val hdr = Multimodal.wavHeader(8000).length
    val pairs = graft.queries.MultimodalQueries.m06AudioFingerprint
      .run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.nonEmpty)
    val auds = media.filter(_.kind == "audio").collect()
    // all three within-media variant pairs recovered for every item —
    // the 10x6-bit bands GUARANTEE recall at hamming <= 9 by pigeonhole
    auds.foreach { m =>
      val base = m.media_id * 4
      Seq(base -> (base + 1), base -> (base + 2), (base + 1) -> (base + 2)).foreach {
        case (a, b) => assert(pairs.exists(p => p._1 == a && p._2 == b),
          s"media ${m.media_id}: planted pair ($a, $b) missing")
      }
    }
    // the re-master leg is hash-identical, so its pairs sit at hamming 0
    auds.foreach { m =>
      val base = m.media_id * 4
      assert(pairs.contains((base, base + 1, 0L)),
        s"media ${m.media_id}: re-master pair not at hamming 0")
    }
    // completeness: output == brute-force all-pairs at the threshold
    // (banding is a candidate filter, never a recall filter; the 12
    // cross-media generator near-dups at hamming 8-9 are real corpus
    // structure and must survive too)
    val items = auds.flatMap { m =>
      Seq((m.media_id * 4, AudioFp60.hash(m.payload, hdr, 0, 1, 0)),
        (m.media_id * 4 + 1, AudioFp60.hash(m.payload, hdr, 2, 3, 7)),
        (m.media_id * 4 + 2, AudioFp60.hash(m.payload, hdr, 32, 1, 0)))
    }
    val brute = (for {
      (ia, ha) <- items; (ib, hb) <- items if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 9
    } yield (ia, ib, d.toLong)).toSet
    assert(pairs == brute,
      s"banding output differs from brute force: missing ${brute -- pairs}, extra ${pairs -- brute}")
    assert(pairs.count(p => p._1 / 4 != p._2 / 4) == 12,
      "cross-media near-dup count drifted — the fixture generator changed")
  }

  test("video_sig: matches a naive reference; trim shifts, perturb almost never flips") {
    import graft.functions.VideoSig
    val hdr = Multimodal.mp4Header("isom").length
    val vids = media.filter(_.kind == "video").collect()
    assert(vids.nonEmpty)
    // naive reference, written independently of the kernel's loops
    def ref(p: Array[Byte], trim: Int, perturb: Int): Seq[Long] = {
      val body = p.drop(hdr).zipWithIndex
        .map { case (b, i) =>
          (b & 0xff).toLong + (if (perturb > 0 && i % perturb == 0) 1L else 0L)
        }
      body.grouped(8).filter(_.length == 8).toSeq.drop(trim)
        .map(f => f.sum / 32L)
    }
    vids.foreach { m =>
      Seq((0, 0), (2, 0), (0, 16)).foreach { case (trim, pert) =>
        val k = VideoSig.sigs(m.payload, hdr, 8, trim, pert, 4)
          .toLongArray().toSeq
        assert(k == ref(m.payload, trim, pert),
          s"media ${m.media_id} trim=$trim perturb=$pert kernel != reference")
      }
      // trim drops exactly the first 2 signatures, nothing else
      val full = VideoSig.sigs(m.payload, hdr, 8, 0, 0, 4).toLongArray().toSeq
      val trimmed = VideoSig.sigs(m.payload, hdr, 8, 2, 0, 4).toLongArray().toSeq
      assert(trimmed == full.drop(2))
      // the re-encode perturbation flips at most 1 token per video on
      // this fixture (sum moves <= 1 against a 32-wide bucket)
      val pert = VideoSig.sigs(m.payload, hdr, 8, 0, 16, 4).toLongArray().toSeq
      assert(full.zip(pert).count { case (a, b) => a != b } <= 1,
        s"media ${m.media_id}: perturbation flipped too many tokens")
    }
  }

  test("m07 output: planted trim/re-encode pairs recovered; jaccard is true set jaccard") {
    import graft.functions.VideoSig
    val hdr = Multimodal.mp4Header("isom").length
    val out = graft.queries.MultimodalQueries.m07VideoNearDup
      .run(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.nonEmpty)
    val vids = media.filter(_.kind == "video").collect()
    // every planted (original, trimmed) and (original, re-encoded)
    // pair survives the 0.5 gate — the trim keeps the shingle set
    // mostly intact and the perturbation flips <= 1 token
    vids.foreach { m =>
      val base = m.media_id * 4
      assert(out.contains((base, base + 1)), s"media ${m.media_id}: trim pair missing")
      assert(out.contains((base, base + 2)), s"media ${m.media_id}: re-encode pair missing")
      assert(out.contains((base + 1, base + 2)), s"media ${m.media_id}: variant pair missing")
    }
    // reported jaccard == independently computed exact 3-gram set
    // jaccard (the df cap bounded candidates, not the score), and the
    // output is exactly the >= 0.5 brute-force pair set
    def shingleSet(sigs: Seq[Long]): Set[Seq[Long]] =
      if (sigs.length < 3) Set(sigs) else sigs.sliding(3).toSet
    val items = vids.flatMap { m =>
      Seq(
        (m.media_id * 4, shingleSet(VideoSig.sigs(m.payload, hdr, 8, 0, 0, 4).toLongArray().toSeq)),
        (m.media_id * 4 + 1, shingleSet(VideoSig.sigs(m.payload, hdr, 8, 2, 0, 4).toLongArray().toSeq)),
        (m.media_id * 4 + 2, shingleSet(VideoSig.sigs(m.payload, hdr, 8, 0, 16, 4).toLongArray().toSeq)))
    }
    val brute = (for {
      (ia, sa) <- items; (ib, sb) <- items if ia < ib
      inter = (sa & sb).size
      j = math.floor(inter.toDouble / (sa.size + sb.size - inter) * 1e4 + 0.5) / 1e4
      if j >= 0.5
    } yield ((ia, ib), j)).toMap
    assert(out.keySet == brute.keySet,
      s"pair set differs from brute force: missing ${brute.keySet -- out.keySet}, " +
        s"extra ${out.keySet -- brute.keySet}")
    brute.foreach { case (k, j) =>
      assert(math.abs(out(k) - j) < 5e-5, s"pair $k: reported ${out(k)} vs exact $j")
    }
  }

  test("binary columns round-trip through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[MediaFile]
    assert(back.count() == 60)
    val a = media.filter(_.media_id == 5L).head().payload.toSeq
    val b = back.filter(_.media_id == 5L).head().payload.toSeq
    assert(a == b)
  }
}
