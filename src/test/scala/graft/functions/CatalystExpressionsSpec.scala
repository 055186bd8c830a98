package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class CatalystExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("RollingHash native expression == built-in higher-order fold") {
    val docs = Tables.documents(spark, sfDir)
    val mismatches = docs.select(
      exprs.rolling_hash($"text").as("native"),
      TextFunctions.rollingHash($"text").as("fold"))
      .filter($"native" =!= $"fold")
      .count()
    assert(mismatches == 0)
  }

  test("RollingHash known value: fold of 'ab' = (0*31+97)*31+98 mod 1e9+7") {
    val got = Seq("ab").toDF("t")
      .select(exprs.rolling_hash($"t")).head().getLong(0)
    assert(got == (97L * 31 + 98) % 1000000007L)
  }

  test("RollingHash handles empty string and null") {
    val rows = Seq(Some(""), None).toDF("t")
      .select(exprs.rolling_hash($"t").as("h")).collect()
    assert(rows(0).getLong(0) == 0L)
    assert(rows(1).isNullAt(0))
  }

  test("SimHash60: identical token arrays -> identical hash; stays in 60 bits") {
    val df = Seq(
      ("a b c d e f g h", "a b c d e f g h"),
      ("the quick brown fox", "the quick brown fox")).toDF("t1", "t2")
    val rows = df.select(
      exprs.simhash60(split($"t1", " ")).as("h1"),
      exprs.simhash60(split($"t2", " ")).as("h2")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60))
    }
  }

  test("SimHash60: near-identical docs are close in Hamming distance, unrelated far") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok30", "tok30x")
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val r = Seq((base, near, far)).toDF("a", "b", "c")
      .select(
        bit_count(exprs.simhash60(split($"a", " "))
          .bitwiseXOR(exprs.simhash60(split($"b", " ")))).as("near_d"),
        bit_count(exprs.simhash60(split($"a", " "))
          .bitwiseXOR(exprs.simhash60(split($"c", " ")))).as("far_d"))
      .head()
    assert(r.getInt(0) < r.getInt(1), s"near=${r.getInt(0)} far=${r.getInt(1)}")
    assert(r.getInt(0) <= 12)
  }

  test("DotProductF native kernel == higher-order fold on real embeddings") {
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val q = Tables.embeddings(spark, sfDir).filter($"vec_id" === 0)
      .select($"embedding".as("q_emb"))
    val mism = e.crossJoin(q)
      .select(
        VectorFunctions.dot($"embedding", $"q_emb").as("native"),
        VectorFunctions.dotFold($"embedding", $"q_emb").as("fold"))
      .filter($"native" =!= $"fold")
      .count()
    assert(mism == 0)
  }

  test("WordShingles native kernel == declarative fold on real documents") {
    val docs = Tables.documents(spark, sfDir)
    val mism = docs.select(
      graft.operators.TextDedup.shingles($"text").as("native"),
      graft.operators.TextDedup.shinglesFold($"text").as("fold"))
      .filter(not($"native" <=> $"fold"))
      .count()
    assert(mism == 0)
    // edge cases: short doc, extra whitespace
    val edge = Seq("a b", "  x   y z  ", "one two three four five six").toDF("text")
    val rows = edge.select(
      graft.operators.TextDedup.shingles($"text").as("native"),
      graft.operators.TextDedup.shinglesFold($"text").as("fold")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("TokensInSet native kernel == declarative filter on real documents") {
    val docs = Tables.documents(spark, sfDir)
    val toks = TextFunctions.wsTokens($"text")
    val vocab = TextFunctions.stopwords
    val mism = docs.select(
      TextFunctions.tokensInSet(toks, vocab).as("native"),
      TextFunctions.tokensInSetFold(toks, vocab).as("fold"))
      .filter($"native" =!= $"fold")
      .count()
    assert(mism == 0)
  }

  test("token hash matches the engine-portable md5-prefix definition") {
    // DuckDB: CAST('0x'||substr(md5('abc'),1,15) AS BIGINT) = 648541476951500027
    val h = TextExprImpl.tokenHash60(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
    assert(h == 648541476951500027L)
  }

  test("TermFreqs native kernel == wsTokens explode+groupBy on real documents") {
    val docs = Tables.documents(spark, sfDir)
    // declarative reference census
    val ref = docs
      .select($"doc_id", explode(TextFunctions.wsTokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val kern = docs
      .select($"doc_id", exprs.term_freqs($"text").as("p"))
      .select($"doc_id", explode($"p.freqs").as("f"))
      .select($"doc_id", $"f.term".as("term"), $"f.tf".as("tf"))
    assert(ref.exceptAll(kern).isEmpty && kern.exceptAll(ref).isEmpty)
    // dl == token count for every doc
    val dlBad = docs
      .select(TextFunctions.tokenCount($"text").cast("long").as("want"),
        exprs.term_freqs($"text").getField("dl").as("got"))
      .filter($"want" =!= $"got").count()
    assert(dlBad == 0)
  }

  test("TermFreqs edge cases: empty, whitespace-only, repeats, mixed whitespace") {
    val rows = Seq("", "  \t\n ", "a a b a", " x\ty \nx ")
      .toDF("text")
      .select(exprs.term_freqs($"text").as("p"))
      .select($"p.dl", $"p.freqs")
      .collect()
    assert(rows(0).getLong(0) == 0L && rows(0).getSeq[Any](1).isEmpty)
    assert(rows(1).getLong(0) == 0L && rows(1).getSeq[Any](1).isEmpty)
    val freqs2 = rows(2).getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(rows(2).getLong(0) == 4L)
    // first-occurrence order is deterministic
    assert(freqs2 == Seq("a" -> 3L, "b" -> 1L))
    val freqs3 = rows(3).getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(rows(3).getLong(0) == 3L && freqs3 == Seq("x" -> 2L, "y" -> 1L))
  }

  test("Sq8Encode kernel == declarative max-abs/127 floor quantization on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val x = transform($"embedding", v => v.cast("double"))
    val scale = aggregate(x, lit(0.0), (acc, v) => greatest(acc, abs(v))) / lit(127.0)
    val ref = e.select(
      $"vec_id", scale.as("scale"),
      transform(x, v => floor(v / scale + lit(0.5)).cast("float")).as("codes"))
    val kern = e.select(
      $"vec_id", exprs.sq8_encode($"embedding").as("enc"))
      .select($"vec_id", $"enc.scale".as("scale"), $"enc.codes".as("codes"))
    val joined = ref.join(kern.withColumnRenamed("scale", "kscale")
      .withColumnRenamed("codes", "kcodes"), "vec_id")
    assert(joined.filter($"scale" =!= $"kscale").count() == 0)
    assert(joined.filter($"codes" =!= $"kcodes").count() == 0)
    // every code within int8 range
    val outOfRange = kern
      .select(explode($"codes").as("c")).filter(abs($"c") > 127).count()
    assert(outOfRange == 0)
  }

  test("Sq8Encode zero vector: scale 0, all-zero codes") {
    val row = Seq(Array(0.0f, 0.0f, 0.0f)).toDF("v")
      .select(exprs.sq8_encode($"v").as("enc"))
      .select($"enc.scale", $"enc.codes").head()
    assert(row.getDouble(0) == 0.0)
    assert(row.getSeq[Float](1).forall(_ == 0.0f))
  }

  test("expressions survive interpreted mode (codegen fallback parity)") {
    withCodegenOff {
      val got = Seq("ab").toDF("t").select(exprs.rolling_hash($"t")).head().getLong(0)
      assert(got == (97L * 31 + 98) % 1000000007L)
    }
  }

  test("cdc_chunks == an independent explicit-powers reimplementation; shift robustness") {
    // deterministic pseudo-random payload (LCG), long enough for
    // several content-defined boundaries at mask=64
    val n = 400
    var x = 123456789L
    val payload = Array.tabulate[Byte](n) { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L); (x >>> 33).toByte
    }
    val w = 8; val mask = 64; val mod = 1000000007L

    // independent replay: explicit Σ b·31^(w-1-k) with a pow table
    // (the oracle's formula), not the kernel's Horner accumulation
    def refChunks(p: Array[Byte]): Seq[String] = {
      val pow = Array.iterate(1L, w)(_ * 31)
      val ends = ((w - 1) until p.length).filter { i =>
        val sum = (0 until w).map(k => (p(i - w + 1 + k) & 0xff).toLong * pow(w - 1 - k)).sum
        (sum % mod) % mask == 0
      } :+ (p.length - 1)
      val hx = p.map(b => f"${b & 0xff}%02X").mkString
      ends.distinct.sorted.foldLeft((Seq.empty[String], 0)) { case ((acc, s), e) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val d = md.digest(hx.substring(s * 2, (e + 1) * 2).getBytes("US-ASCII"))
        (acc :+ d.map("%02x".format(_)).mkString, e + 1)
      }._1
    }

    def kernelChunks(p: Array[Byte]): Seq[String] = {
      val df = Seq(Tuple1(p)).toDF("payload")
      df.select(exprs.cdc_chunks($"payload", w, mask).as("c"))
        .collect().head.getSeq[String](0)
    }

    val base = kernelChunks(payload)
    assert(base == refChunks(payload), "kernel must equal the explicit-sum replay")
    assert(base.length >= 3, s"fixture should chunk several times, got ${base.length}")

    // identical payloads chunk identically; a 5-byte prefix (every
    // fixed offset shifts) still shares all chunks after the first
    // re-aligned boundary — the CDC property fixed-size chunking lacks
    val prefixed = Array[Byte](0x47, 0x52, 0x41, 0x46, 0x54) ++ payload
    val shifted = kernelChunks(prefixed)
    assert(shifted == refChunks(prefixed))
    val shared = base.toSet intersect shifted.toSet
    assert(shared.size >= base.length - 1,
      s"shifted copy must re-align: shared ${shared.size} of ${base.length}")

    // sub-window payload: one chunk, md5 of the whole hex
    val tiny = Array[Byte](1, 2, 3)
    assert(kernelChunks(tiny) == refChunks(tiny) && kernelChunks(tiny).length == 1)
  }

  private def withCodegenOff(f: => Unit): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, old)
  }
}
