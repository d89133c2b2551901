package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Custom-expression semantics: each codegen expression must agree
  * with the built-in (interpreted) composition it replaced, on both
  * the codegen and interpreted evaluation paths.
  */
class ExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
  private def embs = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  /** Run the same check with whole-stage codegen on and off, so both
    * doGenCode and nullSafeEval are exercised.
    */
  private def bothPaths(check: => Unit): Unit = {
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    check
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("FloatVecDot equals the aggregate/zip_with fold bit-for-bit") {
    bothPaths {
      val hof = aggregate(
        zip_with(col("a"), col("b"), (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val rows = embs.select(col("embedding").as("a"), col("vec_id"))
        .crossJoin(embs.limit(3).select(col("embedding").as("b")))
        .limit(200)
        .select(FloatVecDot(col("a"), col("b")).as("fast"), hof.as("ref"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    }
  }

  test("WordShingles equals the transform/array_distinct chain") {
    bothPaths {
      val ws = split(col("text"), " ")
      val hof = when(size(ws) < 3, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(0), size(ws) - 3),
          i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2),
            element_at(ws, i + 3)))))
      val diff = docs
        .select(WordShingles(col("text"), 3).as("fast"), hof.as("ref"))
        .filter(not(col("fast") === col("ref")))
        .count()
      assert(diff == 0)
    }
  }

  test("GramMd5s equals the transform/md5 chains, both modes and " +
      "codegen paths") {
    bothPaths {
      // word mode vs the exact idiom it replaced (incl. split's
      // trailing-empty-token convention via the synthetic suffix doc)
      val augmented = docs.select(col("text"))
        .union(spark.createDataFrame(Seq(
          Tuple1("a b c d "), Tuple1(""), Tuple1("x y"))).toDF("text"))
      val wordRef = when(size(split(col("text"), " ")) < 3,
        array().cast("array<string>"))
        .otherwise(expr(
          "transform(sequence(1, size(split(text, ' ')) - 2), " +
            "i -> md5(CAST(array_join(slice(split(text, ' '), i, 3), ' ')" +
            " AS BINARY)))"))
      assert(augmented
        .select(functions.GramMd5s(col("text"), 3, words = true).as("fast"),
          wordRef.as("ref"))
        .filter(not(col("fast") === col("ref"))).count() == 0)
      // char mode vs substring/md5 over the sentinel-coded form
      val enc = org.apache.spark.sql.functions.replace(
        graft.queries.TextAnalysis.bpeEncode(col("text")),
        lit(" "), lit(""))
      val charRef = when(length(col("enc")) < 50,
        array().cast("array<string>"))
        .otherwise(expr(
          "transform(sequence(1, length(enc) - 49), " +
            "i -> md5(CAST(substring(enc, i, 50) AS BINARY)))"))
      assert(docs.select(enc.as("enc"))
        .select(functions.GramMd5s(col("enc"), 50, words = false).as("fast"),
          charRef.as("ref"))
        .filter(not(col("fast") === col("ref"))).count() == 0)
    }
  }

  test("GramMd5s char mode windows CODE POINTS on multi-byte input — " +
      "engine-exact md5(substring) on accents, CJK, astral emoji, and " +
      "the U+E000 sentinel band") {
    import spark.implicits._
    bothPaths {
      // 2-byte (é ö ü ß), 3-byte (CJK + U+E000/U+E001 sentinels), and
      // 4-byte astral (surrogate PAIRS in UTF-16 — the case UTF-16
      // windowing would split) code points, mixed with ASCII
      val mixed = Seq("héllo wörld grüß",
        "漢字かな混じり文",
        "abc",
        "x😀y🚀z😀",
        "né").toDF("text")
      val ref = when(length(col("text")) < 3,
        array().cast("array<string>"))
        .otherwise(expr(
          "transform(sequence(1, length(text) - 2), " +
            "i -> md5(CAST(substring(text, i, 3) AS BINARY)))"))
      assert(mixed
        .select(functions.GramMd5s(col("text"), 3, words = false).as("fast"),
          ref.as("ref"))
        .filter(not(col("fast") === col("ref"))).count() == 0)
      // word mode unchanged on multi-byte input
      assert(mixed.limit(1)
        .select(functions.GramMd5s(col("text"), 3, words = true).as("g"))
        .selectExpr("size(g)").as[Int].head() == 1)
    }
  }

  test("GramMd5s char mode frames INVALID UTF-8 exactly like engine " +
      "substring (stray continuation lead, 0xF5 lead, truncated tail)") {
    import org.apache.spark.unsafe.types.UTF8String
    // malformed bytes cannot ride a DataFrame (the String round-trip
    // sanitizes them) — compare at eval level against Spark's OWN
    // substringSQL + md5, the exact reference the scaladoc promises
    val cases = Seq(
      Array(0x80, 'a'.toInt, 'b'.toInt, 'c'.toInt),  // stray continuation
      Array('a'.toInt, 0xF5, 'b'.toInt, 'c'.toInt, 'd'.toInt)) // bad lead
    cases.foreach { ints =>
      val bs = ints.map(_.toByte)
      val s = UTF8String.fromBytes(bs)
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = (1 to math.max(0, s.numChars - 3 + 1)).map { i =>
        md.reset()
        md.digest(s.substringSQL(i, 3).getBytes)
          .map("%02x".format(_)).mkString
      }
      val got = functions.GramMd5sHelper.compute(s, 3, words = false)
      assert(got.numElements == want.length,
        s"window count diverged on ${ints.map(_.toHexString).mkString(",")}")
      (0 until got.numElements()).foreach { j =>
        assert(got.getUTF8String(j).toString == want(j),
          s"window $j diverged on ${ints.map(_.toHexString).mkString(",")}")
      }
    }
    // a TRUNCATED multi-byte tail is the one documented divergence:
    // Spark's unsafe substring copies past the logical buffer there
    // (empirically b,c,E4,B8,0x00 — whatever byte follows in memory),
    // which is undefined, not a semantic to reproduce. The compiled
    // scan clamps the final window to the real bytes.
    val trunc = UTF8String.fromBytes(
      Array('a'.toInt, 'b'.toInt, 'c'.toInt, 0xE4, 0xB8).map(_.toByte))
    val got = functions.GramMd5sHelper.compute(trunc, 3, words = false)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(bs: Array[Byte]) = {
      md.reset(); md.digest(bs).map("%02x".format(_)).mkString
    }
    assert(got.numElements == 2) // numChars = 4 (a, b, c, truncated E4)
    assert(got.getUTF8String(0).toString == h("abc".getBytes),
      "window 0 must be the first 3 code points' real bytes")
    assert(got.getUTF8String(1).toString ==
      h("bc".getBytes ++ Array(0xE4.toByte, 0xB8.toByte)),
      "final window must clamp to the buffer, never read past it")
  }

  test("WordShingles edge cases: short docs, k=1") {
    import spark.implicits._
    bothPaths {
      val df = Seq("one two", "a", "", "x y z", "x y z x y z").toDF("text")
      val got = df.select(WordShingles(col("text"), 3).as("g"))
        .collect().map(_.getSeq[String](0))
      assert(got(0).isEmpty && got(1).isEmpty && got(2).isEmpty)
      assert(got(3) == Seq("x y z"))
      assert(got(4) == Seq("x y z", "y z x", "z x y")) // distinct, first-occurrence order
      val k1 = df.select(WordShingles(col("text"), 1).as("g"))
        .collect().map(_.getSeq[String](0))
      assert(k1(3) == Seq("x", "y", "z"))
    }
  }

  test("FloatVecDot null contract matches zip_with: length mismatch and null elements give NULL") {
    bothPaths {
      val hof = aggregate(
        zip_with(col("a"), col("b"), (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val rows = spark.range(1).select(
          array(lit(1.0f), lit(2.0f)).as("a"),
          array(lit(3.0f)).as("b"))
        .select(FloatVecDot(col("a"), col("b")).as("fast"), hof.as("ref"))
        .union(spark.range(1).select(
            array(lit(1.0f), lit(null.asInstanceOf[java.lang.Float])).as("a"),
            array(lit(3.0f), lit(4.0f)).as("b"))
          .select(FloatVecDot(col("a"), col("b")).as("fast"), hof.as("ref")))
        .collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) && r.isNullAt(1),
          s"expected NULL from both forms, got $r")
      }
    }
  }

  test("HornerHash equals the aggregate/ascii HOF fold, both codegen paths") {
    bothPaths {
      val hof = aggregate(
        sequence(lit(1), length(col("w"))), lit(0L),
        (acc, j) =>
          (acc * 31 + ascii(col("w").substr(j.cast("int"), lit(1)))) % 4096)
      val rows = docs
        .select(explode(split(col("text"), " ")).as("w"))
        .limit(500)
        .select(HornerHash(col("w"), 31, 4096).as("fast"), hof.as("ref"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    }
    // explicit codepoint check without the DF round-trip
    import org.apache.spark.unsafe.types.UTF8String
    assert(HornerHashHelper.compute(UTF8String.fromString("ab"), 31, 4096) ==
      ((97L * 31 + 98) % 4096))
    assert(HornerHashHelper.compute(UTF8String.fromString("日"), 31, 100000) ==
      '日'.toLong % 100000)
    assert(HornerHashHelper.compute(UTF8String.fromString(""), 31, 4096) == 0L)
  }

  test("KGramHashes equals the per-position aggregate fold, both codegen paths") {
    bothPaths {
      val k = 8
      val hof = transform(
        sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(0))),
        p => aggregate(sequence(p, p + (k - 1)), lit(0L),
          (acc, j) =>
            (acc * 257 + ascii(col("text").substr(j.cast("int"), lit(1))))
              % 1000000007L))
      val rows = docs.limit(50)
        .select(KGramHashes(col("text"), k, 257, 1000000007L).as("fast"),
          hof.as("ref"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), r)
      }
    }
    import org.apache.spark.unsafe.types.UTF8String
    // short string: fewer than k codepoints -> empty stream
    assert(KGramHashesHelper.compute(
      UTF8String.fromString("abc"), 8, 257, 1000000007L).numElements() == 0)
  }

  test("MinHashSignature: deterministic, monotone under subset growth") {
    bothPaths {
      val sig = docs.select(col("doc_id"),
        MinHashSignature(WordShingles(col("text"), 3), 16).as("sig"))
      val rows = sig.collect()
      assert(rows.forall(_.getSeq[Long](1).size == 16))
      // identical input => identical signature
      val again = sig.collect()
      assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    }
  }

  test("SimHash60 matches the explicit md5-bit pipeline") {
    bothPaths {
      // reference computation in Scala, mirroring the oracle SQL
      val texts = docs.select(col("doc_id"), col("text")).limit(50).collect()
      val expected = texts.map { r =>
        val toks = r.getString(1).split(' ').distinct
        val counts = new Array[Int](60)
        for (t <- toks) {
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
          for (b <- 0 until 60) {
            val nibble = Integer.parseInt(hex.substring(1 + b / 4, 2 + b / 4), 16)
            val bit = (nibble >> (3 - b % 4)) & 1
            counts(b) += (if (bit == 1) 1 else -1)
          }
        }
        var sim = 0L
        for (b <- 0 until 60) if (counts(b) > 0) sim |= 1L << (59 - b)
        r.getLong(0) -> sim
      }.toMap
      val got = docs.limit(50)
        .select(col("doc_id"),
          SimHash60(array_distinct(split(col("text"), " "))).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("TopKPairsAgg equals the row_number window form on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // duplicate values force the tie-break path; duplicate keys force merges
    val rows = Seq.tabulate(5000)(i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(25).toLong * 100, i.toLong))
    val df = rows.toDF("key", "value", "tie").repartition(7)

    val agg = df.groupBy(col("key"))
      .agg(graft.operators.TopKPairsAgg(col("value"), col("tie"), 3).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("key"), col("p.value").as("value"), col("p.tie").as("tie"),
        (col("i") + 1).as("rn"))

    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
      .orderBy(col("value").desc, col("tie"))
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("key"), col("value"), col("tie"), col("rn"))

    assert(agg.except(win).count() == 0 && win.except(agg).count() == 0)
    assert(agg.count() == win.count())
  }

  test("sortable bits: order-preserving, bit-exact round trip, both codegen paths") {
    import graft.functions.{DoubleSortableBits, SortableBitsHelper, SortableBitsToDouble}
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val doubles = Seq(Double.MinValue, -1e300, -1.5, -1e-300, -0.0, 0.0,
      1e-300, 0.25504277088103294, 1.5, 1e300, Double.MaxValue,
      Double.NegativeInfinity, Double.PositiveInfinity) ++
      Seq.fill(500)(rnd.nextDouble() * 2 - 1)
    // helper level: strict monotonicity + involution
    val sorted = doubles.sorted
    val enc = sorted.map(SortableBitsHelper.toSortable)
    assert(enc == enc.sorted, "encoded order must match double order")
    for (d <- doubles)
      assert(java.lang.Double.doubleToRawLongBits(
        SortableBitsHelper.fromSortable(SortableBitsHelper.toSortable(d))) ==
        java.lang.Double.doubleToRawLongBits(d))
    // expression level: codegen and interpreted agree with the helper
    val df = doubles.zipWithIndex.map(_.swap).toDF("i", "x")
    for (cg <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", cg)
      val got = df.select(col("i"), DoubleSortableBits(col("x")).as("s"))
        .withColumn("back", SortableBitsToDouble(col("s")))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      for ((i, s, back) <- got) {
        assert(s == SortableBitsHelper.toSortable(doubles(i)))
        assert(java.lang.Double.doubleToRawLongBits(back) ==
          java.lang.Double.doubleToRawLongBits(doubles(i)))
      }
    }
    spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("horner_hash SQL surface accepts long-literal mult/mod like the Column API") {
    graft.functions.Registry.registerAll(spark)
    // a prime modulus above Int.MaxValue — inside HornerHash's
    // overflow-safe domain; the SQL builder must not narrow it to Int
    val got = spark.sql("SELECT horner_hash('ab', 31, 4294967311) AS h")
      .collect()(0).getLong(0)
    assert(got == (97L * 31 + 98) % 4294967311L)
  }

  test("aggregates reach the SQL surface through the registry") {
    import spark.implicits._
    graft.functions.Registry.registerAll(spark)
    Seq.tabulate(100)(i => (i.toLong % 7, i.toLong))
      .toDF("key", "tie").createOrReplaceTempView("reg_agg_probe")
    val cms = spark.sql(
      "SELECT count_min(key, 2, 16) AS cells FROM reg_agg_probe")
      .collect()(0).getSeq[Long](0)
    assert(cms.length == 32 && cms.sum == 200) // 100 rows x depth 2
    val topk = spark.sql(
      """SELECT topk_pairs(tie, key, 3) AS top FROM reg_agg_probe""")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(topk.map(_.getLong(0)) == Seq(99L, 98L, 97L))
  }

  test("NearestCentroids k=1 equals the per-centroid fan-out chain bit-for-bit") {
    // the exact shape this expression replaced: one cosine column per
    // centroid, greatest + first-match CASE chain (ties to lower cid)
    val cents: Seq[Seq[Double]] = embs.limit(16)
      .select(transform(col("embedding"), x => x.cast("double")))
      .collect().map(_.getSeq[Double](0)).toSeq
    def litVec(v: Seq[Double]) = array(v.map(lit): _*)
    bothPaths {
      val base = embs.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("dv"))
        .withColumn("nvn", sqrt(DoubleVecDot(col("dv"), col("dv"))))
      val withCos = cents.zipWithIndex.foldLeft(base) { case (acc, (v, cid)) =>
        acc.withColumn(s"cos_$cid",
          DoubleVecDot(col("dv"), litVec(v)) /
            (col("nvn") * math.sqrt(v.map(x => x * x).sum)))
      }
      val best = greatest(cents.indices.map(cid => col(s"cos_$cid")): _*)
      val pick = cents.indices.foldRight(lit(-1)) { case (cid, els) =>
        when(col(s"cos_$cid") === best, lit(cid)).otherwise(els)
      }
      val rows = withCos
        .withColumn("chain_cid", pick)
        .withColumn("chain_best", best)
        .withColumn("nc", NearestCentroids(col("dv"), cents, 1))
        .select(col("chain_cid"), col("chain_best"),
          col("nc").getItem(0).getField("cid"),
          col("nc").getItem(0).getField("score"))
        .collect()
      assert(rows.length >= 100)
      rows.foreach { r =>
        assert(r.getInt(0) == r.getInt(2), s"cid mismatch: $r")
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(3)), s"score: $r")
      }
    }
  }

  test("NearestCentroids k>1 equals the crossJoin + rank-window probe shape") {
    import spark.implicits._
    val nProbe = 5
    val centsF: Seq[(Int, Seq[Float])] = embs.limit(16)
      .select(col("vec_id"), col("embedding"))
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1)) }.toSeq
    // float centroids promoted per element — lossless, FloatVecDot's
    // own promotion
    val m: Seq[Seq[Double]] = centsF.map(_._2.map(_.toDouble))
    bothPaths {
      val centsDf = centsF.toDF("cent_id", "cv")
        .withColumn("cn", TextFns.norm(col("cv")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))
      val expect = embs.withColumn("nrm", TextFns.norm(col("embedding")))
        .crossJoin(broadcast(centsDf))
        .withColumn("ccos", TextFns.cosineFrom(
          TextFns.dot(col("embedding"), col("cv")), col("nrm"), col("cn")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= nProbe)
        .select(col("vec_id"), col("rnk"), col("cent_id"), col("ccos"))
      val got = embs
        .select(col("vec_id"), posexplode(
          NearestCentroids(col("embedding"), m, nProbe)).as(Seq("p", "nc")))
        .select(col("vec_id"), (col("p") + 1).as("rnk"),
          col("nc.cid").as("cent_id"), col("nc.score").as("ccos"))
      assert(expect.exceptAll(got).isEmpty && got.exceptAll(expect).isEmpty)
    }
  }

  test("NearestCentroids ties go to the lower cid; CentroidVector looks up") {
    import spark.implicits._
    // two identical centroids -> equal cosines; the chain/window both
    // pick the lower cid on ties
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    bothPaths {
      val rows = Seq(Seq(2.0, 0.1), Seq(0.1, 3.0)).toDF("v")
        .select(col("v"),
          NearestCentroids(col("v"), cents, 3).as("nc"),
          CentroidVector(
            NearestCentroids(col("v"), cents, 1).getItem(0).getField("cid"),
            cents).as("cv"))
        .collect()
      val nc0 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      assert(nc0.map(_.getInt(0)) == Seq(0, 2, 1)) // tie 0 before 2
      assert(rows(0).getSeq[Double](2) == Seq(1.0, 0.0))
      val nc1 = rows(1).getSeq[org.apache.spark.sql.Row](1)
      assert(nc1.map(_.getInt(0)) == Seq(1, 0, 2))
      assert(rows(1).getSeq[Double](2) == Seq(0.0, 1.0))
    }
  }

  test("registerAll reclaims a graft name from a foreign registration," +
      " in a fresh session") {
    // fresh session state: newSession() shares the context but gets its
    // own function registry, so this doesn't disturb other tests
    val s2 = spark.newSession()
    import s2.implicits._
    // a user (or a future Spark built-in) squats on a graft name
    s2.udf.register("simhash60",
      (xs: Seq[String]) => -1L)
    Seq(Seq("a", "b")).toDF("toks").createOrReplaceTempView("reg_own_probe")
    assert(s2.sql("SELECT simhash60(toks) AS h FROM reg_own_probe")
      .collect()(0).getLong(0) == -1L)
    // first registerAll on this session must install graft's
    // implementation over the squatter (ownership, not mere existence)
    graft.functions.Registry.registerAll(s2)
    val h = s2.sql("SELECT simhash60(toks) AS h FROM reg_own_probe")
      .collect()(0).getLong(0)
    assert(h != -1L)
    // and repeat calls stay idempotent (no warning spam, same result)
    graft.functions.Registry.registerAll(s2)
    assert(s2.sql("SELECT simhash60(toks) AS h FROM reg_own_probe")
      .collect()(0).getLong(0) == h)
  }

  test("nearest_centroids through SQL: literal matrix argument resolves" +
      " and matches the Column API") {
    import spark.implicits._
    graft.functions.Registry.registerAll(spark)
    val cm = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0))
    Seq((1L, Array(0.9f, 0.1f)), (2L, Array(-0.5f, 0.2f)))
      .toDF("id", "v").createOrReplaceTempView("nc_probe")
    val viaSql = spark.sql(
      """SELECT id, nearest_centroids(v,
        |  array(array(1.0d, 0.0d), array(0.0d, 1.0d), array(-1.0d, 0.0d)),
        |  1)[0].cid AS cid
        |FROM nc_probe ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val viaColumn = spark.table("nc_probe")
      .select(col("id"), graft.functions.NearestCentroids(col("v"), cm, 1)
        .getItem(0).getField("cid").as("cid"))
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(viaSql.sameElements(viaColumn))
    assert(viaSql.toSeq == Seq((1L, 0), (2L, 2)))
  }

  test("nearest_centroids through SQL: decimal/int literal matrices" +
      " coerce, non-numeric raises the descriptive error") {
    import spark.implicits._
    graft.functions.Registry.registerAll(spark)
    Seq((1L, Array(0.9f, 0.1f)), (2L, Array(-0.5f, 0.2f)))
      .toDF("id", "v").createOrReplaceTempView("nc_coerce_probe")
    // a bare SQL literal like 1.0 types as decimal(2,1), not double —
    // the element read must dispatch on the declared type, not assume
    // double bytes
    for (mat <- Seq(
        "array(array(1.0, 0.0), array(0.0, 1.0), array(-1.0, 0.0))",
        "array(array(1, 0), array(0, 1), array(-1, 0))")) {
      val got = spark.sql(
        s"""SELECT id, nearest_centroids(v, $mat, 1)[0].cid AS cid
           |FROM nc_coerce_probe ORDER BY id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(got == Seq((1L, 0), (2L, 2)), s"matrix literal $mat")
    }
    val err = intercept[Exception] {
      spark.sql("SELECT nearest_centroids(v, array(array('a')), 1)" +
        " FROM nc_coerce_probe").collect()
    }
    assert(err.getMessage.contains("array<array<numeric>>"),
      err.getMessage.take(300))
  }

}
