package graft

class GraftExtensionsSpec extends SparkSpec {

  test("SQL surface: fvec_dot / fvec_norm / fvec_cosine") {
    val r = spark.sql(
      """SELECT fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       fvec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
        |       fvec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 && math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("SQL surface: word_shingles and simhash64/minhash_signature compose") {
    val sh = spark.sql("SELECT word_shingles('a b c d', 2) AS s").head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    val sig = spark.sql(
      """SELECT minhash_signature(transform(word_shingles('a b c d e f', 3), x -> xxhash64(x)), 16, 42) AS m,
        |       simhash64(transform(word_shingles('a b c d e f', 3), x -> xxhash64(x))) AS h
        |""".stripMargin).head()
    assert(sig.getSeq[Long](0).size == 16)
    // deterministic
    val again = spark.sql(
      "SELECT simhash64(transform(word_shingles('a b c d e f', 3), x -> xxhash64(x))) AS h").head()
    assert(sig.getLong(1) == again.getLong(0))
  }

  test("SQL surface: topk_by_score aggregate") {
    spark.sql("SELECT * FROM VALUES (1, 0.9, 10L), (1, 0.5, 11L), (1, 0.9, 9L), (2, 0.1, 7L) AS t(q, s, id)")
      .createOrReplaceTempView("scored")
    val rows = spark.sql(
      "SELECT q, topk_by_score(s, id, 2) AS top FROM scored GROUP BY q ORDER BY q")
      .collect()
    val top1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(top1.map(r => (r.getDouble(0), r.getLong(1))) == Seq((0.9, 9L), (0.9, 10L)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).size == 1)
  }

  test("SQL surface: rolling_hash matches the Scala column function") {
    import org.apache.spark.sql.functions.{col, lit}
    val viaSql = spark.sql("SELECT rolling_hash('hello world') AS h").head().getLong(0)
    val viaApi = spark.range(1)
      .select(graft.functions.TextFunctions.rollingHash(lit("hello world")).as("h"))
      .head().getLong(0)
    assert(viaSql == viaApi)
    // custom seed/prime variant used by the simhash base hash
    val small = spark.sql("SELECT rolling_hash('abc', 17, 2147483647L) AS h").head().getLong(0)
    assert(small == ((((17L * 31 + 'a') * 31 + 'b') * 31 + 'c') % 2147483647L))
  }

  test("SQL surface: rhp_band_keys equals the Scala expression path") {
    import org.apache.spark.sql.functions.{col, posexplode}
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val dim = 8; val bands = 4; val bits = 5
    // deterministic little corpus of float vectors
    val df = spark.range(20).selectExpr(
      s"id", s"transform(sequence(1, $dim), j -> CAST(sin(id * 7 + j) AS FLOAT)) AS vec")
    df.createOrReplaceTempView("rhp_vecs")
    def keyList(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaSql = keyList(spark.sql(
      s"SELECT id, b.pos AS band, b.col AS key FROM rhp_vecs " +
        s"LATERAL VIEW posexplode(rhp_band_keys(vec, $bands, $bits, $dim)) b"))
    val planes = graft.functions.VectorFunctions.rhpPlanes(bands * bits, dim).toArray
    val viaApi = keyList(df.select(col("id"),
      posexplode(ofExpr(graft.functions.expr.RhpBandKeys(
        toExpr(col("vec")), planes, bands, bits))).as(Seq("band", "key"))))
    assert(viaSql == viaApi && viaSql.nonEmpty,
      "SQL wrapper and Scala column path must produce identical band keys")
    // an explicit seed changes the planes; the default seed is 42
    val seeded = keyList(spark.sql(
      s"SELECT id, b.pos AS band, b.col AS key FROM rhp_vecs " +
        s"LATERAL VIEW posexplode(rhp_band_keys(vec, $bands, $bits, $dim, 7)) b"))
    assert(seeded != viaSql, "a different seed must derive different planes")
    // a BIGINT seed keeps its full 64 bits (an Int-truncating parse
    // would collapse 2^32 to seed 0)
    val bigSeed = keyList(spark.sql(
      s"SELECT id, b.pos AS band, b.col AS key FROM rhp_vecs " +
        s"LATERAL VIEW posexplode(rhp_band_keys(vec, $bands, $bits, $dim, 4294967296)) b"))
    val zeroSeed = keyList(spark.sql(
      s"SELECT id, b.pos AS band, b.col AS key FROM rhp_vecs " +
        s"LATERAL VIEW posexplode(rhp_band_keys(vec, $bands, $bits, $dim, 0)) b"))
    val bigApi = keyList(df.select(col("id"),
      posexplode(ofExpr(graft.functions.expr.RhpBandKeys(
        toExpr(col("vec")),
        graft.functions.VectorFunctions.rhpPlanes(bands * bits, dim, 4294967296L).toArray,
        bands, bits))).as(Seq("band", "key"))))
    assert(bigSeed == bigApi && bigSeed != zeroSeed,
      "BIGINT seeds must not truncate to Int")
    // and a wrong dim errors loudly instead of reading out of bounds
    val err = intercept[Exception] {
      spark.sql(s"SELECT rhp_band_keys(vec, $bands, $bits, ${dim * 2}) FROM rhp_vecs").collect()
    }
    assert(err.getMessage.contains("vector dim") ||
      Option(err.getCause).exists(_.getMessage.contains("vector dim")))
  }

  test("SQL surface: rhp_bit_signature + hamming_bits estimate the angle") {
    // identical vectors -> hamming 0; a vector vs its negation flips
    // every sign bit -> hamming = nBits
    val r = spark.sql(
      """SELECT hamming_bits(rhp_bit_signature(v, 128, 4), rhp_bit_signature(v, 128, 4)) AS same,
        |       hamming_bits(rhp_bit_signature(v, 128, 4),
        |                    rhp_bit_signature(transform(v, x -> -x), 128, 4)) AS opposite
        |FROM (SELECT array(CAST(0.3 AS FLOAT), CAST(-1.2 AS FLOAT),
        |                   CAST(0.7 AS FLOAT), CAST(2.1 AS FLOAT)) AS v)""".stripMargin).head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 128)
    // and the SQL wrapper derives the same planes as the Scala path
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    import org.apache.spark.sql.functions.col
    val df = spark.range(10).selectExpr(
      "id", "transform(sequence(1, 8), j -> CAST(cos(id * 3 + j) AS FLOAT)) AS vec")
    df.createOrReplaceTempView("bit_vecs")
    val viaSql = spark.sql("SELECT id, rhp_bit_signature(vec, 96, 8) AS s FROM bit_vecs")
      .collect().map(r2 => r2.getLong(0) -> r2.getSeq[Long](1)).toMap
    val viaApi = df.select(col("id"),
        ofExpr(graft.functions.expr.RhpBitSignature(toExpr(col("vec")),
          graft.functions.VectorFunctions.rhpPlanes(96, 8).toArray)).as("s"))
      .collect().map(r2 => r2.getLong(0) -> r2.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)
  }

  test("SQL surface: sig_match_count equals the HOF estimator") {
    import org.apache.spark.sql.functions.col
    assert(spark.sql(
      "SELECT sig_match_count(array(1L,2L,3L,4L), array(1L,9L,3L,0L)) AS m")
      .head().getInt(0) == 2)
    // pin against the interpreted aggregate(zip_with(...)) spelling it
    // replaced in the streaming near-dup estimator
    val df = spark.range(100).selectExpr(
      "transform(sequence(1, 32), i -> xxhash64(concat(cast(id AS string), '-', cast(i AS string)))) AS a",
      "transform(sequence(1, 32), i -> CASE WHEN i % 3 = 0 THEN " +
        "xxhash64(concat(cast(id AS string), '-', cast(i AS string))) ELSE cast(i AS bigint) END) AS b")
    val both = df.selectExpr(
      "sig_match_count(a, b) AS m",
      "aggregate(zip_with(a, b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v) AS h")
    assert(both.filter(col("m") =!= col("h")).isEmpty)
    assert(both.head().getInt(0) == 10) // i = 3,6,...,30
  }

  test("topk_by_score dedupIds: multi-band duplicates occupy one slot") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // candidate 10 scored twice (equal score, as LSH band dupes are),
    // candidate 11 once — k=2 must hold BOTH distinct ids
    val scored = Seq((1, 0.9, 10L), (1, 0.9, 10L), (1, 0.5, 11L))
      .toDF("q", "cosine", "neighbor_id")
    val topk = ofExpr(graft.functions.expr.TopKByScore(
      toExpr(col("cosine")), toExpr(col("neighbor_id")), 2,
      dedupIds = true).toAggregateExpression())
    val top = scored.groupBy("q").agg(topk.as("top"))
      .head().getSeq[org.apache.spark.sql.Row](1)
    assert(top.map(r => (r.getDouble(0), r.getLong(1))) == Seq((0.9, 10L), (0.5, 11L)))
  }

  test("bad literal args produce clear errors") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b', 'x')").collect()
    }
    assert(e.getMessage.contains("k must be an integer literal"))
  }
}
