package graft

import org.apache.spark.sql.functions._

import graft.expressions.MortonUtil
import graft.operators.{FuzzyJoin, Layout, Sampling}

/** Round-4 batch 3: z-order layout, FastSS fuzzy join, stratified
  * sampling. */
class LayoutFuzzySpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- morton

  test("morton interleave matches the per-bit definition") {
    // z(3, 5): x=011 -> even bits, y=101 -> odd bits: 100111b = 39
    MortonUtil.interleave(3L, 5L, 10) shouldBe 39L
    MortonUtil.interleave(0L, 0L, 10) shouldBe 0L
    MortonUtil.interleave(1L, 0L, 10) shouldBe 1L
    MortonUtil.interleave(0L, 1L, 10) shouldBe 2L
    // exhaustive check against the bit-sum definition on an 8-bit grid
    for (x <- 0L until 32L; y <- 0L until 32L) {
      val want = (0 until 8).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
      MortonUtil.interleave(x, y, 8) shouldBe want
    }
  }

  test("zorderWrite prunes files on the SECOND dimension") {
    // full 64x64 grid, 16 output files. The data-skipping property
    // z-order buys: a filter on y alone intersects only the files
    // whose y-stats cover it (~1/4 of them, + sampled-boundary slop) —
    // an x-sorted layout would leave the full y extent in EVERY file,
    // so min/max stats could prune nothing. (Range bounds are sampled,
    // same mechanism as Spark's global sort, so exact quadrant counts
    // are not asserted.)
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.zorderWrite(grid, col("x"), col("y"), bits = 6, dir, numFiles = 16)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .collect()
    perFile.length should be >= 12 // ~16, minus possible empty splits
    perFile.map(_.getAs[Long]("n")).sum shouldBe 4096L
    // a y <= 7 box overlaps [y0, y1] only for the top stripe of files
    val touched = perFile.count(_.getAs[Int]("y0") <= 7)
    touched should be <= perFile.length / 2
  }

  test("Layout.cell buckets and clamps continuous values") {
    val got = spark.range(1).select(
      Layout.cell(lit(-50.0), -50.0, 10.0, 4),
      Layout.cell(lit(49.9), -50.0, 10.0, 4),
      Layout.cell(lit(1000.0), -50.0, 10.0, 4), // clamps high
      Layout.cell(lit(-99.0), -50.0, 10.0, 4)) // clamps low
      .head()
    (0 to 3).map(got.getLong) shouldBe Seq(0L, 9L, 15L, 0L)
  }

  // --------------------------------------------------- fuzzy join

  test("deletion variants at d=1 include the string and all deletions") {
    val got = spark.range(1)
      .select(FuzzyJoin.deletionVariants(lit("abc"), 1))
      .head().getSeq[String](0).toSet
    got shouldBe Set("abc", "bc", "ac", "ab")
  }

  test("fuzzy selfJoin finds exactly the brute-force pairs (d=1)") {
    val names = Seq(1L -> "kitten", 2L -> "mitten", 3L -> "sitting",
      4L -> "mittens", 5L -> "cat", 6L -> "at", 7L -> "a", 8L -> "")
      .toDF("id", "name")
    val got = FuzzyJoin.selfJoin(names, "id", "name", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference over the same rows
    val rows = names.collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (i1, s1) <- rows; (i2, s2) <- rows if i1 < i2
      d = levDist(s1, s2) if d <= 1
    } yield (i1, i2, d)).toSet
    got shouldBe want
    // sanity: the expected content, not just self-consistency
    want should contain((1L, 2L, 1)) // kitten/mitten
    want should contain((2L, 4L, 1)) // mitten/mittens
    want should contain((6L, 7L, 1)) // at/a
  }

  test("fuzzy selfJoin at d=2 catches the two-edit pairs") {
    val names = Seq(1L -> "abcdef", 2L -> "abzdez", 3L -> "abcd",
      4L -> "xyz").toDF("id", "name")
    val got = FuzzyJoin.selfJoin(names, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe Set((1L, 2L, 2), (1L, 3L, 2))
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // --------------------------------------------- stratified sample

  test("stratifiedSample keeps exactly n per stratum in md5 order") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val got = Sampling.stratifiedSample(df, "id", "grp", nPerStratum = 5)
    got.count() shouldBe 10L
    // matches the window-sort reference
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(md5(col("id").cast("string")), col("id"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5).select("grp", "rk", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    got.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet shouldBe want
  }

  test("stratifiedSample keeps whole small strata") {
    val df = Seq((1L, "tiny"), (2L, "tiny")).toDF("id", "grp")
    Sampling.stratifiedSample(df, "id", "grp", 10).count() shouldBe 2L
  }

  test("Hilbert index: bijective, unit-step adjacent, unlike Morton") {
    import graft.expressions.{HilbertUtil, MortonUtil}
    val bits = 5
    val n = 1 << bits
    // bijective over the full grid
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertUtil.index(x, y, bits) -> (x, y)).toMap
    byD.size shouldBe n * n
    // THE Hilbert property: consecutive indexes are 4-adjacent cells
    (0 until n * n - 1).foreach { d =>
      val (x1, y1) = byD(d.toLong)
      val (x2, y2) = byD(d.toLong + 1)
      (math.abs(x1 - x2) + math.abs(y1 - y2)) shouldBe 1
    }
    // position() is the exact inverse
    (0 until n * n).foreach { d =>
      HilbertUtil.position(d.toLong, bits) shouldBe
        (byD(d.toLong)._1.toLong, byD(d.toLong)._2.toLong)
    }
    // Morton, by contrast, jumps at quadrant boundaries — the reason
    // Hilbert prunes tighter on range predicates
    val mByD = (for (x <- 0 until n; y <- 0 until n)
      yield MortonUtil.interleave(x, y, bits) -> (x, y)).toMap
    val mortonJumps = (0 until n * n - 1).count { d =>
      val (x1, y1) = mByD(d.toLong)
      val (x2, y2) = mByD(d.toLong + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    mortonJumps should be > 0
  }

  test("hilbertWrite clusters files with tight two-dim envelopes") {
    val root = java.nio.file.Files.createTempDirectory("graft_hil")
      .resolve("t").toString
    val df = spark.range(4096).select(
      (col("id") % 64).as("cx"),
      (col("id") / 64).cast("long").as("cy"))
    Layout.hilbertWrite(df, col("cx"), col("cy"), bits = 6, root, 8)
    // each written file covers a contiguous Hilbert segment: its cell
    // count bounds its 2-d envelope area within a small constant (a
    // Hilbert segment of length L fits in an O(L) box; Morton segments
    // can span a whole quadrant). Loose factor-4 bound.
    val withFile = spark.read.parquet(root)
      .select(col("cx"), col("cy"),
        col("_metadata.file_name").as("f"))
    val envs = withFile.groupBy(col("f"))
      .agg(count(lit(1)).as("n"),
        (max(col("cx")) - min(col("cx")) + 1).as("w"),
        (max(col("cy")) - min(col("cy")) + 1).as("h"))
      .collect()
    envs.foreach { r =>
      val (cnt, w, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
      (w * h).toDouble should be <= cnt.toDouble * 4.0
    }
  }

  test("entity resolution recovers blocks, labels singletons as themselves") {
    import graft.operators.EntityResolution
    // two spelling variants per entity, one distinct singleton
    val rows = Seq(
      (1L, "Acme Corp"), (2L, "Acme Corpx"), (3L, "Acme Corp"),
      (10L, "Zeta LLC"), (11L, "Zeta LLCx"),
      (99L, "Completely Different")).toDF("id", "name")
    val got = EntityResolution.resolve(rows, "id", "name")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("entity_id")).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L)
  }

  test("hilbertRanges: exact cover, disjoint, sorted; cap is superset") {
    import graft.expressions.HilbertUtil
    val bits = 4 // 16x16 space
    def boxIdx(x0: Long, y0: Long, x1: Long, y1: Long): Set[Long] =
      (for (x <- x0 to x1; y <- y0 to y1)
        yield HilbertUtil.index(x, y, bits)).toSet
    val cases = Seq((1L, 2L, 6L, 11L), (0L, 0L, 15L, 15L),
      (5L, 5L, 5L, 5L), (0L, 0L, 0L, 15L))
    for ((x0, y0, x1, y1) <- cases) {
      val rs = Layout.hilbertRanges(x0, y0, x1, y1, bits,
        maxRanges = 1000)
      // sorted + disjoint (strict gaps after coalescing)
      rs.sliding(2).foreach {
        case Seq((_, b), (c, _)) => assert(c > b + 1)
        case _ =>
      }
      val covered = rs.flatMap { case (a, b) => a to b }.toSet
      covered shouldBe boxIdx(x0, y0, x1, y1) // exact, uncapped
    }
    // capped: superset of the box, at most maxRanges ranges
    val capped = Layout.hilbertRanges(1, 2, 6, 11, bits, maxRanges = 3)
    capped.length should be <= 3
    val cov = capped.flatMap { case (a, b) => a to b }.toSet
    assert(boxIdx(1, 2, 6, 11).subsetOf(cov))
  }
}
