package graft

/** Pins Spark's native SQL:2003 REGR_ aggregate family (regr_count /
  * avgx / avgy / slope / intercept / r2 / sxx / syy / sxy, plus
  * covar_pop / var_pop / stddev_pop) against exact-integer-moment
  * derivations. The q126 gate row itself ships the exact-moment form
  * (bit-identical across engines by construction — see
  * QueriesRelational.q126Sql); this spec is what keeps the native
  * regr_* surface covered: the float accumulations must agree with the
  * exact derivations to 1e-9 relative, which catches any wiring or
  * semantics regression while tolerating the ulp-level partial-sum
  * ordering noise that made the native form un-gateable. */
class RegrFamilySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("native regr_* family agrees with exact-moment derivations") {
    val s = spark
    Tables.load(s, sf, "lineitem").createOrReplaceTempView("li_regr")
    val native = s.sql(
      """SELECT l_returnflag,
        |  CAST(regr_count(yi, xi) AS BIGINT) AS n_pairs,
        |  regr_avgx(yi, xi) AS avgx, regr_avgy(yi, xi) AS avgy,
        |  regr_slope(yi, xi) AS slope,
        |  regr_intercept(yi, xi) AS icept,
        |  regr_r2(yi, xi) AS r2,
        |  regr_sxx(yi, xi) AS sxx, regr_syy(yi, xi) AS syy,
        |  regr_sxy(yi, xi) AS sxy,
        |  covar_pop(yi, xi) AS cov_p,
        |  var_pop(xi) AS var_p, stddev_pop(xi) AS sd_p
        |FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS xi,
        |        CAST(floor(l_extendedprice) AS BIGINT) AS yi
        |      FROM li_regr)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect()
    val exact = s.sql(
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n, sum(xi) AS sx,
        |    sum(yi) AS sy, sum(xi*xi) AS sxx, sum(xi*yi) AS sxy,
        |    sum(yi*yi) AS syy
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS xi,
        |          CAST(floor(l_extendedprice) AS BIGINT) AS yi
        |        FROM li_regr) GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(sx AS DOUBLE)/n AS avgx, CAST(sy AS DOUBLE)/n AS avgy,
        |  (n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy)
        |    / (n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx) AS slope,
        |  (n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy) *
        |    (n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy) /
        |    ((n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx) *
        |     (n*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy)) AS r2,
        |  CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n AS sxx_c,
        |  CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n AS syy_c,
        |  CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n AS sxy_c
        |FROM m ORDER BY l_returnflag""".stripMargin)
      .collect()
    native.length shouldBe exact.length
    def rel(a: Double, b: Double): Double =
      if (a == b) 0.0 else math.abs(a - b) / math.max(math.abs(a), math.abs(b))
    native.zip(exact).foreach { case (nr, er) =>
      nr.getString(0) shouldBe er.getString(0)
      nr.getLong(1) shouldBe er.getLong(1)
      rel(nr.getDouble(2), er.getDouble(2)) should be < 1e-9  // avgx
      rel(nr.getDouble(3), er.getDouble(3)) should be < 1e-9  // avgy
      rel(nr.getDouble(4), er.getDouble(4)) should be < 1e-9  // slope
      rel(nr.getDouble(6), er.getDouble(5)) should be < 1e-9  // r2
      rel(nr.getDouble(7), er.getDouble(6)) should be < 1e-9  // sxx
      rel(nr.getDouble(8), er.getDouble(7)) should be < 1e-9  // syy
      rel(nr.getDouble(9), er.getDouble(8)) should be < 1e-9  // sxy
      // intercept = avgy - slope*avgx; covar_pop = sxy_c/n;
      // var_pop = sxx_c/n; stddev_pop = sqrt(var_pop)
      val icept = er.getDouble(3) - er.getDouble(4) * er.getDouble(2)
      rel(nr.getDouble(5), icept) should be < 1e-9
      rel(nr.getDouble(10), er.getDouble(8) / er.getLong(1)) should be < 1e-9
      rel(nr.getDouble(11), er.getDouble(6) / er.getLong(1)) should be < 1e-9
      rel(nr.getDouble(12),
        math.sqrt(er.getDouble(6) / er.getLong(1))) should be < 1e-9
    }
  }

  test("native corr/covar_samp agree with their pop/exact identities") {
    // corr² == regr_r2 and covar_samp == covar_pop · n/(n−1): pins the
    // samp-variant wiring the q31 gate row no longer carries natively
    // (its corr/cov were restated from exact moments in round 6)
    val s = spark
    Tables.load(s, sf, "lineitem").createOrReplaceTempView("li_regr2")
    val r = s.sql(
      """SELECT corr(yi, xi) AS c, regr_r2(yi, xi) AS r2,
        |  covar_samp(yi, xi) AS cs, covar_pop(yi, xi) AS cp,
        |  count(*) AS n
        |FROM (SELECT CAST(l_quantity AS BIGINT) AS xi,
        |        CAST(floor(l_extendedprice) AS BIGINT) AS yi
        |      FROM li_regr2)""".stripMargin).head()
    def rel(a: Double, b: Double): Double =
      if (a == b) 0.0 else math.abs(a - b) / math.max(math.abs(a), math.abs(b))
    rel(r.getDouble(0) * r.getDouble(0), r.getDouble(1)) should be < 1e-9
    val n = r.getLong(4).toDouble
    rel(r.getDouble(2), r.getDouble(3) * n / (n - 1.0)) should be < 1e-9
  }
}
