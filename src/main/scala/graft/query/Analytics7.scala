package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 analytics: weighted single-source shortest paths (the
  * delta-relaxation member of the graph family beside
  * [[Analytics.graphReachability]]'s unweighted BFS), the BCa
  * (bias-corrected and accelerated) bootstrap confidence interval over
  * [[Analytics5.evalPairedBootstrap]]'s deterministic replicas, and the
  * differentially-private clipped-sum mean (the release primitive that
  * completes the Laplace-count / exponential-quantile DP family).
  *
  * Reference scope note: the reference (api/api.py) ships point
  * predictions with no uncertainty and releases raw aggregates; these
  * are the interval and privacy releases a careful deployment of the
  * same pipeline quotes instead. Every operator is a declarative
  * Catalyst plan riding the house exactness discipline: integer/DECIMAL
  * sums, literal-inlined normal quantiles shared with the oracle, and
  * float epilogues with fixed parenthesization.
  */
object Analytics7 {

  /** Exact-integer type for single-row moments whose terms can cross
    * 2⁶³ (jackknife cubes) — the [[Analytics6]] tie-term discipline:
    * Spark holds DECIMAL(38,0), the DuckDB oracle HUGEINT. */
  private val dec38 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  // ---- inverse normal CDF (Acklam), evaluated at PLAN BUILD time ----

  /** Φ⁻¹ by Acklam's rational approximation (|rel err| < 1.15e-9) —
    * evaluated ONCE here on the driver and inlined as LITERALS into
    * both the Spark plan and the generated DuckDB oracle (the
    * [[Analytics5.poissonThresh60]] discipline), so neither engine
    * ever evaluates a normal quantile at query time and cross-engine
    * parity is by construction. */
  private[graft] def invNormCdf(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    } else if (p <= 1.0 - pLow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    }
  }

  /** Φ⁻¹(k/B) for k = 1..B−1 — the shared z-grid: z₀ reads it at the
    * clamped below-count, and the adjusted percentile INDEX is found by
    * counting grid thresholds below the adjusted z (so Φ itself is
    * never needed: ⌈Φ(w)·B⌉ = 1 + #{k : Φ⁻¹(k/B) < w}). */
  private[graft] def invNormGrid(b: Int): Array[Double] =
    (1 until b).map(k => invNormCdf(k.toDouble / b)).toArray

  // ---- BCa bootstrap confidence interval --------------------------------

  /** BCa (bias-corrected and accelerated) 95% bootstrap CI for the
    * accuracy delta between [[Analytics5.evalMcnemar]]'s two paired
    * classifiers — the interval a careful eval report quotes beside
    * [[Analytics5.evalPairedBootstrap]]'s raw replica spread (Efron
    * 1987): percentile endpoints adjusted for median bias (z₀) and for
    * the statistic's variance trend (acceleration a, one jackknife
    * pass).
    *
    * Exactness, term by term:
    *   - replicas are [[Analytics5.evalPairedBootstrap]]'s 50
    *     deterministic Poisson draws — integer sums per replica;
    *   - the below-count #{θ*_b < θ̂} is the integer cross-multiplied
    *     compare (ΣA_b − ΣB_b)·n < (ΣA − ΣB)·n_eff_b — no division;
    *   - the jackknife collapses in closed form: with dᵢ = aᵢ − bᵢ ∈
    *     {−1,0,1} and D = Σd, θ̄ − θ₍ᵢ₎ = (n·dᵢ − D)/(n(n−1)), and the
    *     n(n−1) factors CANCEL in a = Σ³/(6·(Σ²)^{3/2}), so a needs
    *     only the three exact tally counts of dᵢ (DECIMAL(38,0) cubes;
    *     I2^{3/2} is computed as I2·√I2 — sqrt is IEEE
    *     correctly-rounded on both engines, pow is not);
    *   - z₀ and the percentile index both read the literal-inlined
    *     [[invNormGrid]], so no engine evaluates Φ or Φ⁻¹ at runtime;
    *   - CI endpoints are SELECTED replica deltas (type-1 empirical
    *     quantile at ⌈α·B⌉), never interpolated.
    *
    * Scale shape: the replica table is the bootstrap's one
    * map-side-combined ×50 aggregate and the tally one more aggregate —
    * exactly TWO passes over the fact scan. The ≤50-row replica panel
    * is aggregated into ONE row (sorted struct array) so the whole
    * epilogue — below-count fold, jackknife moments, percentile
    * element_at selection — is expressions over that single row in one
    * plan: no checkpoint barrier, no re-run of the ×50 fanout per
    * branch, ~4 driver jobs instead of ~20. At 100 TB the epilogue
    * cost is invisible next to the scan. z₀'s below-count clamps to
    * [1, B−1] (the standard finite-B guard: Φ⁻¹(0) is not finite). */
  def evalBootstrapBca(spark: SparkSession, dir: String,
      reps: Int = 50): DataFrame =
    bcaOverPaired(spark, Analytics5.pairedOkFrame(spark, dir), reps,
      widenFull = None)

  /** Hash-threshold SUBSAMPLED BCa interval — the form a 100 TB eval
    * harness actually runs: [[evalBootstrapBca]] resamples the FULL
    * pair stream ×reps (corpus-linear by design, e≈0.44 measured),
    * which at the stated scale turns a CI into a second full-corpus
    * job. This variant draws the replicas over a deterministic
    * PRF subsample — keep an item iff
    * hash60(event_id:bcasub) % mod == 0, mod = ⌈N/targetItems⌉ — so
    * the ×reps md5 fanout (the dominant cost) runs over ~targetItems
    * rows REGARDLESS of corpus size. Three uncertainty columns ride
    * beside the interval:
    *   - ci_lo/ci_hi — the subsample bootstrap CI itself, which is a
    *     VALID (just wider) interval for θ: the replica spread at
    *     n_sub already carries SE ≈ √(N/n_sub)·SE_full, no adjustment
    *     needed or applied;
    *   - widen = √(N/n_sub) — the diagnostic factor by which that CI
    *     is wider than a full-corpus run's would be;
    *   - ci_lo_proj/ci_hi_proj — the m-out-of-n PROJECTION of the
    *     full-corpus interval, θ̂_sub + (ci − θ̂_sub)·√(n_sub/N): the
    *     standard subsample-bootstrap rescaling of the replica spread
    *     DOWN to the full sample size (Bickel–Götze–van Zwet). It
    *     estimates the WIDTH a full run would quote; as a CI for θ it
    *     is anti-conservative (the subsample center itself jitters at
    *     SE_sub), which is why ci_lo/ci_hi stay the primary columns.
    *     (An earlier draft multiplied by √(N/n_sub) instead — wrong
    *     direction, double-counting the inflation the spread already
    *     carries; caught in review, and structurally invisible to the
    *     cross-engine sweep since the oracle mirrors the expression.)
    *
    * Exactness: mod is a pure integer function of the corpus count —
    * ⌈N/target⌉ as (N + target − 1) / target in BIGINTs — which the
    * oracle recomputes in SQL from the same count, so both engines
    * draw the identical subsample; the widen factor is one
    * correctly-rounded sqrt of one correctly-rounded division, and the
    * widened endpoints are a fixed-parenthesization double epilogue on
    * the single output row. Everything inside the interval is the
    * [[evalBootstrapBca]] machinery verbatim (shared plan builder).
    *
    * Scale shape: ONE count over events (parquet count-star —
    * metadata-bound; pairedOkFrame is row-for-row with events so the
    * counts agree by construction), one linear subsample scan (a
    * single md5 per item, vs ×reps for the full form), then the whole
    * replica/jackknife pipeline on ~targetItems rows — the corpus
    * appears only in the scan, never in the fanout. */
  def evalBootstrapBcaSampled(spark: SparkSession, dir: String,
      reps: Int = 50, targetItems: Long = 4096L): DataFrame = {
    val nFull = graft.schema.Schemas.events(spark, dir).count()
    val mod = math.max(1L, (nFull + targetItems - 1L) / targetItems)
    val sub = Analytics5.pairedOkFrame(spark, dir)
      .filter(graft.query.Dedup.hash60(concat(
        col("event_id").cast("string"), lit(":bcasub")))
        % lit(mod) === 0L)
    bcaOverPaired(spark, sub, reps, widenFull = Some(nFull))
  }

  private def bcaOverPaired(spark: SparkSession, paired: DataFrame,
      reps: Int, widenFull: Option[Long]): DataFrame = {
    val tz = invNormGrid(reps)
    val zLo = invNormCdf(0.025)
    val zHi = invNormCdf(0.975)
    // The ≤reps-row replica table is read by several epilogue branches
    // (below-count, the two quantile lookups). An earlier form
    // materialized it with an eager localCheckpoint, which kept the ×50
    // md5 fanout from re-running per branch but cost ~20 driver jobs of
    // epilogue (checkpoints + broadcast builds + two joins + a window —
    // measured 1.4 s of job wall plus 0.7 s of driver gaps at sf0.1 for
    // a ≤50-row tail). This form instead AGGREGATES the replica panel
    // into one row (a sorted struct array + the raw sums array), so
    // every branch is an expression over that single row: one plan, no
    // checkpoint barrier, no window, ~4 jobs. The ranking semantics are
    // pinned unchanged: delta ASC NULLS LAST, tie-break replica —
    // NULL deltas (possible only for degenerate n_eff=0 replicas) sort
    // via the +Inf key; replica is unique, so the struct comparison
    // never reaches the delta field and the order is total.
    val bootRow = Analytics5.pairedBootstrapOver(spark, paired, reps)
      .agg(
        sort_array(collect_list(struct(
          coalesce(col("delta"), lit(Float.PositiveInfinity)).as("sk"),
          col("replica").as("replica"), col("delta").as("delta"))))
          .as("ranked"),
        collect_list(struct(col("n_eff").as("n_eff"),
          col("sum_a").as("sum_a"), col("sum_b").as("sum_b")))
          .as("sums"))
    // exact tallies of the paired frame: n, ΣA, ΣB and the d∈{−1,0,1}
    // class counts the closed-form jackknife reads
    val tally = paired.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(when(col("a_ok"), 1L).otherwise(0L)), lit(0L)).as("sa"),
      coalesce(sum(when(col("b_ok"), 1L).otherwise(0L)), lit(0L)).as("sb"),
      coalesce(sum(when(!col("a_ok") && col("b_ok"), 1L).otherwise(0L)),
        lit(0L)).as("cm"),
      coalesce(sum(when(col("a_ok") && !col("b_ok"), 1L).otherwise(0L)),
        lit(0L)).as("cp"))
      .withColumn("d_total", col("sa") - col("sb"))
    // #{θ*_b < θ̂} as one integer-compare fold over the ≤reps sums array
    val core = bootRow.crossJoin(broadcast(tally))
      .withColumn("cnt_below", aggregate(col("sums"), lit(0L),
        (acc, s) => acc + when(
          (s.getField("sum_a") - s.getField("sum_b")) * col("n_items")
            < col("d_total") * s.getField("n_eff"), 1L).otherwise(0L)))
      .filter(col("n_items") > 0)
    // closed-form jackknife moments on the single tally row:
    // I2 = Σ(n·dᵢ − D)² = cm(n+D)² + c0·D² + cp(n−D)², I3 its cube sum
    def d38(c: Column): Column = c.cast(dec38)
    val nD = d38(col("n_items")); val dD = d38(col("d_total"))
    val c0 = d38(col("n_items") - col("cm") - col("cp"))
    val sP = nD + dD; val sM = nD - dD
    val i2 = d38(col("cm")) * sP * sP + c0 * dD * dD +
      d38(col("cp")) * sM * sM
    val i3 = -(d38(col("cm")) * sP * sP * sP) - c0 * dD * dD * dD +
      d38(col("cp")) * sM * sM * sM
    val zGrid = array(tz.toIndexedSeq.map(lit): _*)
    val clamped = greatest(least(col("cnt_below"), lit(reps.toLong - 1)),
      lit(1L)).cast("int")
    def wCol(z0: Column, zq: Double, a: Column): Column =
      z0 + (z0 + lit(zq)) / (lit(1.0) - a * (z0 + lit(zq)))
    def idxOf(w: Column): Column =
      tz.map(t => when(w > lit(t), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
    val scored = core
      .withColumn("i2", i2).withColumn("i3", i3)
      .withColumn("accel_d",
        when(col("i2") === lit(0).cast(dec38), lit(0.0))
          .otherwise(col("i3").cast("double") /
            (lit(6.0) * col("i2").cast("double") *
              sqrt(col("i2").cast("double")))))
      .withColumn("z0_d", element_at(zGrid, clamped))
      .withColumn("w_lo_d", wCol(col("z0_d"), zLo, col("accel_d")))
      .withColumn("w_hi_d", wCol(col("z0_d"), zHi, col("accel_d")))
      .withColumn("idx_lo", idxOf(col("w_lo_d")))
      .withColumn("idx_hi", idxOf(col("w_hi_d")))
    // percentile endpoints are SELECTED replica deltas: element_at into
    // the sorted ≤reps struct array (1-indexed; idxOf ∈ [1, reps] by
    // construction) — NULLS LAST is carried by the +Inf sort key above
    val base = scored
      .withColumn("ci_lo_d",
        element_at(col("ranked"), col("idx_lo")).getField("delta"))
      .withColumn("ci_hi_d",
        element_at(col("ranked"), col("idx_hi")).getField("delta"))
      .select(col("n_items"), col("d_total"), col("cnt_below"),
        (col("d_total").cast("double") / col("n_items").cast("double"))
          .cast("float").as("theta_hat"),
        col("z0_d").cast("float").as("z0"),
        col("accel_d").cast("float").as("accel"),
        col("idx_lo"), col("idx_hi"),
        col("ci_lo_d").cast("float").as("ci_lo"),
        col("ci_hi_d").cast("float").as("ci_hi"),
        col("ci_lo_d"), col("ci_hi_d"))
    widenFull match {
      case None => base.drop("ci_lo_d", "ci_hi_d")
      case Some(nFull) =>
        // √(N/n) inflation diagnostic + m-out-of-n projected endpoints
        // (shrink the replica spread by √(n/N) — NOT widen: the spread
        // already carries the subsample inflation), all
        // fixed-parenthesization doubles on the single output row —
        // the oracle replays the identical expression text
        val thetaD =
          col("d_total").cast("double") / col("n_items").cast("double")
        val widenD = sqrt(lit(nFull).cast("double")
          / col("n_items").cast("double"))
        val shrinkD = sqrt(col("n_items").cast("double")
          / lit(nFull).cast("double"))
        base.select(col("n_items"), col("d_total"), col("cnt_below"),
            col("theta_hat"), col("z0"), col("accel"),
            col("idx_lo"), col("idx_hi"), col("ci_lo"), col("ci_hi"),
            lit(nFull).as("n_full"),
            widenD.cast("float").as("widen"),
            (thetaD + (col("ci_lo_d").cast("double") - thetaD) * shrinkD)
              .cast("float").as("ci_lo_proj"),
            (thetaD + (col("ci_hi_d").cast("double") - thetaD) * shrinkD)
              .cast("float").as("ci_hi_proj"))
    }
  }

  // ---- differentially-private clipped-sum mean ---------------------------

  /** Differentially-private per-type mean of `value` via the standard
    * two-release clipped-sum mechanism: every record's contribution is
    * L1-clipped to [0, C], the clipped sum is released with Laplace
    * noise at scale C/ε and the count with scale 1/ε, and the DP mean
    * is their ratio — the release primitive a training pipeline quotes
    * for per-slice statistics (the clip bounds per-record sensitivity;
    * [[Warehouse2.dqDpLaplaceCounts]] released counts only,
    * [[Analytics6.privacyDpQuantile]] quantiles; this closes means).
    *
    * Exactness: the clipped sum is an exact scaled BIGINT
    * (⌊value·100⌋ clamped to [0, 100·C] — floor, never round, so no
    * half-way rounding mode can diverge), the Laplace draws are the
    * [[Warehouse2.dqDpLaplaceCounts]] replayable inverse-CDF PRF draws
    * (u = hash60/2⁶⁰, noise = −b·sign(u−½)·ln(1−2|u−½|)), and the mean
    * is one double division with the noisy count floored at 1 (the
    * standard positive-denominator release guard). A production
    * release swaps the PRF for a sealed RNG; mechanism, clip, and
    * scales stay as pinned here.
    *
    * Scale shape: map-only clip arithmetic, ONE map-side-combined
    * (sum, count) aggregate per type, noise applied on the ≤|types|
    * output rows — scan-bound at 100 TB. */
  def privacyDpClippedMean(spark: SparkSession, dir: String,
      epsilon: Double = 0.5, clip: Double = 50.0): DataFrame = {
    val clipScaled = (clip * 100.0).toLong
    val bSum = clip / epsilon
    val bCnt = 1.0 / epsilon
    def lap(salt: String, b: Double): (Column, Column) = {
      val u = graft.query.Dedup.hash60(
        concat(col("event_type"), lit(salt))).cast("double") /
        lit(1152921504606846976.0) // 2^60
      val c = u - lit(0.5)
      (u, -lit(b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c)))
    }
    val clipped = least(greatest(floor(col("value") * lit(100.0))
      .cast("long"), lit(0L)), lit(clipScaled))
    val (_, nSum) = lap(":dpsum", bSum)
    val (_, nCnt) = lap(":dpcnt", bCnt)
    graft.schema.Schemas.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(clipped), lit(0L)).as("clipped_sum_scaled"))
      // the dqDpLaplaceCounts rounding contract: each draw is REAL-cast
      // FIRST (absorbing the one libm-last-ulp ln), and all downstream
      // arithmetic reads the rounded float — so the release columns are
      // bit-identical cross-engine
      .withColumn("noise_sum", nSum.cast("float"))
      .withColumn("noise_cnt", nCnt.cast("float"))
      .withColumn("dp_sum",
        (col("clipped_sum_scaled").cast("double") / lit(100.0)
          + col("noise_sum").cast("double")).cast("float"))
      .withColumn("dp_count",
        greatest(col("n_exact").cast("double")
          + col("noise_cnt").cast("double"), lit(1.0)).cast("float"))
      .withColumn("dp_mean",
        (col("dp_sum").cast("double") / col("dp_count").cast("double"))
          .cast("float"))
      .orderBy(col("event_type"))
  }

  // ---- DP privacy-budget ledger ------------------------------------------

  /** One row of the engine's DP release inventory, ε on the exact µε
    * grid (integer micro-epsilon — the integer-accounting convention of
    * production DP libraries, and what keeps every ledger sum
    * order-independent): `eps_u` is the release's TOTAL composed ε in
    * µε (per-draw ε × sequential draws, composed at panel construction),
    * `lin_n` is the driver-precomputed advanced-composition linear term
    * ε·(e^ε−1) in nano units — libm exp never runs inside either
    * engine, the [[invNormGrid]] inlined-constant discipline. */
  case class DpRelease(release: String, mechanism: String,
      privacy_model: String, n_draws: Long, eps_u: Long, lin_n: Long)

  private def mkRelease(release: String, mechanism: String, model: String,
      nDraws: Long, epsPerDraw: Double): DpRelease = {
    val epsU = Math.round(epsPerDraw * 1e6) * nDraws
    val eps = epsU.toDouble / 1e6
    DpRelease(release, mechanism, model, nDraws, epsU,
      Math.round(eps * Math.expm1(eps) * 1e9))
  }

  /** The engine's standing DP release inventory, one row per release
    * family as the code actually spends ε: the two Laplace count
    * releases ride PARALLEL composition over disjoint type slices (so
    * one worst-case draw each), the Gumbel-max top-k is k adaptive
    * exponential peels (k·ε sequential), the clipped mean is two
    * Laplace draws (sum + count) at ε each, and randomized response is
    * the local-model ε = ln((p)/(1−p)) = ln 3 at p = 3/4. */
  private[graft] val defaultDpReleases: Seq[DpRelease] = Seq(
    mkRelease("dq_dp_laplace_counts", "laplace", "central", 1L, 0.5),
    mkRelease("privacy_dp_counts", "laplace", "central", 1L, 1.0),
    mkRelease("privacy_dp_quantile", "exponential", "central", 1L, 1.0),
    mkRelease("privacy_dp_topk", "exponential", "central", 3L, 1.0),
    mkRelease("privacy_dp_clipped_mean", "laplace", "central", 2L, 0.5),
    mkRelease("privacy_rand_response", "rand_response", "local", 1L,
      math.log(3.0)))

  /** ln(1/δ') for the advanced-composition bound at δ' = 10⁻⁶ — a
    * driver constant shared verbatim with the oracle SQL generator. */
  private[graft] val lnInvDelta: Double = 13.815510557964274

  /** DP privacy-budget ledger — the composition report that turns the
    * privacy family's per-release ε parameters into an account: one row
    * per standing release (exact µε), plus a basic sequential
    * composition total (Σεᵢ) and the heterogeneous advanced-composition
    * bound √(2·ln(1/δ')·Σεᵢ²) + Σεᵢ(e^εᵢ−1) at δ' = 10⁻⁶ — the
    * (ε, δ)-DP statement a data-release review actually asks for.
    *
    * Exactness: every engine-side sum is over exact BIGINTs (µε grid;
    * squares ≤ 9·10¹², nano linear terms) so accumulation order cannot
    * matter; e^ε−1 is driver-precomputed per release (no libm exp in
    * either engine); the two bound epilogues are fixed-parenthesization
    * double arithmetic, REAL-cast. Empty inventory yields the two
    * zero-ε total rows (EdgeCaseSpec contract).
    *
    * Scale shape: a ≤10-row literal panel — driver-sized by
    * construction, the ledger grain is releases, not data. */
  def privacyBudgetLedger(spark: SparkSession, dir: String,
      releases: Seq[DpRelease] = defaultDpReleases): DataFrame = {
    import spark.implicits._
    val p = spark.createDataset(releases).toDF()
    val rel = p.select(col("release"), col("mechanism"),
      col("privacy_model"), col("n_draws"),
      col("eps_u").as("eps_micro"),
      (col("eps_u").cast("double") / lit(1e6)).cast("float").as("eps"))
    val t = p.agg(
      coalesce(sum(col("n_draws")), lit(0L)).as("n"),
      coalesce(sum(col("eps_u")), lit(0L)).as("s"),
      coalesce(sum(col("eps_u") * col("eps_u")), lit(0L)).as("ssq"),
      coalesce(sum(col("lin_n")), lit(0L)).as("sl"))
    val basic = t.select(lit("zz_composition_basic").as("release"),
      lit("sequential").as("mechanism"),
      lit("central+local").as("privacy_model"),
      col("n").as("n_draws"), col("s").as("eps_micro"),
      (col("s").cast("double") / lit(1e6)).cast("float").as("eps"))
    val advanced = t.select(lit("zz_composition_advanced").as("release"),
      lit("advanced_composition").as("mechanism"),
      lit("central+local").as("privacy_model"),
      col("n").as("n_draws"), lit(null).cast("long").as("eps_micro"),
      (sqrt(lit(2.0) * lit(lnInvDelta) *
          (col("ssq").cast("double") / lit(1e12))) +
        col("sl").cast("double") / lit(1e9)).cast("float").as("eps"))
    rel.unionByName(basic).unionByName(advanced).orderBy(col("release"))
  }

  // ---- weighted single-source shortest paths ------------------------------

  /** Weighted SSSP from a deterministic 4-source panel over the
    * co-purchase graph, `rounds` frontier-pruned relaxation rounds —
    * the weighted sibling of [[Analytics.graphReachability]]'s BFS
    * (which counts hops; this sums integer edge lengths, so a 2-hop
    * path of strong ties can beat a 1-hop weak tie). Edge length is
    * the integer 1 + 1000 div weight (shared-order count from the
    * persisted weighted projection): monotone-decreasing in tie
    * strength, exact BIGINT arithmetic end to end.
    *
    * Spark has no recursive CTE, so the engine runs the delta-stepping
    * relaxation as BSP rounds: each round relaxes ONLY the frontier
    * (vertices whose distance improved last round) against the
    * persisted length-carrying symmetric edge index, min-combines the
    * offers map-side, and admits strict improvements. Frontier-pruned
    * rounds produce EXACTLY the Bellman-Ford prefix (dist after round
    * k = min over ≤k-edge paths): a vertex's offers are re-sent only
    * the round after it improves, and an unchanged vertex's offers
    * were all absorbed when last sent — so the DuckDB oracle is the
    * same relaxation UNROLLED (one min-combine CTE stage per round).
    *
    * Scale shape: per round one frontier⨝edges equi-join (frontier
    * broadcasts while small, shuffles on vertex id once it isn't) and
    * ONE map-side-combined min((d, o)) aggregate that merges the offers
    * into the distance table — the improved-flag tiebreak makes the
    * next frontier a FILTER of the same materialization instead of a
    * second join+anti-join pass (measured 5.1 → ~2 s at bench scale).
    * One localCheckpoint per round is the
    * [[Analytics.graphReachability]] BSP superstep barrier (merged
    * feeds both the next base and the frontier; a lazy formulation
    * re-evaluates every earlier round's aggregate). Offer work per
    * round is O(|frontier|·d̄) plus the |dist| merge; fixed rounds keep
    * the plan finite, the iteration dial exactly as in delta-stepping's
    * bucket bound. */
  def graphSsspWeighted(spark: SparkSession, dir: String,
      rounds: Int = 4, nSources: Int = 4): DataFrame = {
    // pinned to a hash(u) layout: every relaxation round equi-joins on
    // the SOURCE endpoint, so the persisted index satisfies the join's
    // required distribution and only the small frontier exchanges per
    // round (the graphPagerank #wdeg pinned-layout rationale — unlike
    // BFS/LPA this loop moves |frontier|·d̄ offer rows, which earns it)
    val ew = Analytics.cachedDf(spark, Analytics.gkey(dir, "symlen")) {
      val e = Analytics.copurchaseWeighted(spark, dir)
        .select(col("u"), col("v"),
          (lit(1L) + expr("CAST(1000 AS BIGINT) div weight")).as("len"))
      e.unionAll(e.select(col("v").as("u"), col("u").as("v"), col("len")))
        .repartition(spark.sparkContext.defaultParallelism, col("u"))
    }
    // deterministic source panel: the nSources vertices ranked first by
    // md5 hash of their id (the detSeeds pseudo-random draw — both
    // engines replay it) out of the persisted vertex set
    val sources = Analytics.copurchaseDeg(spark, dir)
      .orderBy(Dedup.hash60(col("u").cast("string")), col("u"))
      .limit(nSources)
      .select(col("u").as("src"))
    val nPart = spark.sparkContext.defaultParallelism
    // dist rides a STABLE hash(src, v) layout from round 1 on: the
    // per-round merge is a co-partitioned full-outer join, so only the
    // frontier's offers (min-combined on the same key layout) exchange
    // each round — the |V|·|sources| distance table itself never
    // re-shuffles. At 100 TB that is the difference between moving the
    // offers (frontier-sized, shrinking) and moving the whole distance
    // table every round.
    var dist = sources.select(col("src"), col("src").as("v"),
        lit(0L).as("d"))
      .repartition(nPart, col("src"), col("v"))
      .localCheckpoint(true)
    var frontier = dist
    for (_ <- 1 to rounds) {
      val offers = ew.select(col("u").as("v"), col("v").as("w"), col("len"))
        .join(frontier, Seq("v"))
        .groupBy(col("src"), col("w").as("v"))
        .agg(min(col("d") + col("len")).as("d_new"))
      val merged = dist
        .join(offers.repartition(nPart, col("src"), col("v")),
          Seq("src", "v"), "full_outer")
        .select(col("src"), col("v"),
          least(coalesce(col("d"), col("d_new")),
            coalesce(col("d_new"), col("d"))).as("d"),
          // strict improvement ⟺ the offer wins against the (possibly
          // absent) current distance — the next frontier is a FILTER of
          // the same materialization, not a second join pass
          (col("d_new") < coalesce(col("d"), lit(Long.MaxValue)) ||
            col("d").isNull).as("o"))
        .localCheckpoint(true) // the BSP superstep barrier: merged
      // feeds both next round's base and the frontier filter, and a
      // lazy formulation re-evaluates every prior round's join
      frontier = merged.filter(col("o"))
        .select(col("src"), col("v"), col("d"))
      dist = merged.select(col("src"), col("v"), col("d"))
    }
    dist.select(col("src"), col("v").as("part"), col("d").as("dist"))
      .orderBy(col("src"), col("part"))
  }
}
