package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.schema.Schemas.table

/** Training-data pipeline operators beyond the reference surface (SURVEY
  * §7.7 north-star extensions): benchmark decontamination, sequence
  * packing, deterministic splits, class rebalancing, and intra-document
  * repetition scoring. Every operator is DuckDB-oracle exact and designed
  * for the 100 TB rule — bounded shuffle keys, ids-only candidate flows,
  * no driver materialization.
  */
object Pipeline {

  // Distinct (doc_id, gram-hash) index per (sf dir, n), persisted once per
  // session — decontaminate's df filter, eval sizes, and collision join
  // are three plan branches over the same grams, and Catalyst does no
  // cross-branch CSE: without the index the corpus re-tokenizes and
  // re-hashes per branch. Same WeakHashMap-on-session keying as Dedup's
  // signature caches (collision-free; entries drop with the session).
  private type IndexMap =
    java.util.concurrent.ConcurrentHashMap[String, DataFrame]
  private val gramCache = new java.util.WeakHashMap[SparkSession, IndexMap]()

  private def cachedGrams(spark: SparkSession, dir: String,
      n: Int): DataFrame = {
    val perSession = gramCache.synchronized {
      var m = gramCache.get(spark)
      if (m == null) { m = new IndexMap(); gramCache.put(spark, m) }
      m
    }
    perSession.computeIfAbsent(s"$dir#$n#" +
      graft.schema.Schemas.fingerprint(s"$dir/documents.parquet"), { _ =>
      val g = table(spark, dir, "documents")
        .select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= n)
        .select(col("doc_id"),
          explode(Dedup.shinglesFromTokens(col("t"), n)).as("g"))
        .select(col("doc_id"), Dedup.hash60(col("g")).as("h"))
        .distinct()
        .persist()
      g.count() // materialize the index once
      g
    })
  }

  /** Benchmark decontamination: find training documents sharing ≥
    * `minOverlap` distinct word n-grams with any eval-set document — the
    * standard n-gram-collision contamination check run before every
    * training run (eval set here: doc_id % 37 == 0, a stand-in for a
    * benchmark suite).
    *
    * Scale design: documents explode to (doc_id, gram-hash60) longs —
    * the join key is the 60-bit gram hash, uniform by construction. Grams
    * with training document-frequency > `maxDf` are dropped first
    * (stop-gram filter): frequent grams carry no contamination signal and
    * are exactly the keys whose join fanout would blow up O(df_train ×
    * df_eval) — the filter bounds per-key work at any corpus size. The
    * df aggregate, the stop-gram semi-join, and the train↔eval join all
    * hash-partition on the same gram-hash column, so the exchange is
    * reused; only (doc_id, h) longs ever shuffle, never text. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 3,
      maxDf: Long = 50L, minOverlap: Long = 2L): DataFrame = {
    val grams = cachedGrams(spark, dir, n)
    val isEval = col("doc_id") % 37 === 0
    val trainG = grams.filter(!isEval)
    val evalG = grams.filter(isEval)
    val keep = trainG.groupBy(col("h"))
      .agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") <= maxDf)
      .select(col("h"))
    val evalSizes = evalG.groupBy(col("doc_id").as("eval_doc"))
      .agg(count(lit(1)).as("ng"))
    trainG.join(keep, Seq("h"))
      .join(evalG.withColumnRenamed("doc_id", "eval_doc"), Seq("h"))
      .groupBy(col("doc_id").as("train_doc"), col("eval_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
      .join(broadcast(evalSizes), Seq("eval_doc"))
      .select(col("train_doc"), col("eval_doc"), col("n_shared"),
        (col("n_shared").cast("double") / col("ng")).as("eval_frac"))
      .orderBy(col("train_doc"), col("eval_doc"))
  }

  /** Greedy contiguous sequence packing: assign documents (in doc_id
    * order) to fixed token-budget bins — the context-window packing step
    * of an LLM training pipeline; a doc starts in the bin where its
    * running token offset lands. Per-bin stats out.
    *
    * Scale design: the global running token sum uses the same two-level
    * trick as s9BatchAssign — per-bucket token sums (bucket = doc_id
    * value range), a prefix-sum window over the n/bucketWidth-row
    * histogram (never the data), broadcast offsets, and parallel
    * within-bucket windows bounded by bucketWidth rows. Bin assignment is
    * integer division — exact on both engines at any magnitude. */
  def packSequences(spark: SparkSession, dir: String, budget: Long = 256L,
      bucketWidth: Long = 1024L): DataFrame = {
    val d = table(spark, dir, "documents")
      .select(col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("tok"))
      .withColumn("bucket", floor(col("doc_id") / bucketWidth))
    val offsets = d.groupBy(col("bucket")).agg(sum(col("tok")).as("bt"))
      .withColumn("off",
        coalesce(sum(col("bt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off"))
    val wLocal = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_excl",
        col("off") + coalesce(sum(col("tok")).over(wLocal), lit(0L)))
      .withColumn("bin_id", expr(s"cum_excl div $budget"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin_id"))
  }

  /** Deterministic train/val/test split (80/10/10) by md5 of the doc id —
    * reproducible across engines, runs, and partitionings (never rand()),
    * the split every downstream training job re-derives instead of
    * storing. Emits per-split size/token stats. Map-only until the final
    * 3-row aggregate. */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame = {
    val m = Dedup.hash60(concat(col("doc_id").cast("string"), lit(":split"))) % 10
    table(spark, dir, "documents")
      .select(col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("tok"),
        when(m < 8, "train").when(m === 8, "val").otherwise("test")
          .as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        (sum(col("tok")).cast("double") / count(lit(1)))
          .cast("float").as("avg_tokens"))
      .orderBy(col("split"))
  }

  /** Class rebalancing weights: inverse-frequency weight per event_type
    * (total / (n_classes · class_count)) attached to each row — the
    * loss-reweighting input for skewed label mixes. The per-class count
    * table and the scalar totals are broadcast (5 rows + 1 row); the fact
    * scan is never shuffled. */
  def classWeights(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"), col("event_type"))
    val classCounts = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_class"))
    val totals = ev.agg(count(lit(1)).as("n_total"),
      countDistinct(col("event_type")).as("n_classes"))
    ev.filter(col("event_id") < 100)
      .join(broadcast(classCounts), Seq("event_type"))
      .crossJoin(broadcast(totals))
      .select(col("event_id"), col("event_type"),
        (col("n_total").cast("double")
          / (col("n_classes") * col("n_class"))).as("weight"))
      .orderBy(col("event_id"))
  }

  /** Key-skew profile: the distribution of per-key row counts in power-of-
    * two bands — the diagnostic every 100 TB shuffle plan starts from (a
    * heavy band at the top means salting or AQE skew handling; a flat
    * profile means plain hash partitioning is fine). The band is computed
    * by INTEGER arithmetic (length of the binary representation − 1 =
    * floor(log2)) so both engines band identically — float log2 at an
    * exact power-of-two boundary is engine-dependent. Two aggregations:
    * per-key counts (one shuffle on the key), then the tiny band
    * histogram. */
  def skewProfile(spark: SparkSession, dir: String): DataFrame =
    graft.schema.Schemas.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .withColumn("band", (length(bin(col("n"))) - 1).cast("int"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_keys"), min(col("n")).as("min_count"),
        max(col("n")).as("max_count"), sum(col("n")).as("n_rows"))
      .orderBy(col("band"))

  /** Quality-based selection: the top `k` documents per language by the
    * composite [[TextAnalysis.qualityScore]] — the "keep the best N per
    * bucket" curation stage. Rank ties break on doc_id (scores are
    * bit-identical cross-engine, but equal scores would otherwise order
    * arbitrarily). Per-language windows: one shuffle on lang, bounded
    * groups, and the rank filter cuts each partition to k rows before
    * anything global. */
  def qualityTopkPerLang(spark: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id"))
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("doc_id"), col("score"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** Corpus-mix curation under a token budget: per source, keep documents
    * in quality order until the source's cumulative token count exceeds
    * `budget` — how a training mix caps each source's contribution. One
    * window pass per source partition (rank + running token sum, both
    * ordered by (score desc, doc_id) for determinism); the budget filter
    * is exact integer arithmetic. */
  def corpusMixBudget(spark: SparkSession, dir: String,
      budget: Long = 1000L): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(Dedup.tokens(col("text"))).cast("long").as("tok"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("cum_tok",
        sum(col("tok")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("cum_tok") <= budget)
      .select(col("source"), col("doc_id"), col("rnk"), col("cum_tok"))
      .orderBy(col("source"), col("rnk"))
  }

  /** Equal-frequency (decile) discretization: bin a numeric feature by
    * exact global decile boundaries — the feature-engineering binning
    * step. Scale shape: the boundaries are ONE 9-element row (a single
    * percentile aggregate) broadcast to the fact scan; the per-row bin is
    * a 9-comparison fold — never a global ntile sort, which would be a
    * single-partition window over the data. event_id < 2000 bounds the
    * declared output; the binning itself is corpus-wide. */
  def featureBinning(spark: SparkSession, dir: String,
      maxId: Long = 2000L): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"), col("value"))
    val bounds = ev.agg(expr(
      "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
      .as("b"))
    ev.filter(col("event_id") < maxId)
      .crossJoin(broadcast(bounds))
      .select(col("event_id"), col("value"),
        (size(filter(col("b"), x => col("value") > x)) + 1)
          .cast("int").as("bin"))
      .orderBy(col("event_id"))
  }

  /** Leave-one-out target encoding with additive smoothing: replace the
    * categorical `event_type` by the mean of `value` over the OTHER
    * rows of its category, shrunk toward the global mean by a prior
    * weight `m` — the classic high-cardinality categorical encoder,
    * leave-one-out so a row never leaks its own target into its own
    * feature.
    *
    * Exactness: values ride ×1e6 LONG; the encoding
    * ((Σg − v)·N + m·Σ) / ((ng − 1 + m)·N) is assembled as ONE exact
    * integer numerator and denominator (the deferred-division
    * discipline), so the single double division is bit-identical on
    * every engine.
    *
    * Scale shape: one map-side-combined aggregate per category (k rows)
    * plus a 1-row global aggregate, both broadcast back onto the fact
    * scan — no fact shuffle at all; the window-free LOO form is what
    * keeps this encoder one-pass on huge fact tables. BOTH sides of the
    * division ride DECIMAL(38,0)/HUGEINT: the numerator cross-products
    * (Σ·N crosses 2⁶³ just past ~10⁵ rows/category at this ×10⁶ value
    * scale — the x10 sweep caught the BIGINT form overflowing) AND the
    * denominator (ng−1+m)·N, which is the same square-the-row-count
    * shape (~N²/k, crossing 2⁶³ near 10⁹–10¹⁰ rows). */
  def featureTargetEncode(spark: SparkSession, dir: String,
      m: Long = 10L, maxId: Long = 2000L): DataFrame = {
    val dec38 =
      org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * lit(1e6)).cast("long").as("v6"))
    val grp = ev.groupBy(col("event_type"))
      .agg(sum(col("v6")).as("sg"), count(lit(1)).as("ng"))
    val glob = ev.agg(sum(col("v6")).as("s"), count(lit(1)).as("n"))
    ev.filter(col("event_id") < maxId)
      .join(broadcast(grp), Seq("event_type"))
      .crossJoin(broadcast(glob))
      .select(col("event_id"), col("event_type"),
        (((col("sg") - col("v6")).cast(dec38) * col("n")
          + lit(m) * col("s").cast(dec38))
          .cast("double") /
          ((col("ng") - 1 + lit(m)).cast(dec38) * col("n"))
            .cast("double") / lit(1e6))
          .as("loo_te"))
      .orderBy(col("event_id"))
  }

  /** First-fit-decreasing bin packing of documents into fixed-capacity
    * context windows, per source: sort a group's docs by token count
    * descending, place each into the lowest-indexed bin it fits, open a
    * new bin when none fits (an oversize doc opens its own bin). FFD
    * packs within 11/9·OPT + 1 bins — materially tighter than
    * [[packSequences]]' contiguous greedy when doc lengths vary, which
    * is why sequence-packing pipelines that care about padding waste
    * use it.
    *
    * FFD is inherently sequential (each placement depends on ALL prior
    * placements), so like the Kadane/debounce recurrences it rides
    * `flatMapSortedGroups`: one exchange on the group key, engine-side
    * sort by (tokens desc, doc_id), O(#bins) state per group. At 100 TB
    * the packing GROUP is the parallelism unit — shard sources into
    * packing partitions (source, hash-bucket) and pack within each; the
    * bound degrades only by the shards' tail items. The in-group
    * first-fit scan here is the textbook O(n·bins) form; the classic
    * O(n log n) segment-tree variant drops in when groups are huge.
    *
    * HOT-SOURCE CONTRACT (the `anomaly_alert_debounce` precedent): a
    * single gigantic source serializes into one task — cost is
    * bounded by the LARGEST GROUP, not the corpus, and is O(k·bins)
    * time / O(bins) state for a k-doc source (a 20k-doc hot source is
    * pinned bounded by DriverRound13Spec). At 100 TB a source above ~10⁶
    * docs should be pre-sharded with the (source, hash-bucket) scheme
    * above before packing; this operator deliberately does not shard
    * implicitly, because silently splitting a group changes the
    * packing the oracle replays.
    * The oracle replays the identical recurrence as a recursive CTE
    * carrying the bin-load list. Integer-exact throughout. */
  def packBinFfd(spark: SparkSession, dir: String,
      capacity: Long = 256L): DataFrame = {
    import spark.implicits._
    val d = graft.schema.Schemas.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
    d.groupByKey(_._2)
      .flatMapSortedGroups(col("n_tokens").desc, col("doc_id")) {
        (src, it) =>
          val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
          it.map { case (id, _, t) =>
            val i = bins.indexWhere(_ + t <= capacity)
            val bin =
              if (i >= 0) { bins(i) += t; i }
              else { bins += t; bins.length - 1 }
            (id, src, t, bin.toLong)
          }
      }
      .toDF("doc_id", "source", "n_tokens", "bin")
      .orderBy(col("source"), col("doc_id"))
  }

  /** Weight-of-evidence / information-value profile of a categorical
    * feature against a binary outcome (here: `event_type` vs
    * value > `tau`) — the credit-scoring-standard encoder and
    * feature-screening statistic. WOE_i = ln(((g_i+0.5)/G)/((b_i+0.5)/B))
    * with half-count smoothing; IV_i = ((g_i+0.5)/G − (b_i+0.5)/B)·WOE_i.
    *
    * Exactness: counts are integers, so each WOE is ln of ONE exact
    * integer rational ((2g_i+1)·B / ((2b_i+1)·G)) and the IV factor is
    * one exact integer numerator over one exact denominator — a single
    * double division each; the ln outputs ride the REAL cast that
    * absorbs last-ulp libm differences.
    *
    * Scale shape: one map-side-combined aggregate to ≤|categories| rows
    * plus a broadcast 1-row global — the fact table never shuffles.
    * This is why WOE encoding is viable as a single pass at 100 TB. */
  def featureWoeIv(spark: SparkSession, dir: String,
      tau: Double = 50.0): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_type"),
        when(col("value") > tau, lit(1L)).otherwise(lit(0L)).as("y"))
    val byCat = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("good"))
      .withColumn("bad", col("n") - col("good"))
    val glob = byCat.agg(sum(col("good")).as("gt"), sum(col("bad")).as("bt"))
    byCat.crossJoin(broadcast(glob))
      .select(col("event_type"), col("n"), col("good"), col("bad"),
        log(((lit(2) * col("good") + 1) * col("bt")).cast("double") /
          ((lit(2) * col("bad") + 1) * col("gt")).cast("double"))
          .cast("float").as("woe"),
        (((lit(2) * col("good") + 1) * col("bt")
          - (lit(2) * col("bad") + 1) * col("gt")).cast("double") /
          (lit(2) * col("gt") * col("bt")).cast("double") *
          log(((lit(2) * col("good") + 1) * col("bt")).cast("double") /
            ((lit(2) * col("bad") + 1) * col("gt")).cast("double")))
          .cast("float").as("iv_term"))
      .orderBy(col("event_type"))
  }

  /** Model-evaluation surface: confusion matrix of a deterministic
    * pseudo-classifier (md5-derived, 75% of rows keep their label, the
    * rest rotate to another class by hash) against the event_type label,
    * with per-label row fractions — the evaluation step of a training
    * pipeline, all integer counting + one exact division, so the oracle
    * hash-compares it. The class dictionary (5 rows) broadcasts; the
    * fact scan aggregates map-side to k² cells. */
  def evalConfusion(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"), col("event_type"))
    val types = ev.select(col("event_type")).distinct()
      .withColumn("idx",
        (row_number().over(Window.orderBy(col("event_type"))) - 1)
          .cast("long"))
    val k = types.agg(count(lit(1)).as("k"))
    val h = Dedup.hash60(concat(col("event_id").cast("string"), lit(":pred")))
    // spread ONLY the labeled branch (single consumer): the per-row
    // pred-hash runs on every core instead of the unsplittable scan task
    val labeled = graft.schema.Schemas
      .spread(spark, dir, "events", ev, col("event_id"))
      .join(broadcast(types), Seq("event_type"))
      .crossJoin(broadcast(k))
      .withColumn("h", h)
      .withColumn("pidx",
        when(col("h") % 20 < 15, col("idx"))
          .otherwise((col("idx") + 1
            + (col("h") % 20 - 15) % (col("k") - 1)) % col("k")))
    val predNames = types
      .select(col("idx").as("pidx"), col("event_type").as("pred"))
    val cells = labeled.join(broadcast(predNames), Seq("pidx"))
      .groupBy(col("event_type").as("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val wl = Window.partitionBy(col("label"))
    cells
      .withColumn("row_frac",
        col("n").cast("double") / sum(col("n")).over(wl))
      .orderBy(col("label"), col("pred"))
  }

  /** Fixed-size deterministic sample per group — k rows per event_type in
    * md5 order (uniform "random" but reproducible across engines, runs,
    * and partitionings). Two-phase for scale: low-cardinality groups make
    * a single per-group window one task per group over n/k rows, so
    * phase 1 takes each (group, salt) slice's local top-k (parallel,
    * bounded) and phase 2 re-ranks only the surviving salts·k candidate
    * rows per group — provably the same rows as a single global window
    * (every global top-k row is in its salt's local top-k; a spec
    * cross-checks). */
  def sampleTopkPerGroup(spark: SparkSession, dir: String,
      k: Int = 20, salts: Int = 8): DataFrame = {
    val h = Dedup.hash60(concat(col("event_id").cast("string"), lit(":smp")))
    val base = graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"), col("event_type"))
      .withColumn("h", h)
      .withColumn("salt", col("h") % salts)
    val w1 = Window.partitionBy(col("event_type"), col("salt"))
      .orderBy(col("h"), col("event_id"))
    val w2 = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    base
      .withColumn("local_rn", row_number().over(w1))
      .filter(col("local_rn") <= k)
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("rn").cast("int").as("rn"),
        col("event_id"))
      .orderBy(col("event_type"), col("rn"))
  }

  /** Cumulative distinct count — `COUNT(DISTINCT) OVER`, which no Spark
    * window supports natively: running number of distinct users seen per
    * event_type in (ts, event_id) order. The canonical rewrite marks each
    * (type, user)'s FIRST event (a min-struct aggregate, one shuffle) and
    * running-sums the flags.
    *
    * Scale shape: the running sum itself uses the two-level trick — flags
    * prefix-sum per (type, time-bucket) histogram (tiny, broadcast), plus
    * parallel within-bucket windows — so no per-type window ever streams
    * n/|types| rows through one task. Bucket order is consistent with
    * (ts, event_id) order because the bucket is floor(ts), monotone in
    * ts. Output bounded to event_id < maxId AFTER the global compute. */
  def windowCumulativeDistinct(spark: SparkSession, dir: String,
      bucketSeconds: Long = 3600L, maxId: Long = 3000L): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val firsts = ev.groupBy(col("event_type"), col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("f"))
      .select(col("f.event_id").as("event_id"), lit(1L).as("first_flag"))
    val marked = ev
      .join(firsts, Seq("event_id"), "left")
      .withColumn("ff", coalesce(col("first_flag"), lit(0L)))
      .withColumn("bucket",
        floor(unix_micros(col("ts")) / (bucketSeconds * 1000000L)))
    val offsets = marked.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("ff")).as("bf"))
      .withColumn("off",
        coalesce(sum(col("bf")).over(Window.partitionBy(col("event_type"))
          .orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("event_type"), col("bucket"), col("off"))
    val wLocal = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked.join(broadcast(offsets), Seq("event_type", "bucket"))
      .withColumn("cum_distinct_users",
        col("off") + sum(col("ff")).over(wLocal))
      .filter(col("event_id") < maxId)
      .select(col("event_id"), col("event_type"), col("cum_distinct_users"))
      .orderBy(col("event_id"))
  }

  /** Intra-document repetition score: 1 − distinct/total word bigrams —
    * the boilerplate/degenerate-text detector (high repetition ⇒ template
    * or generation-loop content). One explode + one per-doc aggregate;
    * grams never leave their doc's partition group. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(Dedup.shinglesFromTokens(col("t"), 2)).as("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("g")).as("n_distinct"))
      .withColumn("repetition",
        lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams"))
      .orderBy(col("doc_id"))

  /** Mutual-information terms between a categorical feature
    * (event_type) and a banded target (floor(value/25)): per (x, y)
    * cell, the exact joint/marginal counts and the MI contribution
    * (n_xy/n)·ln(n_xy·n / (n_x·n_y)) — the feature-selection signal a
    * training pipeline ranks features by (alongside [[featureWoeIv]]).
    * Terms are emitted PER CELL, never pre-summed: a grouped sum of
    * ln-terms would be engine-order-dependent in the last ulp (the
    * drift_psi_value discipline); the consumer sums the ≤ 25 rows.
    *
    * Scale shape: one map-side-combined (x, y) aggregate (≤ 25 cells at
    * any corpus size); marginals broadcast back onto the cells. All
    * counts exact integers; ln runs once per cell and the REAL cast
    * absorbs libm's last ulp. */
  def featureMutualInfoTerms(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.schema.Schemas.events(spark, dir)
      .select(col("event_type").as("x"),
        floor(col("value") / lit(25.0)).cast("int").as("y"))
    val joint = ev.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = ev.groupBy(col("x")).agg(count(lit(1)).as("n_x"))
    val my = ev.groupBy(col("y")).agg(count(lit(1)).as("n_y"))
    val tot = ev.agg(count(lit(1)).as("n"))
    joint
      .join(broadcast(mx), Seq("x"))
      .join(broadcast(my), Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        col("n"),
        ((col("n_xy").cast("double") / col("n").cast("double")) *
          log((col("n_xy") * col("n")).cast("double") /
            (col("n_x") * col("n_y")).cast("double")))
          .cast("float").as("mi_term"))
      .orderBy(col("x"), col("y"))
  }
}
