package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Time-series / event operators over `events.parquet` (SURVEY.md §2.4
  * "Streaming" row, expressed in their batch-equivalent form so the DuckDB
  * oracle can check them; the true streaming forms — watermarks,
  * `session_window`, `dropDuplicatesWithinWatermark` — are exercised in
  * `graft.streaming` and its ScalaTest suite over the same data).
  *
  * Scale notes: every query here groups or windows by `user_id` (or a time
  * bucket), so the single shuffle partitions by the natural key; the as-of
  * join uses the union+last_value pattern (one shuffle, no per-row probing),
  * which is the standard scalable formulation — a correlated subquery would be
  * O(n·m) and is left to the oracle only.
  */
object Events {

  /** Finite-domain predicate (null ⇒ null, so `when(finite(c), x)` yields
    * null for null input too). The e-family's hostile-domain contract
    * (r13, adversarial audit): non-finite values are treated as MISSING —
    * they can't be quantized to integers or exact decimals, and Spark's
    * decimal cast already nulls them, so every site that would otherwise
    * crash (ANSI NaN→BIGINT cast) or silently saturate routes through
    * this guard; the oracles mirror it with `isfinite`. */
  private def finite(c: Column): Column =
    !isnan(c) && abs(c) =!= lit(Double.PositiveInfinity)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour window aggregation (streaming `window(ts, "1 hour")`
    // batch twin; window start surfaced as a plain timestamp column).
    "e1_tumbling_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("wstart"), col("event_type"))
    },
    // Sliding 2-hour window, 1-hour slide.
    "e2_sliding_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("wstart"), col("n"))
        .orderBy(col("wstart"))
    },
    // Gap-based sessionization (30-min inactivity gap) per user: the batch
    // islands formulation of `session_window`.
    "e3_sessionize" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ts")).as("session_start"),
             max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    },
    // As-of join: each purchase aligned to the latest signup at-or-before it
    // for the same user. Scalable union + last_value-carry-forward
    // formulation. Within a timestamp tie, signups sort BEFORE other events
    // so the carry-forward includes them — matching the oracle's `s.ts <=
    // e.ts` semantics even when (user_id, ts) is not unique.
    "e4_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(
        col("ts"),
        when(col("event_type") === "signup", 0).otherwise(1),
        col("event_id"))
      ev.withColumn("signup_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true)
            .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("signup_ts"))
        .orderBy(col("event_id"))
    },
    // Range (interval) join: pairs of events of one user within 5 minutes.
    "e5_range_join" -> { (s, d) =>
      val a = Tables.events(s, d).select(col("user_id"),
        col("event_id").as("a_id"), col("ts").as("a_ts"))
      val b = Tables.events(s, d).select(col("user_id").as("b_user"),
        col("event_id").as("b_id"), col("ts").as("b_ts"))
      a.join(b, col("user_id") === col("b_user") &&
               col("b_ts") > col("a_ts") &&
               col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    },
    // JSON extraction from the props column.
    "e6_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },
    // Deterministic stream-dedup analog: first event per (user, type) by time.
    "e7_dedup_first" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
        .orderBy(col("user_id"), col("event_type"))
    },
    // min_by/max_by-style: first and last event value per user.
    "e8_first_last" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          // (user_id, µs-truncated ts) is unique in the testdata, so no
          // tiebreak column is needed for min_by/max_by determinism.
          min_by(col("value"), col("ts")).as("first_value"),
          max_by(col("value"), col("ts")).as("last_value"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },
    // Lag/lead deltas: time since previous event per user.
    "e9_lag_lead" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(col("prev_ts")))
        .select(col("event_id"), col("user_id"), col("prev_ts"), col("next_ts"), col("gap_us"))
        .orderBy(col("event_id"))
    },
    // Event-time RANGE frame: per user, rolling count/sum over the
    // trailing 1 hour of EVENT TIME (not row count) — `rangeBetween` on
    // epoch micros, the frame spec the row-based e-queries don't cover.
    // One shuffle on user_id; the frame scan is per-partition ordered.
    "e11_range_frame" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("ts"), col("n_1h"), col("sum_1h"))
        .orderBy(col("event_id"))
    },
    // Rolling distinct users over a trailing 3-hour window (active-user
    // telemetry). COUNT(DISTINCT) isn't a window aggregate in Spark, and a
    // collect_set window would ship whole sets through the exchange — so
    // the window is unrolled instead: distinct (hour, user) pairs each
    // contribute to the 3 window-ends they fall into, then one
    // count-distinct per window-end. Two narrow shuffles over ALREADY
    // DEDUPED pairs (|hours × users|, not |events|) — the scale-right
    // shape; trailing edge windows are emitted partial (same both engines).
    "e12_rolling_distinct" -> { (s, d) =>
      Tables.events(s, d)
        .select(date_trunc("hour", col("ts")).as("h"), col("user_id")).distinct()
        .select(explode(array(col("h"),
            col("h") + expr("INTERVAL 1 HOUR"),
            col("h") + expr("INTERVAL 2 HOUR"))).as("wend"), col("user_id"))
        .groupBy(col("wend"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("wend"))
    },
    // Per-user inter-arrival gap statistics (session/burst profiling): lag
    // over the (ts, event_id)-ordered per-user stream, then one agg per
    // user. Gaps are integral microseconds, so min/max/sum are exact; the
    // mean is a single IEEE division and the median is exact-percentile
    // (both engines average the two middles) — hash-safe. One shuffle on
    // user_id shared by the window and the agg (same key ⇒ no re-exchange).
    "e13_gap_stats" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .filter(col("prev_ts").isNotNull)
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"),
          (sum(col("gap_us")).cast("double") / count(lit(1)).cast("double")).as("avg_gap_us"),
          expr("percentile(gap_us, 0.5)").as("p50_gap_us"))
        .orderBy(col("user_id"))
    },
    // Ordered funnel (view → click → purchase): per user, the first view,
    // the first click strictly AFTER it, and the first purchase strictly
    // after THAT — the sequential-pattern primitive behind conversion
    // analysis. Three chained unordered-frame windows and the final
    // per-user collapse all share ONE hashpartitioning(user_id) exchange
    // (same key ⇒ no re-shuffle, e11/e13 precedent); users who never
    // viewed drop, users who stall mid-funnel keep nulls so step-to-step
    // conversion is a simple count over this output.
    "e14_funnel" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .withColumn("vts", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("cts", min(when(col("event_type") === "click" &&
          col("ts") > col("vts"), col("ts"))).over(w))
        .withColumn("pts", min(when(col("event_type") === "purchase" &&
          col("ts") > col("cts"), col("ts"))).over(w))
        .filter(col("vts").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(col("vts")).as("view_ts"), min(col("cts")).as("click_ts"),
          min(col("pts")).as("purchase_ts"))
        .orderBy(col("user_id"))
    },
    // OHLC bars (the financial/telemetry resample): per (event_type, hour),
    // open/close = value at the first/last event by (ts, event_id), high/
    // low/volume as plain aggregates. min_by/max_by over the unique
    // (ts, event_id) pair keeps open/close deterministic; the decimal sum
    // keeps volume bit-reproducible. ONE shuffle on the grouping key —
    // min_by partial-aggregates map-side like any other agg.
    "e16_ohlc" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("slot"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("volume"))
        .orderBy(col("event_type"), col("slot"))
    },
    // 3σ value-outlier detection (sensor cleaning / data QA): per-type
    // mean/std from EXACT decimal sums (q8's bit-reproducible moment
    // pattern — the engines' internal Welford paths would drift), the tiny
    // stats table broadcast back onto the stream, outliers kept with their
    // z-score. One agg shuffle; the scan side never moves. Both engines
    // evaluate the identical double expression tree, so the 3σ comparison
    // can never disagree at the boundary.
    "e15_value_outliers" -> { (s, d) =>
      val x = col("value").cast("decimal(18,2)")
      val stats = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sum_x"),
          sum(x * x).cast("double").as("sum_xx"))
        .select(col("event_type"),
          (col("sum_x") / col("n")).as("mean"),
          // n = 1 ⇒ stddev undefined ⇒ NULL (the filter below then drops
          // the group's rows on both engines; DuckDB reaches the same
          // NULL via x/0). Without the guard a single-row type is an
          // ANSI divide-by-zero job-kill — invisible on this corpus only
          // because the inner join's null-filter prunes the one 1-row
          // group (null event_type) before the stats project runs.
          when(col("n") > 1,
            sqrt((col("sum_xx") - col("sum_x") * col("sum_x") / col("n")) / (col("n") - 1)))
            .as("stddev"))
      // stddev = 0 with a row still passing the 3-sigma filter is
      // reachable (a +Inf value over an otherwise-constant group):
      // ANSI division would kill the job — the zero-divisor contract is
      // NULL z (DuckDB's native x/0), r13 audit.
      Tables.events(s, d).join(broadcast(stats), "event_type")
        .filter(abs(col("value") - col("mean")) > lit(3) * col("stddev"))
        .select(col("event_id"), col("event_type"), col("value"),
          when(col("stddev") =!= 0.0,
            (col("value") - col("mean")) / col("stddev")).as("z"))
        .orderBy(col("event_id"))
    },
    // Gap-filled resample + forward fill: hourly grid per event_type over
    // all 744 hours of January 2024, empty slots get n=0 and carry the last
    // observed hourly sum forward (sensor-style regularization). One agg
    // shuffle; the grid is types × 720 slots (tiny, broadcast); the fill is
    // a per-type ordered window. Sums go through DECIMAL so Spark and the
    // oracle agree bit-exactly regardless of accumulation order.
    "e10_resample_ffill" -> { (s, d) =>
      val agg = Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("w.start").as("slot"), col("event_type"), col("n"), col("sum_value"))
      val grid = Tables.events(s, d).select(col("event_type")).distinct()
        .crossJoin(s.sql(
          """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
            |  timestamp'2024-01-31 23:00:00', interval 1 hour)) AS slot""".stripMargin))
      val w = Window.partitionBy(col("event_type")).orderBy(col("slot"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(agg, Seq("event_type", "slot"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .withColumn("filled", last(col("sum_value"), ignoreNulls = true).over(w))
        .select(col("event_type"), col("slot"), col("n"), col("sum_value"), col("filled"))
        .orderBy(col("event_type"), col("slot"))
    },
    // Cohort retention: users bucketed by first-active week (their cohort),
    // then for each (cohort_week, active_week) the distinct active users and
    // the retention ratio vs the cohort's size — the product-analytics
    // matrix every activity pipeline reports. Scale shape: first-seen is one
    // groupBy(user_id) shuffle; the distinct (user, week) activity set is
    // one more; the cohort-size table is weeks-sized (tiny) and broadcast.
    // The ratio is a single IEEE division — hash-exact cross-engine.
    "e17_retention" -> { (s, d) =>
      val firstSeen = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val active = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("active_week"))
        .distinct()
      val cohortSize = firstSeen.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("cohort_n"))
      active.join(firstSeen, "user_id")
        .groupBy(col("cohort_week"), col("active_week"))
        .agg(count_distinct(col("user_id")).as("n_active"))
        .join(broadcast(cohortSize), "cohort_week")
        .withColumn("retention",
          col("n_active").cast("double") / col("cohort_n").cast("double"))
        .select(col("cohort_week"), col("active_week"), col("n_active"),
          col("cohort_n"), col("retention"))
        .orderBy(col("cohort_week"), col("active_week"))
    },
    // Per-user interval union (busy-time coverage): merge each user's
    // events into 30-min-gap islands (e3's sessionize rule), then collapse
    // to one row per user with the interval count, the summed busy time,
    // the first-to-last span, and the busy/span coverage ratio. All time
    // arithmetic is exact µs BIGINTs; the one division is IEEE-exact. One
    // shuffle on user_id; both windows and the final agg reuse it.
    "e18_interval_union" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("ivl_start"), max(col("ts")).as("ivl_end"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_intervals"),
          sum(unix_micros(col("ivl_end")) - unix_micros(col("ivl_start"))).as("busy_us"),
          (max(unix_micros(col("ivl_end"))) - min(unix_micros(col("ivl_start"))))
            .as("span_us"))
        .withColumn("coverage",
          when(col("span_us") > 0,
            col("busy_us").cast("double") / col("span_us").cast("double"))
            .otherwise(lit(0.0)))
        .orderBy(col("user_id"))
    },
    // Value histogram per event type (distribution profiling — the QA view
    // before setting e15's outlier thresholds): fixed-width buckets via an
    // explicit floor(value / width) rather than width_bucket, because the
    // explicit form is ONE correctly-rounded IEEE division + floor on both
    // engines (width_bucket's internal (v-lo)*n/(hi-lo) arithmetic order
    // is engine-specific and can flip a boundary value by an ulp). One
    // aggregation shuffle on (type, bucket).
    "e20_value_histogram" -> { (s, d) =>
      // Non-finite values land in the NULL bucket (the missing-value
      // convention — see `finite`): an unguarded floor would silently
      // send NaN to bucket 0 and ±Inf to saturated Long buckets, three
      // different engine-specific placements for "not a number".
      val bucket = when(finite(col("value")), floor(col("value") / 5.0).cast("bigint"))
      Tables.events(s, d)
        .groupBy(col("event_type"), bucket.as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("event_type"), col("bucket"))
    },
    // Time-weighted average (TWAP): each observation weighted by how long
    // it remained current (µs until the user's next event); the standard
    // irregular-series average for sensor/price data, where a plain mean
    // over-counts bursts. Exact by construction: DECIMAL(18,2) value ×
    // BIGINT µs is an exact decimal product, summed exactly (order-free),
    // divided ONCE in IEEE doubles. One user_id shuffle shared by the lead
    // window and the aggregation. The last observation has no successor
    // and drops out (standard left-closed TWAP convention).
    "e19_twap" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
        .withColumn("dt_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
        // Filter on the WEIGHT being defined, not just the successor
        // existing: a null-ts observation has a successor but no
        // measurable duration — it carries no weight and must not count
        // toward n_obs (matches the oracle's `WHERE dt_us IS NOT NULL`;
        // identical on null-free corpora).
        .filter(col("dt_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_obs"),
          sum(col("dt_us")).as("obs_us"),
          // An all-duplicate-ts user sums zero observed time: twap is
          // undefined — NULL (DuckDB x/0), not an ANSI job-kill.
          when(sum(col("dt_us")) > 0,
            sum(col("value").cast("decimal(18,2)") * col("dt_us")).cast("double") /
              sum(col("dt_us")).cast("double")).as("twap"))
        .orderBy(col("user_id"))
    },
    // Gaps-and-islands streak detection: per user, runs of identical
    // consecutive event_type, reporting the run count, the longest run, and
    // which type achieved it (ties broken by type then run position, so the
    // answer is total-order deterministic). Everything — the change-flag
    // window, the run rollup, the per-user argmax window, and the run-count
    // window — partitions by user_id, so ONE shuffle feeds four operators.
    "e21_streaks" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pick = Window.partitionBy(col("user_id"))
        .orderBy(col("len").desc, col("event_type"), col("run_id"))
      Tables.events(s, d)
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(byUser).isNull ||
               lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("run_id", sum(col("chg")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("run_id"))
        .agg(max(col("event_type")).as("event_type"), count(lit(1)).as("len"))
        .withColumn("n_runs",
          count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .withColumn("rn", row_number().over(pick))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("n_runs"), col("len").as("longest"),
          col("event_type").as("top_type"))
        .orderBy(col("user_id"))
    },
    // Spearman rank correlation between arrival order and value, per event
    // type — drift detection ("are values trending over time?") without
    // assuming normality. Computed from the classic integer identity
    // rho = (n(n²−1) − 6·Σd²) / n(n²−1) with row_number ranks (deterministic
    // (value|ts, event_id) tiebreaks). Both operands are exact INTEGERS but
    // NOT exact longs: n(n²−1) and Σd² are cubic in the per-type count, so
    // they pass Long.MAX at n ≈ 2.1M (the r10 sf100 probe caught the
    // overflow live at n = 10M) — they accumulate in DECIMAL(38,0) (exact
    // to n ≈ 1e12, any real corpus) and only the final s_d2 / rho emit as
    // DOUBLE, so the single division is IEEE-exact at oracle SF where a
    // corr()-of-doubles formulation would drift by summation order. The two
    // rank windows use different sort keys but the SAME event_type hash
    // partitioning: one shuffle, two in-partition sorts. At 100 TB the
    // per-key sort is the cost — event_type has FIXED cardinality 10, so
    // this is the q55/q7 low-cardinality window wall; the scale path is
    // the two-pass distributed rank implemented as e22_scale below.
    "e22_spearman" -> { (s, d) =>
      val byVal = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      val byTs  = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rv", row_number().over(byVal).cast("bigint"))
        .withColumn("rt", row_number().over(byTs).cast("bigint"))
        .withColumn("d2", spearmanD2)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("d2")).as("sd"))
        .select(spearmanCols: _*)
        .orderBy(col("event_type"))
    },
    // e22's SCALE TWIN (r8 — q7_scale's two-level playbook applied to
    // per-ROW ranks): e22's two row_number windows partition the FULL
    // events fact by event_type — cardinality 10, FIXED, independent of
    // data size — so at 100 TB ten reducers each sort n/10 rows and
    // wall-clock is ∝ n regardless of cluster width. The twin computes the
    // SAME ranks as a two-pass distributed rank per sort dimension:
    //   (1) coarse MONOTONE buckets of the primary sort key — unit-value
    //       buckets for `value`, hours for `ts` (widths via
    //       spark.graft.e22.{vwidth,thours}); equal keys share a bucket,
    //       so cross-bucket order is total and ties resolve inside one
    //       fine partition exactly as e22's (key, event_id) sort does;
    //   (2) a groupBy(type, bucket) count — map-side combined, result
    //       |types|·|buckets| rows — with an exclusive running prefix over
    //       that TINY table (the only Windows partitioned by bare type run
    //       here, on domain-bound rows, never on the fact);
    //   (3) fine row_number partitioned by (type, bucket) — thousands of
    //       independent partitions — plus the broadcast base:
    //       rank = base + row_number, exact integers.
    // Σd² and the single IEEE division are e22's expressions verbatim, so
    // the twin hash-matches e22 and its DuckDB oracle bit-for-bit
    // (QueriesSpec pins row equality; PlanSpec pins the partition keys).
    // NULL keys rank too: bucket columns are null for null value/ts (and
    // event_type itself may be null), so every join below is null-SAFE
    // (<=>) — a plain === would silently drop those rows while e22's
    // windows rank them nulls-first. The null bucket sorts first in the
    // prefix window exactly as nulls sort first in e22's ORDER BY, so
    // ranks stay identical (QueriesSpec pins this on a null-laden corpus).
    "e22_scale" -> { (s, d) =>
      val vwidth = s.conf.get("spark.graft.e22.vwidth", "1.0").toDouble
      val thours = s.conf.get("spark.graft.e22.thours", "1").toLong
      require(vwidth > 0 && thours > 0,
        s"spark.graft.e22.vwidth/thours must be positive, got $vwidth/$thours")
      // A century is ~876k hours; anything past 1e6 is a typo, and past
      // 2.56e9 the micros-per-bucket product overflows Long — silently
      // non-monotone buckets. Fail fast instead.
      require(thours <= 1000000L,
        s"spark.graft.e22.thours=$thours is beyond any sane bucket (max 1e6)")
      // Belt-and-braces memory guard (q55_scale's idiom): the prefix
      // tables are broadcast, and their size is value-domain/vwidth (resp.
      // time-span/thours) per type — a user-set sliver width would densify
      // a near-fact-sized table. Refuse loudly before the broadcast.
      val maxPrefix = s.conf.get("spark.graft.e22.maxPrefixRows", "2000000").toLong
      // floor(double/width) for values and exact integer FLOOR division
      // for micros (`div` truncates toward zero — a pre-1970 timestamp
      // would land one bucket high and break the monotone-bucket
      // invariant; this corpus is post-1970, but the operator must not
      // silently assume it).
      val tw = thours * 3600000000L
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
        // IEEE edge values must keep the bucket function MONOTONE in
        // Spark's sort order (… < +Inf < NaN): double→long saturates ±Inf
        // (and any |v|/vwidth beyond long range) to Min/MaxValue — fine,
        // saturation is monotone and within-bucket order finishes the job
        // — but (long)NaN is 0, which would silently drop NaN rows into
        // the middle of the domain. Pin NaN to the MaxValue bucket, where
        // in-bucket (value, event_id) order already places it after any
        // saturated finite or +Inf neighbors.
        .withColumn("gv", when(isnan(col("value")), lit(Long.MaxValue))
          .otherwise(floor(col("value") / lit(vwidth))))
        .withColumn("gt",
          expr(s"(unix_micros(ts) - pmod(unix_micros(ts), $tw)) div $tw"))
      // BOTH prefix tables from ONE fact pass (r16 — e22_scale made 4 full
      // fact passes; this removes one): GROUPING SETS ((ty, gv), (ty, gt))
      // computes the per-(type, value-bucket) AND per-(type, time-bucket)
      // counts in a single scan+aggregate — Expand doubles rows entering
      // the partial aggregate, but map-side combine collapses them to
      // bucket counts before the (tiny) exchange, and the two downstream
      // prefix branches read that ONE exchange back (ReusedExchange —
      // PlanSpec pins both the single events scan under the prefixes and
      // the reuse). `grouping(gv)` tags which set a row belongs to;
      // genuine NULL buckets (null value/ts/event_type rows) keep their
      // key and stay distinguishable from the aggregated-away column.
      // Materialized eagerly (d9's union idiom): the two prefix branches
      // filter this ONE table by grouping bit, and Catalyst does not
      // recognize the two filtered reads as a reusable exchange (the
      // grouping-id predicate de-canonicalizes the subtrees — measured:
      // 3 events scans without the checkpoint, 2 with). The table is
      // aggregate-bounded (≤ |v-buckets| + |t-buckets| rows), not
      // fact-sized.
      val pre = ev
        .groupingSets(
          Seq(Seq(col("event_type"), col("gv")), Seq(col("event_type"), col("gt"))),
          col("event_type"), col("gv"), col("gt"))
        .agg(count(lit(1)).as("c"), grouping(col("gv")).as("is_t"))
        .localCheckpoint(true)
      def prefix(bucket: String, tag: String): DataFrame = {
        val w = Window.partitionBy(col(s"${tag}_ty")).orderBy(col(s"${tag}_g"))
        // Whole-partition bucket count per type (same tiny aggregate, same
        // shuffle key as the running sum) — the guard predicate.
        val nb = Window.partitionBy(col(s"${tag}_ty"))
        val knob = if (tag == "v") "vwidth" else "thours"
        pre.filter(col("is_t") === (if (tag == "t") 1 else 0))
          .select(col("event_type").as(s"${tag}_ty"), col(bucket).as(s"${tag}_g"),
            col("c"))
          .withColumn("nb", count(lit(1)).over(nb))
          .filter(when(col("nb") > maxPrefix,
            raise_error(format_string(
              s"e22_scale: %s buckets for event_type %s exceed " +
                s"spark.graft.e22.maxPrefixRows=$maxPrefix; widen " +
                s"spark.graft.e22.$knob, raise the cap, or run e22_spearman",
              col("nb"), col(s"${tag}_ty")))).isNull)
          .select(col(s"${tag}_ty"), col(s"${tag}_g"),
            (sum(col("c")).over(w) - col("c")).as(s"${tag}_base"))
      }
      val fineV = Window.partitionBy(col("event_type"), col("gv"))
        .orderBy(col("value"), col("event_id"))
      val fineT = Window.partitionBy(col("event_type"), col("gt"))
        .orderBy(col("ts"), col("event_id"))
      ev.join(broadcast(prefix("gv", "v")),
          col("event_type") <=> col("v_ty") && col("gv") <=> col("v_g"))
        .withColumn("rv", (col("v_base") + row_number().over(fineV)).cast("bigint"))
        .join(broadcast(prefix("gt", "t")),
          col("event_type") <=> col("t_ty") && col("gt") <=> col("t_g"))
        .withColumn("rt", (col("t_base") + row_number().over(fineT)).cast("bigint"))
        .withColumn("d2", spearmanD2)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("d2")).as("sd"))
        .select(spearmanCols: _*)
        .orderBy(col("event_type"))
    },
    // First-order Markov transition matrix over per-user event sequences:
    // counts of (prev_type → type) steps plus the conditional probability
    // p(type | prev_type) — the sequence-mining view behind next-event
    // prediction and anomalous-flow detection. The lag window shuffles by
    // user_id once; transition counting is a domain²-sized aggregate; the
    // row-normalizing denominator comes from a window over the TINY count
    // table (|types|² rows), not a corpus re-scan. The probability is one
    // IEEE division of exact BIGINTs.
    "e23_transitions" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_from",
          sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("bigint"))
        .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
        .orderBy(col("prev_type"), col("event_type"))
    },
    // CDC changelog materialization — the BATCH twin of the K2 upsert
    // sink, with the one semantic none of e7/e8 (keep-first/last) or d17
    // (survivorship) covers: TOMBSTONES. The event stream is read as a
    // changelog over user_id (op mapped from event_type — 'purchase'
    // closes the account here; a real feed ships the op column) and the
    // result is the LIVE snapshot: last-wins per key in the total
    // (ts, event_id) order, keys whose FINAL op is a delete are absent,
    // and a later upsert legitimately resurrects a deleted key. Both
    // windows share one user_id exchange. At 100 TB this is how a
    // snapshot materializes from a log in one pass — no sort-merge
    // against yesterday's table, no per-key driver loop.
    "e27_cdc_apply" -> { (s, d) =>
      val byKey = Window.partitionBy(col("user_id"))
      val latest = byKey.orderBy(col("ts").desc_nulls_last, col("event_id").desc)
      Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .withColumn("op",
          when(col("event_type") === "purchase", lit("delete")).otherwise(lit("upsert")))
        .withColumn("rk", row_number().over(latest))
        .withColumn("n_changes", count(lit(1)).over(byKey).cast("bigint"))
        .filter(col("rk") === 1 && col("op") =!= "delete")
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"), col("n_changes"))
        .orderBy(col("user_id"))
    },
    // Robust (median/MAD) outliers — e15's 3-sigma twin for heavy-tailed
    // data, where mean/stddev are themselves dragged by the outliers.
    // Exactness recipe: values quantize to integer MICROS (round(v·1e6),
    // exact on both engines), so both medians interpolate integers or
    // integer-halves at g = ½ — exact in IEEE doubles — and the modified
    // z-score (mu − med)/(1.4826·mad) is a fixed two-op double expression
    // evaluated identically on both engines. Two tiny per-type stat
    // tables (|types| rows) broadcast back onto the stream; each is
    // localCheckpoint'd because its lazy plan would otherwise be INLINED
    // into every consumer (d9's union lesson) — med feeds both the MAD
    // branch and the outer join, so the corpus would re-scan once per
    // reference. Materialized, the statistic costs its inherent two
    // passes (med, then MAD of deviations), both scan-shaped.
    "e24_mad_outliers" -> { (s, d) =>
      val ev = Tables.events(s, d)
        // Non-finite values can't quantize to micros (ANSI NaN→BIGINT
        // cast is a job-killer at any scale) — they get a null mu and
        // flow out exactly like null values: excluded from both medians,
        // never emitted as outliers (see `finite`; oracle mirrors with
        // isfinite).
        .withColumn("mu",
          when(finite(col("value")), round(col("value") * 1e6).cast("bigint")))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(mu, 0.5)").as("med"))
        .localCheckpoint(true)
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("mu") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(dev, 0.5)").as("mad"))
        .localCheckpoint(true)
      // mad = 0 (over half the group at the median) makes every row's z
      // a division by zero under ANSI — the robust-z is undefined there:
      // NULL z, row not an outlier (DuckDB's x/0 NULL agrees).
      dev.join(broadcast(mad), "event_type")
        .withColumn("z", when(col("mad") =!= 0.0,
          (col("mu") - col("med")) / (lit(1.4826) * col("mad"))))
        .filter(abs(col("z")) > 3.5)
        .select(col("event_id"), col("event_type"), col("value"), col("z"))
        .orderBy(col("event_id"))
    },
    // Diurnal seasonality profile: fold the calendar onto hour-of-day and
    // report each (type, hour) cell's share of its type plus the lift vs a
    // uniform 1/24 baseline — the QA view for "is this stream's traffic
    // shape sane?" and the input to load-aware sampling. One aggregation
    // shuffle to domain-sized (|types|·24) cells; the row-normalizing
    // window runs over that tiny table. share·24 is one exact-integer
    // division then one double multiply — identical on both engines.
    "e25_seasonality" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("hod", hour(col("ts")).cast("bigint"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_type",
          sum(col("n")).over(Window.partitionBy(col("event_type"))).cast("bigint"))
        .withColumn("share", col("n").cast("double") / col("n_type").cast("double"))
        .withColumn("lift", col("share") * 24.0)
        .orderBy(col("event_type"), col("hod"))
    },
    // Pairwise type co-movement: Pearson correlation between every two
    // event types' HOURLY count series — "do errors spike with
    // purchases?" — computed from the raw-moment identity
    // (nΣxy−ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) over exact DECIMAL(38,0)
    // sums (q8's recipe + the e22 overflow lesson: Σx² of BIGINT hourly
    // counts wraps silently at x~1e7 over 1e5 hours — plausible 100 TB
    // density), so the one division, two correctly-rounded sqrts and one
    // product are engine-identical where builtin corr()'s Welford
    // accumulation order would drift. DuckDB needs no change: its BIGINT
    // sums already widen to HUGEINT and both casts to DOUBLE round
    // correctly from the same exact integers. The series align on the
    // COMPLETE hour×type grid (missing cells = 0 — an inner join would
    // bias the correlation toward co-active hours). Corpus collapses in
    // the first (hour, type) aggregate; everything after runs on
    // grid-sized data (|hours|·|types| rows, |types|² pairs).
    "e26_type_correlation" -> { (s, d) =>
      val hc = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // grid + both join branches reuse it — one corpus pass
      val grid = hc.select(col("h")).distinct()
        .crossJoin(hc.select(col("event_type")).distinct())
      val full = grid.join(hc, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      val j = full.toDF("h", "type_a", "x")
        .join(full.toDF("h2", "type_b", "y"),
          col("h") === col("h2") && col("type_a") < col("type_b"))
      val xd = col("x").cast("decimal(19,0)")
      val yd = col("y").cast("decimal(19,0)")
      j.groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_hours"),
          sum(xd).as("sx"), sum(yd).as("sy"),
          sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"),
          sum(xd * yd).as("sxy"))
        .withColumn("nh", col("n_hours").cast("decimal(19,0)"))
        // A constant count series has zero variance: correlation is
        // undefined — NULL (matching DuckDB's x/0), not an ANSI job-kill.
        .withColumn("den",
          sqrt((col("nh") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("nh") * col("syy") - col("sy") * col("sy")).cast("double")))
        .withColumn("corr",
          when(col("den") =!= 0.0,
            (col("nh") * col("sxy") - col("sx") * col("sy")).cast("double") / col("den")))
        .select(col("type_a"), col("type_b"), col("n_hours"), col("corr"))
        .orderBy(col("type_a"), col("type_b"))
    },
    // Linear gap interpolation on the hourly grid — e10's sibling with the
    // other classic resample fill. A slot is OBSERVED iff its finite-sum is
    // non-null (an hour whose every value is NaN/Inf counts as missing, the
    // e-family's non-finite-is-missing contract); interior gaps fill with
    // prev + (next − prev) · Δh/Δ_span, edges (before first / after last
    // observation) stay NULL — linear interpolation has no extrapolation.
    // Scale shape: one agg shuffle on (slot, type), one window exchange on
    // type; both window frames (backward last, forward first) share the
    // same partitioning + ascending sort, so Catalyst plans ONE sort. The
    // Δh/Δ_span division is guarded (ANSI: x/0 throws even for DOUBLE) —
    // unreachable when un-observed (prev_slot < slot < next_slot strictly)
    // but the guard documents the domain.
    "e28_interp_linear" -> { (s, d) =>
      val agg = Tables.events(s, d)
        .filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(sum(when(finite(col("value")), col("value").cast("decimal(18,2)")))
          .cast("double").as("sum_value"))
        .select(col("w.start").as("slot"), col("event_type"), col("sum_value"))
      val grid = Tables.events(s, d).select(col("event_type")).distinct()
        .crossJoin(s.sql(
          """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
            |  timestamp'2024-01-31 23:00:00', interval 1 hour)) AS slot""".stripMargin))
      val back = Window.partitionBy(col("event_type")).orderBy(col("slot"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy(col("event_type")).orderBy(col("slot"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obs = col("sum_value").isNotNull
      val hrs = (a: Column, b: Column) =>
        ((unix_timestamp(a) - unix_timestamp(b)) / 3600L).cast("double")
      grid.join(agg, Seq("event_type", "slot"), "left")
        .withColumn("pv", last(when(obs, col("sum_value")), ignoreNulls = true).over(back))
        .withColumn("ps", last(when(obs, col("slot")), ignoreNulls = true).over(back))
        .withColumn("nv", first(when(obs, col("sum_value")), ignoreNulls = true).over(fwd))
        .withColumn("ns", first(when(obs, col("slot")), ignoreNulls = true).over(fwd))
        .withColumn("interp",
          when(obs, col("sum_value"))
            .when(col("pv").isNotNull && col("nv").isNotNull &&
                hrs(col("ns"), col("ps")) =!= 0.0,
              col("pv") + (col("nv") - col("pv")) *
                hrs(col("slot"), col("ps")) / hrs(col("ns"), col("ps"))))
        .select(col("event_type"), col("slot"), col("sum_value"), col("interp"))
        .orderBy(col("event_type"), col("slot"))
    },
    // SCD Type-2 dimension build — e27's other half. e27 materializes the
    // LIVE snapshot from a changelog; this materializes the HISTORY: each
    // maximal run of consecutive equal `event_type` per user becomes one
    // versioned row with [valid_from, valid_to) effectivity and an
    // is_current flag — the classic warehouse type-2 dimension, built in
    // one pass. Run detection is the standard gaps-and-islands windowed
    // cumulative-sum; change detection is NULL-SAFE (`<=>` / IS DISTINCT
    // FROM) so a null attribute forms its own run instead of fusing with
    // its neighbors. Rows without a key or a time are out of scope (a
    // type-2 row needs both; mirrored WHERE) and the run order is the
    // total (ts, event_id) order with the e-family's pinned NULLS FIRST.
    // Scale shape: row_number, lag, and the running sum all share ONE
    // (user_id, ts, event_id) sort, the run aggregate reuses the user_id
    // partitioning, and the valid_to lead is a second window on the
    // already run-sized (not event-sized) frame — at 100 TB this is one
    // fact-table exchange plus history-sized everything else.
    "e29_scd2" -> { (s, d) =>
      val byTime = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc_nulls_first)
      val runSum = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val versioned = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("rn", row_number().over(byTime))
        .withColumn("prev_type", lag(col("event_type"), 1).over(byTime))
        .withColumn("chg",
          when(col("rn") === 1 || !(col("event_type") <=> col("prev_type")), 1L)
            .otherwise(0L))
        .withColumn("ver", sum(col("chg")).over(runSum))
      // event_type is constant within a run by construction; min() is just
      // the deterministic way to surface it (all-null runs stay null).
      val runs = versioned.groupBy(col("user_id"), col("ver"))
        .agg(min(col("event_type")).as("attr"),
          min(col("ts")).as("valid_from"),
          count(lit(1)).cast("bigint").as("n_events"))
      val byVer = Window.partitionBy(col("user_id")).orderBy(col("ver"))
      runs
        .withColumn("valid_to", lead(col("valid_from"), 1).over(byVer))
        .withColumn("is_current",
          when(col("valid_to").isNull, 1L).otherwise(0L))
        .select(col("user_id"), col("ver"), col("attr"), col("valid_from"),
          col("valid_to"), col("n_events"), col("is_current"))
        .orderBy(col("user_id"), col("ver"))
    },
    // CUSUM changepoint detection on the hourly series — "where did this
    // metric's level shift?", the QA sibling of e25's seasonality profile.
    // Observation-weighted CUSUM: C_k = Σ_{i≤k} (tot_i − n_i·ḡ) over hours
    // in time order, where ḡ is the type's overall mean; the changepoint
    // is the hour maximizing |C_k| (earliest hour on ties). Exactness
    // recipe (cross-engine bit-identity, the e24/e26 playbook): values
    // quantize to integer micros (finite and |v| < 1e9 — outside that the
    // value is missing, mirrored oracle-side), so BOTH running sums (tot,
    // n) and both overall sums are exact BIGINT folds — order-free — and
    // every double is produced by the same fixed expression on identical
    // integer operands. A floating cumulative sum would NOT be safe here:
    // Spark folds the running frame sequentially while DuckDB may sum it
    // tree-shaped, and the non-associative drift would flip near-tied
    // argmax rows. Scale shape: the corpus collapses in the first
    // (type, hour) aggregate; everything downstream is grid-sized, and
    // the two windows share one event_type exchange.
    "e30_cusum" -> { (s, d) =>
      val hourly = Tables.events(s, d)
        .filter(col("ts").isNotNull)
        .withColumn("mu",
          when(finite(col("value")) && abs(col("value")) < 1e9,
            round(col("value") * 1e6).cast("bigint")))
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(sum(col("mu")).as("tot"), count(col("mu")).as("n"))
        .filter(col("n") > 0)
      val byType = Window.partitionBy(col("event_type"))
      val run = byType.orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = hourly
        .withColumn("gmean", sum(col("tot")).over(byType).cast("double") /
          sum(col("n")).over(byType).cast("double"))
        .withColumn("rt", sum(col("tot")).over(run))
        .withColumn("rnn", sum(col("n")).over(run))
        .withColumn("cusum",
          (col("rt").cast("double") - col("rnn").cast("double") * col("gmean")) / 1e6)
        .withColumn("n_hours", count(lit(1)).over(byType).cast("bigint"))
      val best = Window.partitionBy(col("event_type"))
        .orderBy(abs(col("cusum")).desc, col("hr").asc)
      scored.withColumn("rk", row_number().over(best))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n_hours"), col("hr").as("cp_hr"),
          col("cusum").as("cp_cusum"))
        .orderBy(col("event_type"))
    },
    // Sliding-window rate-limit audit: per user, the peak event count in
    // ANY trailing 6-hour window, how many events landed at-or-over the
    // breach threshold, and when the first breach happened. The abuse/
    // quota primitive every ingestion pipeline runs — and the e-family's
    // RANGE-frame showcase: the frame is a VALUE interval over epoch
    // micros (not N rows), so burst detection is exact regardless of how
    // many events share a timestamp (RANGE includes all peers on both
    // engines — the frame is deterministic even under ties, where a ROWS
    // frame would be input-order-dependent). Null user_id/ts rows are
    // excluded — the e-family null-key contract (r13): a row that cannot
    // be attributed to a window cannot breach one. Scale shape: ONE
    // user_id exchange shared by the window and the rollup (e29's
    // pattern); the frame walks each user's partition sorted once. At
    // 100 TB the window state is bounded by events-per-user-per-6h, and
    // the streaming twin is StateOps' bounded-buffer shape.
    "e31_rate_limit" -> { (s, d) =>
      val WIN_US = 21600L * 1000000L // 6 hours
      val LIMIT = 4
      val burst = Window.partitionBy(col("user_id"))
        .orderBy(col("t")).rangeBetween(-WIN_US, 0)
      Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("t", unix_micros(col("ts")))
        .withColumn("c", count(lit(1)).over(burst))
        .groupBy(col("user_id"))
        .agg(max(col("c")).as("max_in_6h"),
          sum(when(col("c") >= LIMIT, 1L).otherwise(0L)).as("n_breach_events"),
          min(when(col("c") >= LIMIT, col("ts"))).as("first_breach_ts"))
        .orderBy(col("user_id"))
    },
    // Incremental view maintenance of a grouped aggregate under e27's CDC
    // changelog — the 100 TB move this proves: the nightly snapshot
    // aggregate is NOT recomputed from the snapshot; the engine aggregates
    // yesterday's BASE plus today's DELTA (insert/retract pairs derived
    // from consecutive key versions, Flink-changelog style) and the result
    // hash-matches the full recompute, which is exactly what the ORACLE
    // computes (it never sees the split). The textbook SUM/NULL hazard is
    // handled the textbook way: a maintained non-null count (n_vals)
    // distinguishes "sum retracted to 0" from "no non-null contributions"
    // — without it, a key updating from mu=5 to mu=NULL leaves base+delta
    // = 0 where the recompute says NULL. Values quantize to finite micros
    // (e24's guard) so retraction is exact BIGINT arithmetic — IEEE
    // doubles cannot retract (x − x ≠ 0 for NaN, and fold order leaks).
    // Groups whose live-key count nets to zero are dropped (the recompute
    // has no such row). One user_id exchange carries the version chain;
    // base and delta come out of the SAME windowed pass (the delta rows
    // via an array-of-struct explode, not a second scan); the merge join
    // is |types|-sized. The split point is engine-internal (temporal
    // midpoint from a 1-row broadcast) — ANY split must yield the same
    // answer, which is what the oracle hash certifies.
    "e32_ivm_agg" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .withColumn("op",
          when(col("event_type") === "purchase", lit("delete")).otherwise(lit("upsert")))
        .withColumn("mu",
          when(finite(col("value")), round(col("value") * 1e6).cast("bigint")))
      val bounds = ev.agg(
        min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"))
      val byKey = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
      val keyAll = Window.partitionBy(col("user_id"))
      // pre = prefix of each key's version chain (null ts sorts first and
      // counts as pre, so the prefix property holds on hostile rows too).
      val chained = ev.crossJoin(broadcast(bounds))
        .withColumn("pre",
          col("ts").isNull || unix_micros(col("ts")) <= expr("lo + (hi - lo) div 2"))
        .withColumn("rn", row_number().over(byKey))
        .withColumn("prev_op", lag(col("op"), 1).over(byKey))
        .withColumn("prev_type", lag(col("event_type"), 1).over(byKey))
        .withColumn("prev_mu", lag(col("mu"), 1).over(byKey))
        .withColumn("max_pre_rn", max(when(col("pre"), col("rn"))).over(keyAll))
        .localCheckpoint(true) // feeds base AND delta (d9's union lesson)
      val base = chained
        .filter(col("pre") && col("rn") === col("max_pre_rn") && col("op") === "upsert")
        .groupBy(col("event_type").as("g"))
        .agg(count(lit(1)).as("n_b"), count(col("mu")).as("v_b"), sum(col("mu")).as("s_b"))
      val delta = chained
        .filter(!col("pre"))
        .select(explode(array(
          when(col("op") === "upsert",
            struct(col("event_type").as("g"), col("mu"), lit(1L).as("sgn"))),
          when(col("prev_op") === "upsert",
            struct(col("prev_type").as("g"), col("prev_mu").as("mu"), lit(-1L).as("sgn")))))
          .as("dlt"))
        .filter(col("dlt").isNotNull)
        .select(col("dlt.g"), col("dlt.mu"), col("dlt.sgn"))
        .groupBy(col("g"))
        .agg(sum(col("sgn")).as("n_d"),
          sum(when(col("mu").isNotNull, col("sgn")).otherwise(0L)).as("v_d"),
          sum(col("sgn") * col("mu")).as("s_d"))
      // Null-safe merge key: a null event_type is ONE group on both
      // engines, but an equi-join would leave its base and delta rows
      // unmerged (null never equals null).
      base.join(delta.withColumnRenamed("g", "g_d"),
          col("g") <=> col("g_d"), "full_outer")
        .withColumn("g", coalesce(col("g"), col("g_d")))
        .withColumn("n_keys", (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).cast("bigint"))
        .withColumn("n_vals", (coalesce(col("v_b"), lit(0L)) + coalesce(col("v_d"), lit(0L))).cast("bigint"))
        .withColumn("sum_mu",
          when(col("n_vals") > 0,
            coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L))).cast("bigint"))
        .filter(col("n_keys") > 0)
        .select(col("g").as("last_type"), col("n_keys"), col("n_vals"), col("sum_mu"))
        .orderBy(col("last_type"))
    },
    // Peak concurrency — the capacity-planning sweep-line: each event opens
    // a 5-minute activity interval [ts, ts+5m); per type, the maximum
    // number of simultaneously-open intervals and the earliest instant it
    // is reached. The sweep is the classic ±1 delta stream: ends sort
    // BEFORE starts at the same instant (delta asc — closed-open intervals
    // don't overlap at the boundary), the prefix order is totalized by
    // event_id so the running sum is bit-deterministic cross-engine, and
    // the peak instant is the min t among peak rows. Null-ts events belong
    // to no interval (the window() contract); null types form their own
    // group with NULLS FIRST pinned. Scale shape: one union of two narrow
    // projections off one scan, one event_type exchange shared by the
    // running-sum window, the peak window and the final rollup — the
    // per-type sort is the only super-linear step, exactly e3's envelope.
    "e33_peak_concurrency" -> { (s, d) =>
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("event_type"), col("ts"), col("event_id"))
      val pts = ev.select(col("event_type"), col("ts").as("t"),
          lit(1L).as("delta"), col("event_id"))
        .unionAll(ev.select(col("event_type"),
          (col("ts") + expr("INTERVAL 5 MINUTES")).as("t"),
          lit(-1L).as("delta"), col("event_id")))
        .withColumn("day", date_trunc("day", col("t")))
      // TWO-PHASE prefix sum (measured r13-continued-4: the naive
      // per-type window sorted 2n rows in #event_types reducers —
      // 11.3×/decade at sf10, above the q10 shuffle envelope). Phase 1
      // sorts within (type, day) buckets — parallelism #types·#days, the
      // standard parallel-scan decomposition; phase 2 turns per-bucket
      // delta totals into per-bucket OFFSETS with one window over the
      // tiny bucket table and broadcasts them back (null-safe on the
      // nullable type key — a plain join would drop the null-type group).
      // run = local prefix + bucket offset is bit-identical to the global
      // prefix sum because day(t) is monotone in t and ties never span a
      // day. The peak rides a broadcast join of the #types-row max table,
      // not a full-row window — no single-reducer stage anywhere.
      val wLocal = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("t"), col("delta"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wOff = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
      val offsets = pts.groupBy(col("event_type"), col("day"))
        .agg(sum(col("delta")).as("dsum"))
        .withColumn("off", sum(col("dsum")).over(wOff))
        .select(col("event_type").as("o_type"), col("day").as("o_day"), col("off"))
      val runs = pts
        .withColumn("lrun", sum(col("delta")).over(wLocal))
        .join(broadcast(offsets),
          col("event_type") <=> col("o_type") && col("day") === col("o_day"))
        .withColumn("run", col("lrun") + coalesce(col("off"), lit(0L)))
      val peaks = runs.groupBy(col("event_type"))
        .agg(max(col("run")).as("peak"))
        .select(col("event_type").as("p_type"), col("peak"))
      runs.join(broadcast(peaks),
          col("event_type") <=> col("p_type") && col("run") === col("peak"))
        .groupBy(col("event_type"))
        .agg(max(col("run")).cast("bigint").as("peak_concurrency"),
          min(col("t")).as("peak_ts"))
        .orderBy(col("event_type"))
    }
  )

  // Shared by e22_spearman and its rank-twin e22_scale: both must produce
  // these rows bit-for-bit.
  /** Spearman overflow guard, shared by e22_spearman and e22_scale (r10):
    * Σd² and n(n²−1) are cubic in the per-type count and pass Long.MAX at
    * n ≈ 2.1M rows per type (caught live by the sf100 probe at n = 10M),
    * so the squares and cubics run in DECIMAL(38,0) — exact to n ≈ 1e12 —
    * and s_d2/rho emit as DOUBLE. At oracle SF every value is < 2^53, so
    * decimal→double (Spark, correctly rounded) and hugeint→varchar→double
    * (DuckDB) agree bit-for-bit with the old all-BIGINT forms. */
  private def spearmanD2: Column = {
    val dd = (col("rv") - col("rt")).cast("decimal(19,0)")
    dd * dd
  }

  private def spearmanCols: Seq[Column] = {
    val nd = col("n").cast("decimal(12,0)")
    val den = nd * (nd * nd - 1)
    // n = 1 ⇒ den = 0 ⇒ rho is undefined (a single observation has no
    // rank correlation): emit NULL instead of letting ANSI division by
    // zero kill the job (r13 adversarial audit — a 1-row event_type
    // group is perfectly reachable in production). Oracle mirrors with
    // CASE den = 0.
    Seq(col("event_type"), col("n"), col("sd").cast("double").as("s_d2"),
      when(den =!= 0,
        (den - lit(6) * col("sd")).cast("double") / den.cast("double")).as("rho"))
  }

  // NULLS FIRST pins (r13): Spark's ASC sort puts nulls first while
  // DuckDB's default puts them last — every nullable ASC sort key in the
  // e-family oracles is pinned to the engine's convention (a no-op on the
  // null-free driver corpora, decisive on the adversarial one). The
  // CASE den = 0 mirrors the engine's n = 1 ⇒ rho NULL guard.
  private val e22Sql =
    """WITH r AS (
      |  SELECT event_type,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY value NULLS FIRST, event_id NULLS FIRST) AS BIGINT) AS rv,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST) AS BIGINT) AS rt
      |  FROM events),
      |a AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(rv - rt AS HUGEINT) * (rv - rt)) AS sd
      |  FROM r GROUP BY 1),
      |b AS (
      |  SELECT event_type, n, sd,
      |    CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - 1) AS den
      |  FROM a)
      |SELECT event_type, n,
      |  CAST(CAST(sd AS VARCHAR) AS DOUBLE) AS s_d2,
      |  CASE WHEN den = 0 THEN NULL
      |       ELSE CAST(CAST(den - 6 * sd AS VARCHAR) AS DOUBLE)
      |            / CAST(CAST(den AS VARCHAR) AS DOUBLE) END AS rho
      |FROM b ORDER BY event_type NULLS FIRST""".stripMargin

  def oracle: Map[String, String] = Map(
    // `WHERE ts IS NOT NULL` mirrors Spark's window(): an event with no
    // event time belongs to no window (the TimeWindowing rule filters it).
    // The isfinite CASE mirrors Spark's NaN/±Inf→DECIMAL cast yielding
    // NULL (sum skips) — the decimal-exact aggregates treat non-finite as
    // missing.
    "e1_tumbling_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart, event_type,
        |  count(*) AS n,
        |  CAST(CAST(sum(CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2 NULLS FIRST""".stripMargin,
    "e2_sliding_window" ->
      """WITH buckets AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart
        |  FROM events WHERE ts IS NOT NULL
        |  UNION ALL
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR
        |  FROM events WHERE ts IS NOT NULL)
        |SELECT wstart, count(*) AS n FROM buckets GROUP BY 1 ORDER BY 1""".stripMargin,
    // A null-ts event sorts FIRST in its user's stream (Spark nulls-first)
    // and opens session 1 (its gap to any neighbor is unknowable); the
    // first timed event then opens session 2.
    "e3_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST)),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2""".stripMargin,
    "e4_asof_join" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  (SELECT max(CAST(s.ts AS TIMESTAMP)) FROM events s
        |   WHERE s.user_id = e.user_id AND s.event_type = 'signup'
        |     AND CAST(s.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)) AS signup_ts
        |FROM events e WHERE event_type = 'purchase' ORDER BY event_id NULLS FIRST""".stripMargin,
    "e5_range_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND CAST(b.ts AS TIMESTAMP) > CAST(a.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    // The CASE json_valid guard mirrors Spark's PERMISSIVE JSON path
    // (get_json_object → NULL on malformed input) where DuckDB's ->>
    // would raise; NULLS FIRST pins Spark's ASC null order.
    "e6_json_extract" ->
      """WITH x AS (
        |  SELECT event_type,
        |    CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k,
        |  max(k) AS max_k
        |FROM x GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "e7_dedup_first" ->
      """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""".stripMargin,
    "e8_first_last" ->
      """SELECT user_id,
        |  arg_min(value, CAST(ts AS TIMESTAMP)) AS first_value,
        |  arg_max(value, CAST(ts AS TIMESTAMP)) AS last_value,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "e9_lag_lead" ->
      """SELECT event_id, user_id,
        |  lag(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts,
        |  lead(CAST(ts AS TIMESTAMP)) OVER w AS next_ts,
        |  epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST)
        |ORDER BY event_id NULLS FIRST""".stripMargin,
    "e11_range_frame" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  count(*) OVER w AS n_1h,
        |  CAST(CAST(sum(CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,2)) END) OVER w AS VARCHAR) AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id NULLS FIRST""".stripMargin,
    "e12_rolling_distinct" ->
      """WITH hu AS (
        |  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, user_id FROM events),
        |x AS (
        |  SELECT h + r.o * INTERVAL 1 HOUR AS wend, user_id
        |  FROM hu CROSS JOIN range(0, 3) r(o))
        |SELECT wend, count(DISTINCT user_id) AS n_users
        |FROM x GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "e13_gap_stats" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) -
        |      lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |        (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST) AS gap_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_gaps,
        |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
        |  CAST(CAST(sum(gap_us) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_gap_us,
        |  quantile_cont(gap_us, 0.5) AS p50_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    // DuckDB's arg_min takes no struct ordering key (skill-noted limit), so
    // open/close come from row_number windows over the same total order.
    "e16_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS slot,
        |         CAST(ts AS TIMESTAMP) AS t, event_id, value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, slot
        |      ORDER BY t NULLS FIRST, event_id NULLS FIRST) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, slot
        |      ORDER BY t DESC NULLS LAST, event_id DESC NULLS LAST) AS rn_d
        |  FROM e)
        |SELECT event_type, slot,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  max(value) AS high, min(value) AS low, count(*) AS n,
        |  CAST(CAST(sum(CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS volume
        |FROM r GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "e15_value_outliers" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(CAST(sum(CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sum_x,
        |    CAST(CAST(sum(CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sum_xx
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT event_type, sum_x / n AS mean,
        |    sqrt((sum_xx - sum_x * sum_x / n) / (n - 1)) AS stddev
        |  FROM s)
        |SELECT e.event_id, e.event_type, e.value,
        |  (e.value - st.mean) / st.stddev AS z
        |FROM events e JOIN st USING (event_type)
        |WHERE abs(e.value - st.mean) > 3 * st.stddev
        |ORDER BY e.event_id NULLS FIRST""".stripMargin,
    "e14_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS view_ts
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS click_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.view_ts
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS purchase_ts
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.click_ts
        |  GROUP BY 1)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY v.user_id NULLS FIRST""".stripMargin,
    "e10_resample_ffill" ->
      """WITH agg AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS slot, event_type,
        |    count(*) AS n,
        |    CAST(CAST(sum(CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sum_value
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, r.range AS slot
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01', INTERVAL 1 HOUR) r)
        |SELECT g.event_type, g.slot, coalesce(a.n, 0) AS n, a.sum_value,
        |  last_value(a.sum_value IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.slot
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.slot = g.slot
        |ORDER BY g.event_type NULLS FIRST, g.slot""".stripMargin,
    // date_trunc('week', ts) returns DATE in DuckDB (TIMESTAMP in Spark) —
    // cast back so the schema gate agrees.
    "e17_retention" ->
      """WITH fs AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS active_week
        |  FROM events),
        |cs AS (SELECT cohort_week, count(*) AS cohort_n FROM fs GROUP BY 1)
        |SELECT fs.cohort_week, act.active_week,
        |  count(DISTINCT act.user_id) AS n_active, any_value(cs.cohort_n) AS cohort_n,
        |  CAST(count(DISTINCT act.user_id) AS DOUBLE) / CAST(any_value(cs.cohort_n) AS DOUBLE) AS retention
        |FROM act JOIN fs USING (user_id) JOIN cs USING (cohort_week)
        |GROUP BY 1, 2 ORDER BY 1, 2 NULLS FIRST""".stripMargin,
    "e18_interval_union" ->
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST)),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked),
        |ivl AS (
        |  SELECT user_id, min(ts) AS ivl_start, max(ts) AS ivl_end
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(epoch_us(ivl_end) - epoch_us(ivl_start)) AS BIGINT) AS busy_us,
        |  max(epoch_us(ivl_end)) - min(epoch_us(ivl_start)) AS span_us,
        |  CASE WHEN max(epoch_us(ivl_end)) - min(epoch_us(ivl_start)) > 0
        |       THEN CAST(CAST(sum(epoch_us(ivl_end) - epoch_us(ivl_start)) AS BIGINT) AS DOUBLE)
        |            / CAST(max(epoch_us(ivl_end)) - min(epoch_us(ivl_start)) AS DOUBLE)
        |       ELSE 0.0 END AS coverage
        |FROM ivl GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    // Non-finite values land in the NULL bucket (engine's missing-value
    // convention); lo/hi within that bucket still see the raw ±Inf/NaN.
    "e20_value_histogram" ->
      """SELECT event_type,
        |  CASE WHEN isfinite(value) THEN CAST(floor(value / 5.0) AS BIGINT) END AS bucket,
        |  count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM events GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "e19_twap" ->
      """WITH w AS (
        |  SELECT user_id, value,
        |    epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER win) - epoch_us(CAST(ts AS TIMESTAMP)) AS dt_us
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST))
        |SELECT user_id, count(*) AS n_obs,
        |  CAST(sum(dt_us) AS BIGINT) AS obs_us,
        |  CAST(CAST(sum(CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,2)) * dt_us END) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sum(dt_us) AS BIGINT) AS DOUBLE) AS twap
        |FROM w WHERE dt_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "e21_streaks" ->
      """WITH marked AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST)),
        |runs AS (
        |  SELECT user_id,
        |    CAST(sum(chg) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id,
        |    event_type
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, run_id, max(event_type) AS event_type, count(*) AS len
        |  FROM runs GROUP BY 1, 2),
        |ranked AS (
        |  SELECT user_id, event_type, len,
        |    count(*) OVER (PARTITION BY user_id) AS n_runs,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, event_type NULLS FIRST, run_id) AS rn
        |  FROM agg)
        |SELECT user_id, n_runs, len AS longest, event_type AS top_type
        |FROM ranked WHERE rn = 1 ORDER BY user_id NULLS FIRST""".stripMargin,
    "e22_spearman" -> e22Sql,
    // The scale twin computes identical ranks without a full-fact
    // per-type window, so its oracle IS e22's SQL: any divergence between
    // the two rank strategies is a wrong answer.
    "e22_scale" -> e22Sql,
    "e23_transitions" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) NULLS FIRST, event_id NULLS FIRST) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, event_type, count(*) AS n
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
        |  CAST(n AS DOUBLE) / CAST(CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS DOUBLE) AS p
        |FROM c ORDER BY prev_type, event_type NULLS FIRST""".stripMargin,
    "e27_cdc_apply" ->
      """WITH c AS (
        |  SELECT user_id, event_type, value,
        |    CASE WHEN event_type = 'purchase' THEN 'delete' ELSE 'upsert' END AS op,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC NULLS LAST, event_id DESC) AS rk,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT user_id, event_type AS last_type, value AS last_value, n_changes
        |FROM c WHERE rk = 1 AND op <> 'delete' ORDER BY user_id""".stripMargin,
    // CASE isfinite mirrors the engine's null-mu guard: non-finite values
    // are missing — excluded from both medians, never emitted.
    "e24_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value,
        |    CASE WHEN isfinite(value) THEN CAST(round(value * 1e6) AS BIGINT) END AS mu
        |  FROM events),
        |med AS (SELECT event_type, quantile_cont(mu, 0.5) AS med FROM e GROUP BY 1),
        |d AS (SELECT e.*, med, abs(mu - med) AS dev FROM e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT event_id, d.event_type, value,
        |  (mu - med) / (1.4826 * mad) AS z
        |FROM d JOIN mad USING (event_type)
        |WHERE abs((mu - med) / (1.4826 * mad)) > 3.5
        |ORDER BY event_id NULLS FIRST""".stripMargin,
    "e25_seasonality" ->
      """WITH c AS (
        |  SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS hod, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hod, n,
        |  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_type,
        |  CAST(n AS DOUBLE) / CAST(CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS DOUBLE) AS share,
        |  CAST(n AS DOUBLE) / CAST(CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS DOUBLE) * 24.0 AS lift
        |FROM c ORDER BY event_type NULLS FIRST, hod NULLS FIRST""".stripMargin,
    "e26_type_correlation" ->
      """WITH hc AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT h, event_type FROM (SELECT DISTINCT h FROM hc)
        |  CROSS JOIN (SELECT DISTINCT event_type FROM hc)),
        |f AS (
        |  SELECT g.h, g.event_type, CAST(coalesce(hc.c, 0) AS BIGINT) AS c
        |  FROM grid g LEFT JOIN hc ON g.h = hc.h AND g.event_type = hc.event_type),
        |j AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.c AS x, b.c AS y
        |  FROM f a JOIN f b ON a.h = b.h AND a.event_type < b.event_type),
        |m AS (
        |  SELECT type_a, type_b, count(*) AS n_hours,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM j GROUP BY 1, 2)
        |SELECT type_a, type_b, n_hours,
        |  CAST(n_hours * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n_hours * sxx - sx * sx AS DOUBLE))
        |     * sqrt(CAST(n_hours * syy - sy * sy AS DOUBLE))) AS corr
        |FROM m ORDER BY type_a, type_b""".stripMargin,
    // e28: e10's grid + finite-guarded hourly sum; interp mirrors the
    // Spark expression tree exactly — pv + ((nv−pv)·Δh)/Δspan in DOUBLE,
    // hour deltas as exact integers cast to DOUBLE, so the one division
    // is the only rounding step on both engines. DuckDB x/0 is NULL
    // natively; the Spark side guards the (unreachable) Δspan=0 case.
    "e28_interp_linear" ->
      """WITH agg AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS slot, event_type,
        |    CAST(CAST(sum(CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sum_value
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, r.range AS slot
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01', INTERVAL 1 HOUR) r),
        |j AS (
        |  SELECT g.event_type, g.slot, a.sum_value,
        |    last_value(a.sum_value IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN a.sum_value IS NOT NULL THEN g.slot END IGNORE NULLS) OVER wb AS ps,
        |    first_value(a.sum_value IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN a.sum_value IS NOT NULL THEN g.slot END IGNORE NULLS) OVER wf AS ns
        |  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.slot = g.slot
        |  WINDOW wb AS (PARTITION BY g.event_type ORDER BY g.slot
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY g.event_type ORDER BY g.slot
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, slot, sum_value,
        |  CASE WHEN sum_value IS NOT NULL THEN sum_value
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         pv + (nv - pv) * CAST(date_diff('hour', ps, slot) AS DOUBLE)
        |                        / CAST(date_diff('hour', ps, ns) AS DOUBLE)
        |  END AS interp
        |FROM j ORDER BY event_type NULLS FIRST, slot""".stripMargin,
    // e29: gaps-and-islands with NULL-SAFE change detection (IS DISTINCT
    // FROM ↔ Spark's <=>); run order and the pinned NULLS FIRST mirror the
    // engine's window sort exactly.
    "e29_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (
        |  SELECT *, row_number() OVER w AS rn, lag(event_type) OVER w AS prev_type
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC NULLS FIRST)),
        |v AS (
        |  SELECT *,
        |    sum(CASE WHEN rn = 1 OR event_type IS DISTINCT FROM prev_type
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC NULLS FIRST
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
        |  FROM s),
        |g AS (
        |  SELECT user_id, CAST(ver AS BIGINT) AS ver, min(event_type) AS attr,
        |    min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
        |  FROM v GROUP BY user_id, ver)
        |SELECT user_id, ver, attr, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY ver) AS valid_to,
        |  n_events,
        |  CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY ver)
        |            IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM g ORDER BY user_id, ver""".stripMargin,
    // e30: every window/overall sum is an exact BIGINT fold (order-free on
    // both engines); the doubles are fixed expressions over those exact
    // integers, so the argmax row is bit-deterministic. Quantizer domain
    // (finite, |v| < 1e9) mirrors the engine guard.
    "e30_cusum" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |    CASE WHEN isfinite(value) AND abs(value) < 1e9
        |         THEN CAST(round(value * 1e6) AS BIGINT) END AS mu
        |  FROM events WHERE ts IS NOT NULL),
        |h AS (
        |  SELECT event_type, hr, CAST(sum(mu) AS BIGINT) AS tot,
        |    CAST(count(mu) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2 HAVING count(mu) > 0),
        |c AS (
        |  SELECT event_type, hr,
        |    (CAST(CAST(sum(tot) OVER (PARTITION BY event_type ORDER BY hr
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
        |     - CAST(CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hr
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
        |       * (CAST(CAST(sum(tot) OVER (PARTITION BY event_type) AS BIGINT) AS DOUBLE)
        |          / CAST(CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS DOUBLE))
        |    ) / 1e6 AS cusum,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_hours
        |  FROM h),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(cusum) DESC, hr ASC) AS rk FROM c)
        |SELECT event_type, n_hours, hr AS cp_hr, cusum AS cp_cusum
        |FROM r WHERE rk = 1 ORDER BY event_type NULLS FIRST""".stripMargin,
    // Mirrors e31: the same epoch-micros RANGE frame (VALUE interval, so
    // timestamp peers are all in-frame on both engines), the same
    // null-key exclusion, the same breach threshold.
    "e31_rate_limit" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |w AS (
        |  SELECT user_id, ts, count(*) OVER (PARTITION BY user_id ORDER BY t
        |    RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW) AS c
        |  FROM e)
        |SELECT user_id, CAST(max(c) AS BIGINT) AS max_in_6h,
        |  CAST(sum(CASE WHEN c >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_events,
        |  min(CASE WHEN c >= 4 THEN ts END) AS first_breach_ts
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // The IVM contract: the oracle recomputes the snapshot aggregate from
    // scratch (e27's rk=1 live set) and never sees the engine's split —
    // hash equality certifies base ⊕ delta == recompute for the engine's
    // (arbitrary) split point.
    "e32_ivm_agg" ->
      """WITH c AS (
        |  SELECT user_id, event_type,
        |    CASE WHEN isfinite(value) THEN CAST(round(value * 1e6) AS BIGINT) END AS mu,
        |    CASE WHEN event_type = 'purchase' THEN 'delete' ELSE 'upsert' END AS op,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC NULLS LAST, event_id DESC) AS rk
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT event_type AS last_type,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(count(mu) AS BIGINT) AS n_vals,
        |  CAST(sum(mu) AS BIGINT) AS sum_mu
        |FROM c WHERE rk = 1 AND op <> 'delete'
        |GROUP BY 1 ORDER BY last_type""".stripMargin,
    // Sweep-line twin: ends before starts at equal t (delta asc), prefix
    // order totalized by event_id, null-safe type match for the peak join.
    "e33_peak_concurrency" ->
      """WITH pts AS (
        |  SELECT event_type, CAST(ts AS TIMESTAMP) AS t, 1 AS delta, event_id
        |  FROM events WHERE ts IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE, -1, event_id
        |  FROM events WHERE ts IS NOT NULL),
        |r AS (
        |  SELECT event_type, t,
        |    CAST(sum(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta, event_id NULLS FIRST ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM pts),
        |p AS (SELECT event_type, max(run) AS peak FROM r GROUP BY 1)
        |SELECT r.event_type, p.peak AS peak_concurrency, min(r.t) AS peak_ts
        |FROM r JOIN p ON r.event_type IS NOT DISTINCT FROM p.event_type
        |             AND r.run = p.peak
        |GROUP BY r.event_type, p.peak
        |ORDER BY r.event_type NULLS FIRST""".stripMargin
  )
}
