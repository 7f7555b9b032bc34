"""Privacy, governance and entity-resolution suite.

Folded from the round-build batch modules (analytics_extras*): every
query whose name matches this domain moved here verbatim together
with its batch-local helpers, so related operators read side by side.
Section banners record the source batch; helpers shared across
domains were duplicated module-private; colliding private names carry
a _b<batch> suffix.
"""

from __future__ import annotations



# ========================================================================
# from analytics_extras6.py — original batch rationale:
# Analytics extras, batch 6: survival analysis, multiple-testing
# correction, Holt-Winters smoothing, differential-privacy counts, KMV
# set sketches, watermark-dedup batch twin, bloom-prefiltered join,
# distributed connected components, the feature-hashing trick, and a
# Poisson rate test.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's statistics / privacy / sketch /
# graph tiers:
#
# * Kaplan-Meier — right-censored survival over order→last-ship
#   durations (status 'F' = event, else censored);
# * Benjamini-Hochberg — step-up FDR adjustment over per-group Welch
#   z p-values (logistic CDF approximation, identical in both engines);
# * Holt-Winters — level+trend double exponential smoothing, a genuine
#   sequential recurrence run as one per-key array fold;
# * DP noisy counts — Laplace mechanism with an md5-derived inverse-CDF
#   sample, so the noise is deterministic and oracle-checkable;
# * KMV sketch — k-minimum-values NDV + Jaccard/intersection estimates
#   with exact counterparts side by side;
# * watermark dedup — batch twin of Structured Streaming's
#   dropDuplicatesWithinWatermark (first event wins per key);
# * bloom prefilter — two-phase dim-key pruning (hashed bucket-set
#   broadcast, then exact broadcast semi join);
# * connected components — iterative min-label propagation on the
#   co-purchase graph, oracled by a recursive-CTE closure;
# * hashing trick — fixed-width token bucketing (the streaming-safe
#   vocabulary-free vectorizer);
# * Poisson rate test — conditional two-sample count comparison.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "privacy_dp_noise_count",
    oracle="""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, n,
             ((('0x' || substr(md5(event_type), 1, 8))::BIGINT % 999983)
              + 0.5) / 999983.0 - 0.5 AS uni
      FROM g
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS true_count,
           ROUND(-1.0 * sign(uni) * ln(1.0 - 2.0 * abs(uni)), 4) AS noise,
           ROUND(n - 1.0 * sign(uni) * ln(1.0 - 2.0 * abs(uni)), 4)
             AS noisy_count
    FROM u
    """,
)
def privacy_dp_noise_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private counts via the Laplace mechanism
    (epsilon=1, sensitivity=1): noise = -b·sign(u)·ln(1-2|u|) is the
    inverse-CDF transform of a uniform u in (-1/2, 1/2). The uniform
    is derived from md5(key) so the release is deterministic and the
    oracle can verify the mechanism end-to-end — a production release
    would swap the hash for a calibrated RNG, everything else
    unchanged.

    Shape: one grouped count plus O(groups) scalar math — the
    mechanism adds zero distributed cost, which is exactly why
    DP-noised aggregate release scales to 100 TB for free."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    h = F.conv(F.substring(F.md5(F.col("event_type")), 1, 8), 16, 10).cast("long")
    uni = ((h % 999983) + 0.5) / 999983.0 - 0.5
    noise = -1.0 * F.signum(uni) * F.log(1.0 - 2.0 * F.abs(uni))
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("true_count"),
        F.round(noise, 4).alias("noise"),
        F.round(F.col("n") + noise, 4).alias("noisy_count"),
    )


# ========================================================================
# from analytics_extras9.py — original batch rationale:
# Analytics extras, batch 9: classical seasonal decomposition, DP
# histograms with contribution bounding, full-batch logistic
# regression, and haversine hub assignment.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's time-series / privacy / ML / geo
# tiers:
#
# * classical decomposition — centered-MA trend, day-of-week seasonal
#   indexes, remainder spread (the pre-STL workhorse);
# * DP histogram — per-user contribution capping (bounded sensitivity)
#   before Laplace noise, the step naive DP counts miss;
# * logistic regression — three full-batch gradient-descent rounds on
#   sufficient statistics, every round oracled via unrolled CTEs;
# * haversine hubs — great-circle nearest-hub assignment over
#   deterministic pseudo-coordinates.
# ========================================================================
import math
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_DP_CAP = 3



@register(
    "privacy_dp_histogram",
    oracle=f"""
    WITH capped AS (
      SELECT event_type FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn <= {_DP_CAP}
    ),
    g AS (
      SELECT e.event_type,
             (SELECT COUNT(*) FROM capped c
              WHERE c.event_type = e.event_type) AS capped_n,
             COUNT(*) AS true_n
      FROM events e GROUP BY e.event_type
    ),
    u AS (
      SELECT event_type, capped_n, true_n,
             ((('0x' || substr(md5('hist:' || event_type), 1, 8))::BIGINT
               % 999983) + 0.5) / 999983.0 - 0.5 AS uni
      FROM g
    )
    SELECT event_type,
           CAST(true_n AS BIGINT) AS true_count,
           CAST(capped_n AS BIGINT) AS capped_count,
           ROUND(capped_n - {_DP_CAP}.0 * sign(uni) * ln(1.0 - 2.0 * abs(uni)),
                 4) AS dp_count
    FROM u
    """,
)
def privacy_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram done right: each user's
    contribution per cell is CAPPED at 3 events first (bounding the
    L1 sensitivity a single user can have), THEN Laplace(b =
    cap/epsilon) noise is added — the contribution-bounding step that
    separates a correct user-level-DP release from naive count+noise
    (cf. Wilson et al., "Differentially Private SQL"). Noise is
    md5-derived (deterministic) so the full mechanism is
    oracle-checkable; swap the hash for a calibrated RNG to deploy.

    Shape: the cap is one per-(user,cell) ranked window (fine-grained
    keys, well-spread shuffle); the noisy release is O(cells) scalar
    math on top."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    capped = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _DP_CAP)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("capped_n"))
    )
    true_n = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_n"))
    g = true_n.join(F.broadcast(capped), "event_type")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hist:"), F.col("event_type"))), 1, 8),
        16,
        10,
    ).cast("long")
    uni = ((h % 999983) + 0.5) / 999983.0 - 0.5
    noise = -float(_DP_CAP) * F.signum(uni) * F.log(1.0 - 2.0 * F.abs(uni))
    return g.select(
        "event_type",
        F.col("true_n").cast("long").alias("true_count"),
        F.col("capped_n").cast("long").alias("capped_count"),
        F.round(F.col("capped_n") + noise, 4).alias("dp_count"),
    )


# ========================================================================
# from analytics_extras11.py — original batch rationale:
# Analytics extras, batch 11: star-schema flattening, join-key skew
# profiling, entity-resolution cluster rollup, and forecast
# backtesting.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's relational / data-quality /
# entity-resolution / time-series tiers:
#
# * star flatten — the one-pass all-broadcast-dims denormalization
#   every BI extract runs;
# * join-key skew — the partition-balance profiler you consult BEFORE
#   a 100 TB join, quantifying hot keys;
# * ER cluster rollup — fuzzy-match pairs closed into entities by
#   iterative min-label propagation (recursive-CTE closure oracle);
# * seasonal-naive backtest — forecast y(d) with y(d-7) and score it,
#   the baseline every fancier model must beat.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "er_cluster_rollup",
    oracle="""
    WITH RECURSIVE names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[-1] AS block
      FROM part
    ),
    pairs AS (
      SELECT a.p_name AS na, b.p_name AS nb
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 4
    ),
    und AS (SELECT na, nb FROM pairs UNION SELECT nb, na FROM pairs),
    nodes AS (SELECT DISTINCT na AS n FROM und),
    reach(n, m) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.n, u.nb FROM reach r JOIN und u ON u.na = r.m
    ),
    lab AS (SELECT n, MIN(m) AS canonical FROM reach GROUP BY n),
    clusters AS (
      SELECT canonical, COUNT(*) AS cluster_size FROM lab GROUP BY canonical
    )
    SELECT canonical,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM clusters WHERE cluster_size >= 2
    """,
)
def er_cluster_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution, closed: the er_blocked_fuzzy candidate
    pairs (blocked Levenshtein <= 4 on part names) are merged into
    entities by iterative min-label propagation — A~B and B~C land in
    one entity even when A and C never matched directly, which the
    pairwise view cannot express. Output: canonical name (the
    lexicographic minimum, a deterministic survivor rule) and entity
    size, for multi-member entities.

    Shape: same Pregel-style rounds as graph_connected_components
    (join + min-aggregate per round, localCheckpoint lineage cuts),
    on the O(matches) pair graph rather than the corpus. The oracle
    closes the identical pair set with a recursive CTE."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("block")
    ).distinct()
    a = names.alias("a")
    b = names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 4)
        .select(F.col("a.p_name").alias("na"), F.col("b.p_name").alias("nb"))
    )
    und = pairs.union(
        pairs.select(F.col("nb").alias("na"), F.col("na").alias("nb"))
    ).localCheckpoint()
    labels = und.select(F.col("na").alias("n")).distinct().select(
        "n", F.col("n").alias("canonical")
    )
    prev = None
    for _ in range(12):
        prop = und.join(labels, und["na"] == labels["n"]).select(
            F.col("nb").alias("n"), "canonical"
        )
        diffused = labels.union(prop).groupBy("n").agg(
            F.min("canonical").alias("canonical")
        )
        # pointer jumping (see graph_connected_components): O(log
        # diameter) rounds
        tgt = diffused.select(
            F.col("n").alias("pn"), F.col("canonical").alias("pcan")
        )
        labels = (
            diffused.join(tgt, diffused["canonical"] == tgt["pn"])
            .select("n", F.col("pcan").alias("canonical"))
        ).localCheckpoint()
        cur = labels.agg(F.count_distinct("canonical")).collect()[0][0]
        if cur == prev:
            break
        prev = cur
    return (
        labels.groupBy("canonical")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .where(F.col("cluster_size") >= 2)
        .select("canonical", F.col("cluster_size").cast("long").alias("cluster_size"))
    )


# ========================================================================
# from analytics_extras14.py — original batch rationale:
# Analytics extras, batch 14: growth accounting, inventory reorder
# points, and rare-category redaction.
#
# Not in the reference (`HiveToMysql.java:1-641` copies rows, computes
# nothing); extends SURVEY.md §2.2's product-analytics / operations /
# privacy tiers:
#
# * user lifecycle — monthly growth accounting (new / retained /
#   resurrected / churned), the canonical active-user bridge;
# * reorder point — mu*L + z*sigma*sqrt(L) safety-stock math per part
#   from daily demand statistics;
# * rare-category redaction — small categories collapse into OTHER
#   before release (the k-threshold suppression rule that complements
#   privacy_k_anonymity).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_REDACT_K = 60



@register(
    "privacy_redact_rare_categories",
    oracle=f"""
    WITH counts AS (
      SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand
    ),
    labeled AS (
      SELECT CASE WHEN n >= {_REDACT_K} THEN p_brand ELSE 'OTHER' END
               AS label,
             n
      FROM counts
    )
    SELECT label,
           CAST(SUM(n) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_source_categories
    FROM labeled GROUP BY label
    """,
)
def privacy_redact_rare_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-threshold category suppression: brands with fewer than 60
    members collapse into OTHER before the frequency table is
    released — small categories are re-identification handles (a
    brand with 3 parts pinpoints them), and suppressing them is the
    release rule that pairs with privacy_k_anonymity's row-level
    gate. The output keeps the bookkeeping (how many source
    categories each released label absorbs) so utility loss is
    visible.

    Shape: one count aggregate, one relabel, one re-aggregate — all
    O(categories) after the first grouped scan."""
    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    labeled = counts.select(
        F.when(F.col("n") >= _REDACT_K, F.col("p_brand"))
        .otherwise("OTHER")
        .alias("label"),
        "n",
    )
    return labeled.groupBy("label").agg(
        F.sum("n").cast("long").alias("n_parts"),
        F.count(F.lit(1)).cast("long").alias("n_source_categories"),
    )


# ========================================================================
# from analytics_extras31.py — original batch rationale:
# Analytics extras, batch 31: relational model training, robust
# regression, incremental ingestion, and DP order statistics.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * decision stump — the depth-1 CART split search as one scan
#   (candidate × side aggregate), "train a tree node as a query".
# * Theil-Sen slope — median-of-pairwise-slopes robust trend.
# * incremental corpus dedup — the production ingestion path: new
#   batch vs existing corpus only (never corpus × corpus).
# * DP median via the exponential mechanism — md5-determinized so the
#   mechanism itself is oracle-checked.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_DPQ_BINS = 32


_DPQ_EPS = 1.0



@register(
    "privacy_dp_quantile",
    oracle=f"""
    WITH ext AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
             COUNT(*) AS n
      FROM orders
    ),
    bins AS (
      SELECT i, lo + (hi - lo) * (i + 0.5) / {_DPQ_BINS} AS center, n
      FROM ext, UNNEST(generate_series(0, {_DPQ_BINS} - 1)) AS g(i)
    ),
    util AS (
      SELECT b.i, b.center, b.n,
             -ABS((SELECT COUNT(*) FROM orders o
                   WHERE o.o_totalprice <= b.center) - b.n / 2.0) AS u
      FROM bins b
    ),
    wts AS (
      SELECT i, center,
             EXP({_DPQ_EPS} * (u - MAX(u) OVER ()) / 2.0) AS w
      FROM util
    ),
    cum AS (
      SELECT i, center, w,
             SUM(w) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER () AS tw
      FROM wts
    ),
    pick AS (
      SELECT MIN(i) AS pick_i FROM cum
      WHERE cw >= tw * ((('0x' || substr(md5('dpq'), 1, 8))::BIGINT
                         % 999983) + 0.5) / 999983.0
    )
    SELECT CAST({_DPQ_BINS} AS BIGINT) AS n_bins,
           CAST(pick.pick_i AS BIGINT) AS picked_bin,
           ROUND((SELECT center FROM cum WHERE i = pick.pick_i), 4)
             AS dp_median,
           ROUND((SELECT quantile_cont(o_totalprice, 0.5) FROM orders), 4)
             AS true_median
    FROM pick
    """,
)
def privacy_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private median via the exponential mechanism
    (McSherry-Talwar): candidate outputs are 32 equi-width bin
    centers, utility = −|rank(c) − n/2| (sensitivity 1), selection
    probability ∝ exp(ε·u/2) with ε=1, sampled by inverting the
    cumulative weight at an md5-derived uniform — deterministic, so
    the oracle verifies the MECHANISM end-to-end (a production
    release swaps the hash for a calibrated RNG, nothing else).

    Shape: one extremes pass, one rank-per-candidate aggregate
    (candidate list is O(bins), broadcastable), O(bins) weight math —
    the data-sized work is two scans regardless of corpus size."""
    o = load_table(spark, sf_dir, "orders")
    ext = o.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bins = ext.select(
        F.explode(F.sequence(F.lit(0), F.lit(_DPQ_BINS - 1))).alias("i"),
        "lo",
        "hi",
        "n",
    ).select(
        "i",
        (
            F.col("lo")
            + (F.col("hi") - F.col("lo")) * (F.col("i") + 0.5) / _DPQ_BINS
        ).alias("center"),
        "n",
    )
    ranked = (
        o.crossJoin(F.broadcast(bins))
        .groupBy("i", "center", "n")
        .agg(
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("center"), 1).otherwise(0)
            ).alias("rank_c")
        )
        .select(
            "i",
            "center",
            (-F.abs(F.col("rank_c") - F.col("n") / 2.0)).alias("u"),
        )
    )
    from pyspark.sql.window import Window

    wts = ranked.withColumn(
        "w",
        F.exp(
            _DPQ_EPS
            * (F.col("u") - F.max("u").over(Window.partitionBy()))
            / 2.0
        ),
    )
    cum = wts.select(
        "i",
        "center",
        F.sum("w")
        .over(Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(Window.partitionBy()).alias("tw"),
    )
    h = F.conv(F.substring(F.md5(F.lit("dpq")), 1, 8), 16, 10).cast("long")
    uni = ((h % 999983) + 0.5) / 999983.0
    pick = (
        cum.where(F.col("cw") >= F.col("tw") * uni)
        .agg(F.min("i").alias("pick_i"))
    )
    true_med = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("tm")
    )
    return (
        pick.join(
            cum.select(F.col("i").alias("pick_i"), "center"), "pick_i"
        )
        .crossJoin(F.broadcast(true_med))
        .select(
            F.lit(_DPQ_BINS).cast("long").alias("n_bins"),
            F.col("pick_i").cast("long").alias("picked_bin"),
            F.round("center", 4).alias("dp_median"),
            F.round("tm", 4).alias("true_median"),
        )
    )


# ========================================================================
# from analytics_extras34.py — original batch rationale:
# Analytics extras, batch 34: graph partition quality, queueing
# audit, generation diversity, and local differential privacy.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * modularity — partition quality of a labeling over the co-purchase
#   graph, the community-detection objective as a closed-form query.
# * Little's law audit — L = λ·W consistency check over the order
#   flow, the queueing-theory sanity test for ops metrics.
# * distinct n-gram diversity — the distinct-1/2/3 metrics used to
#   audit generated-text (or corpus) diversity.
# * randomized response — local-DP frequency estimation with
#   md5-determinized coin flips, debiased back to true rates.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_RR_P = 0.75  # probability of answering truthfully



@register(
    "privacy_randomized_response",
    oracle=f"""
    WITH flips AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             ((('0x' || substr(md5('rr1:' || o_orderkey), 1, 8))::BIGINT
               % 999983) + 0.5) / 999983.0 AS u1,
             ((('0x' || substr(md5('rr2:' || o_orderkey), 1, 8))::BIGINT
               % 999983) + 0.5) / 999983.0 AS u2
      FROM orders
    ),
    reported AS (
      SELECT y,
             CASE WHEN u1 < {_RR_P} THEN y
                  WHEN u2 < 0.5 THEN 1 ELSE 0 END AS r
      FROM flips
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(y * 1.0), 6) AS true_rate,
           ROUND(AVG(r * 1.0), 6) AS reported_rate,
           ROUND((AVG(r * 1.0) - (1 - {_RR_P}) * 0.5) / {_RR_P}, 6)
             AS debiased_rate
    FROM reported
    """,
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner-style randomized response, the local-DP primitive: each
    row reports its true bit with probability p=0.75, else a fair
    coin; the aggregate debiases by (rate − (1−p)/2)/p. The coins are
    md5-derived so the WHOLE mechanism — flips, reported rate, and
    debiasing — is oracle-verified deterministically (production
    swaps in client-side RNG, nothing else changes). This is the
    aggregation path RAPPOR-style telemetry uses when the collector
    must never see a true bit.

    Shape: pure scan-stage arithmetic plus one scalar aggregate —
    zero-shuffle at any scale."""
    o = load_table(spark, sf_dir, "orders")

    def uni(prefix: str):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return ((h % 999983) + 0.5) / 999983.0

    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    r = F.when(uni("rr1:") < _RR_P, y).otherwise(
        F.when(uni("rr2:") < 0.5, 1).otherwise(0)
    )
    reported = o.select(y.alias("y"), r.alias("r"))
    return reported.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(F.col("y") * 1.0), 6).alias("true_rate"),
        F.round(F.avg(F.col("r") * 1.0), 6).alias("reported_rate"),
        F.round(
            (F.avg(F.col("r") * 1.0) - (1 - _RR_P) * 0.5) / _RR_P, 6
        ).alias("debiased_rate"),
    )


# ========================================================================
# from analytics_extras47.py — original batch rationale:
# Analytics extras, batch 47: image perceptual hashing, state-space
# filtering, variance-homogeneity testing, and l-diversity auditing.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * perceptual hash — block-mean 64-bit image signatures over real PPM
#   pixels, the image-dedup analogue of `dedup_simhash` (signatures
#   feed the same banded Hamming self-join at scale).
# * Kalman local-level filter — the simplest state-space model over
#   the daily order series, the principled successor to the EMA/Holt
#   smoothers already in the registry.
# * Brown-Forsythe (robust Levene) — variance-homogeneity test, the
#   gate statistic before pooled-variance tests like `stats_anova_f`.
# * l-diversity — per-quasi-identifier-group distinct-sensitive-value
#   audit, the release gate that `privacy_k_anonymity` alone misses
#   (a k-anonymous group with one sensitive value still leaks).
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hivetomysql_spark.operators import multimodal as M
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "privacy_l_diversity",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           c.c_mktsegment AS segment,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o.o_orderpriority) AS l_distinct,
           COUNT(DISTINCT o.o_orderpriority) >= 3 AS meets_l3
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: for each quasi-identifier group (nation x
    market segment) count DISTINCT values of the sensitive attribute
    (order priority). A group can be k-anonymous yet carry a single
    sensitive value — homogeneity attack — which
    `privacy_k_anonymity` cannot see; this is the companion release
    gate (Machanavajjhala et al.'s distinct-l in its simplest form).

    Scale: one join on the customer key (broadcast the dimension if
    it fits, shuffle otherwise) + one groupBy with two
    count-distincts over low-cardinality groups — Spark plans
    count-distinct via expand, still one shuffle on the group key."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("l_distinct"),
        )
        .withColumn("meets_l3", F.col("l_distinct") >= 3)
    )


# ========================================================================
# from analytics_extras49.py — original batch rationale:
# Analytics extras, batch 49: kNN classification, random-walk
# sampling, DP top-k release, and image entropy.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * kNN classifier — label prediction from top-5 cosine neighbors with
#   deterministic majority vote: the classifier a retrieval stack gets
#   for free once similarity search exists.
# * random-walk visit sampling — md5-determinized walkers over the
#   co-purchase graph (the node2vec/DeepWalk corpus-generation step,
#   expressed as unrolled neighbor-table joins).
# * DP top-k — one-shot Gumbel-noise top-k, equivalent to peeling the
#   exponential mechanism (Durfee & Rogers 2019), md5-determinized so
#   the oracle verifies the mechanism itself.
# * image entropy — 16-bin luma histogram entropy over real decoded
#   PPM pixels, integer bins end-to-end, fully pixel-oracled.
# ========================================================================
import math
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_DPK_K = 5


_DPK_EPS = 1.0



@register(
    "privacy_dp_topk",
    oracle=f"""
    WITH counts AS (
      SELECT p_brand AS brand, COUNT(*) AS n FROM part GROUP BY 1
    ),
    noisy AS (
      -- one-shot Gumbel top-k == peeling exponential mechanism
      -- (Durfee & Rogers 2019); u from the pinned md5 family
      SELECT brand, n,
             ({_DPK_EPS} / 2.0) * n
             - LN(-LN(
                 (('0x' || substr(md5('dpk:' || brand), 1, 8))::BIGINT + 0.5)
                 / 4294967296.0
               )) AS score
      FROM counts
    ),
    ranked AS (
      SELECT brand, n, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, brand) AS rnk
      FROM noisy
    )
    SELECT CAST(rnk AS INT) AS rank, brand,
           CAST(n AS BIGINT) AS true_count,
           ROUND(score, 6) AS noisy_score
    FROM ranked WHERE rnk <= {_DPK_K}
    """,
)
def privacy_dp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private top-k categories: add Gumbel(2/eps)
    noise to each category's count and take the k highest noisy
    scores — provably equivalent to k rounds of the exponential
    mechanism (so one scan + one O(categories) rank replaces k
    peeling passes). The Gumbel draw is the double-log inverse-CDF
    of an md5-derived uniform, so the oracle verifies the mechanism
    itself; true counts appear in the output only for the utility
    audit (a release would drop them). Completes the DP family:
    count, histogram, quantile, and now selection.

    Shape: one map-side-combined groupBy to O(categories), O(cats)
    noise + rank. Nothing else touches data."""
    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dpk:"), F.col("brand"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    score = (_DPK_EPS / 2.0) * F.col("n") - F.log(-F.log(u))
    ranked = counts.select(
        "brand", "n", score.alias("score")
    ).select(
        "brand",
        "n",
        "score",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "brand"))
        .alias("rnk"),
    )
    return ranked.where(F.col("rnk") <= _DPK_K).select(
        F.col("rnk").cast("int").alias("rank"),
        "brand",
        F.col("n").cast("long").alias("true_count"),
        F.round("score", 6).alias("noisy_score"),
    )


# ========================================================================
# from analytics_extras51.py — original batch rationale:
# Analytics extras, batch 51: a verified quantile sketch, DP means,
# seasonal-aware anomaly flags, and embedding-coverage auditing.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * DDSketch-style quantiles — log-bucketed (gamma=1.02) quantile
#   sketch with its relative-error guarantee measured against the
#   exact percentiles; the VERIFIED member of the quantile-sketch
#   family next to the rows-only t-digest tier.
# * DP clipped mean — the textbook clip-then-Laplace release with the
#   clipping-bias bookkeeping, md5-pinned noise.
# * STL-style anomaly flags — trend (centered MA) + DOW seasonal +
#   remainder, alerting on remainder > 3 robust sigma: anomalies that
#   respect seasonality instead of re-alerting every Monday.
# * embedding coverage — the documents<->embeddings referential audit
#   (missing vectors, orphan vectors, zero-norm/NaN health) every
#   feature store runs before training reads it.
# ========================================================================
import math
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_DPM_CLIP = 100.0


_DPM_EPS = 1.0



@register(
    "privacy_dp_mean_clipped",
    oracle=f"""
    WITH base AS (
      SELECT event_type, value,
             LEAST(GREATEST(value, 0.0), {_DPM_CLIP}) AS clipped
      FROM events
    ),
    agg AS (
      SELECT event_type,
             COUNT(*) AS n,
             AVG(value) AS true_mean,
             SUM(clipped) AS s_clip,
             SUM(CASE WHEN value > {_DPM_CLIP} OR value < 0.0
                      THEN 1 ELSE 0 END) AS n_clipped
      FROM base GROUP BY event_type
    ),
    noised AS (
      SELECT event_type, n, true_mean, n_clipped,
             s_clip + (CASE WHEN u1 < 0.5 THEN 1.0 ELSE -1.0 END)
                      * ({_DPM_CLIP} / ({_DPM_EPS} / 2.0))
                      * LN(1.0 - 2.0 * ABS(u1 - 0.5)) AS noisy_sum,
             n + (CASE WHEN u2 < 0.5 THEN 1.0 ELSE -1.0 END)
                 * (1.0 / ({_DPM_EPS} / 2.0))
                 * LN(1.0 - 2.0 * ABS(u2 - 0.5)) AS noisy_n
      FROM (
        SELECT *,
          (('0x' || substr(md5('dpm1:' || event_type), 1, 8))::BIGINT + 0.5)
            / 4294967296.0 AS u1,
          (('0x' || substr(md5('dpm2:' || event_type), 1, 8))::BIGINT + 0.5)
            / 4294967296.0 AS u2
        FROM agg
      )
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CAST(n_clipped AS BIGINT) AS n_clipped,
           ROUND(true_mean, 4) AS true_mean,
           ROUND(noisy_sum / noisy_n, 4) AS dp_mean,
           ROUND(ABS(noisy_sum / noisy_n - true_mean), 4) AS abs_error
    FROM noised
    """,
)
def privacy_dp_mean_clipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private mean, the textbook recipe: clip each
    contribution to [0, C] (bounding sensitivity), add Laplace(C/
    (eps/2)) to the clipped sum and Laplace(1/(eps/2)) to the count
    (half the budget each), release noisy_sum / noisy_count. The
    clipped-row count is the utility bookkeeping (clipping bias is
    the price of bounded sensitivity). Laplace draws are the
    sign-log inverse CDF of md5-derived uniforms — the mechanism
    itself is oracle-verified, as with the DP count/histogram/
    quantile/top-k siblings. Swap a seeded RNG for release.

    Shape: one conditional-aggregate scan to O(groups); noise is
    O(groups) scalar math."""
    ev = load_table(spark, sf_dir, "events")
    clipped = F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(_DPM_CLIP))
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("true_mean"),
        F.sum(clipped).alias("s_clip"),
        F.sum(
            ((F.col("value") > _DPM_CLIP) | (F.col("value") < 0.0)).cast(
                "long"
            )
        ).alias("n_clipped"),
    )

    def unif(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(tag), F.col("event_type"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            + 0.5
        ) / 4294967296.0

    def lap(u, b: float):
        return (
            F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
            * F.lit(b)
            * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
        )

    noisy_sum = F.col("s_clip") + lap(unif("dpm1:"), _DPM_CLIP / (_DPM_EPS / 2.0))
    noisy_n = F.col("n") + lap(unif("dpm2:"), 1.0 / (_DPM_EPS / 2.0))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("n_clipped").cast("long").alias("n_clipped"),
        F.round("true_mean", 4).alias("true_mean"),
        F.round(noisy_sum / noisy_n, 4).alias("dp_mean"),
        F.round(F.abs(noisy_sum / noisy_n - F.col("true_mean")), 4).alias(
            "abs_error"
        ),
    )


# ========================================================================
# from analytics_extras57.py — original batch rationale:
# Analytics extras, batch 57: lag-feature construction, synthetic
# independence gap, spectral periodicity, and mergeable variance.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * lag matrix — the supervised feature table for forecasting
#   (t-1/t-7 lags, 7-day rolling mean, DOW) built leakage-free from
#   strictly-past windows.
# * synthetic independence gap — TVD between the real joint
#   distribution and the product of its marginals: exactly what a
#   marginals-only synthetic data release would lose.
# * periodogram — explicit cos/sin power at candidate periods over
#   the daily series; finds the weekly cycle spectrally.
# * two-level variance merge — Chan's parallel moments merge computed
#   EXPLICITLY from per-shard (n, mean, M2) and proven equal to the
#   direct variance: the algebra that makes every var/std in this
#   registry safe under any partitioning.
# ========================================================================
import math
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "privacy_synthetic_independence_gap",
    oracle="""
    WITH joint AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) AS p
      FROM orders GROUP BY 1, 2
    ),
    ma AS (
      SELECT o_orderpriority AS a,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) AS pa
      FROM orders GROUP BY 1
    ),
    mb AS (
      SELECT o_orderstatus AS b,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM orders) AS pb
      FROM orders GROUP BY 1
    ),
    cells AS (
      SELECT ma.a, mb.b,
             COALESCE(j.p, 0.0) AS p_joint,
             ma.pa * mb.pb AS p_indep
      FROM ma CROSS JOIN mb
      LEFT JOIN joint j ON j.a = ma.a AND j.b = mb.b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM(ABS(p_joint - p_indep)) / 2.0, 6) AS tvd,
           ROUND(MAX(ABS(p_joint - p_indep)), 6) AS max_cell_gap
    FROM cells
    """,
)
def privacy_synthetic_independence_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a marginals-only synthetic release loses: total-variation
    distance between the REAL joint distribution of (priority,
    status) and the product of its one-way marginals — the exact
    utility cost of the simplest synthetic-data generator (sample
    each column independently). TVD bounds the error of ANY analysis
    run on the synthetic table, so this single number prices the
    release; near-zero means marginal synthesis is safe for this
    pair, large means a correlation-aware mechanism is needed.

    Shape: three O(cells/cats) reduces off one fact scan, a tiny
    cross join of the category domains, one rollup."""
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    joint = o.groupBy(
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
    ).agg((F.count(F.lit(1)) * 1.0 / n).alias("p"))
    ma = o.groupBy(F.col("o_orderpriority").alias("a")).agg(
        (F.count(F.lit(1)) * 1.0 / n).alias("pa")
    )
    mb = o.groupBy(F.col("o_orderstatus").alias("b")).agg(
        (F.count(F.lit(1)) * 1.0 / n).alias("pb")
    )
    cells = (
        ma.crossJoin(mb)
        .join(joint, ["a", "b"], "left")
        .select(
            F.coalesce(F.col("p"), F.lit(0.0)).alias("p_joint"),
            (F.col("pa") * F.col("pb")).alias("p_indep"),
        )
    )
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum(F.abs(F.col("p_joint") - F.col("p_indep"))) / 2.0, 6
        ).alias("tvd"),
        F.round(F.max(F.abs(F.col("p_joint") - F.col("p_indep"))), 6).alias(
            "max_cell_gap"
        ),
    )


# ========================================================================
# from analytics_extras61.py — original batch rationale:
# Analytics extras, batch 61: parametric survival, re-identification
# risk, and rare-combination screening.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * Weibull fit — parametric survival of order fulfillment via the
#   log-log linearization of the empirical survivor function (the
#   parametric sibling of `stats_kaplan_meier`; shape k tells
#   wear-out from infant-mortality).
# * re-identification risk — sample uniqueness under growing
#   quasi-identifier sets: the % of records unique on the QI combo,
#   the standard re-id risk proxy (k-anonymity's dual: k-anon bounds
#   the worst group, uniqueness measures the typical exposure).
# * rare-combination screen — category pairs whose joint support is
#   far below what their marginals predict: data-entry and fraud
#   signal that pure frequency screens miss.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table



@register(
    "privacy_reidentification_risk",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_nationkey,
             c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer
    ),
    q1 AS (
      SELECT 'nation' AS qi_set, COUNT(*) AS n,
             SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS uniq
      FROM (SELECT COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt FROM base)
    ),
    q2 AS (
      SELECT 'nation+segment' AS qi_set, COUNT(*) AS n,
             SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS uniq
      FROM (SELECT COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment)
              AS cnt FROM base)
    ),
    q3 AS (
      SELECT 'nation+segment+balband' AS qi_set, COUNT(*) AS n,
             SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS uniq
      FROM (SELECT COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
                                  bal_band) AS cnt FROM base)
    )
    SELECT qi_set, CAST(n AS BIGINT) AS n_records,
           CAST(uniq AS BIGINT) AS n_unique,
           ROUND(uniq * 1.0 / n, 6) AS uniqueness_rate
    FROM (SELECT * FROM q1 UNION ALL SELECT * FROM q2
          UNION ALL SELECT * FROM q3)
    """,
)
def privacy_reidentification_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-uniqueness re-identification risk under growing
    quasi-identifier sets: the share of customers UNIQUE on
    (nation), (nation, segment), (nation, segment, balance band) —
    the Sweeney-style risk curve showing how fast 'harmless'
    attributes compose into fingerprints. k-anonymity
    (`privacy_k_anonymity`) gates the worst group; uniqueness rate
    measures typical exposure, and its growth across QI sets is the
    number that decides which columns a release may keep.

    Shape: three grouped reduces (one per QI set) — each a partial-
    aggregated shuffle to the QI's group frame, then an O(groups)
    rollup. The previous form counted group sizes with an unordered
    window per QI, which funnels N/k rows through one task when the
    QI is bounded (nationkey alone: 25 groups — r11 window audit);
    counting per group and summing sizes is the same number with
    map-side combine all the way down."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )

    def uniq(name: str, *cols):
        groups = base.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
        return groups.agg(
            F.lit(name).alias("qi_set"),
            F.sum("cnt").cast("long").alias("n_records"),
            F.sum((F.col("cnt") == 1).cast("long")).cast("long").alias(
                "n_unique"
            ),
            F.round(
                F.sum((F.col("cnt") == 1).cast("long"))
                * 1.0
                / F.sum("cnt"),
                6,
            ).alias("uniqueness_rate"),
        )

    return (
        uniq("nation", "c_nationkey")
        .unionByName(uniq("nation+segment", "c_nationkey", "c_mktsegment"))
        .unionByName(
            uniq(
                "nation+segment+balband",
                "c_nationkey",
                "c_mktsegment",
                "bal_band",
            )
        )
    )


# ========================================================================
# from analytics_extras72.py — original batch rationale:
# Analytics extras, batch 72: parameter-sensitivity sweeps for the
# sessionizer and the entity-resolution matcher.
#
# None exist in the reference (`HiveToMysql.java:1-641` copies rows,
# computes nothing); SURVEY.md §2.2 extension-tier entries:
#
# * session gap sweep — session counts/lengths at 15/30/60-minute
#   inactivity gaps: the table that PICKS the sessionizer's gap
#   parameter (same policy-pricing pattern as
#   `text_dedup_threshold_sweep` for dedup).
# * ER threshold calibration — candidate-pair volume and match-rate
#   versus edit-distance threshold over the blocked pairs: the cost/
#   recall curve that picks `er_blocked_fuzzy`'s cutoff.
# ========================================================================
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


_ER_THRESHOLDS = [1, 2, 3, 4, 5]



@register(
    "er_threshold_calibration",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[-1] AS block
      FROM part
    ),
    pairs AS (
      SELECT levenshtein(a.p_name, b.p_name) AS dist
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
    ),
    tot AS (
      SELECT COUNT(*) AS n_pairs,
             (SELECT COUNT(*) FROM names) AS n_names
      FROM pairs
    )
    SELECT t.t AS threshold,
           CAST(tot.n_names AS BIGINT) AS n_entities,
           CAST(tot.n_pairs AS BIGINT) AS n_blocked_pairs,
           CAST((SELECT COUNT(*) FROM pairs WHERE dist <= t.t) AS BIGINT)
             AS n_matches,
           ROUND((SELECT COUNT(*) FROM pairs WHERE dist <= t.t)
                 * 1.0 / tot.n_pairs, 6) AS match_rate
    FROM UNNEST([{", ".join(str(t) for t in _ER_THRESHOLDS)}]) AS t(t)
    CROSS JOIN tot
    """,
)
def er_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution threshold calibration: within-block
    candidate pairs matched at edit-distance cutoffs 1-5 — the
    cost/recall curve that picks `er_blocked_fuzzy`'s threshold
    before anyone commits to a merge policy (each +1 of distance
    multiplies the downstream clerical-review queue; the knee of
    this curve is the budget decision). Distances computed ONCE over
    the blocked pairs; the sweep is conditional aggregation.

    Shape: one blocked self-join (the `er_blocked_fuzzy` plan), one
    distance evaluation per pair, O(thresholds) conditional sums."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("block")
    ).distinct().localCheckpoint(eager=False)
    b = names.select(
        F.col("p_name").alias("pb"), F.col("block").alias("blockb")
    )
    pairs = (
        names.join(
            b,
            (F.col("block") == F.col("blockb"))
            & (F.col("p_name") < F.col("pb")),
        )
        .select(F.levenshtein("p_name", "pb").alias("dist"))
    )
    n_names = names.agg(F.count(F.lit(1)).alias("nn"))
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        *[
            F.sum((F.col("dist") <= t).cast("long")).alias(f"m{t}")
            for t in _ER_THRESHOLDS
        ],
    ).crossJoin(F.broadcast(n_names))
    out = None
    for t in _ER_THRESHOLDS:
        row = agg.select(
            F.lit(t).alias("threshold"),
            F.col("nn").cast("long").alias("n_entities"),
            F.col("n_pairs").cast("long").alias("n_blocked_pairs"),
            F.col(f"m{t}").cast("long").alias("n_matches"),
            F.round(F.col(f"m{t}") * 1.0 / F.col("n_pairs"), 6).alias(
                "match_rate"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ========================================================================
# round-6 addition: PII scan/redact (pre-release corpus gate)
# ========================================================================

_PII_EMAIL = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"555-[0-9]{4}"
_PII_IPV4 = r"10\.[0-9]{1,3}\.0\.1"


@register(
    "privacy_pii_scan",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id, source,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || doc_id || '@corp-example.com now'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                     ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN ' from 10.' || (doc_id % 256) || '.0.1'
                     ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id, source,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT)
             AS n_ips,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(
                  text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                  '{_PII_PHONE}', '<PHONE>', 'g'),
                  '{_PII_IPV4}', '<IP>', 'g')) AS BIGINT) AS redacted_len
    FROM seeded
    """,
)
def privacy_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction accounting — the pre-release gate a
    training corpus runs before any distribution step: per-document
    counts of email / phone / IPv4 matches and the post-redaction
    length (every match replaced by a typed placeholder). The fixture
    corpus is PII-free by construction, so deterministic synthetic PII
    is seeded in-query (doc_id-derived, identical in both engines) —
    the oracle therefore value-checks the REGEX ENGINE agreement on
    real matches, not a vacuous all-zero scan.

    100 TB shape: pure map-side expression work on the scan — no
    shuffle, no UDF; `regexp_count`/`regexp_replace` run inside
    whole-stage codegen, and the scan prunes to (doc_id, source,
    text). Production swaps the seeding for the raw text and adds
    jurisdiction-specific patterns; the plan is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@corp-example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".0.1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_PHONE),
            F.lit("<PHONE>"),
        ),
        F.lit(_PII_IPV4),
        F.lit("<IP>"),
    )
    return seeded.select(
        "doc_id",
        "source",
        F.regexp_count("text", F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count("text", F.lit(_PII_IPV4)).cast("long").alias("n_ips"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )
