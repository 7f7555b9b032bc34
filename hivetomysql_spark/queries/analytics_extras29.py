"""Analytics extras, batch 29: relational ML training/eval and
corpus-tooling ops.

None exist in the reference (`HiveToMysql.java:1-641` copies rows,
computes nothing); SURVEY.md §2.2 extension-tier entries:

* multinomial naive Bayes language ID — train AND predict fully
  relationally (count model + broadcast log-likelihood join), the
  simplest end-to-end ML loop an engine can host.
* ABC/XYZ inventory matrix — Pareto revenue class × demand
  variability class, the ops-planning segmentation.
* discrete-time churn hazard — the hazard-table complement of the
  Kaplan-Meier survival query.
* BPE first-merge candidates — the pair-count step every tokenizer
  trainer runs over the corpus.
* RAKE keyword extraction — stopword-delimited phrase scoring via
  gaps-and-islands, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hivetomysql_spark.queries import register
from hivetomysql_spark.tables import load_table


@register(
    "ml_naive_bayes_langid",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    model AS (
      SELECT lang, tok, COUNT(*) AS n_lt FROM toks GROUP BY lang, tok
    ),
    lang_tot AS (
      SELECT lang, COUNT(*) AS n_l FROM toks GROUP BY lang
    ),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
    priors AS (
      SELECT lang, COUNT(*) AS n_docs,
             LN(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM documents)) AS lp
      FROM documents GROUP BY lang
    ),
    dtc AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ),
    scored AS (
      SELECT d.doc_id, p.lang AS cand,
             p.lp + SUM(d.c * (LN(COALESCE(m.n_lt, 0) + 1.0)
                               - LN(t.n_l + vocab.v))) AS score
      FROM dtc d
      CROSS JOIN priors p
      CROSS JOIN vocab
      JOIN lang_tot t ON t.lang = p.lang
      LEFT JOIN model m ON m.lang = p.lang AND m.tok = d.tok
      GROUP BY d.doc_id, p.lang, p.lp
    ),
    pred AS (
      SELECT doc_id, cand AS predicted
      FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cand) = 1
    )
    SELECT doc.lang AS actual, pr.predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred pr JOIN documents doc ON doc.doc_id = pr.doc_id
    GROUP BY doc.lang, pr.predicted
    ORDER BY actual, predicted
    """,
)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language ID, trained AND applied
    inside the engine: add-one-smoothed token likelihoods
    P(tok|lang) = (n_lt + 1) / (N_l + V) from grouped counts, doc
    score = log prior + Σ c·log P, argmax with a deterministic
    lang-ascending tie-break, reported as the actual×predicted
    confusion matrix. (The synthetic corpus shares one vocabulary
    across langs, so NB separates weakly — exactly what the
    confusion matrix is for.)

    Shape: the model is O(V·L) rows (here 31×5) — broadcast to the
    prediction join; per-doc work is token-count × L with one
    groupBy(doc, lang) shuffle; train + predict are a fixed THREE
    aggregations over one token explosion. At 100 TB the model stays
    tiny (vocab-bounded) and prediction remains a broadcast join —
    the classic "ML as a query" plan."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE into the compressed (doc, lang, tok, count) form
    # and materialize it: model, per-lang totals, vocab, and the
    # prediction join are all derivations of this one table — without
    # the checkpoint the corpus was re-exploded six times
    dtc = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
        )
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    model = dtc.groupBy("lang", "tok").agg(F.sum("c").alias("n_lt"))
    lang_tot = dtc.groupBy("lang").agg(F.sum("c").alias("n_l"))
    vocab = dtc.agg(F.countDistinct("tok").alias("v"))
    n_docs = docs.count()
    priors = docs.groupBy("lang").agg(
        F.log(F.count(F.lit(1)) / F.lit(float(n_docs))).alias("lp")
    )
    cand = (
        priors.join(lang_tot, "lang")
        .crossJoin(vocab)
        .select(F.col("lang").alias("cand"), "lp", "n_l", "v")
    )
    scored = (
        dtc.crossJoin(F.broadcast(cand))
        .join(
            F.broadcast(
                model.select(
                    F.col("lang").alias("cand"), "tok", "n_lt"
                )
            ),
            ["cand", "tok"],
            "left",
        )
        .groupBy("doc_id", "cand")
        .agg(
            (
                F.first("lp")
                + F.sum(
                    F.col("c")
                    * (
                        F.log(F.coalesce(F.col("n_lt"), F.lit(0)) + 1.0)
                        - F.log(F.col("n_l") + F.col("v"))
                    )
                )
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("doc_id", F.col("cand").alias("predicted"))
    )
    return (
        pred.join(docs.select("doc_id", F.col("lang").alias("actual")), "doc_id")
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("actual", "predicted")
    )


@register(
    "inventory_abc_xyz",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS p,
             SUM(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    abc AS (
      SELECT p, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, p
                                ROWS UNBOUNDED PRECEDING)
               / SUM(revenue) OVER () AS cum_share
      FROM rev
    ),
    abc_cls AS (
      SELECT p, revenue,
             CASE WHEN cum_share <= 0.5 THEN 'A'
                  WHEN cum_share <= 0.8 THEN 'B' ELSE 'C' END AS abc_class
      FROM abc
    ),
    monthly AS (
      SELECT l_partkey AS p, DATE_TRUNC('month', l_shipdate) AS m,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT p,
             CASE WHEN AVG(q) = 0 THEN 'Z'
                  WHEN COALESCE(STDDEV_SAMP(q), 0) / AVG(q) <= 0.3 THEN 'X'
                  WHEN COALESCE(STDDEV_SAMP(q), 0) / AVG(q) <= 0.6 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM monthly GROUP BY p
    )
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(revenue) / (SELECT SUM(revenue) FROM rev), 6)
             AS revenue_share
    FROM abc_cls JOIN xyz USING (p)
    GROUP BY abc_class, xyz_class
    ORDER BY abc_class, xyz_class
    """,
)
def inventory_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory segmentation matrix: ABC = Pareto class of
    cumulative revenue share (A ≤ 50 %, B ≤ 80 %, C rest, ordered
    revenue-desc with part-key tie-break), XYZ = demand-variability
    class from the coefficient of variation of monthly shipped
    quantity (X ≤ 0.3, Y ≤ 0.6, Z above) — the 3×3 grid that decides
    stocking policy per cell (forecast-driven for AX, make-to-order
    for CZ).

    Shape: two part-keyed aggregations (revenue, monthly demand) and
    one O(parts) cumulative window; the global cum-share window is
    over the already-reduced part table, orders of magnitude smaller
    than the fact scan — at 100 TB it becomes a range-partitioned
    prefix sum like `etl_surrogate_keys`."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    cum = rev.select(
        "p",
        "revenue",
        (
            F.sum("revenue").over(
                Window.orderBy(F.desc("revenue"), "p").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            / F.sum("revenue").over(
                Window.partitionBy()
            )
        ).alias("cum_share"),
    )
    abc = cum.select(
        "p",
        "revenue",
        F.when(F.col("cum_share") <= 0.5, "A")
        .when(F.col("cum_share") <= 0.8, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = li.groupBy(
        F.col("l_partkey").alias("p"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(F.sum("l_quantity").alias("q"))
    cv = F.coalesce(F.stddev_samp("q"), F.lit(0.0)) / F.avg("q")
    xyz = monthly.groupBy("p").agg(
        F.when(F.avg("q") == 0, "Z")
        .when(cv <= 0.3, "X")
        .when(cv <= 0.6, "Y")
        .otherwise("Z")
        .alias("xyz_class")
    )
    tot = rev.agg(F.sum("revenue").alias("t"))
    return (
        abc.join(xyz, "p")
        .crossJoin(F.broadcast(tot))
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("revenue") / F.first("t"), 6).alias("revenue_share"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@register(
    "event_churn_hazard",
    oracle="""
    WITH life AS (
      SELECT user_id,
             CAST(FLOOR(date_diff('day', MIN(ts), MAX(ts)) / 7.0) AS BIGINT)
               AS w
      FROM events GROUP BY user_id
    ),
    risk AS (
      SELECT w AS week, COUNT(*) AS n_churned FROM life GROUP BY w
    )
    SELECT week,
           CAST(SUM(n_churned) OVER (ORDER BY week DESC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_at_risk,
           CAST(n_churned AS BIGINT) AS n_churned,
           ROUND(n_churned * 1.0 /
                 SUM(n_churned) OVER (ORDER BY week DESC
                                      ROWS UNBOUNDED PRECEDING), 6) AS hazard
    FROM risk
    ORDER BY week
    """,
)
def event_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard table: each user's observed
    lifetime in whole weeks (first event → last event); hazard(w) =
    users whose lifetime ended in week w / users surviving at least
    to week w (a reverse-cumulative sum over the week histogram) —
    the hazard-function complement of `stats_kaplan_meier`, and the
    input to any discrete-time survival regression.

    Shape: one user-keyed aggregate reduces the fact table to
    O(users), one week histogram reduces that to O(weeks), then an
    O(weeks) reverse running sum — at 100 TB only the first
    aggregation touches data-sized input."""
    ev = load_table(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.floor(
            F.datediff(F.max("ts"), F.min("ts")) / 7.0
        ).cast("long").alias("w")
    )
    risk = life.groupBy(F.col("w").alias("week")).agg(
        F.count(F.lit(1)).alias("n_churned")
    )
    at_risk = F.sum("n_churned").over(
        Window.orderBy(F.desc("week")).rowsBetween(Window.unboundedPreceding, 0)
    )
    return risk.select(
        "week",
        at_risk.cast("long").alias("n_at_risk"),
        F.col("n_churned").cast("long").alias("n_churned"),
        F.round(F.col("n_churned") / at_risk, 6).alias("hazard"),
    ).orderBy("week")


@register(
    "tokenizer_bpe_merges",
    oracle="""
    WITH tf AS (
      SELECT tok, COUNT(*) AS freq
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
            FROM documents)
      GROUP BY tok
    ),
    pairs AS (
      SELECT substr(tok, i, 2) AS pair, SUM(freq) AS n
      FROM tf, UNNEST(generate_series(1, len(tok) - 1)) AS t(i)
      WHERE len(tok) >= 2
      GROUP BY substr(tok, i, 2)
    )
    SELECT pair, CAST(n AS BIGINT) AS n
    FROM pairs
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration over the corpus: corpus-weighted
    adjacent-character-pair counts (each word's pairs weighted by its
    corpus frequency), top-20 — the candidate table from which a BPE
    tokenizer trainer picks its next merge rule. One iteration is the
    distributed-engine-shaped piece; the merge LOOP is driver-side
    control flow over this query, exactly how industrial tokenizer
    training over a 100 TB corpus is structured (count in the engine,
    merge table on the driver).

    Shape: token explosion → word-frequency table (vocab-sized, tiny)
    → per-word character pairs → one groupBy(pair). After the first
    reduce everything is vocab-bounded, so the pair stage costs
    ~nothing regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.length("tok") >= 2)
    )
    pairs = tf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    out = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("n"))
    return out.orderBy(F.desc("n"), "pair").limit(20)


_RAKE_STOP = ("the", "a", "and", "of", "to", "in")


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, i, w[i] AS tok,
             w[i] IN {_RAKE_STOP} AS is_stop
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS w
            FROM documents),
           UNNEST(generate_series(1, len(w))) AS t(i)
    ),
    isl AS (
      SELECT doc_id, i, tok, is_stop,
             SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM toks
    ),
    phrases AS (
      SELECT doc_id, island,
             array_to_string(list(tok ORDER BY i), ' ') AS phrase,
             COUNT(*) AS plen
      FROM isl WHERE NOT is_stop
      GROUP BY doc_id, island
      HAVING COUNT(*) <= 4
    ),
    word_stats AS (
      SELECT tok,
             COUNT(*) AS freq,
             SUM(plen) AS degree
      FROM (SELECT p.doc_id, p.island, p.plen, i.tok
            FROM phrases p
            JOIN isl i ON i.doc_id = p.doc_id AND i.island = p.island
            WHERE NOT i.is_stop)
      GROUP BY tok
    ),
    phrase_scores AS (
      SELECT p.phrase,
             COUNT(DISTINCT p.doc_id || '#' || p.island) AS n_occur,
             ROUND(SUM(ws.degree * 1.0 / ws.freq)
                   / COUNT(DISTINCT p.doc_id || '#' || p.island), 6)
               AS rake_score
      FROM phrases p
      JOIN isl i ON i.doc_id = p.doc_id AND i.island = p.island
                 AND NOT i.is_stop
      JOIN word_stats ws ON ws.tok = i.tok
      GROUP BY p.phrase
    )
    SELECT phrase, CAST(n_occur AS BIGINT) AS n_occur, rake_score
    FROM phrase_scores
    ORDER BY rake_score DESC, phrase
    LIMIT 15
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010), UDF-free:
    candidate phrases are maximal stopword-free token runs (≤ 4
    tokens) found by gaps-and-islands (running count of stopwords =
    island id); each word scores degree/frequency where degree sums
    the lengths of phrases containing it; a phrase scores the sum of
    its word scores (averaged over its occurrences). Top-15 phrases.

    Shape: token explosion with positions (in-row, no shuffle),
    per-doc island window, groupBy(doc, island) to materialize
    phrases, then two vocab-bounded joins — word_stats is O(vocab)
    and broadcastable; nothing after the first reduce scales with
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
            "i", "tok"
        ),
    ).select(
        "doc_id",
        (F.col("i") + 1).alias("i"),
        "tok",
        F.col("tok").isin(*_RAKE_STOP).alias("is_stop"),
    )
    wisl = Window.partitionBy("doc_id").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    isl = toks.withColumn(
        "island", F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(wisl)
    )
    content = isl.where(~F.col("is_stop"))
    phrases = (
        content.groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .where(F.col("plen") <= 4)
    )
    members = phrases.join(
        content.select("doc_id", "island", "tok"), ["doc_id", "island"]
    )
    word_stats = members.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree")
    )
    phrase_scores = (
        members.join(F.broadcast(word_stats), "tok")
        .groupBy("phrase")
        .agg(
            F.countDistinct("doc_id", "island").alias("n_occur"),
            F.round(
                F.sum(F.col("degree") / F.col("freq"))
                / F.countDistinct("doc_id", "island"),
                6,
            ).alias("rake_score"),
        )
    )
    return (
        phrase_scores.select(
            "phrase", F.col("n_occur").cast("long"), "rake_score"
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(15)
    )
