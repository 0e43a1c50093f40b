"""Pairwise precision/recall/F1 with sum-of-squares pair counting.

Re-implements the reference's evaluation semantics
(/root/reference/code/common.py:73-89 and the SQL twin
/root/reference/code/blocking/code/pipeline/8_evaluate_components_v2.sh:37-52):

    T  = Σ_g |gold group g|²          (true-pair mass, self-pairs included)
    P  = Σ_l |label group l|²         (predicted-pair mass)
    TP = Σ_{g,l} |gold g ∩ label l|²  (agreeing mass)
    precision = TP/P, recall = TP/T, F1 = harmonic mean

Counting squares instead of C(n,2) pairs matches the reference exactly
(the constant diagonal shifts both numerator and denominator the same way).
One DataFrame job: two groupBy aggregations and one join — no per-group
Python, no driver-side pair materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_pr(
    assignments: DataFrame,
    id_col: str = "id",
    gold_col: str = "gold",
    label_col: str = "label",
    min_gold_size: int = 1,
    max_gold_size: int | None = None,
    max_label_size: int | None = None,
) -> DataFrame:
    """Single-row DataFrame: (t_mass, p_mass, tp_mass, precision_ppm,
    recall_ppm, f1_ppm). Size filters mirror the reference's evaluation
    grid slices (8a_evaluate_all.sh:14-31)."""
    base = assignments.select(id_col, gold_col, label_col)

    gold_sizes = base.groupBy(gold_col).agg(F.count("*").alias("gsz"))
    if max_gold_size is not None:
        gold_sizes = gold_sizes.where(F.col("gsz") <= max_gold_size)
    gold_sizes = gold_sizes.where(F.col("gsz") >= min_gold_size)

    label_sizes = base.groupBy(label_col).agg(F.count("*").alias("lsz"))
    if max_label_size is not None:
        label_sizes = label_sizes.where(F.col("lsz") <= max_label_size)

    kept = base.join(gold_sizes, gold_col).join(label_sizes, label_col)

    t = kept.select(gold_col).groupBy(gold_col).count().agg(
        F.coalesce(F.sum(F.col("count") * F.col("count")), F.lit(0)).alias("t_mass")
    )
    p = kept.select(label_col).groupBy(label_col).count().agg(
        F.coalesce(F.sum(F.col("count") * F.col("count")), F.lit(0)).alias("p_mass")
    )
    tp = (
        kept.groupBy(gold_col, label_col)
        .count()
        .agg(F.coalesce(F.sum(F.col("count") * F.col("count")), F.lit(0)).alias("tp_mass"))
    )

    def ppm(num, den):
        a = (num * 1000000).cast("long")
        return F.when(den > 0, (a - F.pmod(a, den)) / den).otherwise(F.lit(0)).cast("long")

    joined = t.crossJoin(p).crossJoin(tp)
    return joined.select(
        F.col("t_mass").cast("long"),
        F.col("p_mass").cast("long"),
        F.col("tp_mass").cast("long"),
        ppm(F.col("tp_mass"), F.col("p_mass")).alias("precision_ppm"),
        ppm(F.col("tp_mass"), F.col("t_mass")).alias("recall_ppm"),
        ppm(2 * F.col("tp_mass"), F.col("p_mass") + F.col("t_mass")).alias("f1_ppm"),
    )


def pairwise_pr_grid(
    assignments: DataFrame,
    grid: list[tuple[int, int | None, int | None]],
    id_col: str = "id",
    gold_col: str = "gold",
    label_col: str = "label",
) -> DataFrame:
    """The reference's evaluation grid (8a_evaluate_all.sh:14-31 — nested
    bash loops re-running the SQL evaluator per slice) in ONE pass.

    ``grid``: (min_gold_size, max_gold_size|None, max_label_size|None)
    slices. Group sizes are computed once; every slice's T/P/TP masses are
    conditional aggregations over the same size-annotated row set — one
    shuffle chain for the whole grid instead of |grid| jobs. Output: one
    row per slice with the same columns as ``pairwise_pr``.
    """
    base = assignments.select(id_col, gold_col, label_col)
    gold_sizes = base.groupBy(gold_col).agg(F.count("*").alias("gsz"))
    label_sizes = base.groupBy(label_col).agg(F.count("*").alias("lsz"))
    sized = base.join(gold_sizes, gold_col).join(label_sizes, label_col)
    cells = sized.groupBy(gold_col, label_col).agg(
        F.count("*").alias("n"),
        F.first("gsz").alias("gsz"),
        F.first("lsz").alias("lsz"),
    )

    def in_slice(mn: int, mxg: int | None, mxl: int | None):
        cond = F.col("gsz") >= mn
        if mxg is not None:
            cond = cond & (F.col("gsz") <= mxg)
        if mxl is not None:
            cond = cond & (F.col("lsz") <= mxl)
        return cond

    # per-slice masses from the (gold, label) contingency cells: the rows
    # kept by a slice regroup into per-gold (sum n)² and per-label (sum n)²
    # masses — compute those with two slice-conditional aggregations
    out_rows = []
    for mn, mxg, mxl in grid:
        cond = in_slice(mn, mxg, mxl)
        kept = cells.where(cond)
        t = kept.groupBy(gold_col).agg(F.sum("n").alias("s")).agg(
            F.coalesce(F.sum(F.col("s") * F.col("s")), F.lit(0)).alias("t_mass")
        )
        p = kept.groupBy(label_col).agg(F.sum("n").alias("s")).agg(
            F.coalesce(F.sum(F.col("s") * F.col("s")), F.lit(0)).alias("p_mass")
        )
        tp = kept.agg(
            F.coalesce(F.sum(F.col("n") * F.col("n")), F.lit(0)).alias("tp_mass")
        )
        row = (
            t.crossJoin(p)
            .crossJoin(tp)
            .select(
                F.lit(mn).cast("long").alias("min_gold_size"),
                F.lit(mxg).cast("long").alias("max_gold_size"),
                F.lit(mxl).cast("long").alias("max_label_size"),
                F.col("t_mass").cast("long"),
                F.col("p_mass").cast("long"),
                F.col("tp_mass").cast("long"),
            )
        )
        out_rows.append(row)
    stacked = out_rows[0]
    for r in out_rows[1:]:
        stacked = stacked.unionByName(r)

    def ppm(num, den):
        a = (num * 1000000).cast("long")
        return F.when(den > 0, (a - F.pmod(a, den)) / den).otherwise(F.lit(0)).cast("long")

    return stacked.select(
        "*",
        ppm(F.col("tp_mass"), F.col("p_mass")).alias("precision_ppm"),
        ppm(F.col("tp_mass"), F.col("t_mass")).alias("recall_ppm"),
        ppm(2 * F.col("tp_mass"), F.col("p_mass") + F.col("t_mass")).alias("f1_ppm"),
    )


def gold_pair_samples(
    df: DataFrame,
    id_col: str = "id",
    gold_col: str = "gold",
    max_equivs_per_gold_label: int = 1000,
    max_equivs: int = 10000,
    max_diffs_per_gold_pair: int = 10,
    max_diffs: int = 10000,
) -> DataFrame:
    """Bounded equal/different gold pair sampling — the reference's
    ``get_samples`` (/root/reference/code/common.py:376-403), its
    threshold-tuning input. Output: (m1, m2, is_equivalent).

    Reference semantics preserved exactly:
    - mention order = ascending ``id_col`` (the reference's array index),
      label order = order of first appearance (min member id);
    - equivalents: per gold label, ``itertools.combinations`` of members
      in order, first ``max_equivs_per_gold_label`` kept; labels processed
      while the running total is still < ``max_equivs`` (the reference
      checks AFTER adding a label's batch, so the final batch may overshoot
      — mirrored here via the exclusive-prefix mass window);
    - differents: label pairs in ``combinations(labels, 2)`` order, the
      row-major member product capped at ``max_diffs_per_gold_pair`` each,
      processed while the running total is < ``max_diffs``.

    Scale design: the global caps admit at most ``max_equivs`` /
    ``max_diffs`` label (pairs), so the label-pair space is never
    enumerated — eligible (rank1, rank2) windows are derived in closed form
    from the count lower bound (every processed pair contributes ≥ 1
    sample), then exact mass prefix sums decide inclusion. Member lists
    are truncated to the per-group cap + 1 before collection (the sample
    prefix can never reach further), so no unbounded collect_list. The
    label-ranking windows run AFTER a distributed TakeOrdered prune to the
    first max_equivs / max_diffs + 1 labels by first appearance — the only
    single-partition sorts in the operator are over cap-bounded sets,
    never the full label table.
    """
    import pandas as pd
    from pyspark.sql import Window

    m = df.select(F.col(id_col).alias("m"), F.col(gold_col).alias("g"))
    w_m = Window.partitionBy("g").orderBy("m")
    members = m.withColumn("mrank", F.row_number().over(w_m))

    lab = m.groupBy("g").agg(
        F.min("m").alias("first_m"), F.count("*").alias("n")
    ).localCheckpoint(eager=False)

    # ---- equivalents: labels kept while the exclusive prefix mass < cap.
    # Only non-singleton labels carry mass, each ≥ 1, so at most
    # ``max_equivs`` of them (in first-appearance order) can be eligible:
    # prune via a distributed TakeOrdered (orderBy + limit) BEFORE the
    # ranking window — the single-partition window then sorts a
    # cap-bounded set, never the full web-scale label table.
    eq_mass = F.least(
        (F.col("n") * (F.col("n") - 1) / 2).cast("long"),
        F.lit(max_equivs_per_gold_label).cast("long"),
    )
    nonsing = (
        lab.where(F.col("n") >= 2).orderBy("first_m").limit(max_equivs + 1)
    )
    w_eq = Window.orderBy("first_m")
    lab_eq = (
        nonsing.withColumn("mass", eq_mass)
        .withColumn(
            "prior",
            F.coalesce(
                F.sum("mass").over(w_eq.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .where(F.col("prior") < max_equivs)
        .select("g", "mass")
    )
    eq_members = members.join(lab_eq.select("g"), "g", "left_semi").where(
        F.col("mrank") <= max_equivs_per_gold_label + 1
    )

    cap_pl = max_equivs_per_gold_label

    def gen_combos(pdf: pd.DataFrame) -> pd.DataFrame:
        ms = sorted(pdf["m"].tolist())
        out = []
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.append((ms[i], ms[j]))
                if len(out) >= cap_pl:
                    break
            if len(out) >= cap_pl:
                break
        return pd.DataFrame(out, columns=["m1", "m2"]) if out else pd.DataFrame(
            {"m1": pd.Series(dtype="int64"), "m2": pd.Series(dtype="int64")}
        )

    equivs = eq_members.groupBy("g").applyInPandas(gen_combos, "m1 long, m2 long")

    # ---- differents: eligible (r1, r2) windows from the count lower bound.
    # Every processed label pair contributes ≥ 1 sample, so no label with
    # rank > max_diffs + 1 can appear as either side: rank AFTER the same
    # TakeOrdered prune (bounded single-partition window, as above).
    # n_labels (the full count, used by the combinations-order prefix
    # formula) stays a distributed aggregate over the unpruned table.
    n_labels = lab.count()
    lab_top = (
        lab.orderBy("first_m")
        .limit(max_diffs + 1)
        .withColumn("lrank", F.row_number().over(Window.orderBy("first_m")))
    )
    r1 = F.col("lrank")
    # label pairs strictly before (r1, r1+1) in combinations order
    base_prior = ((r1 - 1) * n_labels - r1 * (r1 - 1) / 2).cast("long")
    cand = (
        lab_top.select(
            F.col("g").alias("g1"),
            F.col("lrank").alias("r1"),
            F.col("n").alias("n1"),
            base_prior.alias("base_prior"),
        )
        .where(F.col("base_prior") < max_diffs)
        .withColumn(
            "r2",
            F.explode(
                F.sequence(
                    F.col("r1") + 1,
                    F.least(
                        F.lit(n_labels).cast("long"),
                        F.col("r1") + (max_diffs - F.col("base_prior")),
                    ),
                )
            ),
        )
    )
    pairs_lab = cand.join(
        lab_top.select(
            F.col("g").alias("g2"), F.col("lrank").alias("r2"), F.col("n").alias("n2")
        ),
        "r2",
    )
    diff_mass = F.least(
        (F.col("n1") * F.col("n2")).cast("long"),
        F.lit(max_diffs_per_gold_pair).cast("long"),
    )
    w_pair = Window.orderBy("r1", "r2")
    kept_pairs = (
        pairs_lab.withColumn("mass", diff_mass)
        .withColumn(
            "prior",
            F.coalesce(
                F.sum("mass").over(w_pair.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .where(F.col("prior") < max_diffs)
        .select("g1", "g2", "n1", "n2", "mass")
    )
    # first cap+1 members of each label are enough for any product prefix
    mem_arr = (
        members.where(F.col("mrank") <= max_diffs_per_gold_pair + 1)
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("m")).alias("ms"))
    )
    with_members = kept_pairs.join(
        mem_arr.select(F.col("g").alias("g1"), F.col("ms").alias("ms1")), "g1"
    ).join(mem_arr.select(F.col("g").alias("g2"), F.col("ms").alias("ms2")), "g2")
    # row-major product prefix: sample k → (k // n2, k % n2), pure Catalyst
    k = F.explode(F.sequence(F.lit(0).cast("long"), F.col("mass") - 1))
    diffs = (
        with_members.select("ms1", "ms2", F.col("n2"), k.alias("k"))
        .select(
            F.element_at("ms1", (F.col("k") / F.col("n2")).cast("int") + 1).alias("m1"),
            F.element_at("ms2", (F.col("k") % F.col("n2")).cast("int") + 1).alias("m2"),
        )
    )

    return equivs.withColumn("is_equivalent", F.lit(True)).unionByName(
        diffs.withColumn("is_equivalent", F.lit(False))
    )
