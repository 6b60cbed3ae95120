"""Adversarial / property tests for the round-6 operators — invariants
the oracle hash can't express, in the repo's fixture style (crafted
parquet corpora in tmp_path where the generated testdata can't produce
the edge case)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- perceptron


def test_perceptron_matches_sequential_reference(spark, tmp_path):
    """The distributed broadcast-gradient loop must equal a pure-Python
    sequential batch-perceptron reference exactly (integer arithmetic:
    no tolerance), including on a fixture with a linearly separable
    parity split (errors must reach 0 and then stay 0)."""
    from hadoop_spark_pspd_spark.operators.inference import (
        _PCP_DIM, _PCP_FP, _PCP_ITERS, infer_perceptron_train,
    )

    rng = np.random.default_rng(3)
    n = 64
    w_true = rng.standard_normal(_PCP_DIM)
    X = rng.standard_normal((n, _PCP_DIM))
    # separable labels with margin: label parity encodes the sign
    y = np.sign(X @ w_true)
    y[y == 0] = 1
    labels = [1 if v > 0 else 0 for v in y]  # label%2==1 <-> +1
    rows = [
        (i, [float(v) for v in X[i]], int(labels[i])) for i in range(n)
    ]
    sf_dir = str(tmp_path / "pcp")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf_dir}/embeddings.parquet")

    # sequential reference (same quantization, same batch update)
    xq = np.floor(
        np.stack([np.asarray(r[1], dtype=np.float32) for r in rows])
        .astype(np.float64) * _PCP_FP
    ).astype(np.int64)
    yy = np.where(np.array(labels) % 2 == 1, 1, -1).astype(np.int64)
    w = np.zeros(_PCP_DIM, dtype=np.int64)
    want = []
    for it in range(1, _PCP_ITERS + 1):
        mis = yy * (xq @ w) <= 0
        errors = int(mis.sum())
        w = w + (xq[mis] * yy[mis, None]).sum(axis=0, dtype=np.int64)
        want.append((it, errors, int(np.abs(w).sum())))

    got = sorted(
        (r["iter"], r["errors"], r["w_l1"])
        for r in infer_perceptron_train(spark, sf_dir).collect()
    )
    assert got == want
    # separable fixture: training error must shrink to a perfect pass
    assert want[-1][1] == 0
    spark.catalog.clearCache()


# ---------------------------------------------------------------- tree split


def test_tree_split_is_true_argmin_of_exhaustive_gini(spark, tmp_path):
    """The operator's top-1 split must equal a brute-force numpy
    evaluation of EVERY (dim, bucket) candidate's integer Gini key on a
    clustered fixture (and the emitted score must match exactly)."""
    from hadoop_spark_pspd_spark.operators.inference import (
        _PCP_DIM, _PCP_FP, _STUMP_BUCKET, _STUMP_SCALE, infer_tree_split,
    )

    rng = np.random.default_rng(5)
    n = 90
    X = rng.uniform(-1, 1, (n, _PCP_DIM))
    lab = np.zeros(n, dtype=int)
    # make dim 7 strongly predictive: class 1 sits right of 0.25
    lab[X[:, 7] > 0.25] = 1
    rows = [(i, [float(v) for v in X[i]], int(lab[i])) for i in range(n)]
    sf_dir = str(tmp_path / "stump")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf_dir}/embeddings.parquet")

    xq = np.floor(
        np.stack([np.asarray(r[1], dtype=np.float32) for r in rows])
        .astype(np.float64) * _PCP_FP
    ).astype(np.int64)
    b = (xq + _PCP_FP) // _STUMP_BUCKET
    best = None
    for j in range(_PCP_DIM):
        for thr in range(1, 17):
            left = b[:, j] < thr
            n_l, n_r = int(left.sum()), int((~left).sum())
            if n_l == 0 or n_r == 0:
                continue
            key = 0
            for side in (left, ~left):
                ns = int(side.sum())
                ssq = sum(
                    int((lab[side] == c).sum()) ** 2 for c in (0, 1)
                )
                key += ((ns * ns - ssq) * _STUMP_SCALE) // ns
            cand = (key, j + 1, thr)
            if best is None or cand < best:
                best = cand

    top = (
        infer_tree_split(spark, sf_dir)
        .filter("rk = 1").collect()[0]
    )
    key, j, thr = best
    assert (top["j"], top["score"]) == (j, key)
    assert top["threshold_q"] == thr * _STUMP_BUCKET - _PCP_FP
    # the predictive dim must actually win on this fixture
    assert top["j"] == 8  # dim 7 is 0-based -> j = 8 in 1-based output
    spark.catalog.clearCache()


# ---------------------------------------------------------------- bloom


def test_bloom_incremental_no_false_negatives_planted_dups(spark, tmp_path):
    """Planted exact duplicates that cross the batch/corpus boundary:
    every true dup MUST be a bloom hit (no false negatives — the Bloom
    guarantee), and bloom misses must never be dups. Whitespace/case
    variants of a corpus doc count as dups (normalization contract)."""
    from hadoop_spark_pspd_spark.operators.dedup import (
        dedup_incremental_bloom,
    )

    docs = []
    for i in range(40):  # corpus side: doc_id % 5 != 4
        docs.append((i if i % 5 != 4 else i + 1001, f"corpus doc {i} xyz"))
    # batch side (doc_id % 5 == 4): 4 planted dups + 4 novel docs
    docs += [
        (4, "corpus doc 0 xyz"),            # exact dup
        (9, "  CORPUS   doc 1 XYZ  "),      # dup modulo normalization
        (14, "corpus doc 2 xyz"),
        (19, "Corpus  Doc  3  xyz"),
        (24, "novel text a"), (29, "novel text b"),
        (34, "novel text c"), (39, "novel text d"),
    ]
    rows = [
        (did, txt, "en", "src0", len(txt)) for did, txt in docs
    ]
    sf_dir = str(tmp_path / "bloom")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        r["doc_id"]: (r["bloom_hit"], r["is_dup"])
        for r in dedup_incremental_bloom(spark, sf_dir).collect()
    }
    assert set(got) == {4, 9, 14, 19, 24, 29, 34, 39}
    for did in (4, 9, 14, 19):
        assert got[did] == (True, True), (did, got[did])
    for did in (24, 29, 34, 39):
        hit, dup = got[did]
        assert not dup
        assert not (dup and not hit)  # is_dup => bloom_hit, always
    spark.catalog.clearCache()


# ---------------------------------------------------------------- audio VAD


def test_audio_vad_crafted_bursts(spark, tmp_path):
    """Crafted payloads where the segment structure is known: silence
    (byte 128 = PCM 0) with two loud bursts must yield exactly two
    segments with the right lengths/positions; an all-constant payload
    has zero active windows (mean test is strict); sub-window docs are
    excluded by the length filter (the r5 negative-slice trap class)."""
    from hadoop_spark_pspd_spark.operators.multimodal import (
        AUDIO_WIN, mm_audio_vad,
    )

    def payload_text(bts: bytes) -> str:
        # documents.text is utf-8-encoded by the op; keep bytes ASCII
        return bts.decode("ascii")

    # PCM is centered at byte 128, so ASCII bytes NEAR 0x80 are quiet
    # and low ASCII bytes are loud (|s| = |byte - 128|)
    silence = b"\x7e" * AUDIO_WIN          # |s| = 2  -> near-zero energy
    loud = b"\x21" * AUDIO_WIN             # |s| = 95 -> high energy
    # doc 0: 10 windows: S S L L L S S L S S -> segments [2..4], [7]
    d0 = (silence * 2 + loud * 3 + silence * 2 + loud + silence * 2)
    # doc 1: all-equal energies -> strict mean test -> 0 active
    d1 = silence * 6
    # doc 2: shorter than one window -> filtered out entirely
    d2 = b"\x41" * (AUDIO_WIN - 1)
    rows = [
        (0, payload_text(d0), "en", "src0", len(d0)),
        (1, payload_text(d1), "en", "src0", len(d1)),
        (2, payload_text(d2), "en", "src0", len(d2)),
    ]
    sf_dir = str(tmp_path / "vad")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        r["doc_id"]: r.asDict() for r in mm_audio_vad(spark, sf_dir).collect()
    }
    assert set(got) == {0, 1}  # doc 2 filtered
    assert got[0]["n_windows"] == 10
    assert got[0]["active_windows"] == 4
    assert got[0]["n_segments"] == 2
    assert got[0]["longest_run"] == 3
    assert got[0]["first_active_win"] == 2
    assert got[1]["active_windows"] == 0
    assert got[1]["n_segments"] == 0
    assert got[1]["first_active_win"] == -1
    spark.catalog.clearCache()


# ---------------------------------------------------------------- LPA


def test_label_propagation_round_semantics(spark):
    """One synchronous LPA round computed by the operator's building
    blocks must equal the textbook definition on the real graph: every
    node's final label is a label that was held by one of its neighbors
    in the previous round (closure sanity on the full 5-round output)."""
    from hadoop_spark_pspd_spark.operators.graph import (
        cooccurrence_edges, graph_label_propagation,
    )

    edges = [
        (r["s1"], r["s2"])
        for r in cooccurrence_edges(spark, SF_SMOKE).collect()
    ]
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)

    labels = {n: n for n in nbrs}
    for _ in range(5):
        new = {}
        for n, ns in nbrs.items():
            counts: dict[int, int] = {}
            for m in ns:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new

    got = {
        r["node"]: r["label"]
        for r in graph_label_propagation(spark, SF_SMOKE).collect()
    }
    assert got == labels
    spark.catalog.clearCache()


# ---------------------------------------------------------------- EWMA


def test_ewma_exact_dyadic_against_fractions(spark, tmp_path):
    """The EWMA doubles must equal an exact Fraction computation (the
    dyadic-sum exactness claim, checked with NO tolerance), including
    at a gap in the hourly sequence (the window is over existing
    buckets by spec)."""
    from fractions import Fraction

    from hadoop_spark_pspd_spark.operators.timeseries import (
        _EWMA_STEPS, ts_ewma_counts,
    )

    base = 1_700_000_000_000_000  # micros
    rows = []
    eid = 0
    counts = [3, 1, 4, 1, 5, 9, 2, 6]
    hours = [0, 1, 2, 3, 5, 6, 10, 11]  # gaps after h=3 and h=6
    for h, c in zip(hours, counts):
        for _ in range(c):
            rows.append((eid, base + h * 3_600_000_000, 1, "click", 0.0, "{}"))
            eid += 1
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    import datetime as dt
    rows = [
        (e, dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc)
            .replace(tzinfo=None), u, t_, v, p)
        for e, us, u, t_, v, p in rows
    ]
    sf_dir = str(tmp_path / "ewma")
    spark.createDataFrame(rows, schema).write.parquet(
        f"{sf_dir}/events.parquet"
    )

    got = sorted(
        (r["hour"], r["n"], r["ewma"])
        for r in ts_ewma_counts(spark, sf_dir).collect()
    )
    assert [g[1] for g in got] == counts
    for i in range(len(counts)):
        want = sum(
            Fraction(counts[i - j], 1 << (j + 1))
            for j in range(min(i + 1, _EWMA_STEPS))
        )
        assert Fraction(got[i][2]) == want, (i, got[i][2], want)
    spark.catalog.clearCache()


# ------------------------------------------------- randomization test


def test_randomization_test_identical_groups(spark, tmp_path):
    """With purchase and click values drawn identically AND symmetric
    (every value appears once in each group), t_obs is exactly 0, so
    every replica satisfies |T_b| >= |t_obs| and the p-value is exactly
    1.0 — the test must not reject a true null by construction."""
    import datetime as dt

    from hadoop_spark_pspd_spark.operators.stats import (
        ml_randomization_test,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        v = float(1 + (i % 50))
        rows.append((2 * i, t0, 1, "purchase", v, "{}"))
        rows.append((2 * i + 1, t0, 1, "click", v, "{}"))
    sf = str(tmp_path / "rt0")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    out = ml_randomization_test(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["t_obs"] == 0.0
    assert r["n_extreme"] == 64
    assert r["p_value"] == 1.0
    assert r["n_a"] == 200 and r["n_b"] == 200


def test_randomization_test_detects_separation(spark, tmp_path):
    """With purchase values far above click values, no md5 pseudo-split
    should reproduce the observed gap: p-value = 1/65 (the resolution
    floor of B=64 replicas)."""
    import datetime as dt

    from hadoop_spark_pspd_spark.operators.stats import (
        ml_randomization_test,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(300):
        rows.append((2 * i, t0, 1, "purchase", 1000.0 + i % 7, "{}"))
        rows.append((2 * i + 1, t0, 1, "click", 1.0 + i % 7, "{}"))
    sf = str(tmp_path / "rt1")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    r = ml_randomization_test(spark, sf).collect()[0]
    assert r["n_extreme"] == 0
    assert r["p_value"] == 1.0 / 65.0


# ---------------------------------------------- brier decomposition


def test_brier_matches_python_reference(spark, sf_dir):
    """brier_cell and reliability_cell must equal the exact formulas
    recomputed in python from the cell's (n, pos) — and the dyadic
    p_hat must sit within 1/256 below the observed rate (floor onto
    the /256 grid never overshoots)."""
    from hadoop_spark_pspd_spark.operators.stats import (
        ml_brier_decomposition,
    )

    for r in ml_brier_decomposition(spark, sf_dir).collect():
        n, pos = r["n"], r["pos"]
        p_num = (pos * 256) // n
        p_hat = p_num / 256.0
        assert r["p_hat"] == p_hat
        assert 0.0 <= r["obs_rate"] - p_hat < 1.0 / 256.0
        brier = (pos * (256 - p_num) ** 2 + (n - pos) * p_num**2) / (
            n * 65536
        )
        assert r["brier_cell"] == brier
        rel = (p_hat - pos / n) ** 2
        assert r["reliability_cell"] == rel


# -------------------------------------------------- fifo allocation


def test_fifo_allocation_invariants(spark, sf_dir):
    """Per customer: funded total == clamp(budget, 0, total price);
    statuses are a monotone funded* partial? unfunded* sequence in
    allocation order; 0 <= funded_amt <= price everywhere."""
    from collections import defaultdict

    from hadoop_spark_pspd_spark.operators.windows_extra import (
        q_fifo_allocation,
    )
    from hadoop_spark_pspd_spark.catalog import Tables

    rows = q_fifo_allocation(spark, sf_dir).collect()
    t = Tables(spark, sf_dir)
    budgets = {
        r["c_custkey"]: float(r["c_acctbal"])
        for r in t.customer.select("c_custkey", "c_acctbal").collect()
    }
    dates = {
        r["o_orderkey"]: (r["o_orderdate"], r["o_orderkey"])
        for r in t.orders.select("o_orderkey", "o_orderdate").collect()
    }
    per_cust = defaultdict(list)
    for r in rows:
        assert -1e-9 <= r["funded_amt"] <= r["price"] + 1e-9
        per_cust[r["o_custkey"]].append(r)
    rank = {"funded": 0, "partial": 1, "unfunded": 2}
    for ck, rs in per_cust.items():
        rs.sort(key=lambda r: dates[r["o_orderkey"]])
        seq = [rank[r["status"]] for r in rs]
        assert seq == sorted(seq), f"non-monotone statuses for {ck}"
        assert seq.count(1) <= 1
        funded_total = sum(r["funded_amt"] for r in rs)
        want = min(max(budgets[ck], 0.0), sum(r["price"] for r in rs))
        assert abs(funded_total - want) < 1e-6


# --------------------------------------------------- image tiles


def test_image_tiles_counts_shared_blocks(spark, tmp_path):
    """Two docs sharing one tile-aligned 64-byte block (and nothing
    else) each report exactly that block as duplicated; a third doc
    with unique bytes reports zero."""
    from hadoop_spark_pspd_spark.operators.multimodal import (
        mm_image_tiles,
    )

    shared = "S" * 64
    doc_a = shared + "a" * 64 + "b" * 64          # 3 tiles, 1 shared
    doc_b = "c" * 64 + shared + "d" * 32          # 2 tiles + ragged tail
    doc_c = "e" * 64 + "f" * 64                   # 2 tiles, none shared
    sf = str(tmp_path / "tiles")
    spark.createDataFrame(
        [(1, doc_a, "en", "web", len(doc_a)),
         (2, doc_b, "en", "web", len(doc_b)),
         (3, doc_c, "en", "web", len(doc_c))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tiles"], r["n_dup_tiles"], r["dup_frac"])
        for r in mm_image_tiles(spark, sf).collect()
    }
    assert got[1] == (3, 1, 1.0 / 3.0)
    assert got[2] == (2, 1, 0.5)   # ragged 32-byte tail is not a tile
    assert got[3] == (2, 0, 0.0)


# ------------------------------------------------ poisson bootstrap


def test_poisson_bootstrap_matches_python_replay(spark, sf_dir):
    """Replay the md5-derandomized Poisson draw and the exact-decimal
    replica means in pure python; the emitted mean and order-statistic
    CI must match bit-for-bit."""
    import hashlib
    from decimal import Decimal

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.stats import (
        _BOOT_B, _POIS_T, ml_poisson_bootstrap,
    )

    t = Tables(spark, sf_dir)
    orders = [
        (r["o_orderkey"], Decimal(str(r["o_totalprice"])))
        for r in t.orders.select("o_orderkey", "o_totalprice").collect()
    ]

    def weight(key: int, b: int) -> int:
        # round-10 scheme: one md5 serves TWO 52-bit draws (digest
        # chars 1-13 / 14-26, keyed by b % 2)
        hexd = hashlib.md5(f"{key}:{b // 2}".encode()).hexdigest()
        h = int(hexd[13:26] if b % 2 else hexd[:13], 16)
        for w, thr in enumerate(_POIS_T):
            if h < thr:
                return w
        return len(_POIS_T)

    ests = []
    for b in range(_BOOT_B):
        s, n = Decimal(0), 0
        for key, price in orders:
            w = weight(key, b)
            s += w * price
            n += w
        ests.append((float(s) if s == s.to_integral_value() or True
                     else 0.0, b, s, n))
    # exact decimal -> shortest string -> double, then one division
    vals = sorted(
        (float(str(s)) / float(n if n else 1), b)
        for _, b, s, n in ests
    )
    want_lo, want_hi = vals[1][0], vals[_BOOT_B - 2][0]
    total = sum(p for _, p in orders)
    want_mean = float(str(total)) / float(len(orders))

    r = ml_poisson_bootstrap(spark, sf_dir).collect()[0]
    assert r["n_orders"] == len(orders)
    assert r["mean_obs"] == want_mean
    assert (r["boot_lo"], r["boot_hi"]) == (want_lo, want_hi)
    assert r["boot_lo"] <= r["mean_obs"] <= r["boot_hi"]


# ---------------------------------------------------------- cuped


def test_cuped_matches_python_replay(spark, sf_dir):
    """Recompute the quantized moments and the fixed double op sequence
    in python ints/floats; every emitted column must match exactly, and
    the pooled-theta adjustment must not increase pooled variance."""
    import datetime as dt
    from collections import defaultdict
    from decimal import Decimal

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.stats import (
        ml_cuped_adjustment,
    )

    t = Tables(spark, sf_dir)
    cut = dt.date(1995, 1, 1)
    per = defaultdict(lambda: [Decimal(0), Decimal(0)])
    for r in t.orders.select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect():
        od = r["o_orderdate"]
        if isinstance(od, dt.datetime):
            od = od.date()
        slot = 0 if od < cut else 1
        per[r["o_custkey"]][slot] += Decimal(str(r["o_totalprice"]))
    rows = []
    for r in t.customer.select("c_custkey").collect():
        ck = r["c_custkey"]
        x, y = per.get(ck, [Decimal(0), Decimal(0)])
        rows.append((ck % 2, int(x * 10000), int(y * 10000)))

    n = len(rows)
    sx = sum(x for _, x, _ in rows)
    sy = sum(y for _, _, y in rows)
    sxx = sum(x * x for _, x, _ in rows)
    sxy = sum(x * y for _, x, y in rows)
    den = n * sxx - sx * sx
    theta = (
        0.0 if den == 0
        else float(str(n * sxy - sx * sy)) / float(str(den))
    )
    want = {}
    for arm in (0, 1):
        ar = [(x, y) for a, x, y in rows if a == arm]
        na = len(ar)
        sxa = sum(x for x, _ in ar)
        sya = sum(y for _, y in ar)
        sxxa = sum(x * x for x, _ in ar)
        syya = sum(y * y for _, y in ar)
        sxya = sum(x * y for x, y in ar)
        na_d = float(str(na))
        dg = na_d * (na_d - 1.0) or 1.0
        ybar = float(str(sya)) / na_d / 10000.0
        var_y = float(str(na * syya - sya * sya)) / dg / 1e8
        cov = float(str(na * sxya - sxa * sya)) / dg / 1e8
        var_x = float(str(na * sxxa - sxa * sxa)) / dg / 1e8
        want[arm] = (
            na,
            ybar,
            ybar - theta * ((float(str(sxa)) / na_d
                             - float(str(sx)) / float(str(n))) / 10000.0),
            var_y,
            var_y - 2.0 * theta * cov + theta * theta * var_x,
            theta,
        )
    got = {
        r["arm"]: (
            r["n_arm"], r["ybar"], r["ybar_adj"], r["var_y"],
            r["var_y_adj"], r["theta"],
        )
        for r in ml_cuped_adjustment(spark, sf_dir).collect()
    }
    assert got == want
    # pooled variance must not increase (theta is the pooled minimizer)
    n0, n1 = want[0][0], want[1][0]
    pooled_y = (want[0][3] * (n0 - 1) + want[1][3] * (n1 - 1))
    pooled_adj = (want[0][4] * (n0 - 1) + want[1][4] * (n1 - 1))
    assert pooled_adj <= pooled_y + 1e-9


# ------------------------------------------------------- rich club


def test_richclub_reference_and_monotone_sets(spark, sf_dir):
    """phi(k) recomputed from the edge list in python must match; the
    rich set sizes must be non-increasing in k and phi bounded in
    [0, 1]."""
    from hadoop_spark_pspd_spark.operators.graph import (
        cooccurrence_edges, graph_richclub,
    )

    edges = [
        (r["s1"], r["s2"])
        for r in cooccurrence_edges(spark, sf_dir).collect()
    ]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = {
        r["k"]: (r["n_rich"], r["e_rich"], r["phi"])
        for r in graph_richclub(spark, sf_dir).collect()
    }
    prev_n = None
    for k in (2, 4, 8, 16, 32):
        rich = {v for v, d in deg.items() if d > k}
        e_rich = sum(1 for a, b in edges if a in rich and b in rich)
        n_rich = len(rich)
        phi = (
            2.0 * e_rich / (n_rich * (n_rich - 1))
            if n_rich >= 2 else 0.0
        )
        assert got[k] == (n_rich, e_rich, phi)
        assert 0.0 <= got[k][2] <= 1.0
        if prev_n is not None:
            assert n_rich <= prev_n
        prev_n = n_rich


# ----------------------------------------------------- collocations


def test_collocations_python_reference(spark, sf_dir):
    """Top-50 Dice-ranked bigrams recomputed in pure python from the
    same whitespace tokenization must match exactly (counts, score,
    and the tie-broken ranking cutoff)."""
    from collections import Counter

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.text_analysis import (
        _COLL_MIN_SUPPORT, _COLL_TOPK, text_collocations,
    )

    t = Tables(spark, sf_dir)
    uni, bg = Counter(), Counter()
    for r in t.documents.select("text").collect():
        ws = [w for w in r["text"].lower().split() if w]
        uni.update(ws)
        bg.update(zip(ws, ws[1:]))
    scored = [
        (round(2.0 * c / (uni[a] + uni[b]), 6), f"{a} {b}",
         c, uni[a], uni[b])
        for (a, b), c in bg.items() if c >= _COLL_MIN_SUPPORT
    ]
    scored.sort(key=lambda x: (-x[0], x[1]))
    want = [
        (bgm, c, cx, cy, d) for d, bgm, c, cx, cy in scored[:_COLL_TOPK]
    ]
    got = [
        (r["bigram"], r["c_xy"], r["c_x"], r["c_y"], r["dice"])
        for r in text_collocations(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)


# ------------------------------------------------- stratified ATT


def test_att_stratified_python_reference(spark, sf_dir):
    """Per-stratum treated/control means and the att gap recomputed
    from Decimal sums must match bit-for-bit; off-support strata must
    be absent."""
    import datetime as dt
    from collections import defaultdict
    from decimal import Decimal

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.stats import ml_att_stratified

    t = Tables(spark, sf_dir)
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in t.customer.select("c_custkey", "c_mktsegment").collect()
    }
    cells = defaultdict(lambda: [0, 0, Decimal(0), Decimal(0)])
    for r in t.orders.select(
        "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    ).collect():
        od = r["o_orderdate"]
        mon = (od if isinstance(od, dt.date) else od.date()).month
        key = (seg[r["o_custkey"]], mon)
        tr = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        c = cells[key]
        c[tr] += 1
        c[2 + tr] += Decimal(str(r["o_totalprice"]))
    want = {}
    for (sg, mon), (n_c, n_t, sy_c, sy_t) in cells.items():
        if n_t >= 1 and n_c >= 1:
            yb_t = float(str(sy_t)) / float(n_t)
            yb_c = float(str(sy_c)) / float(n_c)
            want[(sg, mon)] = (
                (n_t * 256) // (n_t + n_c), n_t, n_c,
                yb_t, yb_c, yb_t - yb_c,
            )
    got = {
        (r["segment"], r["mon"]): (
            r["p_num"], r["n_t"], r["n_c"],
            r["ybar_t"], r["ybar_c"], r["att_cell"],
        )
        for r in ml_att_stratified(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------- channel breakout


def test_channel_breakout_crafted_series(spark, tmp_path):
    """A crafted hourly series with a known spike and cliff: the spike
    hour must flag +1 against the trailing-24 max, the cliff hour -1,
    the first hour (empty frame) 0, and steady hours 0."""
    import datetime as dt

    from hadoop_spark_pspd_spark.operators.timeseries import (
        ts_channel_breakout,
    )

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    # hours 0..29: 5 events/hour, except hour 27 spikes to 9 and hour
    # 28 drops to 1
    for h in range(30):
        n = 9 if h == 27 else (1 if h == 28 else 5)
        for _ in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h), 1, "click", 1.0, "{}")
            )
            eid += 1
    sf = str(tmp_path / "chan")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r["hour"].hour + 24 * (r["hour"].day - 1): r["breakout"]
        for r in ts_channel_breakout(spark, sf).collect()
    }
    assert got[0] == 0          # empty frame
    assert got[27] == 1         # spike above trailing max of 5
    assert got[28] == -1        # cliff below trailing min
    assert all(got[h] == 0 for h in range(1, 27))


# ------------------------------------------------------- byte chisq


def test_byte_chisq_known_histograms(spark, tmp_path):
    """Exact chi-square keys for crafted payloads: a single repeated
    byte maximizes concentration (key = 255*n^2), a perfectly uniform
    256-byte cycle over the printable subset... uses the exact integer
    formula recomputed in python."""
    import numpy as np

    from hadoop_spark_pspd_spark.operators.multimodal import mm_byte_chisq

    docs = [
        (1, "a" * 100),                      # one byte, maximal skew
        (2, "".join(chr(33 + (i % 64)) for i in range(640))),  # uniform-64
        (3, "xy"),
    ]
    sf = str(tmp_path / "chisq")
    spark.createDataFrame(
        [(d, t, "en", "web", len(t)) for d, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["n"], r["chisq_key"], r["chisq"],
                      r["n_distinct_bytes"])
        for r in mm_byte_chisq(spark, sf).collect()
    }
    for did, txt in docs:
        arr = np.frombuffer(txt.encode(), dtype=np.uint8)
        n = arr.size
        c = np.bincount(arr, minlength=256).astype(np.int64)
        key = int(256 * (c * c).sum() - n * n)
        assert got[did] == (n, key, key / n, int((c > 0).sum()))
    # analytic checks: all-same-byte -> key = 255*n^2
    assert got[1][1] == 255 * 100 * 100
    # 640 bytes spread evenly over 64 values (10 each):
    # key = 256*64*100 - 640^2
    assert got[2][1] == 256 * 64 * 100 - 640 * 640


# -------------------------------------------------- cluster sizes


def test_cluster_sizes_consistent_with_clusters(spark, sf_dir):
    """The histogram must be exactly the size distribution of the
    dedup_clusters labeling (same session, same data)."""
    from collections import Counter

    from hadoop_spark_pspd_spark.operators.dedup import (
        dedup_cluster_sizes, dedup_clusters,
    )

    labs = Counter(
        r["cluster_id"] for r in dedup_clusters(spark, sf_dir).collect()
    )
    want = Counter(labs.values())
    got = {
        r["size"]: r["n_clusters"]
        for r in dedup_cluster_sizes(spark, sf_dir).collect()
    }
    assert got == dict(want)
    spark.catalog.clearCache()


# -------------------------------------------------- int8 recall


def test_int8_recall_perfect_on_wellseparated(spark, tmp_path):
    """With EQUAL-NORM clusters far apart and exactly 5 same-cluster
    candidates per query, both rankings (integer SQ8 dot and exact
    cosine) must pick the same-cluster set: recall exactly 1.0 for
    every query. Equal norms matter — unnormalized dot is
    magnitude-sensitive, so mixed-norm clusters could legitimately
    disagree with cosine; and clusters of >k+1 members could
    legitimately reorder near-ties under quantization."""
    import numpy as np

    from hadoop_spark_pspd_spark.operators.similarity import (
        sim_int8_recall,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 64))
    centers = 10.0 * centers / np.linalg.norm(
        centers, axis=1, keepdims=True
    )
    rows = []
    for c in range(10):
        member_ids = [c] + [10 + c * 5 + j for j in range(5)]
        for vid in member_ids:
            v = centers[c] + rng.uniform(-0.005, 0.005, 64)
            rows.append((vid, [float(x) for x in v], c))
    sf = str(tmp_path / "sq8")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    out = sim_int8_recall(spark, sf).collect()
    assert len(out) == 10
    assert all(r["recall_at_k"] == 1.0 for r in out)


# ------------------------------------------------- postings d-gaps


def test_postings_dgaps_python_reference(spark, sf_dir):
    """Bit totals recomputed from the posting lists in python must
    match exactly (bin-length magnitude coding, first gap doc_id+1)."""
    from collections import defaultdict

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.text_analysis import (
        text_postings_dgaps,
    )

    t = Tables(spark, sf_dir)
    posts = defaultdict(set)
    for r in t.documents.select("doc_id", "text").collect():
        for w in set(r["text"].lower().split()):
            if w:
                posts[w].add(r["doc_id"])
    want = {}
    for w, ids in posts.items():
        if len(ids) < 5:
            continue
        ordered = sorted(ids)
        gaps = [ordered[0] + 1] + [
            b - a for a, b in zip(ordered, ordered[1:])
        ]
        bits = [len(bin(g)) - 2 for g in gaps]
        want[w] = (
            len(gaps), sum(bits), sum(bits) / len(gaps), max(gaps)
        )
    got = {
        r["word"]: (r["df"], r["total_bits"], r["avg_bits"], r["max_gap"])
        for r in text_postings_dgaps(spark, sf_dir).collect()
    }
    assert got == want


# ------------------------------------------------ learning curve


def test_learning_curve_nested_and_monotone_train(spark, sf_dir):
    """Train sizes must be strictly nested (monotone in the fraction),
    the test size constant across fractions, and the full-data point
    must equal a python replay of the hash split + dyadic scorer."""
    import hashlib

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.stats import (
        _LC_TRAIN_CAP, ml_learning_curve,
    )

    got = {
        r["frac_denom"]: (
            r["n_train"], r["n_test"], r["brier_key"], r["brier"]
        )
        for r in ml_learning_curve(spark, sf_dir).collect()
    }
    assert set(got) == {1, 2, 4, 8}
    assert got[8][0] <= got[4][0] <= got[2][0] <= got[1][0]
    assert len({v[1] for v in got.values()}) == 1  # same test set

    t = Tables(spark, sf_dir)
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in t.customer.select("c_custkey", "c_mktsegment").collect()
    }
    train, test = {}, {}
    for r in t.orders.select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    ).collect():
        h = int(
            hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:13],
            16,
        )
        s = seg[r["o_custkey"]]
        p = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        d = train if h < _LC_TRAIN_CAP else test
        n, pos = d.get(s, (0, 0))
        d[s] = (n + 1, pos + p)
    key, n_test, n_train = 0, 0, 0
    for s, (n_t, pos_t) in test.items():
        n, pos = train.get(s, (0, 0))
        p_num = (pos * 256) // n if n else 128
        key += pos_t * (256 - p_num) ** 2 + (n_t - pos_t) * p_num**2
        n_test += n_t
    n_train = sum(n for n, _ in train.values())
    assert got[1] == (n_train, n_test, key, key / (n_test * 65536))


# --------------------------------------------------- lsh recall


def test_lsh_recall_bounds_and_consistency(spark, sf_dir):
    """recall_at_k must equal |lsh_topk intersect exact_topk| / k
    recomputed from the two registered queries, n_returned <= k, and
    every query id < N_QUERIES must appear exactly once."""
    from hadoop_spark_pspd_spark.operators.similarity import (
        N_QUERIES, TOP_K, cosine_topk, sim_ann_lsh, sim_lsh_recall,
    )
    from hadoop_spark_pspd_spark.catalog import Tables
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    lsh = {
        (r["query_id"], r["candidate_id"])
        for r in sim_ann_lsh(spark, sf_dir).collect()
    }
    queries = t.embeddings.filter(F.col("vec_id") < N_QUERIES)
    exact = {
        (r["query_id"], r["candidate_id"])
        for r in cosine_topk(queries, t.embeddings, TOP_K).collect()
    }
    got = {r["query_id"]: r for r in sim_lsh_recall(spark, sf_dir).collect()}
    assert len(got) == N_QUERIES
    for q, r in got.items():
        mine = {c for (qq, c) in lsh if qq == q}
        truth = {c for (qq, c) in exact if qq == q}
        assert r["n_returned"] == len(mine) <= TOP_K
        assert r["n_overlap"] == len(mine & truth)
        assert r["recall_at_k"] == len(mine & truth) / TOP_K
    spark.catalog.clearCache()


# ------------------------------------------------ fairness parity


def test_fairness_parity_identities(spark, sf_dir):
    """gap_key sign must agree with parity_gap sign, totals must be
    consistent, and the n-weighted sum of gap_keys must be exactly 0
    (a telescoping identity of the cross-multiplied form)."""
    from hadoop_spark_pspd_spark.operators.stats import ml_fairness_parity

    rows = ml_fairness_parity(spark, sf_dir).collect()
    n_all = sum(r["n"] for r in rows)
    pos_all = sum(r["pos"] for r in rows)
    assert sum(r["pos"] * n_all - pos_all * r["n"] for r in rows) == 0
    for r in rows:
        assert r["gap_key"] == r["pos"] * n_all - pos_all * r["n"]
        if r["gap_key"] > 0:
            assert r["parity_gap"] > 0
        elif r["gap_key"] < 0:
            assert r["parity_gap"] < 0
        else:
            assert r["parity_gap"] == 0.0


# -------------------------------------------------- l-diversity


def test_l_diversity_crafted_homogeneous_group(spark, tmp_path):
    """A group that is k-anonymous (large) but sensitive-homogeneous
    must flag violates=True; a small diverse group must not."""
    from hadoop_spark_pspd_spark.operators.profiling import q_l_diversity

    rows = []
    # nation 1, bucket 0: 10 members, ALL segment 'AUTOMOBILE' -> l=1
    for i in range(10):
        rows.append((i, f"c{i}", "addr", 1, "p", 100.0, "AUTOMOBILE", ""))
    # nation 2, bucket 0: 4 members, 4 distinct segments -> l=4
    for j, seg in enumerate(
        ["BUILDING", "MACHINERY", "FURNITURE", "HOUSEHOLD"]
    ):
        rows.append((100 + j, f"d{j}", "addr", 2, "p", 100.0, seg, ""))
    sf = str(tmp_path / "ldiv")
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_address string, "
        "c_nationkey long, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string",
    ).write.parquet(f"{sf}/customer.parquet")
    got = {
        (r["c_nationkey"], r["bal_bucket"]): (r["l"], r["violates"])
        for r in q_l_diversity(spark, sf).collect()
    }
    assert got[(1, 0)] == (1, True)
    assert got[(2, 0)] == (4, False)


# ------------------------------------------------ embedding drift


def test_embedding_drift_crafted_directions(spark, tmp_path):
    """Two labels pointing in nearly opposite directions: the global
    centroid sits between them, and each label's cosine-to-global must
    carry the right sign; a label exactly aligned with the global mean
    scores ~1."""
    import numpy as np

    from hadoop_spark_pspd_spark.operators.clustering import (
        ml_embedding_drift,
    )

    d = 64
    e1 = np.zeros(d); e1[0] = 1.0
    e2 = np.zeros(d); e2[0] = -1.0; e2[1] = 0.2
    rows = []
    vid = 0
    for lab, base, n in ((0, e1, 20), (1, e2, 10)):
        for _ in range(n):
            rows.append((vid, [float(x) for x in base], lab))
            vid += 1
    sf = str(tmp_path / "drift")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    got = {
        r["label"]: r for r in ml_embedding_drift(spark, sf).collect()
    }
    # global mean = (20*e1 + 10*e2)/30 -> positive x component, so
    # label 0 (pure +x) agrees and label 1 (mostly -x) opposes
    assert got[0]["cos_to_global"] > 0.9
    assert got[1]["cos_to_global"] < 0.0
    assert got[0]["n_vecs"] == 20 and got[1]["n_vecs"] == 10


# ---------------------------------------------- conformal interval


def test_conformal_coverage_guarantee_and_quantile(spark, sf_dir):
    """Coverage must meet the conformal lower bound alpha - slack on
    the held-out slice, q_cents must equal the python-replayed exact
    order statistic, and the 90% width must dominate the 80% width."""
    import hashlib

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.stats import (
        _CF_CAL, _CF_TRAIN, ml_conformal_interval,
    )

    got = {
        r["alpha_tenths"]: r
        for r in ml_conformal_interval(spark, sf_dir).collect()
    }
    assert set(got) == {8, 9}
    assert got[9]["q_cents"] >= got[8]["q_cents"]
    for a, r in got.items():
        # finite-sample conformal bound minus a small-n allowance
        assert r["coverage"] >= a / 10 - 0.05

    # python replay of the full pipeline at smoke scale
    t = Tables(spark, sf_dir)
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in t.customer.select("c_custkey", "c_mktsegment").collect()
    }
    from decimal import Decimal
    from collections import defaultdict

    train = defaultdict(lambda: [Decimal(0), 0])
    rows = []
    for r in t.orders.select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).collect():
        h = int(
            hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:13],
            16,
        )
        s = seg[r["o_custkey"]]
        y = Decimal(str(r["o_totalprice"]))
        rows.append((r["o_orderkey"], s, y, h))
        if h < _CF_TRAIN:
            tr = train[s]
            tr[0] += y
            tr[1] += 1
    pred = {
        s: float(str(tot)) / float(n) for s, (tot, n) in train.items()
    }
    import math

    cal = sorted(
        math.floor(abs(float(str(y)) - pred[s]) * 100.0)
        for k, s, y, h in rows
        if _CF_TRAIN <= h < _CF_CAL
    )
    n_cal = len(cal)
    for a, r in got.items():
        k = min(n_cal, ((n_cal + 1) * a) // 10)
        assert r["q_cents"] == cal[k - 1]
        assert r["n_cal"] == n_cal


# ----------------------------------------------------- item CF


def test_item_cf_python_reference(spark, sf_dir):
    """Top-5 cosine neighbors per item recomputed from the basket sets
    in python must match exactly (counts, rounded sims, tie-broken
    ranking cutoff)."""
    import math
    from collections import Counter, defaultdict

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.ml_data import (
        _CF_TOPN, ml_item_cf,
    )

    t = Tables(spark, sf_dir)
    baskets = defaultdict(set)
    for r in t.lineitem.select("l_orderkey", "l_partkey").collect():
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    item_n, pair_c = Counter(), Counter()
    for items in baskets.values():
        item_n.update(items)
        s = sorted(items)
        for i, x in enumerate(s):
            for y in s[i + 1:]:
                pair_c[(x, y)] += 1
    nbrs = defaultdict(list)
    for (x, y), c in pair_c.items():
        if c < 2:
            continue
        sim = round(c / math.sqrt(item_n[x] * item_n[y]), 6)
        nbrs[x].append((-sim, y, c))
        nbrs[y].append((-sim, x, c))
    want = set()
    for item, cands in nbrs.items():
        cands.sort()
        for negsim, nbr, c in cands[:_CF_TOPN]:
            want.add((item, nbr, c, -negsim))
    got = {
        (r["item"], r["nbr"], r["c_ab"], r["sim"])
        for r in ml_item_cf(spark, sf_dir).collect()
    }
    assert got == want


# -------------------------------------------------- readability


def test_readability_crafted_docs(spark, tmp_path):
    """Known feature counts: simple short sentences score high; a
    single long polysyllabic run scores lower; zero-sentence text is
    floored, never a division by zero."""
    from hadoop_spark_pspd_spark.operators.text_analysis import (
        text_readability,
    )

    docs = [
        (1, "The cat sat. The dog ran. It was fun."),
        (2, "extraordinarily incomprehensible organizational "
            "responsibilities notwithstanding"),
        (3, "no terminal punctuation here at all"),
    ]
    sf = str(tmp_path / "read")
    spark.createDataFrame(
        [(d, t_, "en", "web", len(t_)) for d, t_ in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {r["doc_id"]: r for r in text_readability(spark, sf).collect()}
    assert got[1]["n_sents"] == 3
    assert got[3]["n_sents"] == 1  # floored
    assert got[1]["flesch"] > got[2]["flesch"]
    import re

    for did, txt in docs:
        words = len([w for w in txt.split() if w])
        sents = max(len(re.findall(r"[.!?]+", txt)), 1)
        syll = max(len(re.findall(r"[aeiouy]+", txt.lower())), 1)
        want = (
            206.835 - 1.015 * (words / sents)
            - 84.6 * (syll / max(words, 1))
        )
        assert got[did]["flesch"] == want
        assert (got[did]["n_words"], got[did]["n_syll"]) == (words, syll)


# ---------------------------------------------------- SRM check


def test_srm_check_balanced_and_rigged(spark, tmp_path):
    """A perfectly balanced split must not flag; a rigged 9:1 split
    must flag (chi2 far above 16); keys replay exactly."""
    import datetime as dt

    from hadoop_spark_pspd_spark.operators.stats import ml_srm_check

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for i in range(500):  # balanced: alternating parity
        rows.append((eid, t0, i, "click", 1.0, "{}")); eid += 1
    for i in range(500):  # rigged: 90% even users
        uid = 2 * i if i % 10 else 2 * i + 1
        rows.append((eid, t0, uid, "view", 1.0, "{}")); eid += 1
    sf = str(tmp_path / "srm")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = {r["event_type"]: r for r in ml_srm_check(spark, sf).collect()}
    c = got["click"]
    assert (c["n_a"], c["n_b"]) == (250, 250)
    assert not c["flagged"] and c["srm_key"] == 0
    v = got["view"]
    assert (v["n_a"], v["n_b"]) == (450, 50)
    assert v["flagged"]
    assert v["srm_key"] == (450 - 50) ** 2
    assert v["srm_chi2"] == 400 * 400 / 500


# ------------------------------------------------- backtest MAE


def test_backtest_mae_crafted_seasonal_series(spark, tmp_path):
    """A series that repeats weekly except one anomalous hour: MAE
    must equal exactly the planted deviation / forecastable hours, and
    a series shorter than the lag must produce no forecasts."""
    import datetime as dt

    from hadoop_spark_pspd_spark.operators.timeseries import (
        _BT_LAG_H, ts_backtest_mae,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 2 weeks of perfectly repeating hourly counts (i % 24 // 8 + 1
    # events), except hour 200 gets 5 extra events
    for h in range(2 * _BT_LAG_H):
        n = (h % 24) // 8 + 1 + (5 if h == 200 else 0)
        for _ in range(n):
            rows.append(
                (eid, t0 + dt.timedelta(hours=h), 1, "click", 1.0, "{}")
            )
            eid += 1
    # short series: only 3 hours -> no lagged forecast possible
    for h in range(3):
        rows.append(
            (eid, t0 + dt.timedelta(hours=h), 1, "error", 1.0, "{}")
        )
        eid += 1
    sf = str(tmp_path / "bt")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = {r["event_type"]: r for r in ts_backtest_mae(spark, sf).collect()}
    c = got["click"]
    assert c["n_forecasts"] == _BT_LAG_H
    assert c["abs_err_total"] == 5       # the single planted anomaly
    assert c["mae"] == 5 / _BT_LAG_H
    assert c["n_exact"] == _BT_LAG_H - 1
    assert "error" not in got            # sub-lag series drops out


# --------------------------------------------- keep-longest dedup


def test_keep_longest_picks_longest_member(spark, sf_dir):
    """For every cluster the keeper must be the byte-longest member
    (min doc_id among ties) of the dedup_clusters labeling."""
    from collections import defaultdict

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.dedup import (
        dedup_clusters, dedup_keep_longest,
    )

    t = Tables(spark, sf_dir)
    nb = {
        r["doc_id"]: len(r["text"].encode())
        for r in t.documents.select("doc_id", "text").collect()
    }
    clusters = defaultdict(list)
    for r in dedup_clusters(spark, sf_dir).collect():
        clusters[r["cluster_id"]].append(r["doc_id"])
    want = {}
    for cid, docs in clusters.items():
        best = min(docs, key=lambda d: (-nb[d], d))
        want[cid] = (len(docs), nb[best], best)
    got = {
        r["cluster_id"]: (r["n_members"], r["keep_bytes"], r["keep_id"])
        for r in dedup_keep_longest(spark, sf_dir).collect()
    }
    assert got == want
    spark.catalog.clearCache()


# ------------------------------------------------ key skew profile


def test_key_skew_profile_identities(spark, sf_dir):
    """Histogram mass must reconstruct the orders row count, and
    skew_factor must equal max/mean recomputed from the histogram."""
    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.profiling import (
        q_key_skew_profile,
    )

    t = Tables(spark, sf_dir)
    n_orders = t.orders.count()
    rows = q_key_skew_profile(spark, sf_dir).collect()
    n_rows = sum(r["rows_per_key"] * r["n_keys"] for r in rows)
    n_keys = sum(r["n_keys"] for r in rows)
    mx = max(r["rows_per_key"] for r in rows)
    assert n_rows == n_orders
    for r in rows:
        assert r["max_per_key"] == mx
        assert r["skew_factor"] == mx * n_keys / n_rows


# ------------------------------------------------- missing hours


def test_missing_hours_crafted_gaps(spark, tmp_path):
    """A series with two planted missing hours must report exactly
    those; a gapless series reports zero."""
    import datetime as dt

    from hadoop_spark_pspd_spark.operators.timeseries import (
        ts_missing_hours,
    )

    t0 = dt.datetime(2024, 5, 1)
    rows, eid = [], 0
    for h in range(48):
        if h in (10, 30):
            continue  # planted gaps
        rows.append((eid, t0 + dt.timedelta(hours=h), 1, "click", 1.0, "{}"))
        eid += 1
    for h in range(24):
        rows.append((eid, t0 + dt.timedelta(hours=h), 1, "view", 1.0, "{}"))
        eid += 1
    sf = str(tmp_path / "gaps")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = {r["event_type"]: r for r in ts_missing_hours(spark, sf).collect()}
    c = got["click"]
    assert (c["n_expected"], c["n_observed"], c["n_missing"]) == (48, 46, 2)
    v = got["view"]
    assert (v["n_expected"], v["n_missing"]) == (24, 0)


# -------------------------------------------------- CF coverage


def test_cf_coverage_consistent_with_item_cf(spark, sf_dir):
    """n_with_recs must equal the count of distinct items ml_item_cf
    emits recommendations for, and coverage ratios must replay."""
    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.ml_data import (
        ml_cf_coverage, ml_item_cf,
    )

    t = Tables(spark, sf_dir)
    items_with = {
        r["item"] for r in ml_item_cf(spark, sf_dir).collect()
    }
    r = ml_cf_coverage(spark, sf_dir).collect()[0]
    assert r["n_with_recs"] == len(items_with)
    assert r["n_catalog"] == t.part.count()
    assert r["catalog_coverage"] == len(items_with) / r["n_catalog"]
    assert r["purchased_coverage"] == len(items_with) / r["n_purchased"]


# ------------------------------------------------ katz centrality


def test_katz_python_reference_on_crafted_graph(spark, sf_dir):
    """katz_q recomputed from the edge list by integer matrix-free walk
    counting must match exactly for every node."""
    from collections import defaultdict

    from hadoop_spark_pspd_spark.operators.graph import (
        _KATZ_ROUNDS, cooccurrence_edges, graph_katz_centrality,
    )

    adj = defaultdict(list)
    nodes = set()
    for r in cooccurrence_edges(spark, sf_dir).collect():
        adj[r["s1"]].append(r["s2"])
        adj[r["s2"]].append(r["s1"])
        nodes.update((r["s1"], r["s2"]))
    p = {v: 1 for v in nodes}
    katz = {v: 0 for v in nodes}
    for k in range(1, _KATZ_ROUNDS + 1):
        nxt = defaultdict(int)
        for u, c in p.items():
            for v in adj[u]:
                nxt[v] += c
        p = dict(nxt)
        w = 1 << (_KATZ_ROUNDS - k)
        for v, c in p.items():
            katz[v] += c * w
    got = {
        r["node"]: (r["katz_q"], r["katz"])
        for r in graph_katz_centrality(spark, sf_dir).collect()
    }
    want = {v: (q, q / float(1 << _KATZ_ROUNDS)) for v, q in katz.items()}
    assert got == want
    spark.catalog.clearCache()


# --------------------------------------------------- holdout leakage


def test_holdout_leakage_counts_cross_pairs(spark, sf_dir):
    """n_cross_split recomputed from the minhash pair list and the md5
    split predicate in python must match exactly."""
    import hashlib

    from hadoop_spark_pspd_spark.operators.dedup import dedup_minhash_lsh
    from hadoop_spark_pspd_spark.operators.ml_data import (
        _LEAK_TRAIN, ml_holdout_leakage,
    )

    def is_train(doc_id: int) -> bool:
        return (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
            < _LEAK_TRAIN
        )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    ]
    cross = sum(1 for a, b in pairs if is_train(a) != is_train(b))
    r = ml_holdout_leakage(spark, sf_dir).collect()[0]
    assert r["n_pairs"] == len(pairs)
    assert r["n_cross_split"] == cross
    assert r["leak_frac"] == cross / max(len(pairs), 1)
    spark.catalog.clearCache()


# ----------------------------------------------------- PQ recall


def test_pq_recall_consistent_with_components(spark, sf_dir):
    """recall_at_k must equal the overlap of sim_ann_pq's emitted set
    with the exact cosine top-k, per query, and every query must
    appear exactly once."""
    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.similarity import (
        N_QUERIES, TOP_K, cosine_topk, sim_ann_pq, sim_pq_recall,
    )
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    pq = {
        (r["query_id"], r["candidate_id"])
        for r in sim_ann_pq(spark, sf_dir).collect()
    }
    queries = t.embeddings.filter(F.col("vec_id") < N_QUERIES)
    exact = {
        (r["query_id"], r["candidate_id"])
        for r in cosine_topk(queries, t.embeddings, TOP_K).collect()
    }
    got = {r["query_id"]: r for r in sim_pq_recall(spark, sf_dir).collect()}
    assert len(got) == N_QUERIES
    for q, r in got.items():
        mine = {c for (qq, c) in pq if qq == q}
        truth = {c for (qq, c) in exact if qq == q}
        assert r["n_overlap"] == len(mine & truth)
        assert r["recall_at_k"] == len(mine & truth) / TOP_K
    spark.catalog.clearCache()


# ---------------------------------------------- seasonal anomaly


def test_seasonal_anomaly_planted_spike(spark, tmp_path):
    """A weekly-repeating series with one planted spike: the spike hour
    must be the ONLY flagged hour, its residual must equal the planted
    deviation, and the MAD of an otherwise perfectly repeating series
    is 0 (guarded to 1)."""
    import datetime as dt

    from hadoop_spark_pspd_spark.operators.timeseries import (
        _BT_LAG_H, ts_anomaly_seasonal,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for h in range(2 * _BT_LAG_H):
        n = (h % 24) // 8 + 1 + (30 if h == 200 else 0)
        for _ in range(n):
            rows.append(
                (eid, t0 + dt.timedelta(hours=h), 1, "click", 1.0, "{}")
            )
            eid += 1
    sf = str(tmp_path / "anom")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r["hour"]: r for r in ts_anomaly_seasonal(spark, sf).collect()
    }
    flagged = [h for h, r in got.items() if r["flagged"]]
    spike_hour = t0 + dt.timedelta(hours=200)
    # hour 200 deviates +30 from last week; its echo at hour 368 is
    # beyond the 336-hour series, so the spike is the ONLY flag
    assert flagged == [spike_hour]
    assert got[spike_hour]["resid"] == 30
    assert got[spike_hour]["mad"] == 0  # all other residuals are 0


# ------------------------------------------------------ qini curve


def test_qini_python_replay(spark, sf_dir):
    """The full curve recomputed in python (same quantized score, same
    unique-order deciles, same cross-multiplied cumulative form) must
    match bit-for-bit; the final decile's qini_num telescopes to the
    full-population treated/control contrast."""
    import datetime as dt
    from decimal import Decimal

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.stats import ml_qini_curve

    t = Tables(spark, sf_dir)
    cut = dt.date(1995, 1, 1)
    agg = {}
    for r in t.customer.select("c_custkey").collect():
        agg[r["c_custkey"]] = [Decimal(0), 0]
    for r in t.orders.select(
        "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    ).collect():
        od = r["o_orderdate"]
        if isinstance(od, dt.datetime):
            od = od.date()
        a = agg[r["o_custkey"]]
        if od < cut:
            a[0] += Decimal(str(r["o_totalprice"]))
        elif r["o_orderpriority"] == "1-URGENT":
            a[1] = 1
    units = sorted(
        (-int(x * 10000), ck, ck % 2, pos)
        for ck, (x, pos) in agg.items()
    )
    n = len(units)
    want = {}
    cn_t = cn_c = cpos_t = cpos_c = 0
    for d in range(1, 11):
        lo = (d - 1) * n // 10 + min(d - 1, n % 10)
        hi = d * n // 10 + min(d, n % 10)
        for _, _, tr, pos in units[lo:hi]:
            if tr == 1:
                cn_t += 1
                cpos_t += pos
            else:
                cn_c += 1
                cpos_c += pos
        num = cpos_t * cn_c - cpos_c * cn_t
        want[d] = (
            cn_t, cn_c, cpos_t, cpos_c, num,
            num / (cn_c if cn_c else 1),
        )
    got = {
        r["decile"]: (
            r["cn_t"], r["cn_c"], r["cpos_t"], r["cpos_c"],
            r["qini_num"], r["qini"],
        )
        for r in ml_qini_curve(spark, sf_dir).collect()
    }
    assert got == want


# ----------------------------------------------------- load profile


def test_load_profile_python_reference(spark, sf_dir):
    """Per-(dow, hod) discrete percentiles recomputed in python must
    match, using the same Sunday-first 0-6 day convention."""
    import math
    from collections import Counter, defaultdict

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.timeseries import (
        ts_load_profile,
    )

    t = Tables(spark, sf_dir)
    hourly = Counter()
    for r in t.events.select("ts").collect():
        ts = r["ts"]
        hourly[ts.replace(minute=0, second=0, microsecond=0)] += 1
    buckets = defaultdict(list)
    for h, n in hourly.items():
        dow = (h.weekday() + 1) % 7  # python Monday=0 -> Sunday-first 0
        buckets[(dow, h.hour)].append(n)

    def disc(vals, q):
        s = sorted(vals)
        return s[max(0, math.ceil(q * len(s)) - 1)]

    got = {
        (r["dow"], r["hod"]): (
            r["n_samples"], r["p50"], r["p95"], r["peak"]
        )
        for r in ts_load_profile(spark, sf_dir).collect()
    }
    want = {
        k: (len(v), disc(v, 0.5), disc(v, 0.95), max(v))
        for k, v in buckets.items()
    }
    assert got == want


# ------------------------------------------------- video near-dup


def test_video_neardup_planted_trim(spark, tmp_path):
    """A video and its trimmed copy (10% of frames cut) must pair with
    the expected Jaccard; unrelated videos must not pair."""
    import hashlib

    from hadoop_spark_pspd_spark.operators.multimodal import (
        SHOT_FRAME, mm_video_neardup,
    )

    # build 'frames' with distinct content so signatures are unique
    def frames(seed, k):
        out = []
        for i in range(k):
            h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
            out.append((h * 5)[:SHOT_FRAME])
        return out

    f1 = frames("vidA", 40)
    full = "".join(f1)                     # 40 frames
    trimmed = "".join(f1[4:])              # 36 frames, all shared
    other = "".join(frames("vidB", 40))
    sf = str(tmp_path / "vids")
    spark.createDataFrame(
        [(1, full, "en", "web", len(full)),
         (2, trimmed, "en", "web", len(trimmed)),
         (3, other, "en", "web", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in mm_video_neardup(spark, sf).collect()
    }
    # signatures may collide across distinct frames (256-byte sums),
    # so bound rather than pin: the trim pair must be present and high
    assert (1, 2) in pairs
    assert pairs[(1, 2)] >= 0.8
    assert (1, 3) not in pairs and (2, 3) not in pairs


# ------------------------------------------- group-sequential test


def test_group_sequential_cumulative_and_boundaries(spark, sf_dir):
    """Look counts must be cumulative (monotone), z must replay from
    the counts via the fixed op sequence, and crossed must equal the
    integer-boundary comparison."""
    import math

    from hadoop_spark_pspd_spark.operators.stats import (
        _GS_BOUNDS, ml_group_sequential,
    )

    rows = sorted(
        ml_group_sequential(spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == list(range(1, len(_GS_BOUNDS) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_a"] >= prev["n_a"] and cur["n_b"] >= prev["n_b"]
        assert cur["c_a"] >= prev["c_a"] and cur["c_b"] >= prev["c_b"]
    for r in rows:
        na, nb = float(r["n_a"]), float(r["n_b"])
        pooled = float(r["c_a"] + r["c_b"]) / float(r["n_a"] + r["n_b"])
        gap = r["c_a"] / na - r["c_b"] / nb
        se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb))
        z = 0.0 if se == 0 else gap / se
        assert r["z"] == z
        assert r["crossed"] == (abs(z) > _GS_BOUNDS[r["k"] - 1])


# --------------------------------------------------- audio SNR


def test_audio_snr_crafted_payload(spark, tmp_path):
    """A payload of known silence and loud windows: SNR must equal the
    exact cross-multiplied energy ratio, and energy splits must
    replay."""
    from hadoop_spark_pspd_spark.operators.multimodal import (
        AUDIO_WIN, mm_audio_snr,
    )

    silence = "\x7e" * AUDIO_WIN            # |s| = 2 per sample
    loud = "\x21" * AUDIO_WIN               # |s| = 95 per sample
    d0 = silence * 6 + loud * 2             # 8 windows, 2 active
    sf = str(tmp_path / "snr")
    spark.createDataFrame(
        [(1, d0, "en", "web", len(d0))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    r = mm_audio_snr(spark, sf).collect()[0]
    e_sil = AUDIO_WIN * 4          # (126-128)^2 = 4 per sample
    e_loud = AUDIO_WIN * 95 * 95   # (33-128)^2 = 9025
    assert (r["n_sig"], r["n_noise"]) == (2, 6)
    assert r["sig_energy"] == 2 * e_loud
    assert r["noise_energy"] == 6 * e_sil
    assert r["snr"] == (2 * e_loud * 6) / (6 * e_sil * 2)


# ------------------------------------------------------ cohort LTV


def test_cohort_ltv_python_replay(spark, sf_dir):
    """The full (cohort, age) grid recomputed with Decimal sums in
    python must match exactly, and LTV must be non-decreasing in age
    within every cohort."""
    import datetime as dt
    from collections import defaultdict
    from decimal import Decimal

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.ml_data import ml_cohort_ltv

    t = Tables(spark, sf_dir)
    orders = []
    for r in t.orders.select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect():
        od = r["o_orderdate"]
        if isinstance(od, dt.datetime):
            od = od.date()
        orders.append((r["o_custkey"], od, Decimal(str(r["o_totalprice"]))))
    first = {}
    for ck, od, _ in orders:
        m = od.replace(day=1)
        if ck not in first or m < first[ck]:
            first[ck] = m
    sizes = defaultdict(int)
    for m in first.values():
        sizes[m] += 1
    rev = defaultdict(Decimal)
    for ck, od, p in orders:
        c = first[ck]
        age = (od.year - c.year) * 12 + (od.month - c.month)
        rev[(c, age)] += p
    want = {}
    for c in sizes:
        cum = 0
        for age in sorted(a for (cc, a) in rev if cc == c):
            cum += int(rev[(c, age)] * 10000)
            want[(c, age)] = (
                sizes[c], cum, cum / sizes[c] / 10000.0
            )
    got = {
        (r["cohort"], r["age"]): (
            r["n_customers"], r["cum_rev_q"], r["ltv_per_customer"]
        )
        for r in ml_cohort_ltv(spark, sf_dir).collect()
    }
    assert got == want
    by_cohort = defaultdict(list)
    for (c, age), (_, _, ltv) in sorted(got.items()):
        by_cohort[c].append(ltv)
    for vals in by_cohort.values():
        assert vals == sorted(vals)
