"""Independent Python replays for wave 56 (round 12).

Each test recomputes the query's semantics from the raw parquet with
plain Python/numpy (no SQL on either engine), so correctness evidence
is triangulated: Spark vs DuckDB (tools/parity.py) vs this replay.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck():
    return duckdb.connect()


def _events(cols="event_id, epoch(ts) AS es, user_id, event_type, value"):
    return _duck().execute(
        f"SELECT {cols} FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()


def _round6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def test_sign_test_cells(spark, sf_dir):
    """Recompute the hourly click/view cents pairs and the three sign
    cells row-by-row in Python."""
    hours = defaultdict(lambda: [0, 0])
    for _, es, _, et, v in _events():
        if et not in ("click", "view"):
            continue
        cents = int(Decimal(repr(v * 100)).quantize(0, ROUND_HALF_UP))
        hours[math.floor(es / 3600)][0 if et == "click" else 1] += cents
    pos = sum(1 for x, y in hours.values() if x > y)
    neg = sum(1 for x, y in hours.values() if x < y)
    tie = sum(1 for x, y in hours.values() if x == y)
    row = REGISTRY["stat_sign_test"].fn(spark, sf_dir).collect()[0]
    assert (row["n_pos"], row["n_neg"], row["n_tie"]) == (pos, neg, tie)
    assert row["s_stat"] == min(pos, neg)
    n = pos + neg
    z = (max(pos, neg) - n / 2.0 - 0.5) / math.sqrt(n / 4.0)
    assert abs(row["z"] - z) < 1e-6


def test_diversity_profile_replay(spark, sf_dir):
    """Shannon/Simpson/Pielou per type from raw per-user counts."""
    counts = defaultdict(lambda: defaultdict(int))
    for _, _, uid, et, _ in _events():
        counts[et][uid] += 1
    out = {
        r["event_type"]: r
        for r in REGISTRY["agg_diversity_profile"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(counts)
    for et, cu in counts.items():
        cs = list(cu.values())
        n, s = sum(cs), len(cs)
        r = out[et]
        assert (r["n_events"], r["n_species"]) == (n, s)
        h = math.log(n) - sum(c * math.log(c) for c in cs) / n
        assert abs(r["shannon"] - max(0.0, h)) < 1e-5
        if n > 1:
            simpson = sum(c * (c - 1) for c in cs) / (n * (n - 1))
            assert abs(r["simpson"] - simpson) < 1e-6
        if s > 1:
            assert abs(r["pielou"] - max(0.0, h) / math.log(s)) < 1e-5


def test_odds_ratio_replay(spark, sf_dir):
    a = b = c = d = 0
    for _, _, uid, et, _ in _events():
        if uid % 2 == 0:
            if et == "error":
                a += 1
            else:
                b += 1
        elif et == "error":
            c += 1
        else:
            d += 1
    r = REGISTRY["stat_odds_ratio"].fn(spark, sf_dir).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(r["odds_ratio"] - orr) < 1e-6
    assert abs(r["risk_ratio"] - (a / (a + b)) / (c / (c + d))) < 1e-6
    assert abs(r["ci_lo"] - math.exp(math.log(orr) - 1.96 * se)) < 1e-5
    assert abs(r["ci_hi"] - math.exp(math.log(orr) + 1.96 * se)) < 1e-5


def test_mcc_confusion_replay(spark, sf_dir):
    tp = fp = fn = tn = 0
    for _, _, _, et, v in _events():
        cents = int(Decimal(repr(v * 100)).quantize(0, ROUND_HALF_UP))
        pred, act = cents >= 10000, et == "click"
        if act and pred:
            tp += 1
        elif pred:
            fp += 1
        elif act:
            fn += 1
        else:
            tn += 1
    r = REGISTRY["ml_mcc_confusion"].fn(spark, sf_dir).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(r["mcc"] - mcc) < 1e-6
    assert abs(r["f1"] - 2 * tp / (2 * tp + fp + fn)) < 1e-6
    assert abs(
        r["balanced_acc"] - (tp / (tp + fn) + tn / (tn + fp)) / 2
    ) < 1e-6


def test_burstiness_fano_replay(spark, sf_dir):
    per_user = defaultdict(list)
    minutes = defaultdict(int)
    for eid, es, uid, _, _ in _events():
        per_user[uid].append((es, eid))
        minutes[math.floor(es / 60)] += 1
    gaps = []
    for rows in per_user.values():
        rows.sort()
        secs = [math.floor(es) for es, _ in rows]
        gaps.extend(b - a for a, b in zip(secs, secs[1:]))
    ng = len(gaps)
    mu = sum(gaps) / ng
    sigma = math.sqrt(sum(g * g for g in gaps) / ng - mu * mu)
    cs = list(minutes.values())
    nm = len(cs)
    cmu = sum(cs) / nm
    fano = (sum(c * c for c in cs) / nm - cmu * cmu) / cmu
    r = REGISTRY["events_burstiness_fano"].fn(spark, sf_dir).collect()[0]
    assert r["n_gaps"] == ng and r["n_minutes"] == nm
    assert abs(r["burstiness"] - (sigma - mu) / (sigma + mu)) < 1e-6
    assert abs(r["fano"] - fano) < 1e-4


def test_mantel_haenszel_replay(spark, sf_dir):
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for _, _, uid, et, v in _events():
        cents = int(Decimal(repr(v * 100)).quantize(0, ROUND_HALF_UP))
        i = (0 if uid % 2 == 0 else 2) + (0 if cents >= 10000 else 1)
        cells[et][i] += 1
    sr = ss = se = sv = sa = 0.0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        if n <= 1:
            continue
        sa += a
        sr += round(a * d / n, 6)
        ss += round(b * c / n, 6)
        se += round((a + b) * (a + c) / n, 6)
        sv += round(
            (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)), 6
        )
    r = REGISTRY["stat_mantel_haenszel"].fn(spark, sf_dir).collect()[0]
    assert r["n_strata"] == len(cells)
    assert abs(r["or_mh"] - sr / ss) < 1e-5
    chi2 = (abs(sa - se) - 0.5) ** 2 / sv
    assert abs(r["cmh_chi2"] - chi2) < 1e-4


def test_allan_variance_replay(spark, sf_dir):
    hourly = defaultdict(int)
    for _, es, _, _, v in _events():
        cents = int(Decimal(repr(v * 100)).quantize(0, ROUND_HALF_UP))
        hourly[math.floor(es / 3600)] += cents
    y = [hourly[h] for h in sorted(hourly)]
    n = len(y)
    rows = {
        r["tau"]: r
        for r in REGISTRY["ts_allan_variance"].fn(spark, sf_dir).collect()
    }
    for tau in (1, 2, 4):
        spans = [sum(y[i : i + tau]) for i in range(n - tau + 1)]
        dd = [
            spans[i + tau] - spans[i] for i in range(n - 2 * tau + 1)
        ]
        m = len(dd)
        # dollars, not cents: at sf5 the cents^2 avar (~4e9) exceeds
        # the round-6 representable magnitude (r12 sf5 sweep catch)
        avar = sum(
            round((float(d) / 100.0) * (float(d) / 100.0), 6) for d in dd
        ) / (2.0 * tau * tau * m)
        r = rows[tau]
        assert r["m_windows"] == m
        assert abs(r["avar"] - avar) < max(1e-6, abs(avar) * 1e-9)
        assert abs(r["adev"] - math.sqrt(avar)) < max(
            1e-6, math.sqrt(avar) * 1e-9
        )


def test_jackknife_ratio_replay(spark, sf_dir):
    rows = _duck().execute(
        f"SELECT round(l_extendedprice * 100, 0)::BIGINT,"
        f" round(l_quantity, 0)::BIGINT"
        f" FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    pseudo = [
        (sx - x) / (sy - y) for x, y in rows if sy - y > 0
    ]
    # engines quantize each pseudo-term to DECIMAL(38,6) HALF_UP and
    # sum EXACTLY; a float sum here loses enough precision to move the
    # cancellation-heavy variance, so replay with exact Decimals too
    six = Decimal("0.000001")
    q1 = float(
        sum(Decimal(repr(p)).quantize(six, ROUND_HALF_UP) for p in pseudo)
    )
    q2 = float(
        sum(
            Decimal(repr(p * p)).quantize(six, ROUND_HALF_UP)
            for p in pseudo
        )
    )
    np_ = len(pseudo)
    var = ((np_ - 1) / np_) * (q2 - q1 * q1 / np_)
    r = REGISTRY["stat_jackknife_ratio"].fn(spark, sf_dir).collect()[0]
    assert r["n_rows"] == len(rows)
    assert abs(r["ratio"] - sx / sy) < 1e-6
    assert abs(r["jk_se"] - math.sqrt(max(0.0, var))) < 1e-5


def test_stream_session_ewma_matches_batch_fold(spark, sf_dir):
    """Replay the gap-30-min sessionization and the zero-seeded
    alpha=0.125 fold in Python; every finalized streaming session must
    match, and the streaming row set must be exactly the finalized
    subset."""
    per_user = defaultdict(list)
    horizon = -1.0
    for eid, es, uid, _, v in _events():
        per_user[uid].append((es, eid, v))
        horizon = max(horizon, es)
    horizon = math.floor(horizon) - 660
    want = {}
    for uid, rows in per_user.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        sess = []
        last = None
        for es, eid, v in rows:
            if last is None or es - last >= 1800:
                sess.append([])
            sess[-1].append((es, eid, v))
            last = es
        for sr in sess:
            start = math.floor(sr[0][0])
            end = math.floor(sr[-1][0]) + 1800
            if end > horizon:
                continue
            e = 0.0
            for _, _, v in sr:
                e = 0.875 * e + 0.125 * v
            want[(uid, start, end)] = (len(sr), e)
    got = REGISTRY["stream_session_ewma"].fn(spark, sf_dir).collect()
    got_keys = {
        (r["user_id"], r["session_start"], r["session_end"]) for r in got
    }
    assert got_keys == set(want)
    for r in got:
        n, e = want[(r["user_id"], r["session_start"], r["session_end"])]
        assert r["n_events"] == n
        assert abs(r["ewma"] - e) < 1e-9
