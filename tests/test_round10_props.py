"""Round-10 absolute ground-truth recomputes: each new operator's
result re-derived in pandas/numpy straight off the parquet — the
guard the cross-engine hash gate cannot provide (shared-bug escapes:
r6 HLL halving, r8 VaR boundary)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR
import pytest

# r11 (VERDICT #2): deep recompute / e2e tier — deselected from the
# driver's default pytest path; round close runs `pytest -m ""`.
pytestmark = pytest.mark.slow


def _pq(table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{table}.parquet")


class TestDDSketch:
    def test_relative_error_guarantee_vs_exact(self, spark, sf_dir):
        """The whole point of DDSketch: every emitted quantile is
        within γ-relative error (2% + bucket-rounding slack) of the
        EXACT order statistic."""
        from bireme_spark.queries.events import events_ddsketch_quantiles

        rows = {r.event_type: r for r in events_ddsketch_quantiles(spark, sf_dir).collect()}
        ev = _pq("events")
        for etype, g in ev.groupby("event_type"):
            vals = np.sort(g["value"].to_numpy())
            n = len(vals)
            r = rows[etype]
            assert r.n == n
            for q, est in ((50, r.p50_est), (90, r.p90_est), (95, r.p95_est), (99, r.p99_est)):
                pos = (n * q + 99) // 100  # ceil-rank order statistic
                exact = vals[pos - 1]
                if exact <= 0:
                    assert est == 0.0
                else:
                    rel = abs(est - exact) / exact
                    assert rel <= 0.0105, (etype, q, est, exact, rel)

    def test_bucket_count_is_log_bounded(self, spark, sf_dir):
        """Sketch memory: bucket count ≤ log_γ(max/min_positive) + 2
        (+1 for the zero bucket) — the O(log range) guarantee that
        makes the sketch safe at any corpus size."""
        from bireme_spark.queries.events import events_ddsketch_quantiles

        ev = _pq("events")
        rows = events_ddsketch_quantiles(spark, sf_dir).collect()
        for r in rows:
            g = ev[ev["event_type"] == r.event_type]["value"]
            pos = g[g > 0]
            bound = np.log(pos.max() / pos.min()) / np.log(1.02) + 3
            assert r.n_buckets <= bound, (r.event_type, r.n_buckets, bound)


class TestFriedman:
    def test_q_matches_numpy_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_friedman_test

        out = orders_friedman_test(spark, sf_dir).collect()[0]
        o = _pq("orders")
        o["block"] = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
        o["cents"] = (
            o["o_totalprice"].astype("float64").round(2) * 100
        ).round().astype("int64")
        cells = (
            o.groupby(["block", "o_orderpriority"])["cents"]
            .agg(["sum", "count"])
            .reset_index()
        )
        complete = cells.groupby("block").filter(lambda g: len(g) == 5)
        complete["metric"] = complete["sum"].astype("float64") / complete["count"]
        complete = complete.sort_values(["block", "metric", "o_orderpriority"])
        complete["r"] = complete.groupby("block").cumcount() + 1
        rj = complete.groupby("o_orderpriority")["r"].sum()
        n, k = complete["block"].nunique(), 5
        sum_rj2 = int((rj**2).sum())
        q_ppm = 12 * sum_rj2 * 1_000_000 // (n * k * (k + 1)) - 3_000_000 * n * (k + 1)
        assert out.n_blocks == n and out.k == k
        assert out.sum_rj2 == sum_rj2
        assert out.q_ppm == q_ppm
        assert out.q_ppm >= 0  # Q is a nonneg chi-square statistic

    def test_null_blocks_give_zero_q(self, spark):
        """Sanity on the statistic itself: identical cell metrics in
        every block → all rank sums equal → Q == 0 exactly."""
        n, k = 6, 5
        rj = [n * (k + 1) / 2] * k  # equal rank sums
        sum_rj2 = sum(int(r) ** 2 for r in rj)
        q_ppm = 12 * sum_rj2 * 1_000_000 // (n * k * (k + 1)) - 3_000_000 * n * (k + 1)
        assert q_ppm == 0


class TestHeartbeat:
    def test_silence_and_gaps_match_pandas(self, spark, sf_dir):
        from bireme_spark.queries.cdc import cdc_heartbeat_monitor

        rows = {r.kafka_partition: r for r in cdc_heartbeat_monitor(spark, sf_dir).collect()}
        o = _pq("orders")
        base = (
            o["o_orderdate"].astype("datetime64[ns]").astype("int64") // 1_000_000
        ).astype("int64")  # ms (parquet µs arrives as datetime64[us] on pandas 2.x)
        frames = [
            pd.DataFrame(
                {
                    "part": (o["o_orderkey"] % 8).astype(int),
                    "ms": base + shift * 86_400_000,
                    "seq": o["o_orderkey"] * 10 + tag,
                }
            )[mask]
            for shift, tag, mask in (
                (0, 1, np.ones(len(o), dtype=bool)),
                (1, 2, (o["o_orderkey"] % 3 == 0).to_numpy()),
                (2, 3, (o["o_orderkey"] % 5 == 0).to_numpy()),
            )
        ]
        ch = pd.concat(frames).sort_values(["part", "ms", "seq"])
        feed_max = ch["ms"].max()
        for part, g in ch.groupby("part"):
            gaps = g["ms"].diff().dropna()
            r = rows[part]
            assert r.n_msgs == len(g)
            assert r.last_ms == g["ms"].max()
            assert r.silence_ms == feed_max - g["ms"].max()
            assert r.max_gap_ms == int(gaps.max())
            avg = int(gaps.sum()) // max(len(g) - 1, 1)
            assert r.avg_gap_ms == avg
            assert bool(r.stalled) == (feed_max - g["ms"].max() > 3 * avg)


class TestSpectralEntropy:
    def test_matches_numpy_periodogram_entropy(self, spark, sf_dir):
        """Recompute from raw parquet with numpy FFT-free trig: the
        engine result must match the float recompute to ~1e-3 (the
        e3 power quantization) and sit in (0, 1] normalized."""
        from bireme_spark.queries.timeseries import events_spectral_entropy

        r = events_spectral_entropy(spark, sf_dir).collect()[0]
        ev = _pq("events")
        hours = ev["ts"].astype("datetime64[ns]").dt.floor("h")
        c = hours.value_counts().sort_index().to_numpy().astype(float)
        n = len(c)
        assert r.n_hours == n
        dev = c - c.mean()
        t = np.arange(n)
        m = min(n // 2, 256)
        P = np.array(
            [
                (dev * np.cos(2 * np.pi * k * t / n)).sum() ** 2
                + (dev * np.sin(2 * np.pi * k * t / n)).sum() ** 2
                for k in range(1, m + 1)
            ]
        )
        P = P[P > 1e-3]
        p = P / P.sum()
        H = float(-(p * np.log(p)).sum())
        assert abs(r.entropy - H) < 1e-3, (r.entropy, H)
        assert 0 < r.entropy_norm <= 1.0 + 1e-9

    def test_pure_cycle_has_low_entropy_property(self):
        """Statistic sanity: a single-frequency signal concentrates
        all power → normalized entropy ~0; uniform power → 1."""
        conc = np.zeros(16)
        conc[3] = 1.0
        p = conc / conc.sum()
        nz = p[p > 0]
        assert -(nz * np.log(nz)).sum() == 0.0
        flat = np.full(16, 1 / 16)
        assert abs(-(flat * np.log(flat)).sum() / np.log(16) - 1.0) < 1e-12


class TestWaveletHaar:
    def test_energy_matches_numpy_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_wavelet_haar

        rows = {r.level: r for r in events_wavelet_haar(spark, sf_dir).collect()}
        ev = _pq("events")
        hours = ev["ts"].astype("datetime64[ns]").dt.floor("h")
        c = hours.value_counts().sort_index().to_numpy().astype(np.int64)
        n = (len(c) // 64) * 64
        c = c[:n]
        total = 0
        expected = {}
        for j in range(1, 7):
            blocks = c.reshape(-1, 2 ** (j - 1)).sum(axis=1)
            d = blocks[0::2] - blocks[1::2]
            expected[j] = (len(d), int((d.astype(object) ** 2).sum()))
            total += expected[j][1]
        for j in range(1, 7):
            np_pairs, np_energy = expected[j]
            assert rows[j].n_pairs == np_pairs
            assert rows[j].energy == np_energy
            assert rows[j].share_ppm == np_energy * 1_000_000 // max(total, 1)

    def test_parseval_partition(self, spark, sf_dir):
        """Haar detail energies are an orthogonal partition: total
        weighted detail energy + coarsest approximation energy equals
        the raw signal energy (Parseval for the unnormalized
        transform: Σ_j E_j/2^j + A_L²-term)."""
        ev = _pq("events")
        hours = ev["ts"].astype("datetime64[ns]").dt.floor("h")
        c = hours.value_counts().sort_index().to_numpy().astype(np.int64)
        n = (len(c) // 64) * 64
        c = c[:n].astype(float)
        total = float((c**2).sum())
        acc = 0.0
        for j in range(1, 7):
            blocks = c.reshape(-1, 2 ** (j - 1)).sum(axis=1)
            d = blocks[0::2] - blocks[1::2]
            acc += float((d**2).sum()) / 2**j
        approx = c.reshape(-1, 64).sum(axis=1)
        acc += float((approx**2).sum()) / 64
        assert abs(acc - total) / total < 1e-9


class TestKalmanLevel:
    def test_matches_python_recompute_and_sanity(self, spark, sf_dir):
        from decimal import ROUND_HALF_UP, Decimal
        import math

        from bireme_spark.queries.timeseries import orders_kalman_level

        r = orders_kalman_level(spark, sf_dir).collect()[0]
        o = _pq("orders")
        monthly = (
            o.assign(m=o["o_orderdate"].astype("datetime64[ns]").dt.to_period("M"))
            .groupby("m")
            .size()
            .sort_index()
        )
        q6 = Decimal("1e-6")
        ys = [Decimal(int(v)) for v in monthly]
        level, p, k = ys[0], Decimal(1000), Decimal(0)
        for y in ys[1:]:
            p_pred = p + 25
            k_e6 = int(math.floor(float(p_pred) / (float(p_pred) + 400.0) * 1_000_000))
            k = Decimal(k_e6).scaleb(-6)
            level = (level + k * (y - level)).quantize(q6, ROUND_HALF_UP)
            p = ((Decimal(1) - k) * p_pred).quantize(q6, ROUND_HALF_UP)
        assert r.n_months == len(ys)
        assert r.level == float(level)
        assert r.p_var == float(p)
        assert r.gain == float(k)
        # steady state of the PREDICTED variance: P- = (1-K)P- + Q
        # with K = P-/(P-+R) -> P- = (Q + sqrt(Q^2 + 4QR))/2,
        # K* = P-/(P- + R)
        pstar = (25 + math.sqrt(25**2 + 4 * 25 * 400)) / 2
        kstar = pstar / (pstar + 400)
        assert abs(float(k) - kstar) < 0.01, (float(k), kstar)


class TestWordPiece:
    def test_scores_match_python_recompute(self, spark, sf_dir):
        """Round-1 candidates re-derived in pure python: char-split
        words, pair + unigram counts, likelihood score ppt."""
        from collections import Counter

        from bireme_spark.queries.terms import tokenizer_wordpiece_train

        rows = [r for r in tokenizer_wordpiece_train(spark, sf_dir).collect() if r.rnd == 1]
        docs = _pq("documents")
        wc = Counter()
        for text in docs["text"]:
            for w in text.split(" "):
                if w:
                    wc[w] += 1
        uni, pairs = Counter(), Counter()
        for w, c in wc.items():
            for ch in w:
                uni[ch] += c
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += c
        scored = sorted(
            (
                (-(cnt * 10**12 // (uni[a] * uni[b])), f"{a} {b}", cnt)
                for (a, b), cnt in pairs.items()
            )
        )[:10]
        for r, (neg_score, pair, cnt) in zip(sorted(rows, key=lambda r: r.rnk), scored):
            assert r.pair == pair
            assert r.cnt == cnt
            assert r.score_ppt == -neg_score

    def test_likelihood_beats_frequency_selection(self, spark, sf_dir):
        """The point of WordPiece vs BPE: the top likelihood pick need
        not be the top frequency pick — and the score ordering must be
        genuinely different from the count ordering on this corpus
        (if they coincide the query is indistinguishable from BPE)."""
        from bireme_spark.queries.terms import tokenizer_wordpiece_train

        rows = [r for r in tokenizer_wordpiece_train(spark, sf_dir).collect() if r.rnd == 1]
        by_score = [r.pair for r in sorted(rows, key=lambda r: r.rnk)]
        by_count = [r.pair for r in sorted(rows, key=lambda r: (-r.cnt, r.pair))]
        assert by_score != by_count


class TestCointegration:
    def test_matches_numpy_two_stage_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_cointegration_test

        r = events_cointegration_test(spark, sf_dir).collect()[0]
        ev = _pq("events")
        ev["hour"] = ev["ts"].astype("datetime64[ns]").dt.floor("h")
        x = ev[ev["event_type"] == "click"].groupby("hour").size()
        y = ev[ev["event_type"] == "view"].groupby("hour").size()
        s = pd.concat([x.rename("x"), y.rename("y")], axis=1, join="inner").sort_index()
        n = len(s)
        assert r.n_hours == n
        sx, sy = int(s.x.sum()), int(s.y.sum())
        sxy, sxx = int((s.x * s.y).sum()), int((s.x * s.x).sum())
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        u = (s.y - a - b * s.x).to_numpy()
        ul, du = u[:-1], np.diff(u)
        rho = (ul * du).sum() / (ul * ul).sum()
        e = du - rho * ul
        se = np.sqrt((e @ e) / (len(du) - 1) / (ul @ ul))
        assert abs(r.beta - b) < 1e-5
        assert abs(r.rho - rho) < 1e-4
        assert abs(r.adf_t - rho / se) < 1e-2
        assert bool(r.cointegrated_5pct) == (rho / se < -3.34)

    def test_stationary_residual_is_detected(self):
        """Statistic sanity on planted data: y = 2x + stationary noise
        → residual is white → rho ≈ −1 → hugely negative ADF t."""
        rng = np.random.RandomState(7)
        x = np.cumsum(rng.randn(500))  # a random walk
        u = rng.randn(500)  # stationary residual
        ul, du = u[:-1], np.diff(u)
        rho = (ul * du).sum() / (ul * ul).sum()
        e = du - rho * ul
        se = np.sqrt((e @ e) / (len(du) - 1) / (ul @ ul))
        assert rho / se < -3.34  # cointegration detected
        # and the random walk ITSELF is not stationary:
        ul2, du2 = x[:-1], np.diff(x)
        rho2 = (ul2 * du2).sum() / (ul2 * ul2).sum()
        e2 = du2 - rho2 * ul2
        se2 = np.sqrt((e2 @ e2) / (len(du2) - 1) / (ul2 @ ul2))
        assert rho2 / se2 > -3.34


class TestErlangStaffing:
    def test_matches_scipy_free_erlang_c(self, spark, sf_dir):
        """c* re-derived with exact python floats (math.factorial
        exact → float): the engine's c* must match, and its Erlang-C
        at c* must agree to the e6-quantization tolerance."""
        import math

        from bireme_spark.queries.relational import orders_erlang_staffing

        r = orders_erlang_staffing(spark, sf_dir).collect()[0]
        o = _pq("orders")
        lam = int(o.groupby(o["o_orderdate"].astype("datetime64[ns]").dt.date).size().max())
        mu = max(lam // 20, 1)
        a = lam / mu
        assert r.lambda_peak == lam and r.mu == mu

        def erlang_c(c: int) -> float:
            top = (a**c / math.factorial(c)) * (c / (c - a))
            s = sum(a**k / math.factorial(k) for k in range(c))
            return top / (s + top)

        c_star = next(c for c in range(int(a) + 1, 81) if erlang_c(c) <= 0.2)
        assert r.c_star == c_star
        assert abs(r.erlang_c_ppm / 1e6 - erlang_c(c_star)) < 1e-3
        # monotone sanity: one agent fewer must miss the target
        assert erlang_c(c_star - 1) > 0.2 or c_star == int(a) + 1


class TestGraphSCC:
    def test_peeling_matches_tarjan_on_the_fixture(self, spark, sf_dir):
        """Every SCC the peeling round CLAIMS must be a real SCC under
        an exact Tarjan-style recompute, and its size must match; the
        peeling round's assigned set is exactly the Tarjan SCCs that
        contain their own min-ancestor/min-descendant witness within
        6 hops (on this fixture: all claimed ones)."""
        from bireme_spark.queries.audit import graph_scc

        rows = graph_scc(spark, sf_dir).collect()
        li = _pq("lineitem")
        li = li[li["l_orderkey"] % 40 == 0][["l_orderkey", "l_partkey"]].drop_duplicates()
        edges = set()
        for _, g in li.groupby("l_orderkey"):
            pks = sorted(g["l_partkey"])
            for u, v in zip(pks, pks[1:]):
                if u != v:
                    edges.add((u, v))
                    if (u + v) % 2 == 0:
                        edges.add((v, u))
        # iterative Tarjan (recursion-free) for exact SCCs
        from collections import defaultdict

        adj = defaultdict(list)
        nodes = set()
        for u, v in edges:
            adj[u].append(v)
            nodes.update((u, v))
        index, low, onstk = {}, {}, {}
        stack, sccs, counter = [], [], [0]
        for root in nodes:
            if root in index:
                continue
            work = [(root, 0)]
            while work:
                v, pi = work[-1]
                if pi == 0:
                    index[v] = low[v] = counter[0]
                    counter[0] += 1
                    stack.append(v)
                    onstk[v] = True
                recurse = False
                for w in adj[v][pi:]:
                    work[-1] = (v, pi + 1)
                    if w not in index:
                        work.append((w, 0))
                        recurse = True
                        break
                    elif onstk.get(w):
                        low[v] = min(low[v], index[w])
                    pi += 1
                if recurse:
                    continue
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        onstk[w] = False
                        comp.append(w)
                        if w == v:
                            break
                    sccs.append(comp)
                work.pop()
                if work:
                    pv, _ = work[-1]
                    low[pv] = min(low[pv], low[v])
        true_sccs = {min(c): len(c) for c in sccs}
        for r in rows:
            assert r.scc_id in true_sccs, r.scc_id
            assert r.size == true_sccs[r.scc_id], (r.scc_id, r.size, true_sccs[r.scc_id])
        # structure is non-degenerate: multiple components, top > 1
        assert len(rows) == 10
        assert rows[0].size > 1
        assert rows[0].n_residual >= 0
        assert rows[0].n_assigned + rows[0].n_residual == len(nodes)


class TestDeadLetterReplay:
    def test_recovery_matches_fixture_classes(self, spark, sf_dir):
        from bireme_spark.queries.cdc import cdc_dead_letter_replay

        rows = {r.outcome: r for r in cdc_dead_letter_replay(spark, sf_dir).collect()}
        o = _pq("orders")
        res = o["o_orderkey"] % 10
        dead = o[res.isin([1, 2, 3])]
        recoverable = dead[dead["o_orderkey"] % 10 != 1]
        assert rows["recovered"].n_envelopes == len(recoverable)
        assert rows["still_dead"].n_envelopes == (res == 1).sum()
        assert rows["still_dead"].recovered_value == 0.0
        expect = float(recoverable["o_totalprice"].round(2).sum())
        assert abs(rows["recovered"].recovered_value - expect) < 0.5


class TestHuMoments:
    def test_matches_direct_central_moment_recompute(self, spark, sf_dir):
        """Hu values recomputed the DIRECT way (explicit centroid,
        explicit central sums — not the raw-moment algebraic
        expansion the query uses) off the same decoded pixels: the
        two formula paths must agree at 6dp, and hu1/hu2 must be
        positive (they are sums of squares / variances)."""
        from bireme_spark.functions.imagecodec import decode_image, encode_bmp, encode_png
        from bireme_spark.queries.multimodal import multimodal_hu_moments

        rows = {r.canonical_doc % 16: r for r in multimodal_hu_moments(spark, sf_dir).collect()}
        for s in range(16):
            w = h = 16
            pix = bytes(
                (x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            enc = encode_bmp(w, h, pix) if s % 2 == 0 else encode_png(w, h, pix)
            dw, dh, dc, dpix, _f = decode_image(enc)
            nch = min(dc, 3)
            G = np.array(
                [
                    [
                        sum(dpix[(y * dw + x) * dc + ch] for ch in range(nch)) // nch
                        for x in range(dw)
                    ]
                    for y in range(dh)
                ],
                dtype=float,
            )
            ys, xs = np.mgrid[0:dh, 0:dw]
            m00 = G.sum()
            xb, yb = (xs * G).sum() / m00, (ys * G).sum() / m00
            mu = {
                (p, q): (((xs - xb) ** p) * ((ys - yb) ** q) * G).sum()
                for p in range(4)
                for q in range(4)
                if p + q <= 3
            }
            n2, n3 = m00**2, m00**2.5
            hu1 = (mu[(2, 0)] + mu[(0, 2)]) / n2
            hu2 = ((mu[(2, 0)] - mu[(0, 2)]) ** 2 + 4 * mu[(1, 1)] ** 2) / n2**2
            hu3 = (
                (mu[(3, 0)] - 3 * mu[(1, 2)]) ** 2 + (3 * mu[(2, 1)] - mu[(0, 3)]) ** 2
            ) / n3**2
            r = rows[s]
            assert abs(r.hu1 - hu1) < 2e-6, (s, r.hu1, hu1)
            assert abs(r.hu2 - hu2) < 2e-6, (s, r.hu2, hu2)
            assert abs(r.hu3 - hu3) < 2e-6, (s, r.hu3, hu3)
            assert r.hu1 > 0 and r.hu2 >= 0


class TestOaxaca:
    def test_matches_numpy_two_group_ols(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_oaxaca_blinder

        r = lineitem_oaxaca_blinder(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        li["x"] = (li["l_quantity"].round(2) * 100).round().astype("int64")
        li["y"] = (li["l_extendedprice"].round(2) * 100).round().astype("int64")
        a, b = li[li["l_returnflag"] == "R"], li[li["l_returnflag"] != "R"]

        def ols(g):
            n = len(g)
            sx, sy = int(g.x.sum()), int(g.y.sum())
            sxy = int((g.x.astype(object) * g.y).sum())
            sxx = int((g.x.astype(object) * g.x).sum())
            beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            return n, sx / n, sy / n, beta

        na, xa, ya, ba = ols(a)
        nb, xb, yb, bb = ols(b)
        gap = ya / 100 - yb / 100
        explained = bb * (xa - xb) / 100
        assert r.n_a == na and r.n_b == nb
        assert abs(r.gap - gap) < 1e-4
        assert abs(r.explained - explained) < 1e-4
        assert abs(r.unexplained - (gap - explained)) < 1e-4
        assert abs(r.beta_a - ba) < 1e-5 and abs(r.beta_b - bb) < 1e-5
        # decomposition identity
        assert abs(r.explained + r.unexplained - r.gap) < 2e-6


class TestEffectiveDiameter:
    def test_neighborhood_function_vs_exact_bfs(self, spark, sf_dir):
        """HyperANF N(t) vs an exact all-pairs BFS on the fixture:
        per-t relative error within the 16-register HLL band (~26%
        rse; ball overlaps make per-node errors CORRELATED, so sums
        don't cancel them — assert 25%, measured worst 16.7%),
        N(t) monotone, and the 90%-crossing hop within ±1 of exact."""
        from collections import defaultdict, deque

        from bireme_spark.queries.audit import graph_effective_diameter

        rows = sorted(graph_effective_diameter(spark, sf_dir).collect(), key=lambda r: r.t)
        li = _pq("lineitem")
        li = li[li["l_orderkey"] % 4 == 0][["l_orderkey", "l_partkey"]].drop_duplicates()
        adj = defaultdict(set)
        nodes = set()
        for _, g in li.groupby("l_orderkey"):
            pks = sorted(g["l_partkey"])
            for u, v in zip(pks, pks[1:]):
                if u != v:
                    adj[u].add(v)
                    adj[v].add(u)
                    nodes.update((u, v))
        hops = len(rows) - 1
        N = [0] * (hops + 1)
        for src in nodes:
            dist = {src: 0}
            dq = deque([src])
            while dq:
                v = dq.popleft()
                if dist[v] >= hops:
                    continue
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        dq.append(w)
            for t in range(hops + 1):
                N[t] += sum(1 for d in dist.values() if d <= t)
        for r, exact in zip(rows, N):
            rel = abs(r.n_pairs_e4 / 10000 - exact) / exact
            assert rel < 0.25, (r.t, r.n_pairs_e4 / 10000, exact, rel)
        ests = [r.n_pairs_e4 for r in rows]
        assert all(a <= b for a, b in zip(ests, ests[1:]))
        exact_d = next(t for t in range(hops + 1) if N[t] * 10 >= N[hops] * 9)
        est_d = next(r.t for r in rows if r.reaches_90pct)
        assert abs(est_d - exact_d) <= 1, (est_d, exact_d)


class TestEnergyDistance:
    def test_matches_numpy_recompute_and_nonneg(self, spark, sf_dir):
        from bireme_spark.queries.embeddings import embedding_energy_distance

        r = embedding_energy_distance(spark, sf_dir).collect()[0]
        em = _pq("embeddings")
        k = max(em.groupby(em["label"] % 2).size().max() // 400, 1)
        s = em[em["vec_id"] % k == 0]
        V = np.stack(s["embedding"].to_numpy()).astype(np.float64)
        g = (s["label"] % 2).to_numpy()
        X, Y = V[g == 0], V[g == 1]

        def mean_d(A, B, same):
            # e6-rounded per term, integer sums — mirror the engine
            d = np.sqrt(((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=2))
            if same:
                iu = np.triu_indices(len(A), k=1)
                d = d[iu]
            else:
                d = d.ravel()
            e6 = np.round(d * 1e6).astype(np.int64)
            return int(e6.sum()) // len(e6), len(e6)

        dxx, nxx = mean_d(X, X, True)
        dyy, nyy = mean_d(Y, Y, True)
        dxy, nxy = mean_d(X, Y, False)
        assert (r.n_xx_pairs, r.n_yy_pairs, r.n_xy_pairs) == (nxx, nyy, nxy)
        assert r.energy_e6 == 2 * dxy - dxx - dyy
        # the U-statistic (self-pairs excluded) is UNBIASED, so on
        # identically-distributed groups it hovers near zero and may
        # dip slightly negative — the fixture's label split is such a
        # null case (measured -0.0017); a real shift reads >> 0
        assert r.energy_e6 > -10_000

    def test_identical_distributions_give_zero(self):
        """Statistic sanity: X == Y pooled from one distribution →
        E ≈ 0 (small-sample noise only)."""
        rng = np.random.RandomState(3)
        Z = rng.randn(300, 8)
        X, Y = Z[::2], Z[1::2]
        dxx = np.sqrt(((X[:, None] - X[None]) ** 2).sum(-1))
        dyy = np.sqrt(((Y[:, None] - Y[None]) ** 2).sum(-1))
        dxy = np.sqrt(((X[:, None] - Y[None]) ** 2).sum(-1))
        n = len(X)
        e = 2 * dxy.mean() - dxx.sum() / (n * (n - 1)) - dyy.sum() / (n * (n - 1))
        assert abs(e) < 0.05


class TestRejectionSampling:
    def test_kept_profile_approaches_target(self, spark, sf_dir):
        """The point of rejection sampling: the kept pool's bucket
        shares must be closer to the target profile than the raw
        candidate pool's were (total-variation distance shrinks),
        and acceptance never exceeds availability."""
        from bireme_spark.queries.corpus import corpus_rejection_sampling

        rows = corpus_rejection_sampling(spark, sf_dir).collect()
        s_tot = sum(r.s_cnt for r in rows)
        k_tot = sum(r.kept for r in rows)
        t_tot = sum(r.t_cnt for r in rows)
        tv_before = sum(abs(r.s_cnt / s_tot - r.t_cnt / t_tot) for r in rows) / 2
        tv_after = sum(abs(r.kept / k_tot - r.t_cnt / t_tot) for r in rows) / 2
        assert tv_after <= tv_before + 1e-9, (tv_after, tv_before)
        for r in rows:
            assert 0 <= r.kept <= r.s_cnt
            # zero-target buckets must be fully rejected
            if r.t_cnt == 0:
                assert r.kept == 0

    def test_coin_is_partitioning_free(self, spark, sf_dir):
        """The accept decision depends only on doc_id — identical
        kept counts under a different shuffle layout."""
        from bireme_spark.queries.corpus import corpus_rejection_sampling

        a = {r.b: r.kept for r in corpus_rejection_sampling(spark, sf_dir).collect()}
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            b = {r.b: r.kept for r in corpus_rejection_sampling(spark, sf_dir).collect()}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b


class TestAudioOnsets:
    def test_matches_direct_recompute(self, spark, sf_dir):
        from bireme_spark.functions.audiocodec import decode_wav, encode_wav
        from bireme_spark.queries.multimodal import multimodal_audio_onsets

        rows = {r.canonical_doc % 64: r for r in multimodal_audio_onsets(spark, sf_dir).collect()}
        for s in sorted(rows):
            n = 48 + s % 16
            tone = [(s * 13 + i * 11) % 1024 + 512 for i in range(n)]
            _, _, back = decode_wav(encode_wav(16000, tone))
            en = [
                sum(x * x for x in back[i : i + 8])
                for i in range(0, len(back) - len(back) % 8, 8)
            ]
            r = rows[s]
            assert r.n_frames == len(en)
            assert r.n_onsets == sum(1 for a, b in zip(en, en[1:]) if b > 2 * a)
            assert r.max_jump_x1000 == max(
                (b * 1000 // a for a, b in zip(en, en[1:]) if a > 0), default=0
            )
            assert r.n_onsets <= r.n_frames - 1


class TestStreamingDDSketch:
    def test_incremental_state_equals_batch_sketch(self, spark, sf_dir):
        """Mergeability end-to-end: the replayed 2-batch incremental
        state must reproduce the one-shot batch sketch EXACTLY."""
        from bireme_spark.queries.events import events_ddsketch_quantiles
        from bireme_spark.queries.streaming_sessions import streaming_ddsketch_rollup

        batch = {r.event_type: r for r in events_ddsketch_quantiles(spark, sf_dir).collect()}
        stream = {r.event_type: r for r in streaming_ddsketch_rollup(spark, sf_dir).collect()}
        assert batch.keys() == stream.keys()
        for k in batch:
            assert batch[k] == stream[k], k


class TestShiftShare:
    def test_components_bridge_the_growth(self, spark, sf_dir):
        """Shift-share identity: per nation, national + mix +
        competitive = r1 - r0 up to the per-cell FLOOR quantization
        (≤ 1 cent per cell per component)."""
        from bireme_spark.queries.relational import orders_shift_share

        rows = orders_shift_share(spark, sf_dir).collect()
        assert rows
        o = _pq("orders")
        c = _pq("customer")
        for r in rows:
            delta = r.rev_1999_cents - r.rev_1996_cents
            bridged = r.national_cents + r.segment_mix_cents + r.competitive_cents
            # ≤5 segments/nation × 3 components × 1 cent floor slack
            assert abs(delta - bridged) <= 15, (r.n_name, delta, bridged)

    def test_national_component_matches_pandas(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_shift_share

        rows = {r.n_name: r for r in orders_shift_share(spark, sf_dir).collect()}
        o = _pq("orders")
        c = _pq("customer")
        n = _pq("nation")
        o = o[o["o_orderdate"].dt.year.isin([1996, 1999])].copy()
        o["yr"] = o["o_orderdate"].dt.year
        o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
        m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
            n, left_on="c_nationkey", right_on="n_nationkey"
        )
        cell = m.pivot_table(
            index=["n_name", "c_mktsegment"], columns="yr", values="cents", aggfunc="sum"
        ).dropna()
        cell = cell[cell[1996] > 0]
        g_nat = (cell[1999].sum() - cell[1996].sum()) / cell[1996].sum()
        nat = (
            np.floor(cell[1996] / 100.0 * g_nat * 100)
            .astype("int64")
            .groupby(level="n_name")
            .sum()
        )
        for name, r in rows.items():
            assert r.national_cents == nat[name], name


class TestTukeyHSD:
    def test_q_stats_match_numpy(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_tukey_hsd

        rows = lineitem_tukey_hsd(spark, sf_dir).collect()
        assert len(rows) == 3  # C(3,2) returnflag pairs
        li = _pq("lineitem")
        g = li.groupby("l_returnflag")["l_quantity"]
        n = g.count()
        mean = g.mean()
        ssw = sum(((gr - gr.mean()) ** 2).sum() for _, gr in g)
        msw = ssw / (len(li) - 3)
        for r in rows:
            q = abs(mean[r.flag_a] - mean[r.flag_b]) / np.sqrt(
                msw / 2 * (1 / n[r.flag_a] + 1 / n[r.flag_b])
            )
            assert abs(r.q_stat - q) < 1e-4, (r.flag_a, r.flag_b, r.q_stat, q)
            assert r.n_a == n[r.flag_a] and r.n_b == n[r.flag_b]


class TestVintageAnalysis:
    def test_fill_curve_monotone_and_complete(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_vintage_analysis

        df = orders_vintage_analysis(spark, sf_dir).toPandas()
        assert len(df) > 0
        for v, g in df.groupby("vintage"):
            g = g.sort_values("age")
            assert (g["fill_ppm"].diff().dropna() >= 0).all(), v
            assert g["fill_ppm"].iloc[-1] == 1_000_000, v
            assert g["cum_shipped"].iloc[-1] == g["shipped"].sum(), v

    def test_cohort_totals_match_parquet(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_vintage_analysis

        df = orders_vintage_analysis(spark, sf_dir).toPandas()
        li = _pq("lineitem")
        o = _pq("orders")
        m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        truth = m.groupby(m["o_orderdate"].dt.strftime("%Y-%m")).size()
        got = df.groupby("vintage")["shipped"].sum()
        assert got.to_dict() == truth.to_dict()


class TestMetaAnalysis:
    def test_effects_and_pooling_match_pandas(self, spark, sf_dir):
        from bireme_spark.queries.relational import nations_meta_analysis

        df = nations_meta_analysis(spark, sf_dir).toPandas()
        assert len(df) > 0
        o = _pq("orders").merge(
            _pq("customer"), left_on="o_custkey", right_on="c_custkey"
        ).merge(_pq("nation"), left_on="c_nationkey", right_on="n_nationkey")
        o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
        o["hi"] = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        for r in df.itertuples():
            g = o[o["n_name"] == r.n_name]
            hi, lo = g[g["hi"]]["cents"], g[~g["hi"]]["cents"]
            theta = (hi.mean() - lo.mean()) / 100
            assert abs(r.theta - theta) < 2e-4, r.n_name
            var = hi.var(ddof=1) / len(hi) / 1e4 + lo.var(ddof=1) / len(lo) / 1e4
            assert abs(r.se_theta - np.sqrt(var)) < 2e-3, r.n_name
        # pooled diagnostics are shared columns: I2 consistent with Q
        q = df["q_stat"].iloc[0]
        k = len(df)
        expect_i2 = max(0.0, (q - (k - 1)) / q) if q > 0 else 0.0
        assert abs(df["i2_ppm"].iloc[0] / 1e6 - expect_i2) < 2e-3
        assert abs(df["weight_ppm"].sum() - 1_000_000) <= k


class TestCoxRegression:
    def test_score_vanishes_at_estimate(self, spark, sf_dir):
        """Newton converged ⇔ the Breslow partial-likelihood score
        U(β̂) is ~0 — re-derived independently in pandas."""
        from bireme_spark.queries.relational import customers_cox_regression

        r = customers_cox_regression(spark, sf_dir).collect()[0]
        o = _pq("orders").sort_values(["o_custkey", "o_orderdate"])
        c = _pq("customer")
        o = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
        o["nxt"] = o.groupby("o_custkey")["o_orderdate"].shift(-1)
        h = o["o_orderdate"].max()
        o["t"] = np.where(
            o["nxt"].notna(),
            (o["nxt"] - o["o_orderdate"]).dt.days,
            (h - o["o_orderdate"]).dt.days,
        )
        o["ev"] = o["nxt"].notna()
        o["x"] = o["c_mktsegment"] == "BUILDING"
        sp = o[o["t"] > 0]
        assert r.n_treated == int(sp["x"].sum())
        assert r.n_control == int((~sp["x"]).sum())
        eb = np.exp(r.beta)
        u = 0.0
        agg = sp.groupby(["t", "x"]).agg(d=("ev", "sum"), a=("ev", "size")).reset_index()
        ts = sorted(agg["t"].unique())
        r1 = int(sp["x"].sum())
        r0 = int((~sp["x"]).sum())
        for t in ts:
            rows = agg[agg["t"] == t]
            d1 = int(rows[rows["x"]]["d"].sum())
            d = int(rows["d"].sum())
            if d > 0:
                u += d1 - d * r1 * eb / (r1 * eb + r0)
            r1 -= int(rows[rows["x"]]["a"].sum())
            r0 -= int(rows[~rows["x"]]["a"].sum())
        # score at the estimate, in SE units (I = 1/se² scaled)
        i_nat = (1000.0 / r.se) ** 2 / 1e6
        assert abs(u) / i_nat < 1e-3, (u, i_nat)
        assert abs(r.hazard_ratio - round(float(np.exp(r.beta)), 6)) < 1e-9
        assert r.se > 0


class TestBlockiness:
    def test_planted_block_structure_detected(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_blockiness

        df = multimodal_blockiness(spark, sf_dir).toPandas()
        assert (df["blockiness_ppm"] > 1_000_000).all()
        assert df["n_images"].sum() == len(_pq("documents"))


class TestPoissonRegression:
    def test_score_vanishes_at_estimate(self, spark, sf_dir):
        """IRLS converged ⇔ the Poisson score equations Σ(y−μ)=0 and
        Σt(y−μ)=0 hold at the fitted (b0, b1) — re-derived straight
        off the parquet in pandas."""
        from bireme_spark.queries.timeseries import events_poisson_regression

        r = events_poisson_regression(spark, sf_dir).collect()[0]
        ev = _pq("events")
        days = ev["ts"].dt.floor("D")
        daily = days.value_counts().sort_index()
        t0 = daily.index.min()
        t = ((daily.index - t0).days).to_numpy()
        full_t = np.arange(t.max() + 1)
        y = np.zeros(len(full_t))
        y[t] = daily.to_numpy()
        assert r.n_days == len(full_t)
        assert r.n_events == int(y.sum())
        b0, b1 = r.b0_e9 / 1e9, r.b1_e9 / 1e9
        mu = np.exp(b0 + b1 * full_t)
        # score in units of the response scale
        assert abs((y - mu).sum()) / y.sum() < 1e-3
        assert abs(((y - mu) * full_t).sum()) / (y * full_t).sum() < 1e-3
        assert abs(r.rate_ratio_per_day - round(float(np.exp(b1)), 6)) < 1e-9
        # fitted endpoints are the quantized mu sequence
        assert abs(r.fitted_first_e6 / 1e6 - mu[0]) / mu[0] < 1e-3
        assert abs(r.fitted_last_e6 / 1e6 - mu[-1]) / mu[-1] < 1e-3
        assert r.se_beta1 > 0


class TestPartialCorrelation:
    def test_matches_numpy_partials(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_partial_correlation

        df = lineitem_partial_correlation(spark, sf_dir).toPandas()
        li = _pq("lineitem")
        assert df["n"].sum() == len(li)
        for rec in df.itertuples():
            g = li[li["l_returnflag"] == rec.l_returnflag]
            x = g["l_extendedprice"].round(2).to_numpy()
            z = g["l_discount"].round(2).to_numpy()
            y = (x * (1 - z)).round(2)
            c = np.corrcoef(np.vstack([x, y, z]))
            rxy, rxz, ryz = c[0, 1], c[0, 2], c[1, 2]
            assert abs(rec.r_xy_e6 / 1e6 - rxy) < 1e-4
            assert abs(rec.r_xz_e6 / 1e6 - rxz) < 1e-4
            assert abs(rec.r_yz_e6 / 1e6 - ryz) < 1e-4
            exp_yz_x = (ryz - rxy * rxz) / np.sqrt((1 - rxy**2) * (1 - rxz**2))
            assert abs(rec.pr_yz_x_e6 / 1e6 - exp_yz_x) < 1e-4
            # raw revenue-discount r is masked by price variance...
            assert abs(rec.r_yz_e6) < 300_000
            # ...but partialing price out exposes the suppressed
            # near-deterministic negative discount effect
            assert rec.pr_yz_x_e6 < -700_000
            assert rec.pr_xy_z_e6 > 900_000


class TestAudioClipping:
    def test_planted_clipping_detected_through_codec(self, spark, sf_dir):
        """Re-derive one class's rail statistics from the tone formula
        WITHOUT the codec — a codec that altered any sample would split
        count, ppm, or the run structure."""
        from bireme_spark.queries.multimodal import multimodal_audio_clipping

        df = multimodal_audio_clipping(spark, sf_dir).toPandas()
        docs = _pq("documents")
        assert df["n_clips"].sum() == len(docs)
        assert (df["n_clipped"] <= df["n_samples"]).all()
        # planted contrast: some classes are hard-clipped, some clean
        assert (df["clip_ppm"] > 250_000).any()
        assert (df["clip_ppm"] == 0).any()
        assert (df["max_clip_run"] >= 2).any()
        for s in (0, 17, 63):
            n = 40 + (s * 7) % 24
            tone = [max(min((s * 13 + i * 29) % 4001 - 2000, 1500), -1500) for i in range(n)]
            clipped = [abs(v) >= 1500 for v in tone]
            max_run = run = 0
            for c in clipped:
                run = run + 1 if c else 0
                max_run = max(max_run, run)
            row = df[df["canonical_doc"] % 64 == s].iloc[0]
            assert row["n_samples"] == n
            assert row["n_clipped"] == sum(clipped)
            assert row["clip_ppm"] == sum(clipped) * 1_000_000 // n
            assert row["max_clip_run"] == max_run



class TestSlotRetentionForecast:
    def test_lindley_backlog_and_breach_match_pandas(self, spark, sf_dir):
        from bireme_spark.queries.cdc import cdc_slot_retention_forecast

        r = cdc_slot_retention_forecast(spark, sf_dir).collect()[0]
        ev = _pq("events")
        days = ev["ts"].dt.floor("D")
        daily = (ev["props"].str.len() + 16).groupby(days).sum().sort_index()
        x = daily.to_numpy().astype(np.int64)
        assert r.n_days == len(x)
        assert r.total_bytes == int(x.sum())
        drain = int(x.sum()) // len(x) * 9 // 10
        assert r.drain_per_day == drain
        # Lindley recursion, sequentially
        b = 0
        peaks = []
        for v in x:
            b = max(0, b + int(v) - drain)
            peaks.append(b)
        assert r.final_backlog == peaks[-1]
        assert r.peak_backlog == max(peaks)
        # slope: integer OLS over the backlog series
        t = np.arange(len(peaks), dtype=object)
        bb = np.array(peaks, dtype=object)
        n = len(peaks)
        num = (n * int((t * bb).sum()) - int(t.sum()) * int(bb.sum())) * 1_000_000
        den = n * int((t * t).sum()) - int(t.sum()) ** 2
        slope = num // den if (num >= 0) == (den >= 0) else -((-num) // den)
        assert r.slope_e6 == slope
        assert r.capacity_bytes == drain * 20
        if slope > 0:
            assert r.days_to_breach == max(drain * 20 - peaks[-1], 0) * 1_000_000 // slope
            # a 10%-of-drain growth rate must breach within the
            # capacity horizon's order of magnitude
            assert 0 <= r.days_to_breach < 10_000
        else:
            assert r.days_to_breach == -1


class TestBreuschPagan:
    def test_lm_matches_numpy_and_fires_on_planted_structure(self, spark, sf_dir):
        """revenue = price*(1-disc) ⇒ residual variance shrinks with
        discount ⇒ BP must reject homoskedasticity. Recompute the
        whole statistic in numpy from the quantized coefficients
        (trunc-div, matching both engines' DIV semantics)."""
        from bireme_spark.queries.relational import lineitem_heteroskedasticity_bp

        def tdiv(a, b):
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        r = lineitem_heteroskedasticity_bp(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        x = (li["l_discount"].round(2) * 100).round().astype("int64").to_numpy()
        pc = (li["l_extendedprice"].round(2) * 100).round().astype("int64").to_numpy()
        # exact half-up cents: price_cents*(100-z) is an exact 1e4-scale
        # integer; pandas .round is half-even and splits the .xx5 ties
        y = (pc.astype(object) * (100 - x.astype(object)) + 50) // 100
        y = np.array([int(v) for v in y], dtype="int64")
        n = len(x)
        assert r.n == n
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x.astype(object) * x).sum())
        sxy = int((x.astype(object) * y).sum())
        b_e6 = tdiv((n * sxy - sx * sy) * 1_000_000, (n * sxx - sx * sx))
        assert r.b_e6 == b_e6
        a_e6 = tdiv(sy * 1_000_000 - b_e6 * sx, n)
        assert r.a_e6 == a_e6
        e = y.astype(object) * 1_000_000 - a_e6 - b_e6 * x.astype(object)
        u = np.array([int(v) * int(v) // 10**12 for v in e], dtype=float)
        xf = x.astype(float)
        c = np.corrcoef(xf, u)[0, 1]
        lm = n * c * c
        assert abs(r.r2_aux_e6 / 1e6 - c * c) < 1e-4
        assert abs(r.lm_e6 / 1e6 - lm) / max(lm, 1.0) < 1e-3
        assert bool(r.heteroskedastic_5pct) == (lm > 3.841)
        assert bool(r.heteroskedastic_5pct)  # planted structure fires


class TestDedupClusterSizes:
    def test_planted_cluster_structure_exact(self, spark, sf_dir):
        from bireme_spark.queries.dedup import corpus_dedup_cluster_sizes

        df = corpus_dedup_cluster_sizes(spark, sf_dir).toPandas()
        docs = _pq("documents")
        ids = docs["doc_id"].to_numpy()
        n200 = int((ids % 200 == 0).sum())
        n50 = int((ids % 50 == 0).sum()) - n200
        n1 = len(ids) - n50 - n200
        expect = {1: n1, 2: n50, 4: n200}
        got = dict(zip(df["cluster_size"], df["n_clusters"]))
        assert got == {k: v for k, v in expect.items() if v}
        total = int(df["n_docs"].sum())
        assert total == n1 + 2 * n50 + 4 * n200
        for rec in df.itertuples():
            assert rec.docs_ppm == rec.n_docs * 1_000_000 // total
            assert rec.removable_docs == (rec.cluster_size - 1) * rec.n_clusters


class TestTxnSizeDistribution:
    def test_percentiles_and_jumbo_match_pandas(self, spark, sf_dir):
        from bireme_spark.queries.cdc import cdc_transaction_size_distribution

        r = cdc_transaction_size_distribution(spark, sf_dir).collect()[0]
        o = _pq("orders")
        sizes = o.groupby("o_custkey").size().to_numpy()
        n = len(sizes)
        assert r.n_txns == n
        assert r.n_changes == len(o)
        assert r.mean_x1000 == len(o) * 1000 // n
        s = np.sort(sizes)
        for q, got in ((50, r.p50), (95, r.p95), (99, r.p99)):
            pos = (n * q + 99) // 100  # ceil rank
            assert got == s[pos - 1], (q, got, s[pos - 1])
        assert r.max_size == s[-1]
        jumbo = sizes[sizes >= 2 * r.p95]
        assert r.jumbo_txns == len(jumbo)
        assert r.jumbo_changes_ppm == int(jumbo.sum()) * 1_000_000 // len(o)


class TestCusumOfSquares:
    def test_statistic_matches_pandas_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_cusum_of_squares

        r = lineitem_cusum_of_squares(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        cents = (li["l_extendedprice"].round(2) * 100).round().astype("int64")
        daily = cents.groupby(li["l_shipdate"].dt.floor("D")).sum().sort_index()
        x = daily.to_numpy().astype(object)
        T = len(x)
        assert r.n_days == T
        sq = np.cumsum(x * x)
        tot = int(sq[-1])
        dev = [abs(int(sq[t]) * T - (t + 1) * tot) for t in range(T)]
        mx = max(dev)
        k = dev.index(mx)
        assert r.break_t == k + 1
        assert r.break_day == daily.index[k].strftime("%Y-%m-%d")
        d_stat = mx / (tot * T)
        assert abs(r.d_stat_e6 / 1e6 - d_stat) < 2e-6
        # homogeneous synthetic revenue: no variance break expected,
        # but assert the flag is CONSISTENT with the statistic either way
        assert bool(r.variance_break_5pct) == (d_stat * np.sqrt(T) > 1.358)


class TestContextLengthBudget:
    def test_budget_math_matches_pandas(self, spark, sf_dir):
        from bireme_spark.queries.corpus import corpus_context_length_budget

        df = corpus_context_length_budget(spark, sf_dir).toPandas()
        docs = _pq("documents")
        lens = docs["text"].str.split(" ").str.len().to_numpy().astype("int64")
        n = len(lens)
        s = np.sort(lens)
        p50 = s[(n * 50 + 99) // 100 - 1]
        assert list(df["window_tokens"]) == [p50, 2 * p50, 4 * p50]
        for rec in df.itertuples():
            w = rec.window_tokens
            assert rec.n_docs == n
            assert rec.n_tokens == int(lens.sum())
            assert rec.docs_fitting_ppm == int((lens <= w).sum()) * 1_000_000 // n
            kept = np.minimum(lens, w).sum()
            assert rec.tokens_kept_ppm == int(kept) * 1_000_000 // int(lens.sum())
            assert rec.padding_waste_ppm == (n * w - int(kept)) * 1_000_000 // (n * w)
            assert rec.sequences_needed == int(((lens + w - 1) // w).sum())
        # wider windows keep more tokens but waste more padding
        assert df["tokens_kept_ppm"].is_monotonic_increasing
        assert df["padding_waste_ppm"].is_monotonic_increasing


class TestOrderingViolations:
    def test_planted_swaps_are_exactly_detected(self, spark, sf_dir):
        """The %7 I/U seq swap plants violations at exactly the keys
        that have BOTH ops (%21 residue, when the swapped insert's
        time is earlier than the update's) — predict the set from
        first principles."""
        from bireme_spark.queries.cdc import cdc_ordering_violation_detector

        df = cdc_ordering_violation_detector(spark, sf_dir).toPandas()
        o = _pq("orders")
        k = o["o_orderkey"].to_numpy()
        # violation: key has I and U (%3==0 gives U), %7==0 swaps seqs;
        # order by swapped seq => U (seq k*10+1) first at t+1d, then I
        # (k*10+2) at t — the I arrives 1 day late. D (%5) rides seq
        # k*10+3 and time t+2d — never late.
        viol_keys = ((k % 21 == 0)).sum()
        assert int(df["violations"].sum()) == viol_keys
        assert int(df["violated_keys"].sum()) == viol_keys
        if viol_keys:
            assert int(df["max_lateness_ms"].max()) == 86_400_000
        assert int(df["n_changes"].sum()) == len(k) + (k % 3 == 0).sum() + (k % 5 == 0).sum()


class TestPriceHeaping:
    def test_planted_segment_fires_organic_consistent(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_price_heaping_audit

        df = orders_price_heaping_audit(spark, sf_dir).toPandas().set_index("segment")
        o = _pq("orders")
        cents = (o["o_totalprice"].round(2) * 100).round().astype("int64")
        d2 = (cents % 100).to_numpy()
        org = df.loc["organic"]
        assert org["n"] == len(o)
        counts = np.bincount(d2, minlength=100)
        n = len(d2)
        chi2 = ((counts - n / 100.0) ** 2 / (n / 100.0)).sum()
        assert abs(org["chi2_e6"] / 1e6 - chi2) < 1e-3
        assert bool(org["heaping_rejected_5pct"]) == (chi2 > 123.225)
        mode = counts.max()
        assert org["top_pair"] == int(np.argmax(counts))  # argmax = first max = min d2
        assert org["top_share_ppm"] == int(mode) * 1_000_000 // n
        pl = df.loc["planted_rounded"]
        # the planted segment is all .00 — chi2 must fire at ~99n
        assert pl["top_pair"] == 0
        assert pl["top_share_ppm"] == 1_000_000
        assert bool(pl["heaping_rejected_5pct"])
        assert pl["chi2_e6"] / 1e6 > 90 * pl["n"]


class TestStereoBalance:
    def test_planted_phase_and_gain_classes_through_codec(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_stereo_balance

        df = multimodal_stereo_balance(spark, sf_dir).toPandas()
        docs = _pq("documents")
        assert int(df["n_clips"].sum()) == len(docs)
        df["s"] = df["canonical_doc"] % 64
        # anti-phase plant: s % 3 == 0 must carry negative correlation
        anti = df[df["s"] % 3 == 0]
        assert (anti["corr_sign"] == -1).all()
        assert (df[df["s"] % 3 != 0]["corr_sign"] == 1).all()
        # gain classes: gain//4 scales R; gain=4 (s%4==3) makes R ~= L
        # in magnitude -> balance near 500000; gain=1 -> R tiny -> L dominant
        low_gain = df[df["s"] % 4 == 0]
        assert (low_gain["left_energy_ppm"] > 900_000).all()
        assert (low_gain["left_dominant"] == 1).all()
        # recompute one class rail-for-rail without the codec
        for s in (5, 12):
            n = 32 + (s * 5) % 24
            left = [((s * 11 + i * 23) % 2001) - 1000 for i in range(n)]
            gain = 1 + s % 4
            sign = -1 if s % 3 == 0 else 1
            right = [sign * (abs(v * gain) // 4 if v >= 0 else -(abs(v * gain) // 4)) for v in left]
            el = sum(v * v for v in left)
            er = sum(v * v for v in right)
            row = df[df["s"] == s].iloc[0]
            assert row["n_frames"] == n
            assert row["left_energy_ppm"] == el * 1_000_000 // (el + er)


class TestCompactionRatio:
    def test_chain_depths_from_residue_arithmetic(self, spark, sf_dir):
        """Chain depth per key is 1 + [k%3==0] + [k%5==0] — predict
        the whole histogram from residues."""
        from bireme_spark.queries.cdc import cdc_compaction_ratio_report

        df = cdc_compaction_ratio_report(spark, sf_dir).toPandas().set_index("chain_depth")
        o = _pq("orders")
        k = o["o_orderkey"].to_numpy()
        depth = 1 + (k % 3 == 0).astype(int) + (k % 5 == 0).astype(int)
        total = int(depth.sum())
        for d in sorted(set(depth)):
            row = df.loc[d]
            nk = int((depth == d).sum())
            assert row["n_keys"] == nk
            assert row["rows_in"] == d * nk
            assert row["rows_out"] == nk
            assert row["rows_eliminated"] == (d - 1) * nk
            assert row["batch_share_ppm"] == d * nk * 1_000_000 // total
        assert set(df.index) == set(int(x) for x in set(depth))


class TestTwowayAnova:
    def test_f_stats_match_numpy_and_only_discount_fires(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_twoway_anova

        r = lineitem_twoway_anova(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        a = (li["l_returnflag"] == "R").to_numpy()
        z = li["l_discount"].round(2)
        b = (z >= 0.05).to_numpy()
        pc = (li["l_extendedprice"].round(2) * 100).round().astype("int64").to_numpy()
        y = (pc.astype(object) * ((1 - z) * 100).round().astype("int64").to_numpy().astype(object) + 50) // 100
        y = np.array([int(v) for v in y], dtype="float64") / 100.0
        cells = {}
        for ai in (False, True):
            for bi in (False, True):
                g = y[(a == ai) & (b == bi)]
                cells[(ai, bi)] = g
        assert r.n == len(y)
        assert r.n11 == len(cells[(True, True)])
        sse = sum(((g - g.mean()) ** 2).sum() for g in cells.values())
        mse = sse / (len(y) - 4)
        hsum = sum(1.0 / len(g) for g in cells.values())
        m = {k: g.mean() for k, g in cells.items()}
        la = m[(True, True)] + m[(True, False)] - m[(False, True)] - m[(False, False)]
        lb = m[(True, True)] - m[(True, False)] + m[(False, True)] - m[(False, False)]
        lint = m[(True, True)] - m[(True, False)] - m[(False, True)] + m[(False, False)]
        for got_e6, expect in (
            (r.f_returned_e6, la * la / (mse * hsum)),
            (r.f_discount_e6, lb * lb / (mse * hsum)),
            (r.f_interaction_e6, lint * lint / (mse * hsum)),
        ):
            assert abs(got_e6 / 1e6 - expect) / max(expect, 1.0) < 1e-3
        # planted asymmetry: discount main effect fires, others don't
        assert bool(r.discount_sig_5pct)
        assert not bool(r.returned_sig_5pct)
        assert not bool(r.interaction_sig_5pct)


class TestOcrScreen:
    def test_exact_segment_separation(self, spark, sf_dir):
        from bireme_spark.queries.textops import text_ocr_artifact_screen

        df = text_ocr_artifact_screen(spark, sf_dir).toPandas().set_index("segment")
        docs = _pq("documents")
        org = df.loc["organic"]
        pl = df.loc["planted_ocr"]
        assert org["n_docs"] == len(docs)
        # digit-free corpus: zero false positives
        assert org["flagged_docs"] == 0 and org["mixed_token_ppm"] == 0
        n_planted = int((docs["doc_id"] % 9 == 0).sum())
        assert pl["n_docs"] == n_planted
        # every corrupted doc contains an l/o word => full recall
        has_lo = docs[docs["doc_id"] % 9 == 0]["text"].str.contains("[lo]", regex=True)
        assert pl["flagged_docs"] == int(has_lo.sum())
        assert pl["flagged_ppm"] == int(has_lo.sum()) * 1_000_000 // n_planted
        assert pl["mixed_token_ppm"] > 100_000


class TestWilcoxonSignedRank:
    def test_matches_scipy_free_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_wilcoxon_signed_rank

        r = orders_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
        o = _pq("orders")
        cents = (o["o_totalprice"].round(2) * 100).round().astype("int64")
        h1 = o["o_orderdate"] < pd.Timestamp("1998-06-01")
        g = pd.DataFrame({"c": o["o_custkey"], "h1": h1, "cents": cents})
        agg = g.groupby(["c", "h1"])["cents"].agg(["sum", "size"]).reset_index()
        agg["m"] = agg["sum"] // agg["size"]
        piv = agg.pivot(index="c", columns="h1", values="m").dropna()
        d = (piv[False] - piv[True]).astype("int64")
        assert r.n_pairs == len(d)
        nz = d[d != 0]
        assert r.n_nonzero == len(nz)
        ad = nz.abs().to_numpy()
        pos = (nz > 0).to_numpy()
        order = np.sort(np.unique(ad))
        cum = 0
        w2 = 0
        tc = 0
        for v in order:
            t = int((ad == v).sum())
            tp = int(((ad == v) & pos).sum())
            w2 += tp * (2 * cum + t + 1)
            tc += t**3 - t
            cum += t
        assert r.w_plus_x2 == w2
        assert r.tie_term == tc
        n = len(nz)
        z = (w2 / 2 - n * (n + 1) / 4) / np.sqrt(
            n * (n + 1) * (2 * n + 1) / 24 - tc / 48
        )
        assert abs(r.z_e6 / 1e6 - z) < 2e-6
        assert bool(r.shift_sig_5pct) == (abs(z) > 1.96)


class TestLognormalFit:
    def test_moments_match_and_ratio_is_honest(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_lognormal_fit

        r = orders_lognormal_fit(spark, sf_dir).collect()[0]
        o = _pq("orders")
        cents = (o["o_totalprice"].round(2) * 100).round().astype("int64").to_numpy()
        le6 = np.round(np.log(cents.astype("float64")) * 1e6).astype("int64")
        n = len(cents)
        assert r.n == n
        mu = le6.sum() / n / 1e6
        var = (n * (le6.astype(object) ** 2).sum() - int(le6.sum()) ** 2) // (n * 10**6) / n / 1e12
        assert abs(r.mu_e6 / 1e6 - mu) < 2e-6
        assert abs(r.sigma_e6 / 1e6 - np.sqrt(var)) < 2e-6
        implied = np.exp(mu + var / 2)
        assert abs(r.implied_mean_cents - implied) < max(2, implied * 1e-6)
        assert r.actual_mean_cents == int(cents.sum() // n)
        # honest finding: the synthetic fixture is NOT lognormal —
        # a log-moment fit overshoots the mean on bounded uniformish
        # data; assert the ratio is consistent, not that it's 1
        assert abs(r.lognormality_ratio_e6 / 1e6 - implied / (cents.sum() / n)) < 1e-4


class TestUnicodeHygiene:
    def test_exact_three_way_separation(self, spark, sf_dir):
        from bireme_spark.queries.textops import text_unicode_hygiene_screen

        df = text_unicode_hygiene_screen(spark, sf_dir).toPandas().set_index("segment")
        docs = _pq("documents")
        org = df.loc["organic"]
        assert org["n_docs"] == len(docs)
        assert org["flagged_docs"] == 0 and org["suspect_char_ppm"] == 0
        zw = df.loc["planted_zero_width"]
        n11 = int((docs["doc_id"] % 11 == 0).sum())
        assert zw["n_docs"] == n11
        assert zw["flagged_docs"] == n11 and zw["flagged_ppm"] == 1_000_000
        mo = df.loc["planted_mojibake"]
        n13 = int((docs["doc_id"] % 13 == 0).sum())
        assert mo["n_docs"] == n13 and mo["flagged_docs"] == n13
        # mojibake plants exactly ONE suspect char per doc
        sub = docs[docs["doc_id"] % 13 == 0]
        total_chars = int(sub["text"].str.len().sum()) + n13
        assert mo["suspect_char_ppm"] == n13 * 1_000_000 // total_chars


class TestIntraclassCorrelation:
    def test_matches_anova_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_intraclass_correlation

        r = lineitem_intraclass_correlation(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        pc = (li["l_extendedprice"].round(2) * 100).round().astype("int64").to_numpy()
        zq = (li["l_discount"].round(2) * 100).round().astype("int64").to_numpy()
        y = (pc.astype(object) * (100 - zq.astype(object)) + 50) // 100
        y = np.array([int(v) for v in y], dtype="float64") / 100.0
        g = pd.DataFrame({"k": li["l_orderkey"], "y": y}).groupby("k")["y"]
        n = len(y)
        G = g.ngroups
        assert r.n == n and r.n_groups == G
        ssw = float(((y - g.transform("mean").to_numpy()) ** 2).sum())
        means = g.mean()
        sizes = g.size()
        grand = y.mean()
        ssb = float((sizes * (means - grand) ** 2).sum())
        msb = ssb / (G - 1)
        msw = ssw / (n - G)
        kbar = (n - (sizes**2).sum() / n) / (G - 1)
        icc = (msb - msw) / (msb + (kbar - 1) * msw)
        assert abs(r.kbar_x1000 / 1e3 - kbar) < 2e-3
        assert abs(r.f_ratio_e6 / 1e6 - msb / msw) / (msb / msw) < 1e-3
        assert abs(r.icc_e6 / 1e6 - icc) < 1e-3
        # synthetic lines are independent within orders: ICC ~ 0
        assert abs(r.icc_e6) < 50_000


class TestHarmonicRegression:
    def test_recovers_planted_diurnal_component(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_harmonic_regression

        r = events_harmonic_regression(spark, sf_dir).collect()[0]
        ev = _pq("events")
        hours = ev["ts"].astype("datetime64[ns]").dt.floor("h")
        c = hours.value_counts().sort_index()
        n = len(c)
        assert r.n_hours == n
        m = max(int(c.sum()) // n // 3, 2)
        assert r.planted_m == m
        # planted amplitude is m (the cos coefficient); estimator must
        # recover it within the organic noise (~2% of mean)
        assert abs(r.amplitude_x1000 / 1e3 - m) / m < 0.2
        # planted phase is 0 (pure cosine, peak at hour 0)
        assert abs(r.phase_rad) < 0.25
        assert r.r2_e6 > 300_000  # the planted cycle dominates


class TestCaptionConsistency:
    def test_planted_mislabels_recovered_exactly(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_caption_consistency

        df = multimodal_caption_consistency(spark, sf_dir).toPandas()
        docs = _pq("documents")
        ids = docs["doc_id"].to_numpy()
        assert int(df["n_pairs"].sum()) == len(ids)
        for rec in df.itertuples():
            k = rec.pixel_class
            cls_ids = ids[ids % 8 == k]
            mis = cls_ids[cls_ids % 17 == 0]
            assert rec.n_pairs == len(cls_ids)
            assert rec.n_mislabeled == len(mis)
            assert rec.n_consistent == len(cls_ids) - len(mis)
            assert rec.first_mislabel_doc == (int(mis.min()) if len(mis) else -1)
            assert rec.consistency_ppm == rec.n_consistent * 1_000_000 // rec.n_pairs


class TestSourceLeakageMatrix:
    def test_matches_pandas_shingle_recompute(self, spark, sf_dir):
        from bireme_spark.queries.corpus import corpus_source_leakage_matrix

        df = corpus_source_leakage_matrix(spark, sf_dir).toPandas()
        docs = _pq("documents")
        per_src: dict[str, set] = {}
        for rec in docs.itertuples():
            ws = rec.text.split(" ")
            sh = {" ".join(ws[i : i + 8]) for i in range(max(len(ws) - 7, 0))}
            per_src.setdefault(rec.source, set()).update(sh)
        srcs = sorted(per_src)
        assert len(df) == len(srcs) * (len(srcs) - 1)
        got = {(r.src_a, r.src_b): r for r in df.itertuples()}
        import itertools
        for a, b in itertools.permutations(srcs, 2):
            r = got[(a, b)]
            inter = len(per_src[a] & per_src[b])
            assert r.shingles_a == len(per_src[a])
            assert r.leaked == inter
            assert r.leak_ppm == inter * 1_000_000 // len(per_src[a])
        # natural signal: at least one pair leaks
        assert df["leaked"].max() > 0


class TestBimodalityCoefficient:
    def test_matches_scipy_free_moments(self, spark, sf_dir):
        from bireme_spark.queries.events import events_bimodality_coefficient

        rows = {r.event_type: r for r in events_bimodality_coefficient(spark, sf_dir).collect()}
        ev = _pq("events")
        for etype, g in ev.groupby("event_type"):
            x = np.round(g["value"].to_numpy() * 1000).astype("int64").astype("float64")
            n = len(x)
            r = rows[etype]
            assert r.n == n
            mu = x.mean()
            m2 = ((x - mu) ** 2).mean()
            m3 = ((x - mu) ** 3).mean()
            m4 = ((x - mu) ** 4).mean()
            g1 = m3 / m2**1.5
            g2 = m4 / m2**2 - 3
            bc = (g1**2 + 1) / (g2 + 3 * (n - 1) ** 2 / ((n - 2) * (n - 3)))
            assert abs(r.skew_e6 / 1e6 - g1) < 1e-3
            assert abs(r.excess_kurtosis_e6 / 1e6 - g2) < 1e-3
            assert abs(r.bc_e6 / 1e6 - bc) < 1e-3
            assert bool(r.bimodal_suspect) == (bc > 0.555)


class TestTaguchiSN:
    def test_matches_pandas_and_penalizes_variance(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_taguchi_sn

        df = lineitem_taguchi_sn(spark, sf_dir).toPandas()
        li = _pq("lineitem")
        o = _pq("orders")
        j = li.merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
        x = np.maximum((j["l_shipdate"] - j["o_orderdate"]).dt.days.to_numpy(), 1)
        yr = j["l_shipdate"].dt.year.to_numpy()
        for rec in df.itertuples():
            g = x[yr == rec.ship_year].astype("int64")
            n = len(g)
            assert rec.n == n
            assert rec.mean_days_x1000 == int(g.sum()) * 1000 // n
            sn_s = -10 * np.log10(float((g.astype(object) ** 2).sum()) / n)
            assert abs(rec.sn_smaller_db - sn_s) < 1e-5
            srec = sum(10**12 // (int(v) * int(v)) for v in g)
            sn_l = -10 * np.log10(srec / n / 1e12)
            assert abs(rec.sn_larger_db - sn_l) < 1e-5
        # SN_S is a negative dB for multi-day latencies
        assert (df["sn_smaller_db"] < 0).all()


class TestQuantileTreatmentEffect:
    def test_order_statistics_match_numpy(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_quantile_treatment_effect

        df = orders_quantile_treatment_effect(spark, sf_dir).toPandas()
        o = _pq("orders")
        c = _pq("customer")
        j = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
        cents = (j["o_totalprice"].round(2) * 100).round().astype("int64")
        t = np.sort(cents[j["c_mktsegment"] == "BUILDING"].to_numpy())
        ct = np.sort(cents[j["c_mktsegment"] != "BUILDING"].to_numpy())

        def ceil_rank(arr, q):
            n = len(arr)
            return arr[(n * q + 99) // 100 - 1]

        for rec in df.itertuples():
            q = rec.quantile_pct
            assert rec.n_treated == len(t) and rec.n_control == len(ct)
            assert rec.q_treated == ceil_rank(t, q)
            assert rec.q_control == ceil_rank(ct, q)
            assert rec.qte_cents == rec.q_treated - rec.q_control
            # rank-bound CI brackets the point estimate
            assert rec.qte_lo_cents <= rec.qte_cents <= rec.qte_hi_cents
            # bound width sanity: ±1.96 rank band stays local
            for n, arr, lo_pos in ((len(t), t, None),):
                pass
            import math
            nlo = math.ceil(len(t) * q / 100 - 1.96 * math.sqrt(len(t) * q / 100 * (1 - q / 100)))
            assert rec.qte_lo_cents == t[nlo - 1] - ceil_rank_hi(ct, q)


def ceil_rank_hi(arr, q):
    import math
    n = len(arr)
    pos = math.ceil(n * q / 100 + 1.96 * math.sqrt(n * q / 100 * (1 - q / 100)))
    return arr[pos - 1]


class TestPotGpdTail:
    def test_mom_fit_matches_numpy_and_tail_is_sane(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_pot_gpd_tail

        r = events_pot_gpd_tail(spark, sf_dir).collect()[0]
        ev = _pq("events")
        x = np.round(ev["value"].to_numpy() * 1000).astype("int64")
        xs = np.sort(x)
        n = len(x)
        u = xs[(n * 95 + 99) // 100 - 1]
        assert r.n_total == n
        assert r.threshold_x1000 == u
        y = (x[x > u] - u).astype("float64")
        assert r.n_exc == len(y)
        m = y.mean()
        # engine variance is the integer (nSyy - Sy^2) DIV n quantization
        sy = int(y.sum()); syy = int((y.astype("int64").astype(object) ** 2).sum())
        s2 = ((len(y) * syy - sy * sy) // len(y)) / len(y)
        ratio = m * m / s2
        xi = (1 - ratio) / 2
        sigma = m * (ratio + 1) / 2
        assert abs(r.xi_e6 / 1e6 - xi) < 2e-3
        assert abs(r.sigma_x1000 / 1e3 - sigma) / sigma < 1e-3
        lvl = u + sigma / xi * ((n / len(y) * 0.01) ** (-xi) - 1)
        assert abs(r.implied_p99_x1000 - lvl) / lvl < 1e-3
        # the implied p99 must sit between the threshold (p95) and
        # a generous multiple of the observed max
        assert u < r.implied_p99_x1000 < 3 * xs[-1]


class TestAvSyncCheck:
    def test_planted_drift_classes_through_both_codecs(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_av_sync_check

        df = multimodal_av_sync_check(spark, sf_dir).toPandas()
        docs = _pq("documents")
        assert int(df["n_clips"].sum()) == len(docs)
        df["s"] = df["canonical_doc"] % 64
        for rec in df.itertuples():
            s = rec.s
            nf = 10 + s % 5 + (1 if s % 7 == 0 else 0)
            ns = (10 + s % 5) * 800 - (800 if s % 11 == 0 else 0)
            assert rec.n_frames == nf
            assert rec.n_samples == ns
            assert rec.video_ms == nf * 100
            assert rec.audio_ms == ns * 1000 // 8000
            drift = nf * 100 - ns // 8
            assert rec.drift_ms == drift
            assert bool(rec.out_of_sync) == (abs(drift) > 50)
        # both planted fault classes fire; clean classes stay in sync
        assert df[df["s"] % 7 == 0]["out_of_sync"].all()
        assert df[(df["s"] % 7 != 0) & (df["s"] % 11 == 0)]["out_of_sync"].all()
        clean = df[(df["s"] % 7 != 0) & (df["s"] % 11 != 0)]
        assert (~clean["out_of_sync"]).all()


class TestFwlPartialling:
    def test_equals_multivariate_ols_coefficient(self, spark, sf_dir):
        """FWL theorem: the residual-on-residual slope equals the
        2-regressor OLS coefficient on discount — checked against
        numpy lstsq (tolerance covers the e6 coefficient
        quantization)."""
        from bireme_spark.queries.relational import lineitem_fwl_partialled_regression

        r = lineitem_fwl_partialled_regression(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        q = li["l_quantity"].round(2).astype("int64").to_numpy().astype("float64")
        z = (li["l_discount"].round(2) * 100).round().astype("int64").to_numpy().astype("float64")
        pc = (li["l_extendedprice"].round(2) * 100).round().astype("int64").to_numpy()
        zq = z.astype("int64")
        y = (pc.astype(object) * (100 - zq.astype(object)) + 50) // 100
        y = np.array([int(v) for v in y], dtype="float64")
        assert r.n == len(y)
        X = np.column_stack([np.ones_like(q), q, z])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        # partialled effect (cents per discount point)
        assert abs(r.partialled_effect_e6 / 1e6 - beta[2]) / abs(beta[2]) < 1e-3
        naive = np.polyfit(z, y, 1)[0]
        assert abs(r.naive_effect_e6 / 1e6 - naive) / abs(naive) < 1e-3
        # qty independent of discount on this fixture: naive ~ partialled
        assert abs(r.naive_effect_e6 - r.partialled_effect_e6) < abs(r.partialled_effect_e6) * 0.05


class TestPaletteAudit:
    def test_planted_palette_sizes_read_back_exactly(self, spark, sf_dir):
        import math

        from bireme_spark.queries.multimodal import multimodal_image_palette_audit

        df = multimodal_image_palette_audit(spark, sf_dir).toPandas()
        docs = _pq("documents")
        assert int(df["n_images"].sum()) == len(docs)
        df["s"] = df["canonical_doc"] % 64
        for rec in df.itertuples():
            k = 1 + rec.s % 6
            assert rec.palette_size == k
            # symbolic entropy recompute: column x in 0..7 has band x%k
            from collections import Counter
            cnt = Counter(x % k for x in range(8))
            ent = sum(
                8 * c * int(math.floor(math.log(64 / (8 * c)) * 1e6 + 0.5))
                for c in cnt.values()
            ) // 64
            assert rec.entropy_e6 == ent
            assert bool(rec.flat_image_suspect) == (k <= 2)
        assert df["flat_image_suspect"].any() and not df["flat_image_suspect"].all()


class TestPackContamination:
    def test_matches_sequential_pack_recompute(self, spark, sf_dir):
        from bireme_spark.queries.corpus import corpus_pack_contamination_audit
        from bireme_spark.queries.corpus import _PACK_LEN

        df = corpus_pack_contamination_audit(spark, sf_dir).toPandas().set_index("source")
        docs = _pq("documents").sort_values("doc_id")
        for src, g in docs.groupby("source"):
            lens = g["text"].str.split(" ").str.len().to_numpy().astype("int64")
            packs: dict[int, list[int]] = {}
            pos = 0
            for n in lens:
                lo, hi = pos, pos + int(n)
                for p in range(lo // _PACK_LEN, (hi - 1) // _PACK_LEN + 1):
                    seg = min(hi, (p + 1) * _PACK_LEN) - max(lo, p * _PACK_LEN)
                    packs.setdefault(p, []).append(seg)
                pos = hi
            r = df.loc[src]
            n_packs = len(packs)
            assert r["n_packs"] == n_packs
            slots = sum(len(v) for v in packs.values())
            assert r["docs_per_pack_x1000"] == slots * 1000 // n_packs
            shared = sum(1 for v in packs.values() if len(v) > 1)
            assert r["shared_pack_ppm"] == shared * 1_000_000 // n_packs
            sl2 = sum(sum(v) ** 2 for v in packs.values())
            sseg2 = sum(s * s for v in packs.values() for s in v)
            assert r["contamination_ppm"] == (sl2 - sseg2) * 1_000_000 // sl2
            # packing multiple docs per pack must contaminate
            assert r["contamination_ppm"] > 0


class TestAndersonDarling:
    def test_matches_pettitt_recompute(self, spark, sf_dir):
        from bireme_spark.queries.events import events_anderson_darling

        r = events_anderson_darling(spark, sf_dir).collect()[0]
        ev = _pq("events")
        ev = ev[ev["event_type"].isin(["purchase", "click"])]
        x = np.round(ev["value"].to_numpy() * 1000).astype("int64")
        isa = (ev["event_type"] == "purchase").to_numpy()
        N = len(x); n = int(isa.sum()); m = N - n
        assert r.n_pooled == N and r.n_purchase == n and r.n_click == m
        # replicate the engine's tie walk: per distinct value block,
        # M interpolates as ca_before + ta*j//t
        order = np.argsort(x, kind="stable")
        import collections
        blocks = collections.OrderedDict()
        for v, a in sorted(zip(x, isa)):
            t, ta = blocks.get(v, (0, 0))
            blocks[v] = (t + 1, ta + (1 if a else 0))
        s_e9 = 0
        cum = ca = 0
        for v, (t, ta) in sorted(blocks.items()):
            for j in range(1, t + 1):
                i = cum + j
                if i >= N:
                    continue
                mi = ca + ta * j // t
                num = (mi * N - i * n) ** 2 * 10**9
                s_e9 += num // (i * (N - i))
            cum += t; ca += ta
        a2 = s_e9 / 1e9 / (n * m)
        assert r.a2_e6 == int(np.floor(a2 * 1e6))
        assert bool(r.distributions_differ_5pct) == (a2 > 2.492)


class TestLjungBox:
    def test_matches_acf_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import orders_ljung_box

        r = orders_ljung_box(spark, sf_dir).collect()[0]
        o = _pq("orders")
        daily = o.groupby(o["o_orderdate"].dt.floor("D")).size()
        idx = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
        xs = daily.reindex(idx, fill_value=0).to_numpy().astype(object)
        n = len(xs)
        assert r.n_days == n
        S = sum(xs)
        d = [n * int(v) - S for v in xs]
        D = sum(v * v for v in d)
        q_sum = 0
        for k in range(1, 11):
            Nk = sum(d[t] * d[t - k] for t in range(k, n))
            t_e9 = (Nk * 10**9) // D if (Nk >= 0) == (D >= 0) else -((-Nk * 10**9) // D)
            q_sum += t_e9 * t_e9 // (n - k)
        q_e18x = n * (n + 2) * q_sum
        assert r.q_e6 == q_e18x // 10**12
        assert bool(r.autocorrelated_5pct) == (q_e18x > 18307 * 10**15)


class TestThumbnailIntegrity:
    def test_planted_mispairings_exact(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_thumbnail_integrity

        df = multimodal_thumbnail_integrity(spark, sf_dir).toPandas()
        docs = _pq("documents")
        assert int(df["n_pairs"].sum()) == len(docs)
        df["s"] = df["canonical_doc"] % 64
        for rec in df.itertuples():
            s = rec.s
            if s % 13 == 0:
                delta = 48 * abs((40 + 3 * s) % 256 - (40 + 3 * ((s + 1) % 64)) % 256)
                assert rec.pixel_delta == delta and delta > 0
                assert not rec.pair_consistent
            else:
                assert rec.pixel_delta == 0 and rec.pair_consistent


class TestMeanResidualLife:
    def test_matches_numpy_and_pairs_with_gpd(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_mean_residual_life

        df = events_mean_residual_life(spark, sf_dir).toPandas()
        ev = _pq("events")
        x = np.round(ev["value"].to_numpy() * 1000).astype("int64")
        xs = np.sort(x)
        n = len(x)
        assert len(df) == 9
        for rec in df.itertuples():
            q = rec.decile_pct
            u = xs[(n * q + 99) // 100 - 1]
            assert rec.threshold_x1000 == u
            exc = x[x > u]
            assert rec.n_exc == len(exc)
            assert rec.mrl_x1000000 == int((exc - u).sum()) * 1000 // len(exc)
        # MRL must shrink toward the bounded tail's endpoint
        assert df["mrl_x1000000"].iloc[0] > df["mrl_x1000000"].iloc[-1]


class TestVocabCoverageCurve:
    def test_matches_pandas_rank_cdf(self, spark, sf_dir):
        from bireme_spark.queries.terms import corpus_vocab_coverage_curve

        df = corpus_vocab_coverage_curve(spark, sf_dir).toPandas()
        docs = _pq("documents")
        from collections import Counter
        cnt = Counter(w for t in docs["text"] for w in t.split(" "))
        freqs = sorted(cnt.values(), reverse=True)
        total_tokens = sum(freqs)
        total_types = len(freqs)
        for rec in df.itertuples():
            assert rec.total_types == total_types
            assert rec.total_tokens == total_tokens
            # block-granular answer: cumulate whole frequency tiers
            cum_tokens = 0
            cum_types = 0
            i = 0
            answer = None
            while i < len(freqs):
                f = freqs[i]
                j = i
                while j < len(freqs) and freqs[j] == f:
                    j += 1
                cum_tokens += f * (j - i)
                cum_types += j - i
                if cum_tokens * 1000 >= total_tokens * rec.coverage_permille:
                    answer = cum_types
                    break
                i = j
            assert rec.types_needed == answer
            assert rec.vocab_share_ppm == answer * 1_000_000 // total_types
        # the curve is monotone: more coverage needs more types
        assert df["types_needed"].is_monotonic_increasing


class TestDurbinWatson:
    def test_matches_exact_integer_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import orders_durbin_watson

        rec = orders_durbin_watson(spark, sf_dir).collect()[0]
        o = _pq("orders")
        d = pd.to_datetime(o["o_orderdate"]).dt.normalize()
        cents = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
        daily = pd.DataFrame({"d": d, "y": cents}).groupby("d")["y"].sum().sort_index()
        t = (daily.index - daily.index.min()).days.astype("int64")
        y = [int(v) for v in daily.to_numpy()]
        t = [int(v) for v in t]
        n = len(y)
        st, sy = sum(t), sum(y)
        stt = sum(v * v for v in t)
        sty = sum(a * b for a, b in zip(t, y))
        dd = n * stt - st * st
        num = n * sty - st * sy
        eh = [n * dd * yi - n * num * ti - (dd * sy - num * st) for ti, yi in zip(t, y)]
        k = max(1, max(abs(v) for v in eh) // 10**13)
        # int() truncation toward zero == both engines' DIV on negatives
        e = [int(v / k) if k > 1 else v for v in eh]
        e = [(abs(v) // k) * (1 if v >= 0 else -1) for v in eh]
        den = sum(v * v for v in e)
        numq = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
        crs = sum(e[i] * e[i - 1] for i in range(1, n))
        assert rec.n_days == n
        assert rec.dw_ppm == (numq * 10**6) // den
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        assert rec.rho1_ppm == tdiv(crs * 10**6, den)
        # DW lives in (0, 4); identity DW ≈ 2(1 − ρ₁) up to end effects
        assert 0 < rec.dw_ppm < 4_000_000
        assert abs(rec.dw_ppm - (2_000_000 - 2 * rec.rho1_ppm)) < 100_000
        assert abs(rec.slope_cents_per_day - round(num / dd, 6)) <= 1e-6


class TestJarqueBera:
    def test_matches_numpy_moments(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_jarque_bera

        df = events_jarque_bera(spark, sf_dir).toPandas()
        ev = _pq("events")
        x = np.round(ev["value"].to_numpy() * 1000).astype("int64")
        total = 0
        for rec in df.itertuples():
            g = x[(ev["event_type"] == rec.event_type).to_numpy()]
            n = len(g)
            total += n
            assert rec.n == n
            gf = g.astype("float64")
            mean = float(sum(int(v) for v in g)) / n
            m2 = float(sum(int(v) ** 2 for v in g)) / n - mean * mean
            m3 = float(sum(int(v) ** 3 for v in g)) / n - 3 * mean * (
                float(sum(int(v) ** 2 for v in g)) / n
            ) + 2 * mean**3
            m4 = (
                float(sum(int(v) ** 4 for v in g)) / n
                - 4 * mean * (float(sum(int(v) ** 3 for v in g)) / n)
                + 6 * mean * mean * (float(sum(int(v) ** 2 for v in g)) / n)
                - 3 * mean**4
            )
            skew = m3 / (m2 * np.sqrt(m2))
            exk = m4 / (m2 * m2) - 3.0
            jb = n * (skew * skew + exk * exk / 4.0) / 6.0
            assert abs(rec.skewness - skew) <= 2e-6
            assert abs(rec.excess_kurtosis - exk) <= 2e-6
            assert abs(rec.jb_stat - jb) <= max(2e-6, abs(jb) * 1e-9)
            assert rec.jb_stat >= 0
        assert total == len(x)


class TestEmbeddingCKA:
    def test_matches_exact_integer_recompute_and_bounds(self, spark, sf_dir):
        import hashlib
        import math

        from bireme_spark.queries.embeddings import _CKA_CAP, embedding_cka

        rec = embedding_cka(spark, sf_dir).collect()[0]
        emb = _pq("embeddings")
        n_tot = len(emb)
        rows = []
        for vid, v in zip(emb["vec_id"], emb["embedding"]):
            b = int(hashlib.md5(str(vid).encode()).hexdigest()[:2], 16)
            if b * n_tot < 256 * _CKA_CAP:
                rows.append(np.round(v.astype("float64") * 1_000_000).astype("int64"))
        m = len(rows)
        assert rec.n_sample == m and rec.dim == 64
        X = np.stack(rows)  # m × 64 integer matrix
        sxy = X.T.astype(object) @ X.astype(object)  # exact int cross-moments
        si = X.sum(axis=0).astype(object)
        k = m * 1000
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        q = [[tdiv(m * int(sxy[i][j]) - int(si[i]) * int(si[j]), k) for j in range(64)] for i in range(64)]
        hxx = sum(q[i][j] ** 2 for i in range(32) for j in range(32))
        hxy = sum(q[i][j] ** 2 for i in range(32) for j in range(32, 64))
        hyy = sum(q[i][j] ** 2 for i in range(32, 64) for j in range(32, 64))
        cka = float(hxy) / math.sqrt(float(hxx) * float(hyy))
        assert abs(rec.cka - cka) <= 1.1e-6
        # Cauchy-Schwarz bound (up to the deterministic DIV truncation)
        assert 0.0 < rec.cka <= 1.0 + 1e-6


class TestLogRankTest:
    def test_matches_exact_integer_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import customers_log_rank_test

        rec = customers_log_rank_test(spark, sf_dir).collect()[0]
        o = _pq("orders")
        c = _pq("customer")
        seg = c[c["c_mktsegment"].isin(["AUTOMOBILE", "BUILDING"])].copy()
        seg["g"] = np.where(seg["c_mktsegment"] == "AUTOMOBILE", 1, 2)
        oo = o.merge(seg[["c_custkey", "g"]], left_on="o_custkey", right_on="c_custkey")
        oo = oo.sort_values(["o_custkey", "o_orderdate"], kind="mergesort")
        horizon = o["o_orderdate"].max()
        spans = []
        for (ck, g), grp in oo.groupby(["o_custkey", "g"]):
            ds = list(grp["o_orderdate"])
            for i, d0 in enumerate(ds):
                nxt = ds[i + 1] if i + 1 < len(ds) else None
                t = ((nxt if nxt is not None else horizon) - d0).days
                if t > 0:
                    spans.append((g, t, nxt is not None))
        n1 = sum(1 for g, _, _ in spans if g == 1)
        n2 = len(spans) - n1
        assert (rec.n1_spans, rec.n2_spans) == (n1, n2)
        times = sorted({t for _, t, _ in spans})
        o1 = e1 = v = 0
        r1 = n1
        r2 = n2
        for t in times:
            d1 = sum(1 for g, tt, ev in spans if g == 1 and tt == t and ev)
            d2 = sum(1 for g, tt, ev in spans if g == 2 and tt == t and ev)
            if d1 + d2 > 0:
                d, n = d1 + d2, r1 + r2
                o1 += d1
                e1 += (d * r1 * 10**9) // n
                if n > 1:
                    v += (d * r1 * r2 * (n - d) * 10**9) // (n * n * (n - 1))
            r1 -= sum(1 for g, tt, _ in spans if g == 1 and tt == t)
            r2 -= sum(1 for g, tt, _ in spans if g == 2 and tt == t)
        assert rec.observed_g1 == o1
        assert abs(rec.expected_g1 - round(e1 / 1e9, 6)) <= 1e-6
        chi2 = ((o1 * 10**9 - e1) / 1e9) ** 2 / (v / 1e9)
        assert abs(rec.chi2 - chi2) <= max(2e-6, chi2 * 1e-9)
        assert rec.chi2 >= 0


class TestPermutationEntropy:
    def test_matches_pandas_recompute_and_bounds(self, spark, sf_dir):
        import math

        from bireme_spark.queries.timeseries import events_permutation_entropy

        df = events_permutation_entropy(spark, sf_dir).toPandas()
        ev = _pq("events")
        ev["hr"] = pd.to_datetime(ev["ts"]).dt.floor("h")
        for rec in df.itertuples():
            s = (
                ev[ev["event_type"] == rec.event_type]
                .groupby("hr")
                .size()
                .sort_index()
                .to_numpy()
            )
            pats = {}
            for i in range(len(s) - 2):
                a, b, c = int(s[i]), int(s[i + 1]), int(s[i + 2])
                if a <= b:
                    p = "012" if b <= c else ("021" if a <= c else "201")
                else:
                    p = "102" if a <= c else ("120" if b <= c else "210")
                pats[p] = pats.get(p, 0) + 1
            n = sum(pats.values())
            assert rec.n_triples == n and rec.n_patterns == len(pats)
            pe = sum(
                int(round(-(cnt / n) * math.log(cnt / n) * 1e6)) for cnt in pats.values()
            )
            assert rec.pe_nats_e6 == pe
            assert 0.0 <= rec.pe_normalized <= 1.0 + 1e-9


class TestAspectRatioBucketing:
    def test_matches_argmin_recompute(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import (
            _ARB_BUCKETS,
            multimodal_aspect_ratio_bucketing,
        )

        df = multimodal_aspect_ratio_bucketing(spark, sf_dir).toPandas()
        docs = _pq("documents")
        n_docs = len(docs)
        counts = {i: 0 for i, _, _ in _ARB_BUCKETS}
        pads = {i: 0 for i, _, _ in _ARB_BUCKETS}
        for doc_id in docs["doc_id"]:
            w, h = 8 + int(doc_id) % 8, 8 + int(doc_id) % 5
            best = min(
                (abs(w * hb - h * wb) * (144 // hb), i) for i, wb, hb in _ARB_BUCKETS
            )[1]
            _, wb, hb = _ARB_BUCKETS[best]
            if w * hb >= h * wb:
                pad = 10**6 - (h * wb * 10**6) // (w * hb)
            else:
                pad = 10**6 - (w * hb * 10**6) // (h * wb)
            counts[best] += 1
            pads[best] += pad
        assert df["n_images"].sum() == n_docs
        nonempty = 0
        for rec in df.itertuples():
            assert rec.n_images == counts[rec.bucket_id]
            assert rec.share_ppm == counts[rec.bucket_id] * 10**6 // n_docs
            assert rec.mean_pad_ppm == pads[rec.bucket_id] // max(counts[rec.bucket_id], 1)
            nonempty += 1 if rec.n_images else 0
        assert nonempty >= 3


class TestEpochRepetitionPlan:
    def test_matches_muennighoff_decay_recompute(self, spark, sf_dir):
        import math

        from bireme_spark.queries.corpus import corpus_epoch_repetition_plan

        df = corpus_epoch_repetition_plan(spark, sf_dir).toPandas()
        docs = _pq("documents")
        toks = docs.assign(u=docs["text"].str.split(" ").str.len()).groupby("source")["u"].sum()
        u_all, n_src = int(toks.sum()), len(toks)
        budget = (u_all * 8) // n_src
        assert len(df) == n_src
        for rec in df.itertuples():
            u = int(toks[rec.source])
            assert rec.source_tokens == u
            assert rec.budget_tokens == budget
            e_ppm = budget * 10**6 // u
            assert rec.epochs_ppm == e_ppm
            if e_ppm <= 10**6:
                neff = budget
            else:
                e = e_ppm / 1e6
                neff = int(round(u * (1.0 + 15.0 * (1.0 - math.exp(-(e - 1.0) / 15.0)))))
            assert rec.effective_tokens == neff
            assert rec.utility_ppm == neff * 10**6 // budget
            assert rec.wasted_tokens == budget - neff
            # repetition never makes data worth MORE than fresh tokens
            assert rec.effective_tokens <= rec.budget_tokens
            assert rec.effective_tokens >= u  # first epoch is always full value


class TestMrrEval:
    def test_matches_rank_recompute(self, spark, sf_dir):
        from bireme_spark.queries.terms import _NDCG_TERMS, text_mrr_eval

        df = text_mrr_eval(spark, sf_dir).toPandas().set_index("term")
        docs = _pq("documents")
        for term in _NDCG_TERMS:
            cands = []
            for doc_id, text in zip(docs["doc_id"], docs["text"]):
                toks = text.split(" ")
                tf = sum(1 for w in toks if w == term)
                if tf > 0:
                    cands.append((-(tf * 10**6 // len(toks)), int(doc_id), 1 if tf >= 3 else 0))
            cands.sort()
            rels = [r for _, _, r in cands]
            n_rel = sum(rels)
            rec = df.loc[term]
            assert rec["n_relevant"] == n_rel
            first = next((i + 1 for i, r in enumerate(rels) if r), None)
            if first is None:
                assert pd.isna(rec["first_rel_rank"])
                continue
            assert rec["first_rel_rank"] == first
            assert rec["rr_e6"] == 10**6 // first
            hits = 0
            ap_num = 0
            hits10 = 0
            for k, r in enumerate(rels[:10], start=1):
                hits += r
                if r:
                    ap_num += hits * 10**6 // k
                    hits10 += 1
            assert rec["ap_at_10_e6"] == ap_num // max(min(n_rel, 10), 1)
            assert rec["recall_at_10_ppm"] == hits10 * 10**6 // max(n_rel, 1)
            # the strict relevance bar must bite: rank 1 not auto-relevant
            assert rec["rr_e6"] <= 10**6


class TestVarianceRatio:
    def test_matches_exact_integer_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import orders_variance_ratio_test

        df = orders_variance_ratio_test(spark, sf_dir).toPandas()
        o = _pq("orders")
        d = pd.to_datetime(o["o_orderdate"]).dt.normalize()
        cents = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
        y = [int(v) for v in pd.DataFrame({"d": d, "y": cents}).groupby("d")["y"].sum().sort_index()]
        n = len(y)
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        d1 = [y[i] - y[i - 1] for i in range(1, n)]
        k = max(1, max(abs(v) for v in d1) // 10**8)
        stats = {}
        for q in (1, 2, 4, 8):
            dq = [tdiv(y[i] - y[i - q], k) for i in range(q, n)]
            m = len(dq)
            stats[q] = (m, m * sum(v * v for v in dq) - sum(dq) ** 2)
        m1, v1 = stats[1]
        assert len(df) == 3
        for rec in df.itertuples():
            m, v = stats[rec.q]
            assert rec.n_deltas == m
            assert rec.vr_ppm == (v * m1 * m1 * 10**6) // max(rec.q * v1 * m * m, 1)
            # a revenue series is not explosive: VR stays in a sane band
            assert 0 < rec.vr_ppm < 10_000_000


class TestNeweyWest:
    def test_matches_exact_integer_recompute(self, spark, sf_dir):
        import math

        from bireme_spark.queries.timeseries import orders_newey_west

        rec = orders_newey_west(spark, sf_dir).collect()[0]
        o = _pq("orders")
        d = pd.to_datetime(o["o_orderdate"]).dt.normalize()
        cents = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
        daily = pd.DataFrame({"d": d, "y": cents}).groupby("d")["y"].sum().sort_index()
        t = [int(v) for v in (daily.index - daily.index.min()).days]
        y = [int(v) for v in daily.to_numpy()]
        n = len(y)
        st, sy = sum(t), sum(y)
        stt = sum(v * v for v in t)
        sty = sum(a * b for a, b in zip(t, y))
        dd = n * stt - st * st
        num = n * sty - st * sy
        cc = dd * sy - num * st
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        eh = [n * dd * yi - n * num * ti - cc for ti, yi in zip(t, y)]
        k1 = max(1, max(abs(v) for v in eh) // 10**13)
        u = [(n * ti - st) * tdiv(e, k1) for ti, e in zip(t, eh)]
        k2 = max(1, max(abs(v) for v in u) // 10**15)
        up = [tdiv(v, k2) for v in u]
        g = [sum(up[i] * up[i - lag] for i in range(lag, n)) for lag in range(6)]
        s6 = 6 * g[0] + 2 * sum((5 - lag + 1) * g[lag] for lag in range(1, 6))
        assert rec.n_days == n
        assert abs(rec.slope_cents_per_day - round(num / dd, 6)) <= 1e-6
        se = math.sqrt(s6 / 6.0) * k1 * k2 / (n * float(dd) * float(dd))
        assert abs(rec.se_hac - se) <= max(2e-6, se * 1e-9)
        assert abs(rec.t_hac - (num / dd) / se) <= max(2e-6, abs(rec.t_hac) * 1e-9)
        assert rec.se_hac > 0


class TestBipartiteProjection:
    def test_matches_sampled_recompute(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.audit import graph_bipartite_projection

        rec = graph_bipartite_projection(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        sp = li[["l_partkey", "l_suppkey"]].drop_duplicates()
        deg = sp.groupby("l_partkey").size()
        n_parts = len(deg)
        assert rec.n_parts == n_parts
        assert rec.n_suppliers == sp["l_suppkey"].nunique()
        assert rec.total_copair_incidences == int(sum(s * (s - 1) // 2 for s in deg))
        assert rec.max_suppliers_per_part == int(deg.max())
        byte = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:2], 16)
        kept_parts = {p for p in deg.index if byte(f"part:{p}") * n_parts < 256 * 1500}
        pairs = {}
        n_parts_sampled = 0
        for p, grp in sp[sp["l_partkey"].isin(kept_parts)].groupby("l_partkey"):
            n_parts_sampled += 1
            sups = sorted(
                grp["l_suppkey"],
                key=lambda s: (hashlib.md5(f"rk:{s}".encode()).hexdigest(), s),
            )[:40]
            for i in range(len(sups)):
                for j in range(i + 1, len(sups)):
                    key = (min(sups[i], sups[j]), max(sups[i], sups[j]))
                    pairs[key] = pairs.get(key, 0) + 1
        assert rec.n_parts_sampled == n_parts_sampled
        assert rec.sampled_copair_edges == len(pairs)
        assert rec.sampled_incidences == sum(pairs.values())
        assert rec.max_edge_weight == max(pairs.values())
        assert rec.mean_edge_weight_ppm == sum(pairs.values()) * 10**6 // max(len(pairs), 1)


class TestKnnLabelPurity:
    def test_matches_exact_knn_recompute(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.embeddings import (
            _KNN_C_CAP,
            _KNN_Q_CAP,
            embedding_label_knn_purity,
        )

        df = embedding_label_knn_purity(spark, sf_dir).toPandas()
        emb = _pq("embeddings")
        n = len(emb)
        hexd = {int(v): hashlib.md5(str(int(v)).encode()).hexdigest() for v in emb["vec_id"]}
        qmask = [int(hexd[int(v)][:2], 16) * n < 256 * _KNN_Q_CAP for v in emb["vec_id"]]
        cmask = [int(hexd[int(v)][2:4], 16) * n < 256 * _KNN_C_CAP for v in emb["vec_id"]]
        Q = emb[qmask]
        C = emb[cmask]
        correct = {}
        totals = {}
        for qid, qlab, qv in zip(Q["vec_id"], Q["label"], Q["embedding"]):
            cand = []
            for cid, clab, cv in zip(C["vec_id"], C["label"], C["embedding"]):
                if int(cid) == int(qid):
                    continue
                acc = 0.0
                for x, y in zip(qv.astype("float64"), cv.astype("float64")):
                    acc = acc + (x - y) * (x - y)
                cand.append((int(round(acc * 1e6)), int(cid), int(clab)))
            cand.sort()
            top = cand[:5]
            counts = {}
            for _, _, lab in top:
                counts[lab] = counts.get(lab, 0) + 1
            pred = min((5 - c) * 16 + lab for lab, c in counts.items()) % 16
            totals[int(qlab)] = totals.get(int(qlab), 0) + 1
            if pred == int(qlab):
                correct[int(qlab)] = correct.get(int(qlab), 0) + 1
        assert df["n_queries"].sum() == len(Q)
        for rec in df.itertuples():
            assert rec.n_queries == totals.get(rec.label, 0)
            assert rec.n_correct == correct.get(rec.label, 0)
            assert rec.purity_ppm == correct.get(rec.label, 0) * 10**6 // max(
                totals.get(rec.label, 0), 1
            )


class TestBatchCoalescing:
    def test_matches_bucket_recompute_and_monotone(self, spark, sf_dir):
        from bireme_spark.queries.cdc import cdc_batch_coalescing_report

        df = cdc_batch_coalescing_report(spark, sf_dir).toPandas()
        o = _pq("orders")
        d = pd.to_datetime(o["o_orderdate"]).dt.normalize()
        day = (d - d.min()).dt.days.to_numpy()
        k = o["o_custkey"].to_numpy()
        n_ops = len(o)
        prev_saved = -1
        for rec in df.itertuples():
            b = day // rec.window_days
            flushes = len(set(zip(k, b)))
            assert rec.n_ops == n_ops
            assert rec.n_flushes == flushes
            assert rec.saved_ppm == (n_ops - flushes) * 10**6 // n_ops
            counts = pd.DataFrame({"k": k, "b": b}).groupby(["k", "b"]).size()
            assert rec.max_ops_per_flush == int(counts.max())
            # wider windows can only coalesce MORE
            assert rec.saved_ppm >= prev_saved
            prev_saved = rec.saved_ppm


class TestCentroidConfusion:
    def test_matches_integer_rocchio_recompute(self, spark, sf_dir):
        from bireme_spark.queries.embeddings import embedding_label_centroid_confusion

        df = embedding_label_centroid_confusion(spark, sf_dir).toPandas()
        emb = _pq("embeddings")
        X = np.stack([np.round(v.astype("float64") * 1e6).astype("int64") for v in emb["embedding"]])
        labs = emb["label"].to_numpy()
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        cents = {}
        for lab in sorted(set(labs)):
            block = X[labs == lab]
            cents[lab] = [tdiv(int(s), len(block)) for s in block.sum(axis=0)]
        conf = {}
        for row, lab in zip(X, labs):
            best = min(
                (sum((int(x) - c) ** 2 for x, c in zip(row, cv)) * 16 + cl)
                for cl, cv in cents.items()
            ) % 16
            conf[(int(lab), best)] = conf.get((int(lab), best), 0) + 1
        assert int(df["n"].sum()) == len(emb)
        row_tot = {}
        for (t, _), n in conf.items():
            row_tot[t] = row_tot.get(t, 0) + n
        for rec in df.itertuples():
            assert rec.n == conf.get((rec.true_label, rec.pred_label), 0)
            assert rec.row_share_ppm == rec.n * 10**6 // row_tot[rec.true_label]
        # the classifier must beat chance on this clustered fixture
        acc = sum(n for (t, p), n in conf.items() if t == p) / len(emb)
        assert acc > 0.2


class TestMedianPolish:
    def test_matches_two_sweep_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import orders_median_polish

        df = orders_median_polish(spark, sf_dir).toPandas()
        o = _pq("orders")
        d = pd.to_datetime(o["o_orderdate"]).dt.normalize()
        day = (d - d.min()).dt.days
        cells = (
            pd.DataFrame({"w": day // 7, "dow": day % 7})
            .groupby(["w", "dow"])
            .size()
            .to_dict()
        )
        lowmed = lambda xs: sorted(xs)[(len(xs) + 1) // 2 - 1]
        resid = dict(cells)
        rm_acc = {}
        cm_acc = {}
        for _ in range(2):
            for w in {k[0] for k in resid}:
                vals = [v for k, v in resid.items() if k[0] == w]
                m = lowmed(vals)
                rm_acc[w] = rm_acc.get(w, 0) + m
                for k in list(resid):
                    if k[0] == w:
                        resid[k] -= m
            for dw in {k[1] for k in resid}:
                vals = [v for k, v in resid.items() if k[1] == dw]
                m = lowmed(vals)
                cm_acc[dw] = cm_acc.get(dw, 0) + m
                for k in list(resid):
                    if k[1] == dw:
                        resid[k] -= m
        gr = lowmed(list(rm_acc.values()))
        gc = lowmed(list(cm_acc.values()))
        assert len(df) == 7
        for rec in df.itertuples():
            assert rec.dow_effect == cm_acc[rec.dow] - gc
            assert rec.overall == gr + gc
            assert rec.n_cells == len(cells)
            assert rec.max_abs_resid == max(abs(v) for v in resid.values())
            assert rec.med_abs_resid == lowmed([abs(v) for v in resid.values()])
        # effects must reconstruct: overall + effect ~ typical dow level
        assert df["dow_effect"].abs().max() <= df["overall"].iloc[0] * 2 + 10


class TestBenfordSecondDigit:
    def test_matches_recompute_and_law_sums_to_one(self, spark, sf_dir):
        import math

        from bireme_spark.queries.audit import lineitem_benford_second_digit

        df = lineitem_benford_second_digit(spark, sf_dir).toPandas()
        li = _pq("lineitem")
        from decimal import ROUND_HALF_UP, Decimal

        digs = []
        for v in li["l_extendedprice"]:
            dv = Decimal(float(v)).quantize(Decimal("0.01"), ROUND_HALF_UP)
            if dv >= 10:
                digs.append(int(str(dv)[1]))
        tot = len(digs)
        exp = {
            d: sum(math.log10(1 + 1 / (10 * d1 + d)) for d1 in range(1, 10))
            for d in range(10)
        }
        assert abs(sum(exp.values()) - 1.0) < 1e-12
        assert len(df) == 10 and int(df["n"].sum()) == tot
        for rec in df.itertuples():
            n = sum(1 for d in digs if d == rec.second_digit)
            assert rec.n == n
            assert abs(rec.observed - round(n / tot, 6)) <= 1e-6
            assert abs(rec.expected - exp[rec.second_digit]) <= 1.1e-6
            o, e = n / tot, exp[rec.second_digit]
            assert abs(rec.chi2_contrib - tot * (o - e) ** 2 / e) <= 2e-5


class TestKdeModes:
    def test_matches_binomial_smoothing_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_kde_modes

        df = events_kde_modes(spark, sf_dir).toPandas()
        ev = _pq("events")
        ev["b"] = np.floor(ev["value"]).astype("int64")
        mx = int(ev["b"].max())
        for rec in df.itertuples():
            g = ev[ev["event_type"] == rec.event_type]
            c = np.zeros(mx + 1, dtype="int64")
            for b, n in g.groupby("b").size().items():
                c[int(b)] = n
            tot = int(c.sum())
            for _ in range(3):
                c = np.concatenate([[0], c[:-1]]) + 2 * c + np.concatenate([c[1:], [0]])
            cl = np.concatenate([[0], c[:-1]])
            cr = np.concatenate([c[1:], [0]])
            peaks = [
                (int(-c[b]), b)
                for b in range(mx + 1)
                if cl[b] < c[b] and c[b] >= cr[b] and int(c[b]) * 1000 > tot * 64
            ]
            peaks.sort()
            assert rec.n_modes == len(peaks)
            assert rec.mode1_bin == peaks[0][1]
            assert rec.mode1_mass_ppm == (-peaks[0][0]) * 10**6 // (tot * 64)
            if len(peaks) > 1:
                rest = sorted(p for p in peaks if p[1] != peaks[0][1])
                assert rec.mode2_bin == rest[0][1]
            else:
                assert pd.isna(rec.mode2_bin)
            # a mode census must find at least ONE mode
            assert rec.n_modes >= 1


class TestSq8Distortion:
    def test_matches_fold_recompute_and_bounds(self, spark, sf_dir):
        import math

        from bireme_spark.queries.embeddings import embedding_sq8_distortion

        rec = embedding_sq8_distortion(spark, sf_dir).collect()[0]
        emb = _pq("embeddings")
        mses, coss = [], []
        for v in emb["embedding"]:
            x = v.astype("float64")
            scale = max(float(np.abs(x).max()), 1e-12) / 127.0
            acc_m = 0.0
            acc_xy = 0.0
            acc_xx = 0.0
            acc_yy = 0.0
            for xi in x:
                # replicate SQL ROUND (half away from zero on a double)
                q = math.floor(abs(xi) / scale + 0.5) * (1 if xi >= 0 else -1)
                r = q * scale
                acc_m = acc_m + (xi - r) * (xi - r)
                acc_xy = acc_xy + xi * r
                acc_xx = acc_xx + xi * xi
                acc_yy = acc_yy + r * r
            mses.append(int(round(acc_m / 64.0 * 1e9)))
            coss.append(int(round(acc_xy / (math.sqrt(acc_xx) * math.sqrt(acc_yy)) * 1e6)))
        n = len(mses)
        assert rec.n_vecs == n
        assert rec.mean_mse_e9 == sum(mses) // n
        assert rec.max_mse_e9 == max(mses)
        assert rec.mean_cos_retention_e6 == sum(coss) // n
        assert rec.min_cos_retention_e6 == min(coss)
        bks = sorted(m // 10**6 for m in mses)
        assert rec.p95_mse_bucket_e3 == bks[(n * 95 + 99) // 100 - 1]
        # SQ8 on unit-scale vectors must retain virtually all cosine
        assert rec.mean_cos_retention_e6 >= 999_000


class TestInterpurchaseCV:
    def test_matches_gap_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import customers_interpurchase_cv

        df = customers_interpurchase_cv(spark, sf_dir).toPandas()
        o = _pq("orders")
        c = _pq("customer")
        oo = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
        oo = oo.sort_values(["o_custkey", "o_orderdate"], kind="mergesort")
        seg_gaps = {}
        for (ck, seg), grp in oo.groupby(["o_custkey", "c_mktsegment"]):
            ds = list(grp["o_orderdate"])
            for a, b in zip(ds, ds[1:]):
                g = (b - a).days
                if g > 0:
                    seg_gaps.setdefault(seg, []).append(g)
        for rec in df.itertuples():
            gs = seg_gaps[rec.segment]
            m, s1, s2 = len(gs), sum(gs), sum(g * g for g in gs)
            assert rec.n_gaps == m
            assert rec.mean_gap_days_x1000 == s1 * 1000 // m
            cv2 = (m * s2 - s1 * s1) * 10**6 // (s1 * s1)
            assert rec.cv2_ppm == cv2
            expect = "regular" if cv2 < 700000 else ("poisson" if cv2 <= 1300000 else "bursty")
            assert rec.regime == expect


class TestOovRateMatrix:
    def test_matches_vocab_recompute_and_diag_best(self, spark, sf_dir):
        from collections import Counter

        from bireme_spark.queries.terms import tokenizer_oov_rate_matrix

        df = tokenizer_oov_rate_matrix(spark, sf_dir).toPandas()
        docs = _pq("documents")
        tc = {}
        for src, text in zip(docs["source"], docs["text"]):
            tc.setdefault(src, Counter()).update(text.split(" "))
        vocab = {
            src: {t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]}
            for src, cnt in tc.items()
        }
        srcs = sorted(tc)
        assert len(df) == len(srcs) ** 2
        diag = {}
        rows = {}
        for rec in df.itertuples():
            cnt = tc[rec.source]
            total = sum(cnt.values())
            covered = sum(c for t, c in cnt.items() if t in vocab[rec.vocab_source])
            assert rec.total_tokens == total
            assert rec.covered_tokens == covered
            assert rec.oov_ppm == (total - covered) * 10**6 // total
            rows.setdefault(rec.source, []).append(rec.oov_ppm)
            if rec.source == rec.vocab_source:
                diag[rec.source] = rec.oov_ppm
        # a source's own vocabulary must beat the row average
        for src in srcs:
            assert diag[src] <= sum(rows[src]) / len(rows[src])


class TestCorrespondenceAnalysis:
    def test_matches_exact_pipeline_and_true_eigensolve(self, spark, sf_dir):
        import math

        from bireme_spark.queries.relational import (
            _CA_ITERS,
            _ca_tdiv,
            nations_correspondence_analysis,
        )

        df = nations_correspondence_analysis(spark, sf_dir).toPandas()
        o = _pq("orders")
        c = _pq("customer")
        oo = o.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        tab = oo.groupby(["c_nationkey", "o_orderpriority"]).size().unstack(fill_value=0)
        tab = tab[sorted(tab.columns)]
        N = int(tab.to_numpy().sum())
        R = tab.sum(axis=1).to_numpy()
        C = tab.sum(axis=0).to_numpy()
        A = np.zeros(tab.shape, dtype="int64")
        for i in range(tab.shape[0]):
            for j in range(tab.shape[1]):
                val = (N * int(tab.iat[i, j]) - int(R[i]) * int(C[j])) / (
                    math.sqrt(N) * math.sqrt(int(R[i]) * int(C[j]))
                )
                A[i, j] = int(round(val * 1e6))
        M = (A.T.astype(object) @ A.astype(object))
        dim = tab.shape[1]
        v = [10**6] * dim
        for _ in range(_CA_ITERS):
            w = [sum(int(M[j][k]) * v[j] for j in range(dim)) for k in range(dim)]
            mx = max(max(abs(x) for x in w), 1)
            v = [_ca_tdiv(x * 10**6, mx) for x in w]
        if next(x for x in v if x != 0) < 0:
            v = [-x for x in v]
        vmv = sum(v[j] * int(M[j][k]) * v[k] for j in range(dim) for k in range(dim))
        vv = sum(x * x for x in v)
        trace = sum(int(M[k][k]) for k in range(dim))
        share = _ca_tdiv(vmv * 10**6, max(vv * trace, 1))
        inertia = sum(int(a) ** 2 for a in A.flatten()) // 10**6
        assert len(df) == dim
        for rec in df.itertuples():
            jj = rec.j - 1
            assert rec.axis1_coord_e6 == v[jj]
            assert rec.total_inertia_e6 == inertia
            assert rec.axis1_share_ppm == share
            assert rec.n_orders == N
            assert rec.col_mass_ppm == int(C[jj]) * 10**6 // N
        # the integer power iteration must agree with a FLOAT eigensolve
        Mf = np.array(M.tolist(), dtype="float64")
        evals, evecs = np.linalg.eigh(Mf)
        lam1 = evals[-1]
        top = evecs[:, -1]
        top = top / np.abs(top).max()
        if next(x for x in top if abs(x) > 1e-12) < 0:
            top = -top
        got = np.array(v, dtype="float64") / 1e6
        assert np.max(np.abs(got - top)) < 1e-3
        assert abs(share / 1e6 - lam1 / Mf.trace()) < 1e-3


class TestGtidGapAudit:
    def test_matches_interval_recompute(self, spark, sf_dir):
        from bireme_spark.queries.cdc import cdc_gtid_gap_audit

        df = cdc_gtid_gap_audit(spark, sf_dir).toPandas()
        o = _pq("orders")
        per = {}
        for ck, ok in zip(o["o_custkey"], o["o_orderkey"]):
            per.setdefault(int(ck) % 3, set()).add(int(ok) // 4)
        for rec in df.itertuples():
            txns = sorted(per[rec.server])
            islands = []
            lo = prev = txns[0]
            for t in txns[1:]:
                if t == prev + 1:
                    prev = t
                else:
                    islands.append((lo, prev))
                    lo = prev = t
            islands.append((lo, prev))
            holes = [b[0] - a[1] - 1 for a, b in zip(islands, islands[1:])]
            assert rec.n_txns == len(txns)
            assert rec.n_islands == len(islands)
            assert rec.n_holes == sum(1 for h in holes if h > 0)
            assert rec.missing_txns == sum(holes)
            assert rec.largest_hole == (max(holes) if holes else 0)
            # conservation: txns + missing spans the full range
            assert rec.n_txns + rec.missing_txns == txns[-1] - txns[0] + 1


class TestExtremalIndex:
    def test_matches_runs_recompute_and_bounds(self, spark, sf_dir):
        from bireme_spark.queries.events import events_extremal_index

        df = events_extremal_index(spark, sf_dir).toPandas()
        ev = _pq("events")
        ev["x"] = np.round(ev["value"].to_numpy() * 1000).astype("int64")
        ev["us"] = pd.to_datetime(ev["ts"]).astype("datetime64[us]").astype("int64")
        for rec in df.itertuples():
            g = ev[ev["event_type"] == rec.event_type]
            xs = np.sort(g["x"].to_numpy())
            n = len(xs)
            u = xs[(n * 95 + 99) // 100 - 1]
            assert rec.threshold_x1000 == u
            times = sorted(g[g["x"] > u]["us"])
            clusters = 1 + sum(
                1 for a, b in zip(times, times[1:]) if b - a > 7_200_000_000
            )
            assert rec.n_exceedances == len(times)
            assert rec.n_clusters == clusters
            assert rec.theta_ppm == clusters * 10**6 // len(times)
            assert 0 < rec.theta_ppm <= 10**6


class TestExposureAudit:
    def test_matches_symbolic_pixels(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_image_exposure_audit

        df = multimodal_image_exposure_audit(spark, sf_dir).toPandas()
        docs = _pq("documents")
        assert len(df) == len(docs)
        flags = set()
        for rec in df.itertuples():
            doc_id = int(rec.doc_id)
            w, h = 8 + doc_id % 8, 8 + doc_id % 5
            pix = np.array(
                [
                    (x + y + doc_id + 37 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                ],
                dtype="int64",
            )
            npx = pix.size
            assert (rec.width, rec.height) == (w, h)
            assert rec.clip_lo_ppm == int((pix <= 5).sum()) * 10**6 // npx
            assert rec.clip_hi_ppm == int((pix >= 250).sum()) * 10**6 // npx
            assert rec.dynamic_range == int(pix.max() - pix.min())
            assert rec.mean_x1000 == int(pix.sum()) * 1000 // npx
            flags.add(rec.exposure_flag)
        # the synthetic ramp must produce BOTH clipped and ok images
        assert "ok" in flags and len(flags) >= 2


class TestQuantileRegressionProfile:
    def test_matches_pinball_scan_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_quantile_regression_profile

        df = lineitem_quantile_regression_profile(spark, sf_dir).toPandas()
        o = _pq("orders")
        d = pd.to_datetime(o["o_orderdate"]).dt.normalize()
        cents = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
        daily = pd.DataFrame({"d": d, "y": cents}).groupby("d")["y"].sum().sort_index()
        t = [int(v) for v in (daily.index - daily.index.min()).days]
        y = [int(v) for v in daily.to_numpy()]
        n = len(y)
        st, sy = sum(t), sum(y)
        stt = sum(v * v for v in t)
        sty = sum(a * b for a, b in zip(t, y))
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        b_ols = tdiv((n * sty - st * sy) * 1000, n * stt - st * st)
        step = max(abs(b_ols) // 10, 1)
        losses = {}
        for j in range(21):
            b = b_ols + (j - 10) * step
            r = sorted(yy * 1000 - b * tt for tt, yy in zip(t, y))
            a = r[(n + 1) // 2 - 1]
            losses[j] = (b, a, sum(abs(v - a) for v in r))
        best_loss = min(l for _, _, l in losses.values())
        jbest = min(j for j, (_, _, l) in losses.items() if l == best_loss)
        assert len(df) == 21
        for rec in df.itertuples():
            b, a, l = losses[rec.j]
            assert rec.slope_cents_per_day_x1000 == b
            assert rec.ols_slope_x1000 == b_ols
            assert rec.intercept_cents == tdiv(a, 1000)
            assert rec.l1_loss_cents == l // 1000
            assert rec.is_best == (1 if rec.j == jbest else 0)
        # exactly one argmin flagged, and the profile is U-ish around it
        assert int(df["is_best"].sum()) == 1


class TestSurvivorQualityAudit:
    def test_planted_directions_fire(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.dedup import dedup_survivor_quality_audit

        df = dedup_survivor_quality_audit(spark, sf_dir).toPandas().set_index("variant_kind")
        docs = _pq("documents")

        def q(text):
            ws = text.split(" ")
            nt = len(ws)
            ns = sum(1 for w in ws if w in ("a", "the"))
            return min(10**6, nt * 2500) * (10**6 - ns * 10**6 // nt)

        stats = {"doubled": [], "truncated": []}
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            nib = int(hashlib.md5(f"sv:{int(doc_id)}".encode()).hexdigest()[0], 16)
            if nib < 2:
                variant = text + " " + text
                kind = "doubled"
            elif nib < 4:
                ws = text.split(" ")
                variant = " ".join(ws[: max(len(ws) // 2, 1)])
                kind = "truncated"
            else:
                continue
            qo, qv = q(text), q(variant)
            qmax = max(qo, qv)
            stats[kind].append((qo < qmax, qmax - qo))
        for kind in ("doubled", "truncated"):
            rec = df.loc[kind]
            assert rec["n_clusters"] == len(stats[kind])
            assert rec["n_suboptimal_survivor"] == sum(1 for s, _ in stats[kind] if s)
            gaps = [g for _, g in stats[kind]]
            assert rec["mean_quality_gap_e12"] == sum(gaps) // len(gaps)
            assert rec["max_quality_gap_e12"] == max(gaps)
        # the audit must FIRE where planted: doubling beats the original
        assert df.loc["doubled"]["n_suboptimal_survivor"] > 0
        # and min-id is fine against truncation
        assert df.loc["truncated"]["n_suboptimal_survivor"] == 0


class TestProductDiversity:
    def test_matches_exact_simpson_and_shannon(self, spark, sf_dir):
        import math

        from bireme_spark.queries.relational import nations_product_diversity

        df = nations_product_diversity(spark, sf_dir).toPandas()
        li = _pq("lineitem")
        s = _pq("supplier")
        p = _pq("part")
        nat = _pq("nation")
        j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey").merge(
            p, left_on="l_partkey", right_on="p_partkey"
        )
        names = dict(zip(nat["n_nationkey"], nat["n_name"]))
        for rec in df.itertuples():
            key = next(k for k, v in names.items() if v == rec.nation)
            g = j[j["s_nationkey"] == key]
            counts = g.groupby("p_type").size()
            N = int(counts.sum())
            same2 = sum(int(c) * (int(c) - 1) for c in counts)
            assert rec.n_items == N
            assert rec.n_types == len(counts)
            assert rec.simpson_pie_ppm == (N * (N - 1) - same2) * 10**6 // (N * (N - 1))
            h = sum(
                int(round(-(int(c) / N) * math.log(int(c) / N) * 1e6)) for c in counts
            )
            assert rec.shannon_e6 == h
            assert 0 < rec.simpson_pie_ppm < 10**6


class TestDedupWindowAdvisor:
    def test_matches_gap_recompute_and_monotone(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.cdc import cdc_dedup_window_advisor

        df = cdc_dedup_window_advisor(spark, sf_dir).toPandas()
        ev = _pq("events")
        gaps = []
        for eid in ev["event_id"]:
            hx = hashlib.md5(f"rd:{int(eid)}".encode()).hexdigest()
            if int(hx[0], 16) < 2:
                gaps.append((1 + int(hx[1], 16)) * 60000)
        gaps.sort()
        n = len(gaps)
        prev = -1
        for rec in df.itertuples():
            caught = sum(1 for g in gaps if g <= rec.window_min * 60000)
            assert rec.n_dupes == n
            assert rec.caught == caught
            assert rec.caught_ppm == caught * 10**6 // n
            assert rec.p50_gap_ms == gaps[(n * 50 + 99) // 100 - 1]
            assert rec.p99_gap_ms == gaps[(n * 99 + 99) // 100 - 1]
            assert rec.clears_p99 == (1 if rec.window_min * 60000 >= rec.p99_gap_ms else 0)
            assert rec.caught_ppm >= prev
            prev = rec.caught_ppm
        # the 15-minute window must clear the p99 gap (gaps are 1..16 min)
        assert df[df["window_min"] == 15]["caught_ppm"].iloc[0] >= 900_000


class TestAudioDynamicRange:
    def test_matches_symbolic_samples(self, spark, sf_dir):
        import math

        from bireme_spark.queries.multimodal import multimodal_audio_dynamic_range

        df = multimodal_audio_dynamic_range(spark, sf_dir).toPandas()
        docs = _pq("documents")
        assert len(df) == len(docs)
        for rec in df.itertuples():
            doc_id = int(rec.doc_id)
            n = 64 + doc_id % 64
            samples = [(doc_id * 31 + i * 7) % 2048 - 1024 for i in range(n)]
            s = sum(samples)
            ss = sum(v * v for v in samples)
            peak = max(abs(v) for v in samples)
            assert rec.n_samples == n
            assert rec.peak == peak
            assert abs(rec.crest_e6 - peak / math.sqrt(ss / n) * 1e6) <= 1.1
            assert rec.dc_offset_ppm == abs(s) * 10**6 // (n * 1024)
            assert rec.headroom_ppm == (1024 - peak) * 10**6 // 1024
            # a sawtooth-ish ramp has crest factor between 1 and ~2
            assert 1_000_000 <= rec.crest_e6 <= 2_200_000


class TestSpectralBisection:
    def test_matches_integer_iteration_and_beats_parity_cut(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.audit import _SB_ITERS, graph_spectral_bisection

        rec = graph_spectral_bisection(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        li = li[li["l_orderkey"] % 40 == 0]
        po = li[["l_orderkey", "l_partkey"]].drop_duplicates()
        und = set()
        for _, grp in po.groupby("l_orderkey"):
            ps = sorted(grp["l_partkey"])
            for a, b in zip(ps, ps[1:]):
                if a != b:
                    und.add((int(a), int(b)))
        edges = {}
        for u, v in und:
            edges.setdefault(u, set()).add(v)
            edges.setdefault(v, set()).add(u)
        nodes = sorted(edges)
        deg = {u: len(vs) for u, vs in edges.items()}
        c = 2 * max(deg.values())
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        val = {
            u: (int(hashlib.md5(f"sb:{u}".encode()).hexdigest()[:2], 16) - 128) * 7813
            for u in nodes
        }
        for _ in range(_SB_ITERS):
            w = {
                u: (c - deg[u]) * val[u] + sum(val[x] for x in edges[u]) for u in nodes
            }
            m = tdiv(sum(w.values()), len(nodes))
            w = {u: x - m for u, x in w.items()}
            mx = max(max(abs(x) for x in w.values()), 1)
            val = {u: tdiv(x * 10**6, mx) for u, x in w.items()}
        cut = sum(1 for u, v in und if (val[u] >= 0) != (val[v] >= 0))
        vol_a = sum(deg[u] for u in nodes if val[u] >= 0)
        vol_b = sum(deg[u] for u in nodes if val[u] < 0)
        vlv = sum((val[u] - val[v]) ** 2 for u, v in und)
        vv = sum(x * x for x in val.values())
        assert rec.n_nodes == len(nodes)
        assert rec.n_edges == len(und)
        assert rec.side_a_nodes == sum(1 for u in nodes if val[u] >= 0)
        assert rec.side_b_nodes == len(nodes) - rec.side_a_nodes
        assert rec.cut_edges == cut
        assert rec.conductance_ppm == cut * 10**6 // max(min(vol_a, vol_b) // 2, 1)
        assert rec.lambda2_e6 == tdiv(vlv * 10**6, max(vv, 1))
        # the spectral cut must beat a hash-parity cut on this graph
        par = {u: int(hashlib.md5(f"p:{u}".encode()).hexdigest()[0], 16) % 2 for u in nodes}
        pcut = sum(1 for u, v in und if par[u] != par[v])
        pvol = min(
            sum(deg[u] for u in nodes if par[u] == 0),
            sum(deg[u] for u in nodes if par[u] == 1),
        )
        assert rec.conductance_ppm < pcut * 10**6 // max(pvol // 2, 1)


class TestBinarySignRecall:
    def test_matches_rank_recompute(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.embeddings import (
            _BSR_C_CAP,
            _BSR_Q_CAP,
            embedding_binary_sign_recall,
        )

        df = embedding_binary_sign_recall(spark, sf_dir).toPandas()
        emb = _pq("embeddings")
        n = len(emb)
        hexd = {int(v): hashlib.md5(str(int(v)).encode()).hexdigest() for v in emb["vec_id"]}
        Q = emb[[int(hexd[int(v)][:2], 16) * n < 256 * _BSR_Q_CAP for v in emb["vec_id"]]]
        C = emb[[int(hexd[int(v)][2:4], 16) * n < 256 * _BSR_C_CAP for v in emb["vec_id"]]]
        hist = {h: 0 for h in range(11)}
        total_hits = 0
        for qid, qv in zip(Q["vec_id"], Q["embedding"]):
            cands = []
            for cid, cv in zip(C["vec_id"], C["embedding"]):
                if int(cid) == int(qid):
                    continue
                acc = 0.0
                ham = 0
                for x, y in zip(qv.astype("float64"), cv.astype("float64")):
                    acc = acc + x * y
                    ham += 0 if (x >= 0) == (y >= 0) else 1
                cands.append((int(round(acc * 1e6)), int(cid), ham))
            truth = sorted(cands, key=lambda t: (-t[0], t[1]))[:10]
            hamr = sorted(cands, key=lambda t: (t[2], t[1]))[:10]
            hset = {cid for _, cid, _ in hamr}
            hits = sum(1 for _, cid, _ in truth if cid in hset)
            hist[hits] += 1
            total_hits += hits
        n_total = len(Q)
        assert len(df) == 11
        for rec in df.itertuples():
            assert rec.n_queries == hist[rec.hits_at_10]
            assert rec.n_total == n_total
            assert rec.mean_recall_ppm == total_hits * 10**6 // (n_total * 10)
        # sign bits must beat the random-ranking baseline 10/(|C|-1)
        random_ppm = 10 * 10**6 // (len(C) - 1)
        assert df["mean_recall_ppm"].iloc[0] > random_ppm


class TestFanoProfile:
    def test_matches_weekly_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import orders_fano_factor_profile

        df = orders_fano_factor_profile(spark, sf_dir).toPandas()
        o = _pq("orders")
        d = pd.to_datetime(o["o_orderdate"]).dt.normalize()
        day = (d - d.min()).dt.days
        daily = pd.DataFrame({"w": day // 7, "dow": day % 7}).groupby(["w", "dow"]).size()
        fs = []
        for w, grp in daily.groupby(level=0):
            if len(grp) != 7:
                continue
            m, s1 = 7, int(grp.sum())
            s2 = int((grp**2).sum())
            fs.append((m * s2 - s1 * s1) * 10**6 // ((m - 1) * s1))
        band = lambda f: (
            "under_0.5" if f < 500000 else
            "poisson_band" if f < 1500000 else
            "over_1.5_3" if f < 3000000 else "over_3plus"
        )
        n_weeks = len(fs)
        n_over = sum(1 for f in fs if f > 1500000)
        got_bands = {}
        for f in fs:
            got_bands.setdefault(band(f), []).append(f)
        assert len(df) == len(got_bands)
        for rec in df.itertuples():
            vals = got_bands[rec.band]
            assert rec.n_weeks_band == len(vals)
            assert rec.min_f_ppm == min(vals)
            assert rec.max_f_ppm == max(vals)
            assert rec.n_weeks == n_weeks
            assert rec.overdispersed_share_ppm == n_over * 10**6 // n_weeks


class TestClusterAwareSplit:
    def test_aware_split_has_zero_leakage_and_naive_leaks(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.corpus import corpus_cluster_aware_split

        df = corpus_cluster_aware_split(spark, sf_dir).toPandas()
        docs = _pq("documents")
        nib = lambda pre, i: int(hashlib.md5(f"{pre}:{i}".encode()).hexdigest()[0], 16)
        members = []
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            members.append((int(doc_id), text))
            if nib("cs", int(doc_id)) < 2:
                members.append((int(doc_id) + 1000000, text))
        canon = {}
        for did, text in members:
            canon[text] = min(canon.get(text, did), did)
        split_of = lambda i: (
            "train" if nib("sp", i) < 13 else ("val" if nib("sp", i) == 13 else "test")
        )
        rows = {}
        naive_leak = set()
        toks = {}
        clusters = {}
        for did, text in members:
            cid = canon[text]
            sp = split_of(cid)
            rows.setdefault(sp, []).append(did)
            toks[sp] = toks.get(sp, 0) + len(text.split(" "))
            clusters.setdefault(sp, set()).add(cid)
            if split_of(did) != split_of(cid):
                pass
        # naive straddling: clusters whose members land in >1 naive split
        by_cluster = {}
        for did, text in members:
            by_cluster.setdefault(canon[text], set()).add(split_of(did))
        naive_straddle = sum(1 for s in by_cluster.values() if len(s) > 1)
        total = len(members)
        for rec in df.itertuples():
            assert rec.n_docs == len(rows[rec.split])
            assert rec.n_tokens == toks[rec.split]
            assert rec.n_clusters == len(clusters[rec.split])
            assert rec.doc_share_ppm == len(rows[rec.split]) * 10**6 // total
            assert rec.aware_straddling_clusters == 0
            assert rec.naive_straddling_clusters == naive_straddle
        # the plant must make the naive split actually leak
        assert df["naive_straddling_clusters"].iloc[0] > 0
        # shares near 81/6/12 by the nibble design
        tr = df.set_index("split").loc["train", "doc_share_ppm"]
        assert 700_000 < tr < 900_000


class TestDormancyReactivation:
    def test_matches_span_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import customers_dormancy_reactivation

        df = customers_dormancy_reactivation(spark, sf_dir).toPandas()
        o = _pq("orders")
        c = _pq("customer")
        seg_of = dict(zip(c["c_custkey"], c["c_mktsegment"]))
        horizon = o["o_orderdate"].max()
        spans = []
        oo = o.sort_values(["o_custkey", "o_orderdate"], kind="mergesort")
        for ck, grp in oo.groupby("o_custkey"):
            ds = list(grp["o_orderdate"])
            for i, d0 in enumerate(ds):
                nxt = ds[i + 1] if i + 1 < len(ds) else None
                t = ((nxt if nxt is not None else horizon) - d0).days
                if t > 0:
                    spans.append((seg_of[ck], t, nxt is not None))
        closed = sorted(t for _, t, cl in spans if cl)
        n = len(closed)
        u = closed[(n * 90 + 99) // 100 - 1]
        for rec in df.itertuples():
            dorm = [(t, cl) for sg, t, cl in spans if sg == rec.segment and t > u]
            re_ = sum(1 for _, cl in dorm if cl)
            op_ = len(dorm) - re_
            assert rec.dormancy_threshold_days == u
            assert rec.reactivated == re_
            assert rec.still_dormant == op_
            assert rec.reactivation_rate_ppm == re_ * 10**6 // (re_ + op_)
            exc = sum(t - u for t, cl in dorm if cl)
            assert rec.mean_overshoot_days_x1000 == exc * 1000 // max(re_, 1)
            assert 0 < rec.reactivation_rate_ppm <= 10**6


class TestGiniYearlyTrend:
    def test_matches_exact_gini_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_gini_yearly_trend

        df = orders_gini_yearly_trend(spark, sf_dir).toPandas()
        o = _pq("orders")
        yrs = pd.to_datetime(o["o_orderdate"]).dt.year
        cents = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        pts = {}
        for yr in sorted(set(yrs)):
            xs = sorted(int(v) for v in cents[(yrs == yr).to_numpy()])
            n = len(xs)
            t = sum(xs)
            s = sum((i + 1) * x for i, x in enumerate(xs))
            pts[yr] = (n, (2 * s - (n + 1) * t) * 10**6 // (n * t))
        k = len(pts)
        sy = sum(pts)
        sg = sum(g for _, g in pts.values())
        syy = sum(y * y for y in pts)
        syg = sum(y * g for y, (_, g) in pts.items())
        slope = tdiv((k * syg - sy * sg) * 1000, k * syy - sy * sy)
        assert len(df) == k
        for rec in df.itertuples():
            n, g = pts[rec.yr]
            assert rec.n_orders == n
            assert rec.gini_ppm == g
            assert rec.gini_trend_ppm_per_year_x1000 == slope
            # order values are genuinely unequal but not degenerate
            assert 100_000 < rec.gini_ppm < 900_000


class TestDissimilarityIndex:
    def test_matches_exact_integer_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import nations_dissimilarity_index

        df = nations_dissimilarity_index(spark, sf_dir).toPandas()
        li = _pq("lineitem")[["l_suppkey", "l_partkey"]]
        su = _pq("supplier")[["s_suppkey", "s_nationkey"]]
        pa = _pq("part")[["p_partkey", "p_type"]]
        na = _pq("nation")[["n_nationkey", "n_name"]]
        j = li.merge(su, left_on="l_suppkey", right_on="s_suppkey").merge(
            pa, left_on="l_partkey", right_on="p_partkey"
        )
        cells = j.groupby(["s_nationkey", "p_type"]).size()
        g_tot = int(cells.sum())
        typ_tot = cells.groupby("p_type").sum()
        nat_tot = cells.groupby("s_nationkey").sum()
        got = {r.n_name: r for r in df.itertuples()}
        assert len(df) == len(nat_tot)
        for nk, cn in nat_tot.items():
            cn = int(cn)
            num = sum(
                abs(int(cells.get((nk, t), 0)) * g_tot - int(gt) * cn)
                for t, gt in typ_tot.items()
            )
            d = num * 500000 // (cn * g_tot)
            name = na.set_index("n_nationkey").loc[nk, "n_name"]
            rec = got[name]
            assert rec.n_items == cn
            assert rec.dissim_ppm == d
            # a valid dissimilarity: inside [0, 1e6), and the mixes are
            # genuinely non-identical but not disjoint on this fixture
            assert 0 < rec.dissim_ppm < 500_000


class TestParticipationRatio:
    def test_matches_exact_integer_recompute_and_bounds(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.embeddings import (
            _CKA_CAP,
            embedding_participation_ratio,
        )

        rec = embedding_participation_ratio(spark, sf_dir).collect()[0]
        emb = _pq("embeddings")
        n_tot = len(emb)
        rows = []
        for vid, v in zip(emb["vec_id"], emb["embedding"]):
            b = int(hashlib.md5(str(vid).encode()).hexdigest()[:2], 16)
            if b * n_tot < 256 * _CKA_CAP:
                rows.append(np.round(v.astype("float64") * 1_000_000).astype("int64"))
        m = len(rows)
        assert rec.n_sample == m and rec.dim == 64
        X = np.stack(rows)
        sxy = X.T.astype(object) @ X.astype(object)
        si = X.sum(axis=0).astype(object)
        k = m * 1000
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        q = [
            [tdiv(m * int(sxy[i][j]) - int(si[i]) * int(si[j]), k) for j in range(64)]
            for i in range(64)
        ]
        tr = sum(q[i][i] for i in range(64))
        frob = sum(q[i][j] ** 2 for i in range(64) for j in range(64))
        pr = float(tr * tr) / float(frob)
        assert rec.trace_q == tr
        assert abs(rec.participation_ratio - pr) <= 1.1e-6
        assert abs(rec.effective_dim_frac - pr / 64) <= 1.1e-6
        # PR is bounded by [1, d]; on a real (non-degenerate, non-
        # isotropic) cloud it sits strictly inside
        assert 1.0 < rec.participation_ratio < 64.0


class TestDieboldMariano:
    def test_matches_exact_integer_recompute(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import orders_diebold_mariano

        rec = orders_diebold_mariano(spark, sf_dir).collect()[0]
        o = _pq("orders")
        dt = pd.to_datetime(o["o_orderdate"])
        mk = dt.dt.year * 12 + dt.dt.month
        ys = mk.value_counts().sort_index()
        keys = list(ys.index)
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        ntot = int(ys.sum())
        k = max(1, ntot // 20_000_000)
        la, lb, d = [], [], []
        for i in range(12, len(keys)):
            y = int(ys.iloc[i])
            ra = tdiv(y - int(ys.iloc[i - 12]), k)
            rb = tdiv(y - int(ys.iloc[i - 1]), k)
            la.append(ra * ra)
            lb.append(rb * rb)
            d.append(ra * ra - rb * rb)
        n = len(d)
        s = sum(d)
        e = [n * x - s for x in d]
        g = [sum(e[t] * e[t + kk] for t in range(n - kk)) for kk in range(5)]
        gw = max(5 * g[0] + 2 * (4 * g[1] + 3 * g[2] + 2 * g[3] + g[4]), 1)
        import math

        dm = float(s * n) * math.sqrt(5.0) / math.sqrt(float(gw))
        assert rec.n_eff == n
        assert rec.loss_diff_sum == s
        assert rec.sse_seasonal == sum(la)
        assert rec.sse_naive == sum(lb)
        assert rec.mse_ratio_ppm == sum(la) * 10**6 // max(sum(lb), 1)
        assert abs(rec.dm_stat - dm) <= 1.1e-6
        # the monthly series must actually feed the test: a year of
        # warmup dropped, a real (nonzero) loss differential left
        assert n >= 24 and s != 0


class TestPacfLevinson:
    def test_matches_exact_integer_recompute_and_ar_semantics(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import _PACF_K, events_pacf_levinson

        out = {r.lag: r for r in events_pacf_levinson(spark, sf_dir).collect()}
        ev = _pq("events")
        hours = pd.to_datetime(ev["ts"]).dt.floor("h")
        cs = hours.value_counts().sort_index()
        n = len(cs)
        stot = int(cs.sum())
        u = [n * int(c) - stot for c in cs]
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        g0 = sum(x * x for x in u)
        R = {
            kk: tdiv(sum(u[t] * u[t + kk] for t in range(n - kk)) * 10**6, g0)
            for kk in range(1, _PACF_K + 1)
        }
        phi = {1: R[1]}
        pacf = {1: R[1]}
        for kk in range(2, _PACF_K + 1):
            num = 10**6 * R[kk] - sum(phi[j] * R[kk - j] for j in range(1, kk))
            den = max(10**12 - sum(phi[j] * R[j] for j in range(1, kk)), 1)
            pkk = tdiv(num * 10**6, den)
            phi = {j: phi[j] - tdiv(pkk * phi[kk - j], 10**6) for j in range(1, kk)}
            phi[kk] = pkk
            pacf[kk] = pkk
        assert len(out) == _PACF_K
        for kk in range(1, _PACF_K + 1):
            assert out[kk].n_hours == n
            assert out[kk].acf_ppm == R[kk]
            assert out[kk].pacf_ppm == pacf[kk]
        # lag-1 PACF equals lag-1 ACF by construction, and every
        # partial autocorrelation is a correlation: |φ_kk| ≤ 1
        assert out[1].pacf_ppm == out[1].acf_ppm
        assert all(abs(out[kk].pacf_ppm) <= 10**6 for kk in out)


class TestRandomWalkRestart:
    def test_matches_exact_integer_recompute(self, spark, sf_dir):
        from bireme_spark.queries.audit import (
            _RWR_D_E9,
            _RWR_ITERS,
            _RWR_ONE_E9,
            _RWR_SEEDS,
            graph_random_walk_restart,
        )

        out = graph_random_walk_restart(spark, sf_dir).collect()
        li = _pq("lineitem")
        li = li[li["l_orderkey"] % 40 == 0][["l_orderkey", "l_partkey"]].drop_duplicates()
        fwd = set()
        for ok, grp in li.groupby("l_orderkey"):
            ps = sorted(grp["l_partkey"])
            for a, b in zip(ps, ps[1:]):
                fwd.add((int(a), int(b)))
        edges = set(fwd) | {(v, u) for u, v in fwd if (u + v) % 2 == 0}
        nodes = sorted({x for e in edges for x in e})
        seeds = set(nodes[:_RWR_SEEDS])
        ns = len(seeds)
        outd = {}
        for s, _ in edges:
            outd[s] = outd.get(s, 0) + 1
        r = {nk: (_RWR_ONE_E9 // ns if nk in seeds else 0) for nk in nodes}
        tele = (_RWR_ONE_E9 - _RWR_D_E9) // ns
        for _ in range(_RWR_ITERS):
            mass = dict.fromkeys(nodes, 0)
            for s, d in edges:
                mass[d] += r[s] // outd[s]
            r = {
                nk: (tele if nk in seeds else 0) + _RWR_D_E9 * mass[nk] // _RWR_ONE_E9
                for nk in nodes
            }
        top = sorted(nodes, key=lambda nk: (-r[nk], nk))[:20]
        assert [x.part_id for x in out] == top
        for x in out:
            assert x.ppr_e9 == r[x.part_id]
            assert x.is_seed == int(x.part_id in seeds)
        # restart semantics: seeds dominate their own neighborhood —
        # the top-ranked node must be a seed, and scores are personal
        # (total mass concentrated, not uniform)
        assert out[0].is_seed == 1
        assert out[0].ppr_e9 > out[-1].ppr_e9


class TestHbosOutliers:
    def test_matches_exact_recompute_and_density_semantics(self, spark, sf_dir):
        import math

        from bireme_spark.queries.embeddings import (
            _HBOS_BINS,
            _HBOS_DIMS,
            embedding_hbos_outliers,
        )

        out = embedding_hbos_outliers(spark, sf_dir).collect()
        emb = _pq("embeddings")
        n = len(emb)
        X = np.stack([np.round(v[:_HBOS_DIMS].astype("float64") * 1e6).astype("int64") for v in emb["embedding"]])
        scores = {}
        terms_by_dim = []
        for d in range(_HBOS_DIMS):
            col = X[:, d]
            mn, mx = int(col.min()), int(col.max())
            b = (col - mn) * _HBOS_BINS // (mx - mn + 1)
            cnts = pd.Series(b).value_counts()
            term = {
                int(bb): int(round(-math.log(int(c) / n) * 1_000_000))
                for bb, c in cnts.items()
            }
            terms_by_dim.append((b, term))
        for i, vid in enumerate(emb["vec_id"]):
            scores[int(vid)] = sum(term[int(b[i])] for b, term in terms_by_dim)
        top = sorted(scores, key=lambda v: (-scores[v], v))[:20]
        assert [x.vec_id for x in out] == top
        for x in out:
            assert x.hbos_e6 == scores[x.vec_id]
            assert x.n_vecs == n
        # density semantics: the reported outliers sit in genuinely
        # rarer bins than the corpus median score
        med = sorted(scores.values())[len(scores) // 2]
        assert out[0].hbos_e6 > med


class TestImageSharpness:
    def test_matches_exact_recompute_and_blur_separates(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_image_sharpness

        out = {r.s: r for r in multimodal_image_sharpness(spark, sf_dir).collect()}
        doc = _pq("documents")
        classes = doc["doc_id"].astype("int64") % 16
        # exact per-class recompute straight from the pixel formula
        # (pre-codec: the query's value additionally round-trips the
        # real encoder/decoder, so equality also checks the codecs)
        exp = {}
        for s in range(16):
            base = [
                [[(x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256 for c in range(3)] for x in range(16)]
                for y in range(16)
            ]
            if s % 4 == 1:
                blur = [[list(base[y][x]) for x in range(16)] for y in range(16)]
                for y in range(1, 15):
                    for x in range(1, 15):
                        for c in range(3):
                            blur[y][x][c] = sum(
                                base[y + dy][x + dx][c] for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                            ) // 9
                base = blur
            gray = [[sum(base[y][x]) // 3 for x in range(16)] for y in range(16)]
            sl = sl2 = m = 0
            for y in range(2, 14):
                for x in range(2, 14):
                    lap = 4 * gray[y][x] - gray[y][x - 1] - gray[y][x + 1] - gray[y - 1][x] - gray[y + 1][x]
                    sl += lap
                    sl2 += lap * lap
                    m += 1
            exp[s] = (m * sl2 - sl * sl) // (m * m)
        for s in range(16):
            rec = out[s]
            assert rec.lap_var_q == exp[s]
            assert rec.is_blurred == int(s % 4 == 1)
            assert rec.n_images == int((classes == s).sum())
            assert rec.canonical_doc == int(doc["doc_id"][classes == s].min())
        # the plant separates with margin: EVERY blurred class scores
        # below EVERY sharp class (measured 131-301 vs 1163-3798 —
        # nowhere near a detector boundary)
        blurred = [out[s].lap_var_q for s in range(16) if s % 4 == 1]
        sharp = [out[s].lap_var_q for s in range(16) if s % 4 != 1]
        assert max(blurred) * 3 < min(sharp)


class TestSamplingEss:
    def test_matches_exact_recompute_and_kong_bounds(self, spark, sf_dir):
        from bireme_spark.queries.corpus import corpus_sampling_ess_audit

        out = {r.source: r for r in corpus_sampling_ess_audit(spark, sf_dir).collect()}
        doc = _pq("documents")
        b = np.minimum(doc["n_chars"].to_numpy() // 50, 11)
        ntot = len(doc)
        cb = pd.Series(b).value_counts()
        w = {int(bb): min(ntot * 1000 // int(c), 1_000_000) for bb, c in cb.items()}
        for src, grp in doc.groupby("source"):
            ws = [w[int(bb)] for bb in np.minimum(grp["n_chars"].to_numpy() // 50, 11)]
            s1, s2 = sum(ws), sum(x * x for x in ws)
            rec = out[src]
            assert rec.n_docs == len(ws)
            assert rec.ess_x1000 == s1 * s1 * 1000 // s2
            assert rec.ess_frac_ppm == s1 * s1 * 1_000_000 // (len(ws) * s2)
            # Kong bounds: 1 <= ESS <= n (Cauchy-Schwarz)
            assert 1000 <= rec.ess_x1000 <= len(ws) * 1000
        # the audit must DISCRIMINATE on this fixture (not emit a
        # constant — the quality_classifier lesson): sources holding
        # the rare tail-bucket docs collapse (~8% ESS, the weight cap
        # dominating), sources without them stay healthy (~99%)
        fracs = [r.ess_frac_ppm for r in out.values()]
        assert min(fracs) < 500_000 < max(fracs)


class TestCrpsSeasonalEval:
    def test_matches_exact_recompute_and_proper_score(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import orders_crps_seasonal_eval

        out = {r.calendar_month: r for r in orders_crps_seasonal_eval(spark, sf_dir).collect()}
        o = _pq("orders")
        dt = pd.to_datetime(o["o_orderdate"])
        counts = o.groupby([dt.dt.year, dt.dt.month]).size()
        per_mon = {}
        for (yr, mon), y in counts.items():
            hist = [int(counts.get((h, mon), 0)) for h in range(1995, yr) if (h, mon) in counts]
            if not hist:
                continue
            k = len(hist)
            sad = sum(abs(x - int(y)) for x in hist)
            spp = sum(abs(a - b) for a in hist for b in hist)
            crps = (2 * k * sad - spp) * 1000 // (2 * k * k)
            per_mon.setdefault(mon, []).append(crps)
        assert len(out) == len(per_mon)
        for mon, vals in per_mon.items():
            rec = out[mon]
            assert rec.n_evals == len(vals)
            assert rec.mean_crps_x1000 == sum(vals) // len(vals)
            # CRPS is a PROPER score: nonnegative by the energy
            # inequality, and strictly positive on a non-constant series
            assert rec.mean_crps_x1000 >= 0
        assert any(out[m].mean_crps_x1000 > 0 for m in out)


class TestSnapshotChunkPlanner:
    def test_matches_exact_recompute_and_chunk_contract(self, spark, sf_dir):
        from bireme_spark.queries.cdc import cdc_snapshot_chunk_planner

        out = cdc_snapshot_chunk_planner(spark, sf_dir).collect()
        o = _pq("orders")
        keys = o["o_orderkey"].to_numpy().astype("int64")
        mn, mx, n = int(keys.min()), int(keys.max()), len(keys)
        bw = max((mx - mn + 1) // 4096, 1)
        target = max(n // 16, 1000)
        cnt = pd.Series((keys - mn) // bw).value_counts().sort_index()
        cum = 0
        exp = {}
        for bk, c in cnt.items():
            cum += int(c)
            cid = (cum - 1) // target
            lo, hi, er, nb = exp.get(cid, (None, None, 0, 0))
            lo = mn + int(bk) * bw if lo is None else min(lo, mn + int(bk) * bw)
            hi = max(hi or 0, mn + (int(bk) + 1) * bw - 1)
            exp[cid] = (lo, hi, er + int(c), nb + 1)
        assert len(out) == len(exp)
        total = 0
        for rec in out:
            lo, hi, er, nb = exp[rec.chunk_id]
            assert (rec.lo_key, rec.hi_key, rec.est_rows, rec.n_buckets) == (lo, hi, er, nb)
            assert rec.target_rows == target
            total += rec.est_rows
        # plan contract: chunks cover every row exactly once, ranges
        # ascend without overlap, and no chunk exceeds target by more
        # than one bucket's worth (equi-depth up to bucket resolution)
        assert total == n
        for a, b in zip(out, out[1:]):
            assert a.hi_key < b.lo_key
        maxbucket = int(cnt.max())
        assert all(rec.est_rows <= target + maxbucket for rec in out)


class TestCramersVMatrix:
    def test_matches_exact_recompute_and_bounds(self, spark, sf_dir):
        from bireme_spark.queries.events import events_cramers_v_matrix

        out = {r.pair: r for r in events_cramers_v_matrix(spark, sf_dir).collect()}
        ev = _pq("events")
        ts = pd.to_datetime(ev["ts"])
        t = ev["event_type"]
        wd = (ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days % 7
        hb = ts.dt.hour // 6
        frames = {"type_x_weekday": (t, wd), "type_x_hourband": (t, hb), "weekday_x_hourband": (wd, hb)}
        import math

        assert len(out) == 3
        for name, (a, b) in frames.items():
            tab = pd.crosstab(a, b)
            n = int(tab.to_numpy().sum())
            chi2_e6 = 0
            for i in tab.index:
                for j in tab.columns:
                    o = int(tab.loc[i, j])
                    r = int(tab.loc[i].sum())
                    c = int(tab[j].sum())
                    d = float(n * o - r * c)
                    chi2_e6 += int(round(d * d / (float(n) * r * c) * 1e6))
            m = min(len(tab.index), len(tab.columns))
            v = math.sqrt(chi2_e6 / (1e6 * n * (m - 1)))
            rec = out[name]
            assert rec.n == n
            assert rec.df == (len(tab.index) - 1) * (len(tab.columns) - 1)
            assert rec.chi2_e6 == chi2_e6
            assert abs(rec.cramers_v - v) <= 1.1e-6
            # V is an effect size: bounded [0, 1]
            assert 0.0 <= rec.cramers_v <= 1.0


class TestLoudnessGate:
    def test_matches_exact_recompute_and_cohort_ordering(self, spark, sf_dir):
        from bireme_spark.queries.multimodal import multimodal_loudness_gate

        out = multimodal_loudness_gate(spark, sf_dir).toPandas()
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        # exact recompute for a deterministic sample of docs (pure
        # formula replay, independent of codec and SQL)
        for rec in out.itertuples():
            if rec.doc_id % 97 != 0:
                continue
            n = 64 + rec.doc_id % 64
            att = 32 if rec.doc_id % 8 == 3 else (6 if rec.doc_id % 8 == 5 else 1)
            sam = [
                tdiv((rec.doc_id * 31 + i * 7) % 2048 - 1024, att) if i >= n // 2
                else (rec.doc_id * 31 + i * 7) % 2048 - 1024
                for i in range(n)
            ]
            nb = (n - 32) // 16 + 1
            ssbs = [sum(v * v for v in sam[16 * b : 16 * b + 32]) for b in range(nb)]
            absk = [s for s in ssbs if s >= 64000]
            na, usum = len(absk), sum(absk)
            kept = [s for s in absk if s * 10 * na >= usum]
            assert rec.n_blocks == nb
            assert rec.n_abs_kept == na
            assert rec.n_rel_kept == len(kept)
            assert rec.loudness_q == sum(kept) // (max(len(kept), 1) * 32)
            assert rec.gated_frac_ppm == (nb - len(kept)) * 10**6 // nb
        # cohort semantics: the quiet-tail cohort gates hardest, the
        # attenuated-tail cohort next, clean clips barely gate; both
        # gate STAGES individually fire somewhere in the corpus
        cls = out["doc_id"] % 8
        gf = out.groupby(cls)["gated_frac_ppm"].mean()
        clean = gf[[c for c in gf.index if c not in (3, 5)]].max()
        assert gf[3] > gf[5] > clean
        assert (out["n_blocks"] - out["n_abs_kept"]).sum() > 0
        assert (out["n_abs_kept"] - out["n_rel_kept"]).sum() > 0
        lq = out.groupby(cls)["loudness_q"].mean()
        assert lq[3] < lq[[c for c in lq.index if c not in (3, 5)]].min()


class TestSquareCount:
    def test_matches_exact_recompute(self, spark, sf_dir):
        from bireme_spark.queries.audit import graph_square_count

        rec = graph_square_count(spark, sf_dir).collect()[0]
        li = _pq("lineitem")
        li = li[li["l_orderkey"] % 40 == 0][["l_orderkey", "l_partkey"]].drop_duplicates()
        und = set()
        for _, grp in li.groupby("l_orderkey"):
            ps = sorted(grp["l_partkey"])
            for a, b in zip(ps, ps[1:]):
                if a != b:
                    und.add((min(int(a), int(b)), max(int(a), int(b))))
        adj = {}
        for u, v in und:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        wed = {}
        for c, nb in adj.items():
            nbs = sorted(nb)
            for i in range(len(nbs)):
                for j in range(i + 1, len(nbs)):
                    wed[(nbs[i], nbs[j])] = wed.get((nbs[i], nbs[j]), 0) + 1
        n_wedges = sum(wed.values())
        n_squares = sum(w * (w - 1) // 2 for w in wed.values())
        assert rec.n_nodes == len(adj)
        assert rec.n_edges == len(und)
        assert rec.n_wedges == n_wedges
        assert rec.n_squares == n_squares
        assert rec.squares_per_million_wedges == n_squares * 10**6 // max(n_wedges, 1)
        # the fixture graph must actually exercise the motif counter
        assert n_wedges > 0 and rec.n_edges > rec.n_nodes // 2


class TestTradeReciprocity:
    def test_matches_exact_recompute_and_bounds(self, spark, sf_dir):
        from bireme_spark.queries.relational import nations_trade_reciprocity

        rows = nations_trade_reciprocity(spark, sf_dir).collect()
        li = _pq("lineitem")[["l_orderkey", "l_suppkey"]]
        o = _pq("orders")[["o_orderkey", "o_custkey"]]
        c = _pq("customer")[["c_custkey", "c_nationkey"]]
        su = _pq("supplier")[["s_suppkey", "s_nationkey"]]
        j = (
            li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
            .merge(c, left_on="o_custkey", right_on="c_custkey")
            .merge(su, left_on="l_suppkey", right_on="s_suppkey")
        )
        j = j[j["c_nationkey"] != j["s_nationkey"]]
        x = j.groupby(["c_nationkey", "s_nationkey"]).size().to_dict()
        recip = sum(min(v, x.get((b, a), 0)) for (a, b), v in x.items())
        tot = sum(x.values())
        trow = [r for r in rows if r.cust_nation == "TOTAL"][0]
        assert trow.volume == tot
        assert trow.asymmetry == tot - recip
        assert trow.metric_ppm == recip * 10**6 // tot
        # reciprocity is a fraction; a dense random-ish trade matrix
        # is substantially but not perfectly reciprocal
        assert 0 < trow.metric_ppm < 10**6
        # top pairs: recompute the asymmetry ranking
        pair_asym = sorted(
            (
                (abs(v - x.get((b, a), 0)), a, b)
                for (a, b), v in x.items()
                if a < b
            ),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        top = [r for r in rows if r.cust_nation != "TOTAL"]
        assert len(top) == 10
        exp_asyms = [t[0] for t in pair_asym[:10]]
        assert sorted((r.asymmetry for r in top), reverse=True) == exp_asyms


class TestPriceVolumeBridge:
    def test_matches_exact_recompute_and_bridge_identity(self, spark, sf_dir):
        from decimal import Decimal

        from bireme_spark.queries.relational import lineitem_price_volume_bridge

        out = {r.p_brand: r for r in lineitem_price_volume_bridge(spark, sf_dir).collect()}
        li = _pq("lineitem")
        pa = _pq("part")[["p_partkey", "p_brand"]]
        sd = pd.to_datetime(li["l_shipdate"])
        li = li[(sd >= "1996-01-01") & (sd <= "1997-12-31")].copy()
        li["yr"] = pd.to_datetime(li["l_shipdate"]).dt.year
        j = li.merge(pa, left_on="l_partkey", right_on="p_partkey")
        tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)
        cells = {}
        for (br, yr), g in j.groupby(["p_brand", "yr"]):
            r_e4 = sum(
                int(Decimal(str(round(ep, 2))) * 10000) * int(Decimal("1") * 100 - Decimal(str(round(d, 2))) * 100)
                for ep, d in zip(g["l_extendedprice"], g["l_discount"])
            ) // 100
            q = int(g["l_quantity"].sum())
            cells[(br, yr)] = (r_e4, q)
        for br in sorted({b for b, _ in cells}):
            if (br, 1996) not in cells or (br, 1997) not in cells:
                assert br not in out
                continue
            r1, q1 = cells[(br, 1996)]
            r2, q2 = cells[(br, 1997)]
            rec = out[br]
            assert rec.rev_1996_e4 == r1
            assert rec.rev_1997_e4 == r2
            assert rec.delta_e4 == r2 - r1
            assert rec.price_effect_e4 == tdiv(r2 * q1 - r1 * q2, q1)
            assert rec.volume_effect_e4 == tdiv((q2 - q1) * r1, q1)
            # bridge identity up to the two documented truncations
            assert abs(rec.price_effect_e4 + rec.volume_effect_e4 - rec.delta_e4) <= 2


class TestNetRevenueRetention:
    def test_matches_exact_recompute_and_grr_bounds(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_net_revenue_retention

        rows = {r.base_year: r for r in orders_net_revenue_retention(spark, sf_dir).collect()}
        o = _pq("orders")
        o = o.assign(
            yr=pd.to_datetime(o["o_orderdate"]).dt.year,
            cents=np.round(o["o_totalprice"].to_numpy() * 100).astype("int64"),
        )
        cy = o.groupby(["o_custkey", "yr"])["cents"].sum()
        years = sorted(o["yr"].unique())
        assert set(rows) == set(years[:-1])
        for y in years[:-1]:
            base = cy[cy.index.get_level_values("yr") == y]
            rev0 = int(base.sum())
            rev1 = capped = 0
            nret = 0
            for (ck, _), r0 in base.items():
                r1 = int(cy.get((ck, y + 1), 0))
                rev1 += r1
                capped += min(int(r0), r1)
                nret += int(r1 > 0)
            rec = rows[y]
            assert rec.n_base_customers == len(base)
            assert rec.n_retained == nret
            assert rec.base_rev_cents == rev0
            assert rec.retained_rev_cents == rev1
            assert rec.nrr_ppm == rev1 * 10**6 // rev0
            assert rec.grr_ppm == capped * 10**6 // rev0
            # GRR can never exceed NRR or 100%; cohorts genuinely retain
            assert rec.grr_ppm <= min(rec.nrr_ppm, 10**6)
            assert 0 < rec.n_retained <= rec.n_base_customers


class TestGreenwoodUniformity:
    def test_matches_exact_recompute_and_null_calibration(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_greenwood_uniformity

        out = {r.event_type: r for r in events_greenwood_uniformity(spark, sf_dir).collect()}
        ev = _pq("events")
        us = pd.to_datetime(ev["ts"]).values.astype("datetime64[us]").astype("int64")
        for etype, g in ev.assign(us=us).groupby("event_type"):
            xs = np.sort(g["us"].to_numpy())
            tau = np.diff(xs).astype(object)
            st = int(tau.sum())
            st2 = int(sum(int(t) * int(t) for t in tau))
            n = len(tau)
            gw = st2 * 10**9 // (st * st)
            null = 2 * 10**9 // (n + 1)
            rec = out[etype]
            assert rec.n_gaps == n
            assert rec.greenwood_e9 == gw
            assert rec.uniform_null_e9 == null
            assert rec.clustering_ratio_ppm == gw * 10**6 // null
            # G is bounded [1/n, 1] (scaled e9), and a Poisson-ish
            # stream reads near 2/(n+1), far from either bound
            assert 10**9 // n <= rec.greenwood_e9 <= 10**9
            assert 200_000 < rec.clustering_ratio_ppm < 5_000_000


class TestCslsRerankEval:
    def test_matches_exact_recompute(self, spark, sf_dir):
        import hashlib

        from bireme_spark.queries.embeddings import (
            _BSR_C_CAP,
            _BSR_Q_CAP,
            _CSLS_K,
            embedding_csls_rerank_eval,
        )

        out = {r.overlap_at_10: r for r in embedding_csls_rerank_eval(spark, sf_dir).collect()}
        emb = _pq("embeddings")
        n_tot = len(emb)
        b1 = lambda v: int(hashlib.md5(str(int(v)).encode()).hexdigest()[:2], 16)
        b2 = lambda v: int(hashlib.md5(str(int(v)).encode()).hexdigest()[2:4], 16)
        qs = [(int(v), x) for v, x in zip(emb["vec_id"], emb["embedding"]) if b1(v) * n_tot < 256 * _BSR_Q_CAP]
        cs = [(int(v), x) for v, x in zip(emb["vec_id"], emb["embedding"]) if b2(v) * n_tot < 256 * _BSR_C_CAP]
        cos = {}
        for qid, qv in qs:
            qd = qv.astype("float64")
            for cid, cv in cs:
                if qid == cid:
                    continue
                d = float(np.dot(qd, cv.astype("float64")))
                cos[(qid, cid)] = int(round(d * 1e6))
        # per-query and per-candidate top-k neighbor sums
        by_q, by_c = {}, {}
        for (qid, cid), v in cos.items():
            by_q.setdefault(qid, []).append((v, cid))
            by_c.setdefault(cid, []).append((v, qid))
        sqx = {q: sum(v for v, _ in sorted(l, key=lambda t: (-t[0], t[1]))[:_CSLS_K]) for q, l in by_q.items()}
        scy = {c: sum(v for v, _ in sorted(l, key=lambda t: (-t[0], t[1]))[:_CSLS_K]) for c, l in by_c.items()}
        hist = dict.fromkeys(range(11), 0)
        th = 0
        for qid, l in by_q.items():
            raw = [cid for _, cid in sorted(l, key=lambda t: (-t[0], t[1]))[:10]]
            csls = sorted(l, key=lambda t: (-(20 * t[0] - sqx[qid] - scy[t[1]]), t[1]))[:10]
            csls_ids = {cid for _, cid in csls}
            hits = sum(1 for cid in raw if cid in csls_ids)
            hist[hits] += 1
            th += hits
        for k in range(11):
            assert out[k].n_queries == hist[k], (k, out[k].n_queries, hist[k])
            assert out[k].mean_overlap_ppm_x10 == th * 100000 // (len(by_q) * 10)
        # the eval is non-degenerate: some queries agree highly
        assert hist[10] + hist[9] + hist[8] > 0


class TestTradingDayAdjustment:
    def test_matches_exact_recompute_and_calendar_effect(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import orders_trading_day_adjustment

        out = {r.mkey: r for r in orders_trading_day_adjustment(spark, sf_dir).collect()}
        o = _pq("orders")
        dt = pd.to_datetime(o["o_orderdate"])
        cents = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
        rev = pd.Series(cents).groupby(dt.dt.year * 12 + dt.dt.month).sum()
        days = pd.date_range("1995-01-01", "2001-08-31", freq="D")
        wd = pd.Series(
            ((days - pd.Timestamp("1970-01-01")).days % 7), index=days
        ).isin([0, 1, 4, 5, 6])
        wdays = wd.groupby(days.year * 12 + days.month).sum()
        keys = sorted(rev.index)
        for prev, cur in zip(keys, keys[1:]):
            r0, r1 = int(rev[prev]), int(rev[cur])
            rpd0 = r0 // int(wdays[prev])
            rpd1 = r1 // int(wdays[cur])
            rec = out[cur]
            assert rec.rev_cents == r1
            assert rec.wdays == int(wdays[cur])
            assert rec.rev_per_wday_cents == rpd1
            assert rec.raw_growth_ppm == r1 * 10**6 // r0 - 10**6
            assert rec.adjusted_growth_ppm == rpd1 * 10**6 // rpd0 - 10**6
        # the adjustment must actually DO something: some month's raw
        # and adjusted growth differ by more than 1% (22 vs 20 weekday
        # months exist in any span this long)
        assert any(
            abs(r.raw_growth_ppm - r.adjusted_growth_ppm) > 10_000 for r in out.values()
        )


class TestOodMahalanobis:
    def test_matches_exact_recompute_and_class_semantics(self, spark, sf_dir):
        from bireme_spark.queries.embeddings import embedding_ood_mahalanobis

        out = embedding_ood_mahalanobis(spark, sf_dir).collect()
        emb = _pq("embeddings")
        X = np.stack([np.round(v.astype("float64") * 1e6).astype("int64") for v in emb["embedding"]])
        labels = emb["label"].to_numpy()
        vids = emb["vec_id"].to_numpy()
        n = len(X)
        classes = sorted(set(int(l) for l in labels))
        S = {c: X[labels == c].astype(object).sum(axis=0) for c in classes}
        NC = {c: int((labels == c).sum()) for c in classes}
        sx = X.astype(object).sum(axis=0)
        sxx = (X.astype(object) * X.astype(object)).sum(axis=0)
        var = [max((n * int(sxx[d]) - int(sx[d]) ** 2) // (n * n), 1) for d in range(64)]
        scores = {}
        for i in range(n):
            best, bestc = None, None
            for c in classes:
                tot = 0
                for d in range(64):
                    dx = int(X[i, d]) * NC[c] - int(S[c][d])
                    tot += dx * dx // (NC[c] * NC[c]) * 1000 // var[d]
                if best is None or tot < best or (tot == best and c < bestc):
                    best, bestc = tot, c
            scores[int(vids[i])] = (best, bestc, int(labels[i]))
        top = sorted(scores, key=lambda v: (-scores[v][0], v))[:20]
        assert [r.vec_id for r in out] == top
        for r in out:
            sc, nc, lb = scores[r.vec_id]
            assert r.score_x1000 == sc
            assert r.nearest_class == nc
            assert r.label == lb
        # this synthetic corpus is fully in-distribution (no planted
        # outliers): the top score sits only slightly above the median
        # - assert the ordering is real but DON'T demand separation
        # the fixture doesn't contain; most rows' nearest class is
        # their own label (sanity of the class model)
        med = sorted(s for s, _, _ in scores.values())[len(scores) // 2]
        assert out[0].score_x1000 > med
        # labels carry moderate geometric signal on this fixture
        # (~36% own-class vs the 10% random baseline; same order as
        # embedding_label_knn_purity measures)
        own = sum(1 for s, c, l in scores.values() if c == l)
        assert own > len(scores) // 5


class TestImageNoiseEstimate:
    def test_matches_exact_recompute_and_plant_separates(self, spark, sf_dir):
        import math

        from bireme_spark.queries.multimodal import multimodal_image_noise_estimate

        out = {r.s: r for r in multimodal_image_noise_estimate(spark, sf_dir).collect()}
        doc = _pq("documents")
        classes = doc["doc_id"].astype("int64") % 16
        exp = {}
        for s in range(16):
            base = [
                [[(x * x + 2 * y + 5 * s + 37 * c + (s * x) // 3) % 256 for c in range(3)] for x in range(16)]
                for y in range(16)
            ]
            if s % 4 == 2:
                for y in range(16):
                    for x in range(16):
                        for c in range(3):
                            v = base[y][x][c] + (x * 7 + y * 13 + c * 29 + s) % 5 - 2
                            base[y][x][c] = min(max(v, 0), 255)
            gray = [[sum(base[y][x]) // 3 for x in range(16)] for y in range(16)]
            sal = 0
            for y in range(1, 15):
                for x in range(1, 15):
                    nv = (
                        gray[y - 1][x - 1] - 2 * gray[y - 1][x] + gray[y - 1][x + 1]
                        - 2 * gray[y][x - 1] + 4 * gray[y][x] - 2 * gray[y][x + 1]
                        + gray[y + 1][x - 1] - 2 * gray[y + 1][x] + gray[y + 1][x + 1]
                    )
                    sal += abs(nv)
            exp[s] = sal
        for s in range(16):
            rec = out[s]
            assert rec.sum_abs_n == exp[s]
            assert rec.is_noisy == int(s % 4 == 2)
            assert rec.n_images == int((classes == s).sum())
            sigma = int(round(exp[s] * math.sqrt(math.pi / 2.0) / 1176.0 * 1e6))
            assert rec.sigma_e6 == sigma
        # the plant separates: every noisy class reads above every
        # clean class (measured 2996-4226 vs 1198-2736; the per-class
        # values are formula-determined, hence SF-independent)
        noisy = [out[s].sum_abs_n for s in range(16) if s % 4 == 2]
        clean = [out[s].sum_abs_n for s in range(16) if s % 4 != 2]
        assert min(noisy) > max(clean)


class TestChunkBoundaryAudit:
    def test_matches_exact_recompute_and_discriminates(self, spark, sf_dir):
        from bireme_spark.queries.corpus import corpus_chunk_boundary_audit

        out = {r.chunk_size: r for r in corpus_chunk_boundary_audit(spark, sf_dir).collect()}
        doc = _pq("documents")
        breaks = set(" .!?\n")
        for k in (128, 256, 512):
            nb = ncl = 0
            for text in doc["text"]:
                n = len(text)
                for b in range(1, n // k + 1):
                    if b * k >= n:
                        continue
                    nb += 1
                    if text[b * k - 1] in breaks or text[b * k] in breaks:
                        ncl += 1
            rec = out[k]
            assert rec.n_boundaries == nb
            assert rec.n_clean == ncl
            assert rec.clean_break_ppm == ncl * 10**6 // nb
            # real prose: some boundaries are clean, most are not
            assert 0 < rec.n_clean < rec.n_boundaries


class TestOtifRate:
    def test_matches_exact_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import orders_otif_rate

        out = {r.priority: r for r in orders_otif_rate(spark, sf_dir).collect()}
        li = _pq("lineitem")[["l_orderkey", "l_shipdate"]]
        o = _pq("orders")[["o_orderkey", "o_orderdate", "o_orderpriority"]]
        j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        delay = (
            pd.to_datetime(j["l_shipdate"]).dt.normalize()
            - pd.to_datetime(j["o_orderdate"])
        ).dt.days
        j = j.assign(delay=delay)
        per = j.groupby(["o_orderkey", "o_orderpriority"])["delay"].agg(["max", "min", "count"])
        for prio, g in per.groupby(level="o_orderpriority"):
            rec = out[prio]
            n = len(g)
            otif = int((g["max"] <= 90).sum())
            partial = int((g["min"] <= 90).sum())
            assert rec.n_orders == n
            assert rec.n_otif == otif
            assert rec.n_partial == partial
            assert rec.n_lines == int(g["count"].sum())
            assert rec.otif_ppm == otif * 10**6 // n
            assert rec.partial_ppm == partial * 10**6 // n
            # all-or-nothing is strictly harder than at-least-one, and
            # both gates genuinely bind on this fixture
            assert 0 < rec.n_otif <= rec.n_partial < rec.n_orders


class TestBowtieDecomposition:
    def test_matches_exact_recompute(self, spark, sf_dir):
        from bireme_spark.queries.audit import (
            _BT_HOPS,
            _BT_REACH,
            graph_bowtie_decomposition,
        )

        out = {r.component: r for r in graph_bowtie_decomposition(spark, sf_dir).collect()}
        li = _pq("lineitem")
        li = li[li["l_orderkey"] % 40 == 0][["l_orderkey", "l_partkey"]].drop_duplicates()
        fwd = set()
        for _, grp in li.groupby("l_orderkey"):
            ps = sorted(grp["l_partkey"])
            for x, y in zip(ps, ps[1:]):
                fwd.add((int(x), int(y)))
        edges = set(fwd) | {(v, u) for u, v in fwd if (u + v) % 2 == 0}
        nodes = sorted({x for e in edges for x in e})
        out_adj, in_adj = {}, {}
        for s, d in edges:
            out_adj.setdefault(s, []).append(d)
            in_adj.setdefault(d, []).append(s)
        A = {v: v for v in nodes}  # min label reaching v (fwd prop)
        B = {v: v for v in nodes}  # min label v reaches (bwd prop)
        for _ in range(_BT_HOPS):
            A2, B2 = dict(A), dict(B)
            for s, d in edges:
                if A[s] < A2[d]:
                    A2[d] = min(A2[d], A[s])
                if B[d] < B2[s]:
                    B2[s] = min(B2[s], B[d])
            A, B = A2, B2
        sccs = {}
        for v in nodes:
            if A[v] == B[v]:
                sccs.setdefault(A[v], []).append(v)
        core_id = min(sorted(sccs), key=lambda c: (-len(sccs[c]), c))
        core = set(sccs[core_id])
        rc, fc = set(core), set(core)
        for _ in range(_BT_REACH):
            rc |= {s for s in nodes for d in out_adj.get(s, []) if d in rc}
            fc |= {d for s in fc for d in out_adj.get(s, [])}
        counts = {"CORE": 0, "BRIDGE": 0, "IN": 0, "OUT": 0, "OTHER": 0}
        for v in nodes:
            if v in core:
                counts["CORE"] += 1
            elif v in rc and v in fc:
                counts["BRIDGE"] += 1
            elif v in rc:
                counts["IN"] += 1
            elif v in fc:
                counts["OUT"] += 1
            else:
                counts["OTHER"] += 1
        n = len(nodes)
        for comp, c in counts.items():
            if c == 0:
                assert comp not in out
                continue
            assert out[comp].n_nodes == c
            assert out[comp].share_ppm == c * 10**6 // n
        # the fixture graph has real bow-tie structure: a core exists
        # and at least two other classes are populated
        assert counts["CORE"] > 1
        assert sum(1 for c in counts.values() if c > 0) >= 3


class TestLoadDurationCurve:
    def test_matches_exact_recompute_and_curve_shape(self, spark, sf_dir):
        from bireme_spark.queries.timeseries import events_load_duration_curve

        out = {r.exceed_pct: r for r in events_load_duration_curve(spark, sf_dir).collect()}
        ev = _pq("events")
        hours = pd.to_datetime(ev["ts"]).dt.floor("h")
        loads = np.sort(hours.value_counts().to_numpy())[::-1]
        H = len(loads)
        peak = int(loads[0])
        total = int(loads.sum())
        for pct in (1, 5, 10, 25, 50):
            budget = max(pct * H // 100, 1)
            # smallest load whose >=-load hour count fits the budget
            cands = []
            for lv in sorted(set(int(x) for x in loads)):
                cum_ge = int((loads >= lv).sum())
                if cum_ge <= budget:
                    cands.append(lv)
            exp = min(cands)
            rec = out[pct]
            assert rec.load_exceeded == exp
            assert rec.peak == peak
            assert rec.n_hours == H
            assert rec.load_factor_ppm == total * 10**6 // (H * peak)
        # curve is monotone: tighter exceedance => higher load, and
        # the p50 level sits at or below the mean-ish band
        assert out[1].load_exceeded >= out[5].load_exceeded >= out[50].load_exceeded
        assert 0 < out[50].load_factor_ppm <= 10**6


class TestShipmentConsolidation:
    def test_matches_exact_recompute(self, spark, sf_dir):
        from bireme_spark.queries.relational import lineitem_shipment_consolidation

        out = {r.priority: r for r in lineitem_shipment_consolidation(spark, sf_dir).collect()}
        li = _pq("lineitem")[["l_orderkey", "l_shipdate"]]
        o = _pq("orders")[["o_orderkey", "o_orderpriority"]]
        j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        j["d"] = pd.to_datetime(j["l_shipdate"]).dt.date
        per = j.groupby(["o_orderkey", "o_orderpriority"]).agg(
            n_lines=("d", "size"), n_ships=("d", "nunique")
        )
        for prio, g in per.groupby(level="o_orderpriority"):
            rec = out[prio]
            n = len(g)
            assert rec.n_orders == n
            assert rec.n_lines == int(g["n_lines"].sum())
            assert rec.n_shipments == int(g["n_ships"].sum())
            single = int((g["n_ships"] == 1).sum())
            assert rec.single_shipment_ppm == single * 10**6 // n
            extra_s = int((g["n_ships"] - 1).sum())
            extra_o = max(int((g["n_lines"] - 1).sum()), 1)
            assert rec.fragmentation_ppm == extra_s * 10**6 // extra_o
            # fulfilment is genuinely fragmented but not maximally
            assert 0 < rec.fragmentation_ppm < 10**6
