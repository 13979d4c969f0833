"""Independent pure-Python/numpy references for the round-6c
operators (kNN label-vote eval, bigram-LM perplexity filter, composed
IVF-PQ search, cross-source JS vocabulary divergence) — complementing
their DuckDB oracles (tools/oracle_check.py) with full semantic
re-derivations the hash compare can't localize failures in."""

from __future__ import annotations

import math

import numpy as np
import pytest

from olap_project_spark.queries import QUERY_REGISTRY, _import_all

_import_all()


def q(name):
    return QUERY_REGISTRY[name].fn


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


@pytest.fixture(scope="module")
def emb(sf_dir):
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return {
        vid: (np.array(e, dtype=np.float64), lab) for vid, e, lab in rows
    }


@pytest.fixture(scope="module")
def docs(sf_dir):
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, text, source FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def _cells(emb):
    """IVF coarse ranking: per vector, centroid ids (= first 16
    vectors) ordered by cosine desc, cid asc — mirrors _ivf_ranked."""
    from olap_project_spark.queries.similarity import N_CENTROIDS

    cents = {c: emb[c][0] for c in range(N_CENTROIDS)}
    ranked = {}
    for vid, (v, _lab) in emb.items():
        nv = np.linalg.norm(v)
        sims = {
            c: float(v @ cv) / (nv * np.linalg.norm(cv))
            for c, cv in cents.items()
        }
        ranked[vid] = sorted(sims, key=lambda c: (-sims[c], c))
    return ranked


class TestKnnLabelAccuracy:
    def test_matches_numpy_reference(self, spark, sf_dir, emb):
        from olap_project_spark.queries.similarity import (
            KNN_VOTE_K,
            NEAR_DUP_NPROBE,
        )

        ranked = _cells(emb)
        assign = {vid: r[0] for vid, r in ranked.items()}
        by_cell: dict[int, list[int]] = {}
        for vid, cid in assign.items():
            by_cell.setdefault(cid, []).append(vid)
        correct: dict[str, int] = {}
        total: dict[str, int] = {}
        for vid, (v, lab) in emb.items():
            cand = [
                u
                for cid in ranked[vid][:NEAR_DUP_NPROBE]
                for u in by_cell.get(cid, [])
                if u != vid
            ]
            if not cand:
                continue
            nv = np.linalg.norm(v)
            sims = {
                u: float(v @ emb[u][0]) / (nv * np.linalg.norm(emb[u][0]))
                for u in cand
            }
            top = sorted(cand, key=lambda u: (-sims[u], u))[:KNN_VOTE_K]
            votes: dict[str, int] = {}
            for u in top:
                votes[emb[u][1]] = votes.get(emb[u][1], 0) + 1
            pred = sorted(votes, key=lambda p: (-votes[p], p))[0]
            total[lab] = total.get(lab, 0) + 1
            if pred == lab:
                correct[lab] = correct.get(lab, 0) + 1
        got = {
            r["label"]: r
            for r in q("knn_label_accuracy")(spark, sf_dir).collect()
        }
        assert set(got) == set(total)
        for lab in total:
            assert got[lab]["n_vectors"] == total[lab]
            assert got[lab]["n_correct"] == correct.get(lab, 0)
            assert got[lab]["accuracy"] == pytest.approx(
                correct.get(lab, 0) / total[lab], abs=1e-6
            )


class TestLmPerplexity:
    def test_matches_python_reference(self, spark, sf_dir, docs):
        from collections import Counter

        from olap_project_spark.queries.text import LM_NLL_PER_NAT

        doc_bg = {}
        c12: Counter = Counter()
        c1: Counter = Counter()
        vocab = set()
        for doc_id, text, _src in docs:
            if text is None or text.strip() == "":
                continue
            toks = text.lower().strip().split()
            vocab.update(toks)
            bgs = list(zip(toks, toks[1:]))
            if bgs:
                doc_bg[doc_id] = bgs
                c12.update(bgs)
                c1.update(t[0] for t in bgs)
        V = len(vocab)
        lp = {
            bg: _round_half_away(
                math.log((n + 1) / (c1[bg[0]] + V)) * 1_000_000
            )
            for bg, n in c12.items()
        }
        hist: Counter = Counter()
        for bgs in doc_bg.values():
            s = sum(lp[b] for b in bgs)
            hist[(-s * LM_NLL_PER_NAT) // (len(bgs) * 1_000_000)] += 1
        got = {
            r["nll_bucket"]: r
            for r in q("lm_perplexity_buckets")(spark, sf_dir).collect()
        }
        assert set(got) == set(hist)
        n_total = sum(hist.values())
        for b, n in hist.items():
            assert got[b]["n_docs"] == n
            assert got[b]["nll_lo"] == pytest.approx(b * 0.05, abs=1e-9)
            assert got[b]["share"] == pytest.approx(n / n_total, abs=1e-6)


class TestIvfPqTopk:
    def test_matches_numpy_reference(self, spark, sf_dir, emb):
        from olap_project_spark.queries.similarity import (
            ADC_SCALE,
            IVFPQ_SHORTLIST,
            NEAR_DUP_NPROBE,
            PQ_K,
            PQ_M,
            PQ_SUB,
            QUERY_VEC_ID,
            TOP_K,
        )

        ranked = _cells(emb)
        assign = {vid: r[0] for vid, r in ranked.items()}
        probes = set(ranked[QUERY_VEC_ID][:NEAR_DUP_NPROBE])
        cand = [
            vid
            for vid, cid in assign.items()
            if cid in probes and vid != QUERY_VEC_ID
        ]
        assert cand, "probed cells must contain candidates"
        subs = {
            vid: [
                v[m * PQ_SUB : (m + 1) * PQ_SUB] for m in range(PQ_M)
            ]
            for vid, (v, _l) in emb.items()
        }
        cb = {
            m: {c: subs[c][m] for c in range(PQ_K)} for m in range(PQ_M)
        }
        codes = {}
        for vid in emb:
            codes[vid] = [
                min(
                    range(PQ_K),
                    key=lambda c: (
                        float(cb[m][c] @ cb[m][c])
                        - 2 * float(subs[vid][m] @ cb[m][c]),
                        c,
                    ),
                )
                for m in range(PQ_M)
            ]
        qd = {
            (m, c): _round_half_away(
                float(subs[QUERY_VEC_ID][m] @ cb[m][c]) * ADC_SCALE
            )
            for m in range(PQ_M)
            for c in range(PQ_K)
        }
        adc = {
            vid: sum(qd[(m, codes[vid][m])] for m in range(PQ_M))
            for vid in cand
        }
        short = sorted(adc, key=lambda v: (-adc[v], v))[:IVFPQ_SHORTLIST]
        qv = emb[QUERY_VEC_ID][0]
        nq = np.linalg.norm(qv)
        cos = {
            v: float(emb[v][0] @ qv) / (np.linalg.norm(emb[v][0]) * nq)
            for v in short
        }
        want = sorted(cos, key=lambda v: (-cos[v], v))[:TOP_K]
        rows = q("ann_ivf_pq_topk")(spark, sf_dir).collect()
        assert [r["vec_id"] for r in rows] == want
        for r in rows:
            assert r["cos_sim"] == pytest.approx(cos[r["vec_id"]], abs=1e-6)


class TestSourceVocabDivergence:
    def test_matches_python_reference(self, spark, sf_dir, docs):
        from collections import Counter

        from olap_project_spark.queries.text import JS_NANO

        ct: dict[str, Counter] = {}
        for _doc_id, text, src in docs:
            if text is None or text.strip() == "":
                continue
            ct.setdefault(src, Counter()).update(text.lower().strip().split())
        tot = {s: sum(c.values()) for s, c in ct.items()}
        want = {}
        srcs = sorted(ct)
        for i, sa in enumerate(srcs):
            for sb in srcs[i + 1 :]:
                sh = set(ct[sa]) & set(ct[sb])
                if not sh:
                    continue
                s1 = s2 = csa = csb = 0
                for t in sh:
                    p = ct[sa][t] / tot[sa]
                    qq = ct[sb][t] / tot[sb]
                    s1 += _round_half_away(
                        p * math.log(2 * p / (p + qq)) * JS_NANO
                    )
                    s2 += _round_half_away(
                        qq * math.log(2 * qq / (p + qq)) * JS_NANO
                    )
                    csa += ct[sa][t]
                    csb += ct[sb][t]
                js = 0.5 * (s1 + s2) / JS_NANO + 0.5 * math.log(2) * (
                    2 - csa / tot[sa] - csb / tot[sb]
                )
                want[(sa, sb)] = (len(sh), js)
        rows = q("source_vocab_divergence")(spark, sf_dir).collect()
        got = {(r["source_a"], r["source_b"]): r for r in rows}
        assert set(got) == set(want)
        ln2 = math.log(2)
        for key, (n_sh, js) in want.items():
            assert got[key]["n_shared_tokens"] == n_sh
            assert got[key]["js_divergence"] == pytest.approx(js, abs=1e-6)
            assert -1e-9 <= got[key]["js_divergence"] <= ln2 + 1e-9


class TestConcurrentSessionPeaks:
    def test_matches_python_sweep(self, spark, sf_dir):
        import duckdb
        from collections import defaultdict

        rows = duckdb.sql(
            f"SELECT user_id, CAST(ts AS TIMESTAMP), event_id FROM "
            f"'{sf_dir}/events.parquet' ORDER BY user_id, 2, event_id"
        ).fetchall()
        sessions = []
        cur_user, cur_start, cur_end = None, None, None
        for user, ts, _eid in rows:
            if user != cur_user or (ts - cur_end).total_seconds() >= 1800:
                if cur_user is not None:
                    sessions.append((cur_start, cur_end))
                cur_user, cur_start = user, ts
            cur_end = ts
        sessions.append((cur_start, cur_end))
        by_day = defaultdict(list)
        for s, e in sessions:
            by_day[s.strftime("%Y-%m-%d")].append((s, e))
        want = {}
        for day, ivals in by_day.items():
            bounds = defaultdict(lambda: [0, 0])
            for s, e in ivals:
                bounds[s][0] += 1
                bounds[e][1] += 1
            cum, peak = 0, 0
            for t in sorted(bounds):
                st, en = bounds[t]
                peak = max(peak, cum + st)  # starts before ends at t
                cum += st - en
            want[day] = (len(ivals), peak)
        got = {
            r["day"]: (r["n_sessions"], r["peak_concurrent"])
            for r in q("concurrent_session_peaks")(spark, sf_dir).collect()
        }
        assert got == want


class TestCharEntropy:
    def test_matches_python_reference(self, spark, sf_dir, docs):
        from collections import Counter

        from olap_project_spark.queries.text import ENTROPY_BUCKET_NANO

        hist: Counter = Counter()
        for _doc_id, text, _src in docs:
            if text is None or text.strip() == "":
                continue
            cc = Counter(text.lower().strip())
            total = sum(cc.values())
            s = sum(
                _round_half_away(
                    (n / total) * math.log(n / total) * 1_000_000_000
                )
                for n in cc.values()
            )
            hist[(-s) // ENTROPY_BUCKET_NANO] += 1
        got = {
            r["entropy_bucket"]: r
            for r in q("char_entropy_buckets")(spark, sf_dir).collect()
        }
        assert set(got) == set(hist)
        n_total = sum(hist.values())
        for b, n in hist.items():
            assert got[b]["n_docs"] == n
            assert got[b]["share"] == pytest.approx(n / n_total, abs=1e-6)


class TestBpeMergeCandidates:
    def test_matches_python_reference(self, spark, sf_dir, docs):
        from collections import Counter

        from olap_project_spark.queries.text import BPE_MERGE_TOP_K

        wc: Counter = Counter()
        for _doc_id, text, _src in docs:
            if text is None or text.strip() == "":
                continue
            wc.update(text.lower().strip().split())
        occ: Counter = Counter()
        words: dict[str, set] = {}
        for w, n in wc.items():
            for a, b in zip(w, w[1:]):
                pair = f"{a}+{b}"
                occ[pair] += n
                words.setdefault(pair, set()).add(w)
        want = sorted(occ, key=lambda p: (-occ[p], p))[:BPE_MERGE_TOP_K]
        rows = q("bpe_merge_candidates")(spark, sf_dir).collect()
        assert [r["pair"] for r in rows] == want
        for r in rows:
            assert r["n_occurrences"] == occ[r["pair"]]
            assert r["n_distinct_words"] == len(words[r["pair"]])


class TestKmChurnSurvival:
    def test_matches_python_reference(self, spark, sf_dir):
        import duckdb
        from collections import defaultdict

        rows = duckdb.sql(
            f"SELECT user_id, CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE), "
            f"CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) FROM "
            f"'{sf_dir}/events.parquet' GROUP BY user_id"
        ).fetchall()
        max_d = max(r[2] for r in rows)
        by_t = defaultdict(lambda: [0, 0])  # t -> [churned, censored]
        for _u, first_d, last_d in rows:
            t = (last_d - first_d).days
            by_t[t][int(last_d >= max_d)] += 1
        n_risk = len(rows)
        surv = 1.0
        want = {}
        for t in sorted(by_t):
            d, c = by_t[t]
            surv *= 1 - d / n_risk
            want[t] = (n_risk, d, c, surv)
            n_risk -= d + c
        got = {
            r["t_days"]: r
            for r in q("km_churn_survival")(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for t, (nr, d, c, s) in want.items():
            r = got[t]
            assert (r["n_at_risk"], r["n_churned"], r["n_censored"]) == (
                nr, d, c,
            )
            assert r["survival"] == pytest.approx(s, abs=1e-6)
        # survival is monotone nonincreasing and within [0, 1]
        ts = sorted(got)
        vals = [got[t]["survival"] for t in ts]
        assert all(0.0 <= v <= 1.0 for v in vals)
        assert all(a >= b for a, b in zip(vals, vals[1:]))


def _arm(user_id) -> str:
    import hashlib

    h = int(hashlib.md5(str(user_id).encode()).hexdigest()[:12], 16)
    return "A" if h % 2 == 0 else "B"


class TestCupedAdjustedMetrics:
    def test_matches_python_reference(self, spark, sf_dir):
        import duckdb
        from collections import defaultdict

        min_d, max_d = duckdb.sql(
            f"SELECT CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE), "
            f"CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) FROM "
            f"'{sf_dir}/events.parquet'"
        ).fetchone()
        from datetime import timedelta

        mid = min_d + timedelta(days=((max_d - min_d).days + 1) // 2)
        rows = duckdb.sql(
            f"SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE), "
            f"CAST(value AS DECIMAL(18,2)) FROM '{sf_dir}/events.parquet'"
        ).fetchall()
        xy = defaultdict(lambda: [0, 0])  # user -> [x_cents, y_cents]
        for uid, day, v in rows:
            xy[uid][int(day >= mid)] += int(v * 100)
        n = len(xy)
        sx = sum(x for x, _ in xy.values()) / 100
        sy = sum(y for _, y in xy.values()) / 100
        sxy = sum(x * y for x, y in xy.values()) / 10_000
        sxx = sum(x * x for x, _ in xy.values()) / 10_000
        theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        got = {
            r["bucket"]: r
            for r in q("cuped_adjusted_metrics")(spark, sf_dir).collect()
        }
        arms = defaultdict(lambda: [0, 0, 0])  # arm -> [n, sx, sy]
        for uid, (x, y) in xy.items():
            a = arms[_arm(uid)]
            a[0] += 1
            a[1] += x
            a[2] += y
        assert set(got) == set(arms)
        for arm, (na, sxa, sya) in arms.items():
            r = got[arm]
            assert r["n_users"] == na
            assert r["theta"] == pytest.approx(theta, abs=1e-6)
            mean_post = sya / 100 / na
            assert r["mean_post"] == pytest.approx(mean_post, abs=1e-6)
            adj = mean_post - theta * (sxa / 100 / na - sx / n)
            assert r["mean_adjusted"] == pytest.approx(adj, abs=1e-6)
        # CUPED preserves the pooled mean: weighted adjusted means
        # recombine to the raw pooled post-period mean
        pooled = sum(
            got[a]["mean_adjusted"] * arms[a][0] for a in arms
        ) / n
        assert pooled == pytest.approx(sy / n, abs=1e-4)


class TestMannWhitney:
    def test_matches_pairwise_definition(self, spark, sf_dir):
        import duckdb
        from collections import defaultdict

        rows = duckdb.sql(
            f"SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) FROM "
            f"'{sf_dir}/events.parquet' GROUP BY user_id"
        ).fetchall()
        vals = defaultdict(list)
        for uid, y in rows:
            vals[_arm(uid)].append(int(y * 100))
        A, B = vals["A"], vals["B"]
        u_a = sum(
            (a > b) + 0.5 * (a == b) for a in A for b in B
        )  # O(n²) pairwise definition — the ground truth
        r = q("mann_whitney_ab_test")(spark, sf_dir).collect()[0]
        assert (r["n_a"], r["n_b"]) == (len(A), len(B))
        assert r["u_a"] == pytest.approx(u_a, abs=1e-9)
        assert r["rank_biserial"] == pytest.approx(
            1 - 2 * u_a / (len(A) * len(B)), abs=1e-6
        )
        # z-score with tie correction, from first principles
        import math
        from collections import Counter

        n = len(A) + len(B)
        tie3 = sum(
            t**3 - t for t in Counter(A + B).values()
        )
        sigma = math.sqrt(
            len(A) * len(B) / 12 * ((n + 1) - tie3 / (n * (n - 1)))
        )
        z = (u_a - len(A) * len(B) / 2) / sigma
        assert r["z_score"] == pytest.approx(z, abs=1e-6)


class TestMediaPhash:
    def test_matches_python_banding(self, spark, sf_dir, docs):
        from collections import defaultdict

        from olap_project_spark.functions.multimodal import ahash_band_keys
        from olap_project_spark.queries.multimodal import AHASH_HAM_T

        keys = {
            doc_id: ahash_band_keys(text.encode())
            for doc_id, text, _src in docs
            if text
        }
        buckets = defaultdict(list)
        for d, ks in keys.items():
            for b, k in enumerate(ks):
                buckets[(b, k)].append(d)
        want = {}
        for ds in buckets.values():
            ds.sort()
            for i, a in enumerate(ds):
                for b in ds[i + 1 :]:
                    h = sum(
                        bin(x ^ y).count("1")
                        for x, y in zip(keys[a], keys[b])
                    )
                    want[(a, b)] = (h, int(h <= AHASH_HAM_T))
        got = {
            (r["doc_a"], r["doc_b"]): (r["hamming"], r["is_dup"])
            for r in q("media_phash_dup_pairs")(spark, sf_dir).collect()
        }
        assert got == want


class TestTemperatureMixture:
    def test_invariants(self, spark, sf_dir):
        rows = q("temperature_mixture_plan")(spark, sf_dir).collect()
        assert len(rows) > 1
        assert sum(r["actual_share"] for r in rows) == pytest.approx(
            1.0, abs=1e-4
        )
        assert sum(r["temp_share"] for r in rows) == pytest.approx(
            1.0, abs=1e-4
        )
        # T=2 flattens: below-average sources upweight, above downweight
        mean_share = 1 / len(rows)
        for r in rows:
            if r["actual_share"] < mean_share - 1e-6:
                assert r["temp_weight"] > 1
            if r["actual_share"] > mean_share + 1e-6:
                assert r["temp_weight"] < 1


class TestDedupTokenSavings:
    def test_ledger_consistency(self, spark, sf_dir):
        rows = q("dedup_token_savings")(spark, sf_dir).collect()
        assert rows
        kept = q("dedup_keep_best")(spark, sf_dir).collect()
        n_dropped_expected = sum(r["n_dropped"] for r in kept)
        assert sum(r["n_dropped"] for r in rows) == n_dropped_expected
        for r in rows:
            assert 0 <= r["tokens_after"] <= r["tokens_before"]
            dropped_tok = r["tokens_before"] - r["tokens_after"]
            if r["tokens_before"]:
                assert r["savings"] == pytest.approx(
                    dropped_tok / r["tokens_before"], abs=1e-6
                )


class TestAnnHubness:
    def test_matches_numpy_reference(self, spark, sf_dir, emb):
        from collections import Counter

        from olap_project_spark.queries.similarity import (
            KNN_VOTE_K,
            NEAR_DUP_NPROBE,
        )

        ranked = _cells(emb)
        assign = {vid: r[0] for vid, r in ranked.items()}
        by_cell: dict[int, list[int]] = {}
        for vid, cid in assign.items():
            by_cell.setdefault(cid, []).append(vid)
        deg: Counter = Counter()
        for vid, (v, _lab) in emb.items():
            cand = [
                u
                for cid in ranked[vid][:NEAR_DUP_NPROBE]
                for u in by_cell.get(cid, [])
                if u != vid
            ]
            if not cand:
                continue
            nv = np.linalg.norm(v)
            sims = {
                u: float(v @ emb[u][0]) / (nv * np.linalg.norm(emb[u][0]))
                for u in cand
            }
            for u in sorted(cand, key=lambda u: (-sims[u], u))[:KNN_VOTE_K]:
                deg[u] += 1
        hist = Counter(deg.get(vid, 0) for vid in emb)
        got = {
            r["in_degree"]: r
            for r in q("ann_hubness_audit")(spark, sf_dir).collect()
        }
        assert set(got) == set(hist)
        for d, n in hist.items():
            assert got[d]["n_vectors"] == n
            assert got[d]["share"] == pytest.approx(n / len(emb), abs=1e-6)


class TestChi2Independence:
    def test_matches_python_reference(self, spark, sf_dir):
        import duckdb
        from collections import Counter

        rows = duckdb.sql(
            f"SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) FROM "
            f"'{sf_dir}/events.parquet'"
        ).fetchall()
        obs = Counter(rows)
        rt, ct = Counter(), Counter()
        for (et, dw), o in obs.items():
            rt[et] += o
            ct[dw] += o
        n = sum(obs.values())
        chi2_nano = sum(
            _round_half_away(
                (o - rt[et] * ct[dw] / n) ** 2 / (rt[et] * ct[dw] / n) * 1e9
            )
            for (et, dw), o in obs.items()
        )
        r = q("chi2_type_dow_independence")(spark, sf_dir).collect()[0]
        assert r["n_events"] == n
        assert (r["n_types"], r["n_dows"]) == (len(rt), len(ct))
        assert r["dof"] == (len(rt) - 1) * (len(ct) - 1)
        assert r["chi2"] == pytest.approx(chi2_nano / 1e9, abs=1e-5)
        import math

        v = math.sqrt(
            (chi2_nano / 1e9) / (n * min(len(rt) - 1, len(ct) - 1))
        )
        assert r["cramers_v"] == pytest.approx(v, abs=1e-6)


class TestReadability:
    def test_matches_python_reference(self, spark, sf_dir, docs):
        import re
        from collections import defaultdict

        agg = defaultdict(lambda: [0, 0, 0, 0])
        for _doc_id, text, src in docs:
            if text is None or text.strip() == "":
                continue
            t = text.lower().strip()
            a = agg[src]
            a[0] += 1
            a[1] += len(re.split(r"\s+", t))
            a[2] += max(len(re.findall(r"[.!?]+", t)), 1)
            a[3] += max(len(re.findall(r"[aeiouy]+", t)), 1)
        got = {
            r["source"]: r
            for r in q("readability_scores")(spark, sf_dir).collect()
        }
        assert set(got) == set(agg)
        for src, (nd, w, s, y) in agg.items():
            r = got[src]
            assert (r["n_docs"], r["words"], r["sents"], r["sylls"]) == (
                nd, w, s, y,
            )
            assert r["flesch_ease"] == pytest.approx(
                206.835 - 1.015 * (w / s) - 84.6 * (y / w), abs=1e-5
            )


class TestCrossSourceDupMatrix:
    def test_consistent_with_pair_set(self, spark, sf_dir, docs):
        src = {doc_id: s for doc_id, _t, s in docs}
        pairs = q("ngram_dup_pairs")(spark, sf_dir).collect()
        from collections import Counter

        want = Counter(
            tuple(sorted((src[r["doc_a"]], src[r["doc_b"]])))
            for r in pairs
        )
        rows = q("cross_source_dup_matrix")(spark, sf_dir).collect()
        got = {(r["source_a"], r["source_b"]): r for r in rows}
        assert {k: v["n_dup_pairs"] for k, v in got.items()} == dict(want)
        total = sum(want.values())
        for k, r in got.items():
            assert r["within_source"] == (k[0] == k[1])
            assert r["share"] == pytest.approx(
                want[k] / total, abs=1e-6
            )


class TestZipfLawFit:
    def test_matches_python_reference(self, spark, sf_dir, docs):
        from collections import Counter

        tf: Counter = Counter()
        for _doc_id, text, _src in docs:
            if text is None or text.strip() == "":
                continue
            tf.update(text.lower().strip().split())
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (
                _round_half_away(math.log(r) * 10_000),
                _round_half_away(math.log(f) * 10_000),
            )
            for r, (_t, f) in enumerate(ranked, start=1)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        num = n * sxy - sx * sy
        r = q("zipf_law_fit")(spark, sf_dir).collect()[0]
        assert r["vocab_size"] == n
        assert r["zipf_exponent"] == pytest.approx(
            -num / (n * sxx - sx * sx), abs=1e-6
        )
        assert r["r2"] == pytest.approx(
            num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            abs=1e-6,
        )


class TestMixtureDiversity:
    def test_matches_python_reference(self, spark, sf_dir, docs):
        from collections import Counter

        tok: Counter = Counter()
        for _doc_id, text, src in docs:
            n = 0 if text is None or text.strip() == "" else len(
                text.lower().strip().split()
            )
            tok[src] += n
        total = sum(tok.values())
        hsum = sum(
            _round_half_away((t / total) * math.log(t / total) * 1e9)
            for t in tok.values()
        )
        p2sum = sum(
            _round_half_away((t / total) ** 2 * 1e9) for t in tok.values()
        )
        r = q("mixture_diversity_stats")(spark, sf_dir).collect()[0]
        assert r["n_sources"] == len(tok)
        h = -hsum / 1e9
        assert r["shannon_entropy"] == pytest.approx(h, abs=1e-6)
        assert r["effective_sources"] == pytest.approx(
            math.exp(h), abs=1e-5
        )
        assert r["gini_simpson"] == pytest.approx(1 - p2sum / 1e9, abs=1e-6)
        # effective sources bounded by the actual source count
        assert 1.0 <= r["effective_sources"] <= len(tok) + 1e-6
