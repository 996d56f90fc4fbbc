"""One-permutation-hashing MinHash kernel (operators/dedup.py oph_*):
the vectorized scatter-min + rotation densification must equal a
straightforward scalar re-derivation, act as an unbiased Jaccard
estimator, and compose with LSH banding identically at any
parallelism."""

from __future__ import annotations

import numpy as np
import pandas as pd

from bathyscaphe_spark.operators.dedup import (
    _OPH_C,
    oph_dedup_pairs,
    oph_sig_np,
    oph_with_shingles,
)
from bathyscaphe_spark.functions.fnv import fnv1_64_np

EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def _scalar_oph(hashes: list[int], B: int) -> list[int]:
    """Reference implementation: bin mins then circular right-borrow
    densification with +d·C per distance."""
    mat = [int(EMPTY)] * B
    for h in hashes:
        b = h % B
        mat[b] = min(mat[b], h)
    out = list(mat)
    for j in range(B):
        if mat[j] != int(EMPTY):
            continue
        for d in range(1, 2 * B):
            src = (j + d) % B
            if mat[src] != int(EMPTY):
                out[j] = (mat[src] + d * int(_OPH_C)) % (1 << 64)
                break
    return [np.uint64(x).view(np.int64) if False else x for x in out]


def _to_signed(vals):
    return [int(np.uint64(v).astype(np.int64)) for v in vals]


class TestOphKernel:
    def test_matches_scalar_reference(self):
        rng = np.random.RandomState(5)
        B = 16
        docs = [
            list(rng.randint(0, 2**63, size=n, dtype=np.uint64))
            for n in (0, 1, 3, 40, 7, 0, 100)
        ]
        counts = np.array([len(d) for d in docs], dtype=np.int64)
        flat = np.concatenate(
            [np.array(d, dtype=np.uint64) for d in docs if d]
        ) if any(docs) else np.empty(0, dtype=np.uint64)
        got = oph_sig_np(flat, counts, B)
        for i, d in enumerate(docs):
            want = _to_signed(_scalar_oph([int(x) for x in d], B))
            if not d:
                # all-empty doc: every bin stays the EMPTY sentinel
                assert (got[i] == np.uint64(EMPTY).astype(np.int64)).all()
            else:
                assert got[i].tolist() == want, f"doc {i}"

    def test_estimator_tracks_jaccard(self):
        rng = np.random.RandomState(9)
        B = 256
        universe = rng.randint(0, 2**63, size=4000, dtype=np.uint64)
        a = universe[:3000]
        b = universe[1000:4000]  # |∩|=2000, |∪|=4000 → J = 0.5
        counts = np.array([len(a), len(b)], dtype=np.int64)
        sig = oph_sig_np(np.concatenate([a, b]), counts, B)
        agree = (sig[0] == sig[1]).mean()
        assert abs(agree - 0.5) < 0.1

    def test_identical_sets_identical_sigs_any_order(self):
        rng = np.random.RandomState(2)
        vals = rng.randint(0, 2**63, size=50, dtype=np.uint64)
        perm = rng.permutation(50)
        counts = np.array([50, 50], dtype=np.int64)
        sig = oph_sig_np(np.concatenate([vals, vals[perm]]), counts, 32)
        assert sig[0].tolist() == sig[1].tolist()


class TestOphSpark:
    def test_partition_invariant_sigs(self, spark):
        rows = [(i, f"class {i % 5} words " + " ".join(
            f"t{i % 5}x{j}" for j in range(12))) for i in range(40)]
        df1 = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
        df8 = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
        s1 = {r["doc_id"]: r["sig"] for r in
              oph_with_shingles(df1, "doc_id", "text", 16).collect()}
        s8 = {r["doc_id"]: r["sig"] for r in
              oph_with_shingles(df8, "doc_id", "text", 16).collect()}
        assert s1 == s8
        # identical text ⇒ identical signature
        for i in range(40):
            assert s1[i] == s1[i % 5]

    def test_dedup_pairs_catch_identical_and_verify_near_miss(self, spark):
        # 3 classes of identical docs + one 0.9-Jaccard variant that the
        # 0.95 threshold must exclude no matter what LSH candidates
        rows = []
        for i in range(9):
            c = i % 3
            txt = " ".join(f"w{c}x{j}" for j in range(20))
            if i == 8:
                txt += " u8a u8b"  # J vs classmates = 18/20 = 0.9
            rows.append((i, txt))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["jaccard3"]
            for r in oph_dedup_pairs(df, "doc_id", "text", 0.95).collect()
        }
        want = {
            (a, b)
            for a in range(8)
            for b in range(a + 1, 8)
            if a % 3 == b % 3
        }
        assert set(got) == want
        assert all(v == 1.0 for v in got.values())

    def test_empty_docs_never_reach_banding(self, spark):
        """Zero-shingle docs all share the all-sentinel signature, so
        without the pre-band filter they'd collide in EVERY band — a
        quadratic candidate blowup in the number of empty docs.  The
        filter must (a) keep the real-pair output identical and (b)
        emit no pair touching an empty doc at threshold > 0."""
        from bathyscaphe_spark.operators.dedup import (
            lsh_candidate_pairs,
            oph_with_shingles,
        )

        rows = [(i, "") for i in range(50)]  # 50 empty docs
        dup = " ".join(f"d{j}" for j in range(20))
        rows += [(100, dup), (101, dup)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"])
            for r in oph_dedup_pairs(df, "doc_id", "text", 0.95).collect()
        }
        assert got == {(100, 101)}
        # and the banding stage itself sees zero empty-doc candidates:
        # 50 empty docs would otherwise mint 50·49/2 = 1225 candidates
        s = oph_with_shingles(df, "doc_id", "text", 16)
        from pyspark.sql import functions as F

        cand = lsh_candidate_pairs(
            s.where(F.size("sh_hashes") > 0).select("doc_id", "sig"),
            "doc_id", 16, 8,
        )
        assert cand.count() == 1
