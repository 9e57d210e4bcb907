"""Crossover-path tests for the chunk-dedup family and the
set-similarity join: the broadcast/distributed and rank/hash-order
fallbacks must produce identical results (the pinned oracles only
exercise the default path at sf0.01 sizes)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_df(n_docs: int = 120, seed: int = 11) -> pd.DataFrame:
    """Synthetic docs with planted repeated chunks/boilerplate: every
    third doc shares a 32-token footer, a few docs are full copies."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(300)], dtype=object)
    footer = " ".join(rng.choice(vocab, 32))
    texts = []
    for i in range(n_docs):
        body = " ".join(rng.choice(vocab, int(rng.integers(40, 140))))
        if i % 3 == 0:
            body = body + " " + footer
        texts.append(body)
    # full copies (exact chunk-level dups across all positions)
    for i in range(0, n_docs, 17):
        texts[i] = texts[(i + 5) % n_docs]
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts})


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_boilerplate_broadcast_vs_distributed(ray_session):
    from reconcile_curation_in_cris_systems_ray.stages.chunks import (
        boilerplate_stats,
    )

    df = _docs_df()
    a = boilerplate_stats(_ds(df), "doc_id", "text",
                          chunk_tokens=16).to_pandas()
    # broadcast_cap=0 forces the distributed join + bucketed count path
    b = boilerplate_stats(_ds(df), "doc_id", "text", chunk_tokens=16,
                          broadcast_cap=0).to_pandas()
    assert len(a) > 0
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b),
                                  check_dtype=False)


def test_chunk_dedup_copy_counts(ray_session):
    from reconcile_curation_in_cris_systems_ray.stages.chunks import (
        chunk_dedup,
    )

    # two identical docs + one unique: every owned chunk of the copied
    # text must report n_copies == 2 and be owned by the lower doc_id
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["a b c d e f", "a b c d e f", "g h i j k l"],
    })
    out = chunk_dedup(_ds(df), "doc_id", "text",
                      chunk_tokens=3).to_pandas()
    out = _sorted(out)
    expect = pd.DataFrame({
        "chunk_id": [0, 1, 0, 1],
        "doc_id": [1, 1, 3, 3],
        "n_copies": [2, 2, 1, 1],
    })
    pd.testing.assert_frame_equal(out, _sorted(expect), check_dtype=False)


def test_setsim_rank_vs_hash_order(ray_session):
    from reconcile_curation_in_cris_systems_ray.stages.setsim import (
        setsim_join,
    )

    df = _docs_df(n_docs=90, seed=5)
    a = setsim_join(_ds(df), "doc_id", "text", threshold=0.5,
                    shingle_n=3).to_pandas()
    # df_broadcast_cap=0 forces the hash total order (no global DF pass)
    b = setsim_join(_ds(df), "doc_id", "text", threshold=0.5,
                    shingle_n=3, df_broadcast_cap=0).to_pandas()
    assert len(a) > 0  # the planted full copies guarantee pairs
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b),
                                  check_dtype=False)


def test_setsim_matches_bruteforce(ray_session):
    from reconcile_curation_in_cris_systems_ray.stages.setsim import (
        setsim_join,
    )

    df = _docs_df(n_docs=60, seed=9)
    t = 0.4
    got = _sorted(setsim_join(_ds(df), "doc_id", "text", threshold=t,
                              shingle_n=2).to_pandas())

    def grams(s):
        toks = s.lower().split()
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}

    sets = {r.doc_id: grams(r.text) for r in df.itertuples()}
    rows = []
    ids = sorted(sets)
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            inter = len(sets[da] & sets[db])
            if not inter:
                continue
            jac = inter / len(sets[da] | sets[db])
            if jac >= t:
                rows.append((da, db, round(jac, 6)))
    expect = _sorted(pd.DataFrame(rows,
                                  columns=["doc_a", "doc_b", "jaccard"]))
    assert len(expect) > 0
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_unigram_logprob_broadcast_vs_join(ray_session):
    from reconcile_curation_in_cris_systems_ray.stages.textstats import (
        unigram_logprob,
    )

    df = _docs_df(n_docs=100, seed=3)
    a = unigram_logprob(_ds(df), "doc_id", "text", ref_mod=5).to_pandas()
    # broadcast_max_terms=0 forces the distributed left-join hydration
    b = unigram_logprob(_ds(df), "doc_id", "text", ref_mod=5,
                        broadcast_max_terms=0).to_pandas()
    assert len(a) == len(df)
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b),
                                  check_dtype=False)
