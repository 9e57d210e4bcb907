"""Entity extraction (ST1) + partial_ratio (F2) unit coverage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from reconcile_curation_in_cris_systems_ray.functions.similarity import (
    partial_lev_distance, partial_ratio,
)
from reconcile_curation_in_cris_systems_ray.stages.entities import (
    EntityExtractor, validate_entities,
)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = min(prev + (ca != cb), dp[j] + 1, dp[j - 1] + 1)
            prev, dp[j] = dp[j], cur
    return dp[-1]


def _brute_partial(p: str, t: str) -> int:
    """min Levenshtein over ALL substrings of t (incl. the empty one)."""
    if not p:
        return 0
    best = len(p)
    for i in range(len(t)):
        for j in range(i + 1, len(t) + 1):
            best = min(best, _lev(p, t[i:j]))
    return best


def test_partial_lev_distance_matches_bruteforce():
    import random

    random.seed(7)
    for _ in range(250):
        p = "".join(random.choice("abcde") for _ in range(random.randint(0, 6)))
        t = "".join(random.choice("abcde") for _ in range(random.randint(0, 12)))
        assert partial_lev_distance(p, t) == _brute_partial(p, t), (p, t)


def test_partial_ratio_known_values():
    # exact-substring alignments score 1.0 (rapidfuzz gives 100 here too)
    assert partial_ratio("bork", "bork is great") == 1.0
    assert partial_ratio("this is a test", "this is a test!") == 1.0
    assert partial_ratio("", "") == 1.0
    assert partial_ratio("", "abc") == 0.0
    assert partial_ratio("abc", "") == 0.0
    # one char off inside the best window
    assert partial_ratio("ring", "red rong widget") == pytest.approx(0.75)
    # symmetric in its arguments
    assert partial_ratio("abcd", "xxabcdxx") == partial_ratio("xxabcdxx", "abcd")


def test_entity_extractor_gazetteer():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["acme corp sells acme corp widgets",
                 "no entities here",
                 "globex at the start",
                 ""],
    })
    ex = EntityExtractor(entities=["acme corp", "globex"])
    out = ex(pa.Table.from_pandas(df)).to_pandas() \
        .sort_values(["doc_id", "entity"]).reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 3]
    assert list(out["entity"]) == ["acme corp", "globex"]
    assert list(out["pos"]) == [1, 1]
    assert list(out["n_hits"]) == [2, 1]


def test_entity_extractor_rejects_unknown_backend():
    with pytest.raises(ValueError):
        EntityExtractor(entities=["x"], backend="quantum")


def test_validate_entities_threshold():
    # 'acme corporation' contains 'acme corp' -> partial_ratio 1.0;
    # 'initech' matches nothing configured
    out = validate_entities(["acme corp", "initech"],
                            ["acme corporation", "globex inc"],
                            threshold=0.85)
    assert list(out["entity"]) == ["acme corp"]
    assert out.loc[0, "best_org"] == "acme corporation"
    assert out.loc[0, "best_score"] == 1.0


def test_extract_entities_actor_pool(ray_session):
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.entities import (
        extract_entities,
    )

    tbl = pa.table({
        "doc_id": pa.array(np.arange(100), pa.int64()),
        "text": pa.array([f"row {i} mentions acme corp" if i % 3 == 0
                          else f"row {i} plain" for i in range(100)]),
    })
    out = extract_entities(rd.from_arrow(tbl), ["acme corp"]).to_pandas()
    assert len(out) == 34
    assert (out["entity"] == "acme corp").all()
    assert (out["n_hits"] == 1).all()


def test_model_backend_end_to_end(ray_session):
    """ST1 model path: the stand-in NER model is loaded once per actor
    (trained in __init__) and batch-predicts in __call__, emitting the
    same (id, entity, pos, n_hits) schema as the gazetteer backend."""
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.entities import (
        extract_entities,
    )

    texts = []
    for i in range(60):
        if i % 3 == 0:
            texts.append(f"Doc {i}: funding from Acme Corporation was "
                         "confirmed by Stanford University today.")
        elif i % 3 == 1:
            texts.append(f"Doc {i}: John Smith met Mary Johnson for tea.")
        else:
            texts.append(f"doc {i} has no capitalized spans at all")
    tbl = pa.table({
        "doc_id": pa.array(np.arange(60), pa.int64()),
        "text": pa.array(texts),
    })
    out = extract_entities(rd.from_arrow(tbl), backend="model",
                           concurrency=(1, 2),
                           batch_size=16).to_pandas()
    assert list(out.columns) == ["doc_id", "entity", "pos", "n_hits"]
    org_docs = set(range(0, 60, 3))
    got = out.groupby("doc_id")["entity"].apply(set)
    for d in org_docs:
        assert {"Acme Corporation", "Stanford University"} <= got[d], got.get(d)
    # person-name and lowercase docs must produce no entity rows
    assert set(out["doc_id"]) == org_docs
    # pos is the 1-based first occurrence, n_hits the occurrence count
    one = out[(out["doc_id"] == 0) & (out["entity"] == "Acme Corporation")]
    assert int(one["pos"].iloc[0]) == texts[0].find("Acme Corporation") + 1
    assert int(one["n_hits"].iloc[0]) == 1


def test_model_backend_deterministic(ray_session):
    from reconcile_curation_in_cris_systems_ray.stages.entities import (
        _HashedNGramNER,
    )

    a, b = _HashedNGramNER(), _HashedNGramNER()
    assert np.array_equal(a.w, b.w)
    t = pd.Series(["Meeting at Vertex Institute with Ivan Novak."])
    pd.testing.assert_frame_equal(a.predict_spans(t), b.predict_spans(t))


def test_gazetteer_prefilter_matches_plain_loop(ray_session):
    """A >4-entity gazetteer activates the any-match prefilter; the
    output must equal the unfiltered per-entity pass."""
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.entities import (
        extract_entities,
    )

    ents_small = ["acme corp"]
    ents_big = ["acme corp", "globex", "initech", "umbrella", "hooli",
                "stark labs"]
    texts = [f"row {i} mentions acme corp and globex twice: globex"
             if i % 4 == 0 else f"row {i} mentions hooli" if i % 4 == 1
             else f"row {i} plain" for i in range(80)]
    tbl = pa.table({"doc_id": pa.array(np.arange(80), pa.int64()),
                    "text": pa.array(texts)})
    out = extract_entities(rd.from_arrow(tbl), ents_big).to_pandas() \
        .sort_values(["doc_id", "entity"]).reset_index(drop=True)
    # oracle: plain python containment
    rows = []
    for i, t in enumerate(texts):
        for e in ents_big:
            if e in t:
                rows.append((i, e, t.find(e) + 1, t.count(e)))
    want = pd.DataFrame(rows, columns=["doc_id", "entity", "pos",
                                       "n_hits"]) \
        .sort_values(["doc_id", "entity"]).reset_index(drop=True)
    got = out.astype({"doc_id": "int64", "entity": str,
                      "pos": "int64", "n_hits": "int64"})
    pd.testing.assert_frame_equal(
        got[["doc_id", "entity", "pos", "n_hits"]], want,
        check_dtype=False)


def test_gazetteer_flat_wall_as_gazetteer_grows():
    """Round-4 task 6 'done' criterion: per-batch wall stays flat as
    the gazetteer grows 10x — the single-pass multi-pattern scanner's
    cost is per distinct pattern LENGTH, not per entity."""
    import time

    from reconcile_curation_in_cris_systems_ray.stages.entities import (
        EntityExtractor,
    )
    import pandas as pd

    rng = __import__("numpy").random.default_rng(0)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26, 8))
             for _ in range(2000)]
    texts = [" ".join(rng.choice(words, 60)) for _ in range(400)]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    small = [w for w in words[:200]]
    big = [w + "q" for w in words] + [w + "zz" for w in words]  # 4000, no hits
    big = small + big  # superset: same hits, 21x entities

    ex_small = EntityExtractor(entities=small)
    ex_big = EntityExtractor(entities=big)
    # warm
    ex_small(df.copy())
    ex_big(df.copy())
    t0 = time.perf_counter()
    out_s = ex_small(df.copy())
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_b = ex_big(df.copy())
    t_big = time.perf_counter() - t0
    # identical hits for the shared 200 entities
    a = out_s.to_pandas().sort_values(["doc_id", "entity"]).reset_index(drop=True)
    b = (out_b.to_pandas()
         .query("entity in @small")
         .sort_values(["doc_id", "entity"]).reset_index(drop=True))
    assert a.equals(b)
    # 21x entities must NOT cost ~21x wall; allow generous 3x headroom
    assert t_big < 3.0 * t_small + 0.05, (t_small, t_big)
