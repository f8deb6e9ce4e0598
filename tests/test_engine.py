"""Engine behavior tests: result schemas match the reference's dicts
(pro_b_gan_infer.py:153-163,190-209,238-261,279-318,324-338) and the math
matches independent numpy recomputation.
"""

import jax
import numpy as np
import pytest

from probgan_tpu.engine import InferenceEngine
from tests.conftest import (
    EMBED_DIM,
    HIDDEN_DIM,
    NOISE_DIM,
    NUM_ENTITIES,
    NUM_RELATIONS,
)


@pytest.fixture(scope="module")
def engine(native_ckpt_path):
    return InferenceEngine(native_ckpt_path, device="cpu", seed=0)


# -- numpy reference implementations ----------------------------------------

def _np_lrelu(x):
    return np.where(x >= 0, x, 0.2 * x)


def _np_mlp(params, x):
    for name in ("fc1", "fc2", "fc3"):
        x = x @ np.asarray(params[name]["w"]) + np.asarray(params[name]["b"])
        if name != "fc3":
            x = _np_lrelu(x)
    return x


def _np_disc_logits(ckpt, trips):
    node = ckpt["node_emb"]
    rel = ckpt["rel_emb"]["weight"]
    x = np.concatenate(
        [node[trips[:, 0]], rel[trips[:, 1]], node[trips[:, 2]]], axis=-1
    )
    return _np_mlp(ckpt["discriminator"], x)[:, 0]


def _np_normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


# -- predict_tails -----------------------------------------------------------

def test_predict_tails_schema(engine):
    res = engine.predict_tails([(0, 1), (2, 3)], top_k=5, return_scores=True)
    assert set(res) == {"predictions", "metadata", "scores"}
    assert res["metadata"] == {
        "num_queries": 2,
        "top_k": 5,
        "model_hit10": pytest.approx(0.4321),
    }
    assert len(res["predictions"]) == 2 and len(res["predictions"][0]) == 5
    assert len(res["scores"]) == 2 and len(res["scores"][0]) == 5
    # Scores are cosine similarities, descending per row.
    for row in res["scores"]:
        assert all(-1.001 <= s <= 1.001 for s in row)
        assert row == sorted(row, reverse=True)


def test_predict_tails_no_scores_key(engine):
    res = engine.predict_tails([(0, 1)], top_k=3, return_scores=False)
    assert "scores" not in res


def test_predict_tails_deterministic_for_fresh_engine(native_ckpt_path, capsys):
    """A freshly-seeded engine reproduces the same predictions (explicit RNG
    policy, core/rng.py)."""
    r1 = InferenceEngine(native_ckpt_path, "cpu", seed=7).predict_tails(
        [(1, 2)], top_k=4, return_scores=True
    )
    r2 = InferenceEngine(native_ckpt_path, "cpu", seed=7).predict_tails(
        [(1, 2)], top_k=4, return_scores=True
    )
    assert r1 == r2


def test_predict_tails_matches_numpy(engine, ckpt_dict):
    """Ranking must equal numpy: gather -> G fwd (with the engine's actual
    noise draw) -> normalize -> matmul -> topk."""
    pairs = [(3, 1), (7, 0), (10, 4)]
    res = engine.predict_tails(pairs, top_k=6, return_scores=True)

    # Reproduce the engine's task-keyed noise draw for this call
    # (core/rng.py: fold_in(fold_in(seed, crc32(task)), per-task counter)).
    import zlib

    counter = engine._rng.counter("predict_tails") - 1
    bucket = 8  # len(pairs)=3 -> bucket 8
    key = jax.random.fold_in(
        jax.random.key(0), zlib.crc32(b"predict_tails") & 0x7FFFFFFF
    )
    key = jax.random.fold_in(key, counter)
    z = np.asarray(jax.random.normal(key, (bucket, NOISE_DIM)), np.float32)

    node = ckpt_dict["node_emb"]
    rel = ckpt_dict["rel_emb"]["weight"]
    heads = np.array([p[0] for p in pairs])
    rels = np.array([p[1] for p in pairs])
    x = np.concatenate([node[heads], rel[rels], z[: len(pairs)]], axis=-1)
    pred = _np_mlp(ckpt_dict["generator"], x)
    sims = _np_normalize(pred) @ _np_normalize(node).T
    order = np.argsort(-sims, axis=1, kind="stable")[:, :6]

    np.testing.assert_array_equal(np.asarray(res["predictions"]), order)
    np.testing.assert_allclose(
        np.asarray(res["scores"]),
        np.take_along_axis(sims, order, axis=1),
        rtol=1e-4,
        atol=1e-5,
    )


# -- score_triplets ----------------------------------------------------------

def test_score_triplets_schema_and_disc_math(engine, ckpt_dict):
    trips = [(0, 1, 2), (3, 4, 5), (6, 0, 7)]
    res = engine.score_triplets(trips, method="both")
    assert set(res) == {
        "triplets",
        "metadata",
        "generator_scores",
        "discriminator_logits",
        "discriminator_probabilities",
    }
    assert res["triplets"] == [list(t) for t in trips]
    assert res["metadata"]["method"] == "both"
    assert res["metadata"]["num_triplets"] == 3

    expected_logits = _np_disc_logits(ckpt_dict, np.asarray(trips))
    np.testing.assert_allclose(
        res["discriminator_logits"], expected_logits, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        res["discriminator_probabilities"],
        1.0 / (1.0 + np.exp(-expected_logits)),
        rtol=1e-4,
        atol=1e-6,
    )
    # Generator cosine scores are bounded.
    assert all(-1.001 <= s <= 1.001 for s in res["generator_scores"])


def test_score_triplets_method_filtering(engine):
    gen_only = engine.score_triplets([(0, 1, 2)], method="generator")
    assert "generator_scores" in gen_only
    assert "discriminator_logits" not in gen_only
    disc_only = engine.score_triplets([(0, 1, 2)], method="discriminator")
    assert "discriminator_logits" in disc_only
    assert "generator_scores" not in disc_only


# -- find_similar_entities ---------------------------------------------------

def test_similar_entities_matches_numpy_and_excludes_self(engine, ckpt_dict):
    res = engine.find_similar_entities([4, 9], top_k=5)
    assert set(res) == {"similar_entities", "metadata"}
    assert res["metadata"]["num_queries"] == 2

    norm = _np_normalize(ckpt_dict["node_emb"])
    sims = norm @ norm.T
    for entry, qid in zip(res["similar_entities"], [4, 9]):
        assert entry["query_entity"] == qid
        assert qid not in entry["similar_entities"]
        assert len(entry["similar_entities"]) == 5
        # Self-exclusion semantics of pro_b_gan_infer.py:247-255: top-(k+1)
        # then mask then slice.
        order = np.argsort(-sims[qid], kind="stable")[:6]
        expected = [i for i in order if i != qid][:5]
        assert entry["similar_entities"] == expected


# -- analyze_relations ---------------------------------------------------------

def test_analyze_relations_matches_bruteforce(engine, ckpt_dict):
    """The batched device kernel must reproduce the reference's brute-force
    loop semantics (pro_b_gan_infer.py:290-312): for each (h, t), score every
    relation, sort by probability desc, take top-k."""
    heads, tails, k = [1, 2], [3, 4], 3
    res = engine.analyze_relations(heads, tails, top_k=k)
    assert set(res) == {"relation_analysis", "metadata"}
    assert res["metadata"] == {
        "num_head_entities": 2,
        "num_tail_entities": 2,
        "top_k": k,
        "model_hit10": pytest.approx(0.4321),
    }
    assert len(res["relation_analysis"]) == 4

    i = 0
    for h in heads:
        for t in tails:
            entry = res["relation_analysis"][i]
            assert entry["head_entity"] == h and entry["tail_entity"] == t
            trips = np.array([[h, r, t] for r in range(NUM_RELATIONS)])
            logits = _np_disc_logits(ckpt_dict, trips)
            probs = 1.0 / (1.0 + np.exp(-logits))
            order = np.argsort(-probs, kind="stable")[:k]
            got_rels = [tr["relation_id"] for tr in entry["top_relations"]]
            assert got_rels == order.tolist()
            np.testing.assert_allclose(
                [tr["discriminator_score"] for tr in entry["top_relations"]],
                logits[order],
                rtol=1e-4,
                atol=1e-5,
            )
            np.testing.assert_allclose(
                [tr["probability"] for tr in entry["top_relations"]],
                probs[order],
                rtol=1e-4,
                atol=1e-6,
            )
            i += 1


def test_analyze_relations_topk_clamped_to_num_relations(engine):
    res = engine.analyze_relations([0], [1], top_k=100)
    assert len(res["relation_analysis"][0]["top_relations"]) == NUM_RELATIONS


# -- model_info ----------------------------------------------------------------

def test_model_info(engine, native_ckpt_path):
    info = engine.get_model_info()
    assert info == {
        "model_architecture": {
            "embedding_dim": EMBED_DIM,
            "noise_dim": NOISE_DIM,
            "hidden_dim": HIDDEN_DIM,
            "num_entities": NUM_ENTITIES,
            "num_relations": NUM_RELATIONS,
        },
        "training_performance": {
            "best_validation_hit10": pytest.approx(0.4321),
            "best_epoch": 17,
        },
        "checkpoint_path": native_ckpt_path,
        "device": "cpu:0",
    }


# -- torch .pt checkpoint through the engine -----------------------------------

def test_engine_loads_torch_checkpoint(torch_ckpt_path, native_ckpt_path):
    """Same logical checkpoint in both physical formats -> identical disc
    scores (generator scores involve noise, disc path is deterministic)."""
    e_pt = InferenceEngine(torch_ckpt_path, "cpu")
    e_native = InferenceEngine(native_ckpt_path, "cpu")
    trips = [(0, 1, 2), (5, 3, 9)]
    r1 = e_pt.score_triplets(trips, method="discriminator")
    r2 = e_native.score_triplets(trips, method="discriminator")
    np.testing.assert_allclose(
        r1["discriminator_logits"], r2["discriminator_logits"], rtol=1e-6
    )


def test_pallas_rank_path_matches_jnp_path(native_ckpt_path):
    """Engine with the Pallas fused-rank path (interpret mode on CPU) must
    produce identical rankings to the jnp path, including with an entity
    count that needs table padding (N=50 pads to 512)."""
    e_jnp = InferenceEngine(native_ckpt_path, "cpu", seed=3, use_pallas=False)
    e_pal = InferenceEngine(native_ckpt_path, "cpu", seed=3, use_pallas=True)
    pairs = [(0, 1), (2, 3), (5, 6)]
    r1 = e_jnp.predict_tails(pairs, top_k=7, return_scores=True)
    r2 = e_pal.predict_tails(pairs, top_k=7, return_scores=True)
    assert r1["predictions"] == r2["predictions"]
    np.testing.assert_allclose(r1["scores"], r2["scores"], atol=1e-6)

    s1 = e_jnp.find_similar_entities([4, 9], top_k=5)
    s2 = e_pal.find_similar_entities([4, 9], top_k=5)
    assert s1["similar_entities"][0]["similar_entities"] == \
        s2["similar_entities"][0]["similar_entities"]


# -- robustness fixes from review ---------------------------------------------

def test_similar_entities_topk_clamped_to_table(engine):
    """top_k >= N is a legal request: clamped to the table size (minus self
    when present) instead of crashing in lax.top_k."""
    res = engine.find_similar_entities([0], top_k=NUM_ENTITIES)
    got = res["similar_entities"][0]["similar_entities"]
    assert len(got) == NUM_ENTITIES - 1  # all others, self excluded
    assert 0 not in got


def test_out_of_range_ids_raise(engine):
    with pytest.raises(IndexError, match=r"entity id 999999 out of range"):
        engine.predict_tails([(999999, 0)], top_k=3)
    with pytest.raises(IndexError, match=r"relation id 99 out of range"):
        engine.predict_tails([(0, 99)], top_k=3)
    with pytest.raises(IndexError, match="entity id"):
        engine.score_triplets([(0, 0, 10**6)])
    with pytest.raises(IndexError, match="entity id -1"):
        engine.find_similar_entities([-1])
    with pytest.raises(IndexError, match="entity id"):
        engine.analyze_relations([10**6], [0])


def test_empty_inputs_return_empty_results(engine):
    assert engine.predict_tails([], top_k=5, return_scores=True) == {
        "predictions": [],
        "metadata": {"num_queries": 0, "top_k": 5,
                     "model_hit10": pytest.approx(0.4321)},
        "scores": [],
    }
    res = engine.score_triplets([], method="both")
    assert res["triplets"] == [] and res["generator_scores"] == []
    assert res["discriminator_logits"] == []
    assert engine.find_similar_entities([], top_k=3)["similar_entities"] == []
    assert engine.analyze_relations([], [1])["relation_analysis"] == []


def test_batch_bucket_padding_no_contamination(engine):
    """A 9-item batch pads to bucket 16; padded rows must not leak into
    results. The deterministic discriminator path makes this exact."""
    trips = [(i, i % NUM_RELATIONS, (i * 3) % NUM_ENTITIES) for i in range(9)]
    whole = engine.score_triplets(trips, method="discriminator")
    parts = []
    for t in trips:
        parts.extend(
            engine.score_triplets([t], method="discriminator")["discriminator_logits"]
        )
    np.testing.assert_allclose(
        whole["discriminator_logits"], parts, rtol=1e-5, atol=1e-6
    )
