"""Golden-output stability tests (SURVEY.md §4: fixed-seed checkpoints ->
byte-stable JSON for every CLI task).

The golden files under tests/goldens/ were produced by
``python tests/make_goldens.py`` from the deterministic fixture checkpoint
(tests/conftest.py:make_checkpoint_dict, seed 0) with engine seed 0. Any
refactor that changes a ranking, a score, or a result-dict key breaks these
tests — regenerate ONLY when the change is intentional and understood.
"""

import json
import os

import pytest

from probgan_tpu.engine import InferenceEngine

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _golden(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def engine(native_ckpt_path):
    return InferenceEngine(native_ckpt_path, device="cpu", seed=0)


def _canon(obj):
    """Round-trip through JSON so float reprs match the stored goldens."""
    return json.loads(json.dumps(obj))


def test_golden_predict_tails(engine):
    res = engine.predict_tails([(0, 1), (2, 3)], top_k=5, return_scores=True)
    assert _canon(res) == _golden("predict_tails.json")


def test_golden_score_triplets(engine):
    res = engine.score_triplets([(0, 1, 2), (3, 4, 5)], method="both")
    assert _canon(res) == _golden("score_triplets.json")


def test_goldens_survive_reordering(native_ckpt_path):
    """RNG keys are task-derived (core/rng.py): each task's first call on a
    fresh engine matches the golden no matter which tasks ran before it."""
    eng = InferenceEngine(native_ckpt_path, device="cpu", seed=0)
    # Deliberately inverted call order vs make_goldens.py.
    res_score = eng.score_triplets([(0, 1, 2), (3, 4, 5)], method="both")
    res_pred = eng.predict_tails([(0, 1), (2, 3)], top_k=5, return_scores=True)
    assert _canon(res_score) == _golden("score_triplets.json")
    assert _canon(res_pred) == _golden("predict_tails.json")


def test_golden_torch_pt_load_path(torch_ckpt_path):
    """The torch-.pt physical format load path produces byte-identical task
    output to the native msgpack path (same logical checkpoint + seed)."""
    eng = InferenceEngine(torch_ckpt_path, device="cpu", seed=0)
    res = eng.predict_tails([(0, 1), (2, 3)], top_k=5, return_scores=True)
    assert _canon(res) == _golden("predict_tails.json")


def test_golden_similar_entities(engine):
    res = engine.find_similar_entities([0, 7], top_k=4)
    assert _canon(res) == _golden("similar_entities.json")


def test_golden_analyze_relations(engine):
    res = engine.analyze_relations([1], [2], top_k=3)
    assert _canon(res) == _golden("analyze_relations.json")


def test_golden_model_info(engine, native_ckpt_path):
    res = engine.get_model_info()
    golden = _golden("model_info.json")
    golden["checkpoint_path"] = native_ckpt_path  # tmp path varies per run
    assert _canon(res) == golden
