"""CLI surface tests: flags, dispatch, JSON output, REPL — matching the
reference's surface (pro_b_gan_infer.py:434-511, :340-432)."""

import json

import pytest

from probgan_tpu.cli import repl
from probgan_tpu.cli.infer import build_parser, main


def _run(capsys, argv):
    main(argv)
    return capsys.readouterr().out


def _extract_json(out: str):
    """The CLI prints banners then an indented JSON blob; parse the blob."""
    start = out.index("{\n")
    return json.loads(out[start:])


def test_parser_flags_match_reference_surface():
    parser = build_parser()
    opts = {a.option_strings[0] for a in parser._actions if a.option_strings}
    # Reference flags (pro_b_gan_infer.py:437-461):
    assert {
        "--checkpoint_path",
        "--task",
        "--input_triplets",
        "--input_pairs",
        "--input_entities",
        "--top_k",
        "--output_file",
        "--device",
    } <= opts


def test_task_choices_include_all_reference_tasks():
    parser = build_parser()
    task_action = next(a for a in parser._actions if a.dest == "task")
    # All six reference tasks (pro_b_gan_infer.py:441) plus the image-family
    # addition.
    assert {
        "predict_tails",
        "score_triplets",
        "similar_entities",
        "analyze_relations",
        "interactive",
        "model_info",
    } <= set(task_action.choices)
    assert "generate_images" in task_action.choices
    assert task_action.default == "interactive"


def test_model_info_task(capsys, native_ckpt_path):
    out = _run(
        capsys,
        ["--checkpoint_path", native_ckpt_path, "--task", "model_info",
         "--device", "cpu"],
    )
    assert "Loading Prot-B-GAN inference system..." in out
    assert "Inference ready!" in out
    info = _extract_json(out)
    assert info["model_architecture"]["num_entities"] == 50


def test_predict_tails_task(capsys, native_ckpt_path):
    out = _run(
        capsys,
        ["--checkpoint_path", native_ckpt_path, "--task", "predict_tails",
         "--input_pairs", "[[0, 1], [2, 3]]", "--top_k", "4",
         "--device", "cpu"],
    )
    res = _extract_json(out)
    assert res["metadata"] == {
        "num_queries": 2,
        "top_k": 4,
        "model_hit10": pytest.approx(0.4321),
    }
    assert "scores" in res  # CLI passes return_scores=True (:483)


def test_predict_tails_missing_input(capsys, native_ckpt_path):
    out = _run(
        capsys,
        ["--checkpoint_path", native_ckpt_path, "--task", "predict_tails",
         "--device", "cpu"],
    )
    assert "Error: --input_pairs required for predict_tails task" in out
    assert "{\n" not in out  # no JSON printed (results None, :502 guard)


def test_score_triplets_task(capsys, native_ckpt_path):
    out = _run(
        capsys,
        ["--checkpoint_path", native_ckpt_path, "--task", "score_triplets",
         "--input_triplets", "[[0, 1, 2], [3, 4, 5]]", "--device", "cpu"],
    )
    res = _extract_json(out)
    assert res["metadata"]["method"] == "both"  # CLI forces 'both' (:491)
    assert len(res["generator_scores"]) == 2
    assert len(res["discriminator_probabilities"]) == 2


def test_similar_entities_task(capsys, native_ckpt_path):
    out = _run(
        capsys,
        ["--checkpoint_path", native_ckpt_path, "--task", "similar_entities",
         "--input_entities", "[0, 5]", "--top_k", "3", "--device", "cpu"],
    )
    res = _extract_json(out)
    assert len(res["similar_entities"]) == 2
    assert res["similar_entities"][0]["query_entity"] == 0


def test_analyze_relations_dispatched(capsys, native_ckpt_path):
    """The reference accepts this task but never dispatches it (SURVEY.md
    §0.3); our CLI wires it via --input_heads/--input_tails."""
    out = _run(
        capsys,
        ["--checkpoint_path", native_ckpt_path, "--task", "analyze_relations",
         "--input_heads", "[0]", "--input_tails", "[1]", "--top_k", "2",
         "--device", "cpu"],
    )
    res = _extract_json(out)
    assert len(res["relation_analysis"]) == 1
    assert len(res["relation_analysis"][0]["top_relations"]) == 2


def test_output_file(tmp_path, capsys, native_ckpt_path):
    out_file = tmp_path / "results.json"
    out = _run(
        capsys,
        ["--checkpoint_path", native_ckpt_path, "--task", "model_info",
         "--output_file", str(out_file), "--device", "cpu"],
    )
    assert f"Results saved to: {out_file}" in out
    with open(out_file) as f:
        saved = json.load(f)
    assert saved["model_architecture"]["embedding_dim"] == 16


def test_missing_checkpoint_errors(capsys):
    with pytest.raises(FileNotFoundError, match="Checkpoint not found"):
        main(["--checkpoint_path", "/does/not/exist.pt", "--task", "model_info",
              "--device", "cpu"])


# -- REPL ---------------------------------------------------------------------

def _run_repl(monkeypatch, capsys, engine, commands):
    it = iter(commands)

    def fake_input(prompt=""):
        try:
            return next(it)
        except StopIteration:
            raise KeyboardInterrupt

    monkeypatch.setattr("builtins.input", fake_input)
    repl.interactive_mode(engine)
    return capsys.readouterr().out


@pytest.fixture(scope="module")
def repl_engine(native_ckpt_path):
    from probgan_tpu.engine import InferenceEngine

    return InferenceEngine(native_ckpt_path, "cpu")


def test_repl_banner_and_quit(monkeypatch, capsys, repl_engine):
    out = _run_repl(monkeypatch, capsys, repl_engine, ["quit"])
    assert "Prot-B-GAN Interactive Mode" in out
    assert "done!" in out


def test_repl_predict_and_info(monkeypatch, capsys, repl_engine):
    out = _run_repl(
        monkeypatch, capsys, repl_engine, ["predict 0 1 3", "info", "quit"]
    )
    assert "Top 3 predictions for (0, 1):" in out
    assert "Model Information:" in out
    assert "Entities: 50" in out


def test_repl_score_and_similar(monkeypatch, capsys, repl_engine):
    out = _run_repl(
        monkeypatch, capsys, repl_engine, ["score 0 1 2", "similar 3 2", "quit"]
    )
    assert "Scores for triplet (0, 1, 2):" in out
    assert "Generator similarity:" in out
    assert "Top 2 entities similar to 3:" in out


def test_repl_usage_and_unknown(monkeypatch, capsys, repl_engine):
    out = _run_repl(
        monkeypatch, capsys, repl_engine,
        ["predict 1", "bogus", "help", "", "quit"],
    )
    assert "Usage: predict <head_id> <relation_id> <top_k>" in out
    assert "Unknown command: bogus." in out
    assert "Available commands:" in out


def test_repl_error_recovery(monkeypatch, capsys, repl_engine):
    """Per-command exceptions print and continue (pro_b_gan_infer.py:431-432)."""
    out = _run_repl(
        monkeypatch, capsys, repl_engine, ["predict a b c", "info", "quit"]
    )
    assert "Error:" in out
    assert "Model Information:" in out
