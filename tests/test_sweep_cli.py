"""Sweep runner (cli/sweep.py): a 2-point grid trains both configs and
writes a result.md-style table (the reference's per-model result.md grids
as one command, SURVEY.md §4)."""

import os


def test_sweep_two_point_grid(tmp_path, monkeypatch):
    from recalgorithm_tpu.cli import sweep

    out = str(tmp_path / "result.md")
    monkeypatch.chdir(tmp_path)  # keep any run artifacts inside tmp
    sweep.main([
        "--model", "DeepCrossing", "--synthetic",
        "--grid", '{"residual_network_num": [1, 2]}',
        "--out", out,
        "--",
        "--train_steps", "8", "--batch_size", "32",
        "--save_checkpoints_steps", "0",
        "--synthetic_vocab_scale", "0.002",
    ])
    assert os.path.exists(out)
    lines = [l for l in open(out).read().splitlines() if l.startswith("|")]
    header, sep, *rows = lines
    assert "residual_network_num" in header
    assert "read_comment_auc" in header
    assert len(rows) == 2
    # each row carries the grid value and a parseable AUC
    col = header.strip("|").split("|").index(" read_comment_auc ")
    for row, want in zip(rows, ("1", "2")):
        cells = [c.strip() for c in row.strip("|").split("|")]
        assert cells[0] == want
        assert 0.0 <= float(cells[col]) <= 1.0


def test_list_models(capsys):
    from recalgorithm_tpu.cli.main import main
    from recalgorithm_tpu.models import MODEL_REGISTRY

    out = main(["--list_models"])
    assert out == {}
    printed = capsys.readouterr().out
    for name in MODEL_REGISTRY:
        assert name in printed
