"""CLI surface + SNR analysis."""

import json
import os

import numpy as np
import pytest

from bayeslms_tpu import ModelConfig, build_model, init_params
from bayeslms_tpu.analysis.snr import snr_report
from bayeslms_tpu.cli.main import main
from bayeslms_tpu.core.checkpoint import save_checkpoint


@pytest.fixture
def corpus_dir(tmp_path):
    rng = np.random.default_rng(0)
    words = ["<s>", "<unk>"] + [f"w{i}" for i in range(18)]
    (tmp_path / "words.txt").write_text("".join(f"{w} {i}\n" for i, w in enumerate(words)))
    lines = []
    for _ in range(120):
        L = rng.integers(3, 8)
        lines.append(" ".join(f"w{(i*3) % 18}" for i in range(L)))
    text = "\n".join(lines) + "\n"
    for split in ("train", "valid", "test"):
        (tmp_path / f"{split}.txt").write_text(text)
    return tmp_path


def test_cli_train_then_score_then_snr(corpus_dir, capsys):
    save = str(corpus_dir / "m.ckpt")
    rc = main([
        "train", "--data", str(corpus_dir), "--model", "LSTM",
        "--uncertainty", "Bayesian", "--L_bayes_pos", "3",
        "--emsize", "8", "--nhid", "8", "--epochs", "1", "--seq_len", "8",
        "--batch-size", "4", "--eval-batch-size", "4", "--lr", "1.0",
        "--save", save,
    ])
    assert rc == 0 and os.path.exists(save)

    nbest = corpus_dir / "nbest.txt"
    nbest.write_text("u1-1 w0 w3\nu1-2 w0 w5\n")
    out = corpus_dir / "scores.txt"
    rc = main([
        "score", "--nbest-list", str(nbest), "--vocabulary",
        str(corpus_dir / "words.txt"), "--model-path", save,
        "--outfile", str(out), "--model", "LSTM", "--uncertainty", "Bayesian",
        "--L_bayes_pos", "3", "--emsize", "8", "--nhid", "8",
    ])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 2 and lines[0].startswith("u1-1 ")

    capsys.readouterr()  # drain train/score output
    rc = main(["snr", "--model-path", save, "--L_bayes_pos", "3", "--nhid", "8"])
    assert rc == 0
    captured = capsys.readouterr().out
    report = json.loads(captured[captured.index("{"):])
    assert any("lgstd" in k for k in report)
    for v in report.values():
        assert v["median_snr"] > 0


def test_snr_report_gate_slice():
    cfg = ModelConfig(model="LSTM", vocab_size=30, emsize=8, nhid=8,
                      uncertainty="Bayesian", l_bayes_pos=2)
    params = init_params(build_model(cfg), cfg)
    rep = snr_report(params, cfg)
    key = "core/weight_hh_lgstd_1"
    assert key in rep
    assert rep[key]["shape"] == [8, 8]  # (H, H) slice lgstd
    assert rep[key]["median_snr"] > 0


def test_cli_score_context_file(corpus_dir):
    """--context-file: global single-line and per-utterance formats both
    reach the scorer (context changes the scores when splice_len > 0)."""
    save = str(corpus_dir / "m2.ckpt")
    rc = main([
        "train", "--data", str(corpus_dir), "--model", "LSTM",
        "--emsize", "8", "--nhid", "8", "--epochs", "1", "--seq_len", "8",
        "--batch-size", "4", "--eval-batch-size", "4", "--lr", "1.0",
        "--save", save,
    ])
    assert rc == 0

    nbest = corpus_dir / "nb2.txt"
    nbest.write_text("u1-1 w0 w3\nu2-1 w0 w5\n")

    def scores_of(extra):
        out = corpus_dir / "s.txt"
        rc = main([
            "score", "--nbest-list", str(nbest), "--vocabulary",
            str(corpus_dir / "words.txt"), "--model-path", save,
            "--outfile", str(out), "--model", "LSTM",
            "--emsize", "8", "--nhid", "8", "--no-carry-over",
        ] + extra)
        assert rc == 0
        return dict(l.split() for l in out.read_text().splitlines())

    base = scores_of([])
    glob_ctx = corpus_dir / "ctx_global.txt"
    glob_ctx.write_text("w1 w2 w3 w4\n")
    g = scores_of(["--context-file", str(glob_ctx), "--splice-len", "3"])
    per_ctx = corpus_dir / "ctx_per.txt"
    per_ctx.write_text("u1 w1 w2\nu2 w9 w9\n")
    p = scores_of(["--context-file", str(per_ctx), "--splice-len", "2"])

    assert base != g  # context conditioning changed the scores
    assert g != p
    assert set(base) == set(g) == set(p) == {"u1-1", "u2-1"}


def test_cli_score_context_file_bad_ids_errors(tmp_path, capsys):
    """A per-utterance context file with unknown utterance ids must ERROR
    rather than silently splicing its first line into every hypothesis."""
    from bayeslms_tpu import ModelConfig, build_model, init_params
    from bayeslms_tpu.core.checkpoint import save_checkpoint

    words = ["<s>", "<unk>"] + [f"w{i}" for i in range(6)]
    (tmp_path / "words.txt").write_text(
        "".join(f"{w} {i}\n" for i, w in enumerate(words)))
    cfg = ModelConfig(model="LSTM", vocab_size=len(words), emsize=8, nhid=8,
                      dropout=0.0)
    params = init_params(build_model(cfg), cfg)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params, cfg)
    (tmp_path / "nbest.txt").write_text("u1-1 w0 w1\nu2-1 w2\n")
    (tmp_path / "ctx.txt").write_text("u1 w3 w4\nu2_MISSPELLED w5\n")

    rc = main([
        "score", "--nbest-list", str(tmp_path / "nbest.txt"),
        "--vocabulary", str(tmp_path / "words.txt"), "--model-path", ckpt,
        "--model", "LSTM", "--emsize", "8", "--nhid", "8",
        "--splice-len", "2", "--context-file", str(tmp_path / "ctx.txt"),
        "--outfile", str(tmp_path / "out.txt"),
    ])
    assert rc == 1
    assert "not n-best utterance ids" in capsys.readouterr().err


def test_cli_interp_second_model_from_sidecar(corpus_dir):
    """--inter_path may point to an independently-trained model with
    DIFFERENT geometry/uncertainty: cfg2 is rebuilt from the checkpoint's
    model_config sidecar (written by Trainer.fit) instead of the main
    model's args. Interpolation must change the scores, and omitting
    --inter_path must fail with a clear error."""
    save1 = str(corpus_dir / "main.ckpt")
    rc = main([
        "train", "--data", str(corpus_dir), "--model", "LSTM",
        "--uncertainty", "Bayesian", "--L_bayes_pos", "3",
        "--emsize", "8", "--nhid", "8", "--epochs", "1", "--seq_len", "8",
        "--batch-size", "4", "--eval-batch-size", "4", "--lr", "1.0",
        "--save", save1,
    ])
    assert rc == 0
    save2 = str(corpus_dir / "baseline.ckpt")
    rc = main([
        "train", "--data", str(corpus_dir), "--model", "LSTM",
        "--emsize", "12", "--nhid", "12", "--nlayers", "1",
        "--epochs", "1", "--seq_len", "8", "--batch-size", "4",
        "--eval-batch-size", "4", "--lr", "1.0", "--save", save2,
    ])
    assert rc == 0

    nbest = corpus_dir / "nb_interp.txt"
    nbest.write_text("u1-1 w0 w3\nu1-2 w0 w5\n")

    def scores_of(extra):
        out = corpus_dir / "si.txt"
        rc = main([
            "score", "--nbest-list", str(nbest), "--vocabulary",
            str(corpus_dir / "words.txt"), "--model-path", save1,
            "--outfile", str(out), "--model", "LSTM", "--uncertainty",
            "Bayesian", "--L_bayes_pos", "3", "--emsize", "8", "--nhid", "8",
            "--no-carry-over",
        ] + extra)
        assert rc == 0
        return dict(l.split() for l in out.read_text().splitlines())

    base = scores_of([])
    interp = scores_of(["--interpolation_flag", "1",
                        "--inter_path", save2, "--inter_alpha", "0.5"])
    assert set(base) == set(interp) == {"u1-1", "u1-2"}
    assert base != interp  # the 12/12x1 baseline moved the scores

    import pytest as _pytest
    with _pytest.raises(SystemExit, match="requires --inter_path"):
        scores_of(["--interpolation_flag", "1"])


def test_cli_train_resume_flag(corpus_dir, capsys):
    """--resume continues an interrupted run from <save>.resume (the
    reference's flag existed but was wired out, train.py:92-93)."""
    save = str(corpus_dir / "r.ckpt")
    common = [
        "train", "--data", str(corpus_dir), "--model", "LSTM",
        "--emsize", "8", "--nhid", "8", "--seq_len", "8",
        "--batch-size", "4", "--eval-batch-size", "4", "--lr", "1.0",
        "--save", save, "--resume",
    ]
    assert main(common + ["--epochs", "1"]) == 0
    assert os.path.exists(save + ".resume")
    capsys.readouterr()
    assert main(common + ["--epochs", "2"]) == 0
    assert "resumed from epoch 1" in capsys.readouterr().out
