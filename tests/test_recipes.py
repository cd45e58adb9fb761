"""L5 recipe scripts end to end: run_nnlm_ami_lstm.sh trains a model and
rescores synthetic lattices through both stages, with hyperparameters
overridden via the parse_options-style flags (the reference's recipe
surface, run_nnlm_ami_lstm.sh:19-24)."""

import json
import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_tools():
    subprocess.run(["make", "-C", os.path.join(ROOT, "tools")], check=True,
                   capture_output=True)


def test_recipe_lstm_end_to_end(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    words = ["<eps>", "<s>", "<unk>", "good", "bad", "day", "night"]
    (data / "words.txt").write_text(
        "".join(f"{w} {i}\n" for i, w in enumerate(words)))
    text = "\n".join("good day" if i % 2 else "bad night"
                     for i in range(60)) + "\n"
    for split in ("train", "valid", "test"):
        (data / f"{split}.txt").write_text(text)

    lats = tmp_path / "lats.txt"
    lats.write_text(
        "u1\n0 1 4 0.1,1.0\n0 2 3 2.0,1.0\n1 3 5 0.1,1.0\n2 3 5 0.1,1.0\n3\n\n")
    ref = tmp_path / "ref.txt"
    ref.write_text("u1 good day\n")

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    expdir = tmp_path / "exp"
    proc = subprocess.run(
        ["bash", os.path.join(ROOT, "recipes", "run_nnlm_ami_lstm.sh"),
         "--stage", "1",
         "--data", str(data), "--expdir", str(expdir),
         "--emsize", "8", "--nhid", "8", "--epochs", "2",
         "--batch_size", "8", "--seq_len", "6", "--lr", "2.0",
         "--platform", "cpu",  # keep the smoke off the TPU compile path
         "--lattices", str(lats), "--ref", str(ref)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (expdir / "model.ckpt").exists()
    assert (expdir / "rescore").is_dir()
    last = [l for l in (expdir / "rescore.log").read_text().splitlines()
            if l.startswith("{")][-1]
    res = json.loads(last)
    assert res["n_utts"] == 1 and res["n_hyps"] == 2
    assert set(map(int, res["wer_by_lmwt"])) == set(range(7, 16))


def test_recipe_tm_train_stage(tmp_path):
    """run_nnlm_ami_tm.sh stage 1 (train only) with overridden sizes."""
    data = tmp_path / "data"
    data.mkdir()
    words = ["<eps>", "<s>", "<unk>", "good", "bad", "day", "night"]
    (data / "words.txt").write_text(
        "".join(f"{w} {i}\n" for i, w in enumerate(words)))
    text = "\n".join("good day" for _ in range(40)) + "\n"
    for split in ("train", "valid", "test"):
        (data / f"{split}.txt").write_text(text)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    expdir = tmp_path / "exp"
    proc = subprocess.run(
        ["bash", os.path.join(ROOT, "recipes", "run_nnlm_ami_tm.sh"),
         "--stage", "1", "--data", str(data), "--expdir", str(expdir),
         "--emsize", "8", "--nhid", "16", "--nlayers", "1", "--nhead", "2",
         "--epochs", "1", "--batch_size", "8", "--seq_len", "6",
         "--lr", "0.5", "--platform", "cpu", "--uncertainty", "Bayesian",
         "--T_bayes_pos", "FFN"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (expdir / "model.ckpt").exists()


def test_recipe_interpolated_rescoring(tmp_path):
    """Recipe-level interpolated rescoring (VERDICT r2 item 3): two models
    trained via stage 1, then the rescore stage runs logit-level
    interpolation (inter_flag=1) end-to-end through run_pipeline with the
    WER sweep — the configuration the reference pipeline forwards at
    lmrescore_nbest_pytorchnn_cuda.sh:217-218 / run_nnlm_ami_tm.sh:133-134."""
    data = tmp_path / "data"
    data.mkdir()
    words = ["<eps>", "<s>", "<unk>", "good", "bad", "day", "night"]
    (data / "words.txt").write_text(
        "".join(f"{w} {i}\n" for i, w in enumerate(words)))
    text = "\n".join("good day" if i % 2 else "bad night"
                     for i in range(60)) + "\n"
    for split in ("train", "valid", "test"):
        (data / f"{split}.txt").write_text(text)
    lats = tmp_path / "lats.txt"
    lats.write_text(
        "u1\n0 1 4 0.1,1.0\n0 2 3 2.0,1.0\n1 3 5 0.1,1.0\n2 3 5 0.1,1.0\n3\n\n")
    ref = tmp_path / "ref.txt"
    ref.write_text("u1 good day\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")

    common = ["--data", str(data), "--emsize", "8", "--nhid", "8",
              "--epochs", "2", "--batch_size", "8", "--seq_len", "6",
              "--lr", "2.0", "--platform", "cpu"]
    # interpolation (baseline) model: stage 1 only
    base_dir = tmp_path / "exp_base"
    proc = subprocess.run(
        ["bash", os.path.join(ROOT, "recipes", "run_nnlm_ami_lstm.sh"),
         "--stage", "1", "--expdir", str(base_dir), *common],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # main model + interpolated rescore
    expdir = tmp_path / "exp_main"
    proc = subprocess.run(
        ["bash", os.path.join(ROOT, "recipes", "run_nnlm_ami_lstm.sh"),
         "--stage", "1", "--expdir", str(expdir), *common,
         "--inter_flag", "1", "--inter_alpha", "0.8",
         "--inter_path", str(base_dir / "model.ckpt"),
         "--lattices", str(lats), "--ref", str(ref)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    last = [l for l in (expdir / "rescore.log").read_text().splitlines()
            if l.startswith("{")][-1]
    res = json.loads(last)
    assert res["n_utts"] == 1 and res["n_hyps"] == 2
    assert set(map(int, res["wer_by_lmwt"])) == set(range(7, 16))
    assert res["best_wer"] is not None
