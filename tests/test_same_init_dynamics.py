"""End-to-end training-dynamics parity vs the reference's OWN train.py.

Runs /root/reference/steps/pytorchnn/train.py unmodified (torch CPU,
subprocess) on a micro corpus, imports the exact same initial weights into
this framework (identical construction seed — train.py:123-130, :210-214),
trains with the same schedule, and asserts the per-epoch VALID LOSSES track.

This is the in-suite version of tools/same_init_parity.py, whose mid-scale
runs (docs/CONVERGENCE.md) show ≤0.4% valid-PPL deviation over 32 epochs
with the LR halving firing at the same epoch.
"""

import os
import random
import re
import subprocess
import sys

import jax
import numpy as np
import pytest
import torch

REF_DIR = "/root/reference/steps/pytorchnn"

V_WORDS = 40
E = H = 32
EPOCHS = 3
SEED = 1111


@pytest.fixture(scope="module")
def micro_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("microcorpus")
    rng = random.Random(7)
    words = [f"w{i}" for i in range(V_WORDS)]
    vocab = ["<s>", "<unk>"] + words

    def gen_lines(n_lines):
        lines, cur = [], 0
        for _ in range(n_lines):
            L = rng.randint(4, 12)
            out = []
            for _ in range(L):
                out.append(words[cur])
                cur = (cur + (1 if rng.random() < 0.8 else rng.randrange(V_WORDS))) % V_WORDS
            lines.append(" ".join(out))
        return "\n".join(lines) + "\n"

    (root / "train.txt").write_text(gen_lines(700))
    (root / "valid.txt").write_text(gen_lines(90))
    (root / "test.txt").write_text(gen_lines(90))
    (root / "words.txt").write_text(
        "".join(f"{w} {i}\n" for i, w in enumerate(vocab)))
    return root


def _run_reference(data_dir, save):
    env = dict(os.environ, PYTHONPATH=REF_DIR, OMP_NUM_THREADS="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REF_DIR, "train.py"),
         "--data", str(data_dir), "--seq_len", "20", "--clip", "1.0",
         "--batch-size", "8", "--epoch", str(EPOCHS), "--seed", str(SEED),
         "--dropout", "0.0", "--tied", "--save", save, "--model", "LSTM",
         "--emsize", str(E), "--nhid", str(H), "--nlayers", "2",
         "--lr", "1", "--uncertainty", "none"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(save))
    losses = [float(m) for m in re.findall(
        r"valid loss\s*([0-9.]+)", out.stdout)]
    assert len(losses) >= EPOCHS, f"reference run failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    return losses[:EPOCHS]


def test_same_init_valid_losses_track_reference(micro_corpus, tmp_path):
    ref_losses = _run_reference(micro_corpus, str(tmp_path / "ref.pt"))

    # the reference's exact init: same seed, same construction order
    # (model_2 then model for uncertainty=none, train.py:210-214)
    sys.path.insert(0, REF_DIR)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_model_mod", os.path.join(REF_DIR, "model.py"))
    refM = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refM)
    ntokens = V_WORDS + 2
    random.seed(SEED)
    torch.manual_seed(SEED)
    _m2 = refM.RNNModel("LSTM", ntokens, E, H, 2, 0.0, True)
    ref_model = refM.RNNModel("LSTM", ntokens, E, H, 2, 0.0, True)
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}

    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.core.checkpoint import (import_torch_state_dict,
                                              partial_update, save_checkpoint)
    from bayeslms_tpu.core.registry import build_model, init_params
    from bayeslms_tpu.data.corpus import Corpus
    from bayeslms_tpu.train.loop import Trainer

    cfg = ModelConfig(model="LSTM", vocab_size=ntokens, emsize=E, nhid=H,
                      nlayers=2, dropout=0.0)
    params = init_params(build_model(cfg), cfg)
    merged, updated = partial_update(params, import_torch_state_dict(sd, cfg))
    assert len(updated) == len(jax.tree.leaves(params))
    init_ckpt = str(tmp_path / "torch_init.ckpt")
    save_checkpoint(init_ckpt, merged, meta={})

    trainer = Trainer(cfg, TrainConfig(
        lr=1.0, batch_size=8, epochs=EPOCHS, seq_len=20, clip=1.0,
        seed=SEED, prior=True, prior_path=init_ckpt,
        save=str(tmp_path / "model.ckpt")))
    _, out = trainer.fit(Corpus(str(micro_corpus)))
    ours_losses = [e["val_loss"] for e in out["history"]][:EPOCHS]

    # identical init + data + schedule: per-epoch valid loss must track.
    # fp32-vs-bf16 and dropout-free micro dynamics keep this tight.
    for ep, (a, b) in enumerate(zip(ours_losses, ref_losses), 1):
        assert abs(a - b) / b < 0.03, (
            f"epoch {ep}: ours {a:.4f} vs torch {b:.4f} "
            f"(ours all: {ours_losses}, torch all: {ref_losses})")
