#!/usr/bin/env python
"""Training-dynamics parity A/B: this framework vs a torch model with the
reference's exact architecture/loop, same data, same schedule.

Initializations are drawn from the same distributions but different RNGs, so
the check is statistical: final test PPLs must land within a band of each
other. Run on CPU: JAX_PLATFORMS=cpu python tools/ppl_parity_check.py
"""

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

# env vars do NOT override this container's axon registration; only the
# config call selects the CPU backend
jax.config.update("jax_platforms", "cpu")

import numpy as np

V, E, H, LAYERS = 40, 32, 32, 2
BATCH, SEQ, EPOCHS, LR, CLIP = 8, 16, 4, 2.0, 1.0


def make_stream(n=12000, seed=0):
    rng = np.random.default_rng(seed)
    # order-2 markov-ish stream: learnable but not trivial
    out = [1]
    for _ in range(n - 1):
        nxt = (out[-1] * 7 + int(rng.integers(0, 3))) % (V - 2) + 2
        out.append(nxt)
    return np.asarray(out, dtype=np.int64)


def run_torch(train, valid):
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class M(nn.Module):  # reference RNNModel structure
        def __init__(self):
            super().__init__()
            self.encoder = nn.Embedding(V, E)
            self.rnn = nn.LSTM(E, H, LAYERS)
            self.decoder = nn.Linear(H, V)
            self.decoder.weight = self.encoder.weight

        def forward(self, x, hid):
            out, hid = self.rnn(self.encoder(x), hid)
            return self.decoder(out), hid

    def batchify(d, b):
        n = len(d) // b
        return torch.tensor(d[: n * b]).view(b, n).t().contiguous()

    tr, va = batchify(train, BATCH), batchify(valid, BATCH)
    m = M()
    crit = nn.CrossEntropyLoss()
    opt = torch.optim.SGD(m.parameters(), lr=LR, momentum=0.9)
    for ep in range(EPOCHS):
        m.train()
        hid = (torch.zeros(LAYERS, BATCH, H), torch.zeros(LAYERS, BATCH, H))
        for i in range(0, tr.size(0) - 1 - SEQ, SEQ):
            d, t = tr[i : i + SEQ], tr[i + 1 : i + 1 + SEQ].reshape(-1)
            hid = tuple(h.detach() for h in hid)
            opt.zero_grad()
            out, hid = m(d, hid)
            loss = crit(out.view(-1, V), t)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(m.parameters(), CLIP)
            opt.step()
    m.eval()
    total, count = 0.0, 0
    hid = (torch.zeros(LAYERS, BATCH, H), torch.zeros(LAYERS, BATCH, H))
    with torch.no_grad():
        for i in range(0, va.size(0) - 1 - SEQ, SEQ):
            d, t = va[i : i + SEQ], va[i + 1 : i + 1 + SEQ].reshape(-1)
            out, hid = m(d, hid)
            total += crit(out.view(-1, V), t).item() * t.numel()
            count += t.numel()
    return math.exp(total / count)


def run_jax(train, valid):
    from bayeslms_tpu import ModelConfig, TrainConfig
    from bayeslms_tpu.train.loop import Trainer

    class C:
        pass

    corpus = C()
    corpus.train = train.astype(np.int32)
    corpus.valid = valid.astype(np.int32)
    corpus.test = valid.astype(np.int32)
    cfg = ModelConfig(model="LSTM", vocab_size=V, emsize=E, nhid=H,
                      nlayers=LAYERS, dropout=0.0)
    tcfg = TrainConfig(lr=LR, batch_size=BATCH, eval_batch_size=BATCH,
                       epochs=EPOCHS, seq_len=SEQ, clip=CLIP,
                       log_interval=10**9,
                       save=os.path.join(tempfile.mkdtemp(), "m.ckpt"))
    _, out = Trainer(cfg, tcfg).fit(corpus, log=lambda *a: None)
    return math.exp(out["test_loss"])


if __name__ == "__main__":
    train, valid = make_stream(12000, 0), make_stream(3000, 1)
    ppl_t = run_torch(train, valid)
    ppl_j = run_jax(train, valid)
    ratio = ppl_j / ppl_t
    print(f"torch PPL={ppl_t:.3f}  bayeslms_tpu PPL={ppl_j:.3f}  ratio={ratio:.3f}")
    assert 0.8 < ratio < 1.25, "training dynamics diverge beyond the parity band"
    print("PPL PARITY OK")
