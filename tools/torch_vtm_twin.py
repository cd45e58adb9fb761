"""Torch twin driver for the Variational Transformer (T_v_pos > 0).

The reference AS SHIPPED cannot train this configuration: its
``VTransformerEncoderLayer.sample_weight_diff`` reads ``self.hiddens``, an
attribute that is never assigned anywhere (model.py:2785; forward assigns
``self.hidden`` at :2800), so the first training forward raises
AttributeError — evidence: exp/campaign/torch_vtm/train.log (the unmodified
run crashes on batch 1).

Three minimal repairs are required (all documented in
bayeslms_tpu/models/transformer_lm.py VEncoderLayer, which implements the
repaired semantics):

1. ``sample_weight_diff`` reads ``self.hidden`` (the stored FFN output, the
   only tensor in scope matching the name) instead of the never-assigned
   ``self.hiddens``.
2. ``forward``'s ``src2 += self.sample_weight_diff()`` (model.py:2802-2803)
   becomes the out-of-place ``src2 = src2 + ...``: the in-place add mutates
   the very tensor ``sample_weight_diff`` just saved for ``exp``'s backward
   (``exp(hidden * lgstd)`` with ``hidden is src2``), so even after repair 1
   autograd's version counter rejects the graph on ``loss.backward()``
   (evidence: exp/campaign/torch_vtm_fixed/train.log). Out-of-place also
   keeps ``self.hidden`` pointing at the PRE-noise FFN output, which is what
   ``kl_divergence`` (model.py:2770-2781) reads.

3. ``kl_divergence`` (model.py:2770-2781) computes
   ``prior_mean = self.hidden * self.hiddens_mean_p`` BEFORE its own
   ``self.hidden.size()[0] == 100`` gate, so the epoch's ragged final window
   (99 steps on this corpus) crashes on a (99,B,d)×(100,1,d) broadcast —
   evidence: the first exp/campaign/torch_vtm_fixed/train.log (two-patch run
   dies at batch 375 of epoch 1). Repair: hoist the existing gate above the
   prior computation; KL for short windows is 0, exactly the semantics the
   gate already encodes (and what VEncoderLayer's ``T == v_seq_len`` branch
   implements).

With the patches applied the reference's train.py runs unmodified; the
resulting run is the same-init twin for the V-Transformer family.

Usage: PYTHONPATH not needed; argv after the script name is passed to
train.py verbatim.
"""

import runpy
import sys

sys.path.insert(0, "/root/reference/steps/pytorchnn")

import torch  # noqa: E402

import model  # noqa: E402  (the reference's model.py)


def sample_weight_diff(self):
    # model.py:2784-2792 with self.hiddens -> self.hidden
    if self.training:
        hiddens_lgstd = torch.exp(self.hidden * self.hiddens_lgstd)
        epsilon = hiddens_lgstd.new_zeros(*hiddens_lgstd.size()).normal_(0, 0.1)
        return epsilon * hiddens_lgstd
    return 0


def kl_divergence(self):
    # model.py:2770-2781 with the size gate hoisted above the prior math
    # (repair 3): the prior tables are (100, 1, d), so the ragged final
    # window's (99, B, d) hidden cannot broadcast against them.
    kl = 0
    if self.training and self.hidden.size()[0] == 100:
        prior_mean = self.hidden * self.hiddens_mean_p
        kl += torch.mean(
            (self.hidden - prior_mean) ** 2.
            - self.hiddens_lgstd * 2.
            + torch.exp(self.hiddens_lgstd * 2)) / 2.
    return kl


def forward(self, src, src_mask=None):
    # model.py:2793-2806 with the noise add made out-of-place (repair 2)
    src2 = self.self_attn(src, src, src, attn_mask=src_mask)[0]
    src = src + self.dropout1(src2)
    src = self.norm1(src)

    src2 = self.linear2(self.dropout(self.activation(self.linear1(src))))
    self.hidden = src2
    if self.training and src2.size()[0] == 100:
        src2 = src2 + self.sample_weight_diff()

    src = src + self.dropout2(src2)
    src = self.norm2(src)
    return src


model.VTransformerEncoderLayer.sample_weight_diff = sample_weight_diff
model.VTransformerEncoderLayer.kl_divergence = kl_divergence
model.VTransformerEncoderLayer.forward = forward

sys.argv = ["train.py"] + sys.argv[1:]
runpy.run_path("/root/reference/steps/pytorchnn/train.py", run_name="__main__")
