"""Torch twin driver for the Variational Transformer (T_v_pos > 0).

The reference AS SHIPPED cannot train this configuration: its
``VTransformerEncoderLayer.sample_weight_diff`` reads ``self.hiddens``, an
attribute that is never assigned anywhere (model.py:2785; forward assigns
``self.hidden`` at :2800), so the first training forward raises
AttributeError — evidence: exp/campaign/torch_vtm/train.log (the unmodified
run crashes on batch 1).

This driver applies the minimal one-token repair — read ``self.hidden``,
the stored FFN output and the only tensor in scope matching the name —
which is exactly the interpretation this framework implements
(bayeslms_tpu/models/transformer_lm.py VEncoderLayer docstring), then runs
the reference's train.py unmodified. The resulting run is the same-init
twin for the V-Transformer family.

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


model.VTransformerEncoderLayer.sample_weight_diff = sample_weight_diff

sys.argv = ["train.py"] + sys.argv[1:]
runpy.run_path("/root/reference/steps/pytorchnn/train.py", run_name="__main__")
