"""bayeslms_tpu — a TPU-native Bayesian / GP / Variational LM framework.

A ground-up JAX/Flax/pjit/Pallas rebuild of the capability set of
AmourWaltz/BayesLMs (IEEE/ACM TASLP 2022): uncertainty-aware LSTM and
Transformer language models with configurable stochastic-parameter positions,
KL-regularized pretrain-then-finetune workflows, DARTS-style architecture
search, SNR posterior analysis, and a high-throughput batched N-best ASR
rescoring pipeline.
"""

from .core.config import ModelConfig, RescoreConfig, TrainConfig
from .core.registry import build_model, init_params, sum_losses

__version__ = "0.1.0"

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "RescoreConfig",
    "build_model",
    "init_params",
    "sum_losses",
]
