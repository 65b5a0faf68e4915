"""dualvar_tpu — TPU-native self-supervised video representation learning.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the DualVar
reference (BMVC 2021, "Inter-intra Variant Dual Representations for
Self-supervised Video Recognition"): 3D-CNN video backbones, SimCLR/MoCo
contrastive pretraining augmented with the shuffle-rank (SR) intra-variant
pretext and temporal-coherent (TC) contrastive objectives, downstream
linear-probe/finetune classification, multi-crop / temporal-10-clip test
protocols and k-NN video retrieval.

Design stance (TPU-first, not a port):
  * channels-last ``(B, T, H, W, C)`` tensors everywhere on device — XLA's
    preferred layout for convolutions on the MXU;
  * a functional core: models are flax.linen modules, losses are pure
    functions of features, all mutable training state (params, BN stats,
    optimizer state, MoCo queue/EMA) is an explicit pytree threaded through a
    single jitted ``train_step``;
  * one logical data mesh axis: batches are sharded over ``Mesh(('data',))``
    and the model runs with global semantics under ``jax.jit`` — the global
    contrastive denominators, cross-replica batch norm and gradient
    all-reduce all fall out of XLA's SPMD partitioner instead of hand-written
    NCCL calls (reference: utils/utils.py:321 GatherLayer, pretrain.py:244
    SyncBN, pretrain.py:248 DDP);
  * Pallas kernels for genuinely custom ops (soft-DTW wavefront,
    ops/soft_dtw.py) with pure-``lax.scan`` oracles for testing.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import dualvar_tpu` light)."""
    import importlib

    exports = {
        "select_backbone": ("dualvar_tpu.models.backbones", "select_backbone"),
        "SimCLRNaked": ("dualvar_tpu.models.ssl.simclr", "SimCLRNaked"),
        "SimCLRTimeSeriesV4": ("dualvar_tpu.models.ssl.simclr", "SimCLRTimeSeriesV4"),
        "MoCoEncoder": ("dualvar_tpu.models.ssl.moco", "MoCoEncoder"),
        "LinearClassifier": ("dualvar_tpu.models.heads", "LinearClassifier"),
        "soft_dtw": ("dualvar_tpu.ops.soft_dtw", "soft_dtw"),
        "soft_dtw_sequences": ("dualvar_tpu.ops.soft_dtw", "soft_dtw_sequences"),
        "PRETRAIN_PRESETS": ("dualvar_tpu.core.config", "PRETRAIN_PRESETS"),
        "CLASSIFIER_PRESETS": ("dualvar_tpu.core.config", "CLASSIFIER_PRESETS"),
        "PretrainConfig": ("dualvar_tpu.core.config", "PretrainConfig"),
        "ClassifierConfig": ("dualvar_tpu.core.config", "ClassifierConfig"),
    }
    if name in exports:
        module, attr = exports[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'dualvar_tpu' has no attribute {name!r}")
