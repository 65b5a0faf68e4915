"""SSL pretrain tasks: a uniform functional interface over the four model
families (reference model registry get_model, pretrain.py:61-77):

    simclr_naked | simclr_timeseriesv4 | moco_naked | moco_timeseriesv4

Each task exposes ``init(rng, example_block)`` -> TaskState and
``forward(state, block, rng, train)`` -> (ret dict, new TaskState fields).
All mutation (BN stats, MoCo queue/EMA) is explicit state so a single jitted
train step covers every family. Total loss = sum of every ``*loss`` entry in
the returned dict — the reference's generic multi-loss accounting
(pretrain.py:404-445) with a static key schema per config.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.config import ModelConfig
from ..models.ssl.moco import (
    MoCoEncoder,
    MoCoState,
    init_moco_state,
    moco_naked_forward,
    moco_timeseries_forward,
)
from ..models.ssl.simclr import SimCLRNaked, SimCLRTimeSeriesV4


def _dtype(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]


class TaskState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    moco: MoCoState | None


def total_loss(ret: dict[str, jax.Array]) -> jax.Array:
    """Sum of every '*loss' entry (reference pretrain.py:404-445)."""
    return sum(v for k, v in ret.items() if k.endswith("loss"))


class SimCLRTask:
    n_views = None  # set in __init__

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        if cfg.model == "simclr_naked":
            self.model = SimCLRNaked(
                network=cfg.net, dim=cfg.moco_dim, temperature=cfg.moco_t,
                dtype=_dtype(cfg), remat=cfg.remat,
            )
            self.n_views = 2
        else:
            self.model = SimCLRTimeSeriesV4(
                network=cfg.net, dim=cfg.moco_dim, temperature=cfg.moco_t,
                n_series=cfg.n_series, series_dim=cfg.series_dim,
                series_T=cfg.series_T, aligned_T=cfg.aligned_T, mode=cfg.mode,
                shufflerank_theta=cfg.shufflerank_theta,
                dtw_gamma=cfg.dtw_gamma, dtype=_dtype(cfg), remat=cfg.remat,
                packed_encode=cfg.packed_encode,
            )
            self.n_views = 3

    def init(self, rng: jax.Array, example_block: jax.Array) -> TaskState:
        k1, k2 = jax.random.split(rng)
        variables = self.model.init(
            {"params": k1, "shuffle": k2}, example_block, train=True
        )
        return TaskState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            moco=None,
        )

    def forward(self, params, state: TaskState, block, rng, train: bool):
        variables = {"params": params, "batch_stats": state.batch_stats}
        if train:
            ret, updated = self.model.apply(
                variables, block, train=True, rngs={"shuffle": rng},
                mutable=["batch_stats"],
            )
            return ret, updated["batch_stats"], None
        ret = self.model.apply(variables, block, train=False,
                               rngs={"shuffle": rng})
        return ret, state.batch_stats, None

    def get_features(self, params, state: TaskState, x):
        """Per-stage attention maps for --visualize (reference
        model/simclr.py:123-127; needs a multi_level backbone + remat=False)."""
        variables = {"params": params, "batch_stats": state.batch_stats}
        return self.model.apply(variables, x, train=False,
                                method=type(self.model).get_features)


class MoCoTask:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.naked = cfg.model == "moco_naked"
        self.n_views = 2 if self.naked else 3
        self.encoder = MoCoEncoder(
            network=cfg.net, dim=cfg.moco_dim, n_series=cfg.n_series,
            series_dim=cfg.series_dim, with_series=not self.naked,
            dtype=_dtype(cfg), remat=cfg.remat,
        )

    def init(self, rng: jax.Array, example_block: jax.Array) -> TaskState:
        k1, k2 = jax.random.split(rng)
        variables = self.encoder.init(k1, example_block[:, 0], True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        moco = init_moco_state(
            k2, params, batch_stats, self.cfg.moco_k, self.cfg.moco_dim,
            0 if self.naked else self.cfg.n_series,
            0 if self.naked else self.cfg.series_dim,
        )
        return TaskState(params=params, batch_stats=batch_stats, moco=moco)

    def forward(self, params, state: TaskState, block, rng, train: bool):
        variables = {"params": params, "batch_stats": state.batch_stats}
        groups = self.cfg.moco_shuffle_bn
        if self.naked:
            ret, updated_q, new_moco = moco_naked_forward(
                self.encoder, variables, state.moco, block,
                self.cfg.moco_m, self.cfg.moco_t, train=train, rng=rng,
                shuffle_bn_groups=groups,
            )
        else:
            ret, updated_q, new_moco = moco_timeseries_forward(
                self.encoder, variables, state.moco, block,
                self.cfg.moco_m, self.cfg.moco_t, self.cfg.aligned_T,
                mode=self.cfg.mode, dtw_gamma=self.cfg.dtw_gamma,
                rng=rng, train=train, shuffle_bn_groups=groups,
                packed_encode=self.cfg.packed_encode,
            )
        new_bs = updated_q.get("batch_stats", state.batch_stats) if train \
            else state.batch_stats
        return ret, new_bs, new_moco

    def get_features(self, params, state: TaskState, x):
        """Query-encoder attention maps for --visualize (round-4 VERDICT #8;
        needs a multi_level backbone + remat=False)."""
        variables = {"params": params, "batch_stats": state.batch_stats}
        return self.encoder.apply(variables, x, False,
                                  method=MoCoEncoder.get_features)


def make_task(cfg: ModelConfig):
    """Model registry (reference get_model, pretrain.py:61-77)."""
    if cfg.model in ("simclr_naked", "simclr_timeseriesv4"):
        return SimCLRTask(cfg)
    if cfg.model in ("moco_naked", "moco_timeseriesv4"):
        return MoCoTask(cfg)
    raise NotImplementedError(f"unknown model {cfg.model!r}")
