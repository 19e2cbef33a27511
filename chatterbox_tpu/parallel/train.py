"""Sharded T3 training step (teacher-forced CE) over a (dp, tp) mesh.

Inference is the product, but a sharded train step serves fine-tuning and is
the multi-chip validation path: params laid out per parallel/sharding.py,
batch sharded on dp, optimizer state sharded like params.  XLA derives the
gradient all-reduce over dp and the tp collectives from the NamedShardings.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import T3ModelConfig
from ..models.t3.model import T3Model
from .sharding import batch_spec, t3_param_spec


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_train_step(model: T3Model, mesh: Mesh, learning_rate: float = 1e-4):
    """Returns (init_fn, step_fn) jitted with mesh shardings."""
    tx = optax.adamw(learning_rate)
    pspec = t3_param_spec(model.cfg)
    param_sharding = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec)
    data_sharding = NamedSharding(mesh, batch_spec())
    rep = NamedSharding(mesh, P())

    def init_fn(params):
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, s), params, param_sharding)
        opt_state = tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    sp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("sp", 1)
    act_sharding = (NamedSharding(mesh, P("dp", "sp", None))
                    if sp_size > 1 else None)
    act_constraint = (
        (lambda x: jax.lax.with_sharding_constraint(x, act_sharding))
        if act_sharding is not None else None)

    def loss_fn(params, cond_emb, text_ids, speech_tokens, speech_len):
        return model.apply(
            params, cond_emb, text_ids, speech_tokens, speech_len,
            method=lambda m, *a: m.training_forward(
                *a, act_constraint=act_constraint))

    @jax.jit
    def step_fn(state: TrainState, cond_emb, text_ids, speech_tokens,
                speech_len):
        cond_emb = jax.lax.with_sharding_constraint(cond_emb, data_sharding)
        text_ids = jax.lax.with_sharding_constraint(text_ids, data_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, cond_emb, text_ids, speech_tokens, speech_len)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, step_fn
