"""Training step (greenfield — the reference keeps training on a separate
branch, SURVEY.md §3.4; only forward + STE + noise hooks exist in the snapshot).

Provides a jittable/pjittable full train step over a (dp, sp, tp) mesh:
- batch sharded over ``dp``,
- time axis sharded over ``sp`` via GSPMD sharding constraints (XLA inserts the
  conv halo exchanges and attention reshard collectives),
- transformer/ConvUnit matmul weights sharded over ``tp`` (Megatron-style
  pairs; XLA inserts the psums).

Loss: L1 + MSE on waveform plus a latent commitment term — a stand-in for the
reference's unpublished training recipe, structured so real losses (mel/STFT,
adversarial) can slot in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import ModelConfig
from .models import codec as fcodec
from .parallel import sharding as shrd


def loss_fn(params, audio: jnp.ndarray, mc: ModelConfig, rng=None):
    out = fcodec.forward(params, audio, mc, training=True)
    y = out["generated_audio"]
    wav_l2 = jnp.mean((y - audio) ** 2)
    wav_l1 = jnp.mean(jnp.abs(y - audio))
    loss = wav_l2 + 0.1 * wav_l1 + out["commit_loss"]
    return loss, {"loss": loss, "wav_l2": wav_l2, "wav_l1": wav_l1}


def sgd_update(params, grads, lr: float):
    return jax.tree.map(lambda p, g: p - lr * g, params, grads)


def make_train_step(mc: ModelConfig, lr: float = 1e-4, optimizer=None):
    """Single-device train step. With ``optimizer`` (an optax GradientTransformation),
    returns (params, opt_state, metrics); otherwise plain SGD."""

    if optimizer is None:
        @jax.jit
        def step(params, audio):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, audio, mc)
            return sgd_update(params, grads, lr), metrics

        return step

    @jax.jit
    def step(params, opt_state, audio):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, audio, mc)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_sharded_train_step(mesh: Mesh, mc: ModelConfig, lr: float = 1e-4):
    """Full train step jitted over a (dp, sp, tp) mesh.

    Returns (step_fn, shard_params_fn, audio_sharding). The step does
    grad + SGD update entirely under GSPMD; gradients reduce over dp
    automatically because the loss is a mean over the dp-sharded batch.
    """
    param_sh = None  # resolved lazily per concrete params pytree

    def _constrained_loss(params, audio):
        # batch over dp, time over sp. GSPMD inserts the conv halo exchanges
        # and attention-window reshard collectives for the spatially sharded
        # time axis (the explicit-ppermute inference path lives in
        # models.codec.encode_sp/decode_sp).
        audio = jax.lax.with_sharding_constraint(
            audio, NamedSharding(mesh, P("dp", "sp")))
        return loss_fn(params, audio, mc)

    @partial(jax.jit, donate_argnums=(0,))
    def step(params, audio):
        (loss, metrics), grads = jax.value_and_grad(
            _constrained_loss, has_aux=True)(params, audio)
        return sgd_update(params, grads, lr), metrics

    def shard_params(params):
        return jax.device_put(params, shrd.param_shardings(params, mesh))

    return step, shard_params, shrd.audio_sharding(mesh)
