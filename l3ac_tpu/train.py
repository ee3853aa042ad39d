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


def _hann(n: int) -> jnp.ndarray:
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / n)


def _frame(x: jnp.ndarray, frame: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, frame) via a static gather."""
    T = x.shape[-1]
    n = max(1, 1 + (T - frame) // hop)
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(frame)[None, :]
    return x[:, idx]


def _stft_mag(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Magnitude STFT (B, frames, n_fft//2+1), Hann window, fp32."""
    frames = _frame(x.astype(jnp.float32), n_fft, hop) * _hann(n_fft)
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def _mel_filterbank(sr: int, n_fft: int, n_mels: int,
                    fmin: float = 0.0, fmax: float | None = None):
    """Standard triangular mel filterbank (HTK mel scale), numpy/static."""
    import numpy as np
    fmax = fmax or sr / 2
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    pts = imel(np.linspace(mel(fmin), mel(fmax), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        if c > l:
            fb[i, l:c] = (np.arange(l, c) - l) / (c - l)
        if r > c:
            fb[i, c:r] = (r - np.arange(c, r)) / (r - c)
    return jnp.asarray(fb)


# (n_fft, hop) pairs for the multi-resolution STFT loss (standard MR-STFT
# recipe, e.g. Yamamoto et al. 2020 — the reference's training recipe is
# unpublished/off-snapshot, SURVEY §3.4, so this is the stand-in spectral
# objective the framework ships)
STFT_RESOLUTIONS = ((512, 128), (1024, 256), (2048, 512))


def stft_loss(y: jnp.ndarray, x: jnp.ndarray,
              resolutions=STFT_RESOLUTIONS) -> jnp.ndarray:
    """Multi-resolution STFT loss: spectral convergence + log-magnitude L1."""
    total = 0.0
    for n_fft, hop in resolutions:
        my = _stft_mag(y, n_fft, hop)
        mx = _stft_mag(x, n_fft, hop)
        sc = jnp.linalg.norm(my - mx) / (jnp.linalg.norm(mx) + 1e-7)
        mag = jnp.mean(jnp.abs(jnp.log(my + 1e-7) - jnp.log(mx + 1e-7)))
        total = total + sc + mag
    return total / len(resolutions)


def mel_loss(y: jnp.ndarray, x: jnp.ndarray, sr: int = 16000,
             n_fft: int = 1024, hop: int = 256,
             n_mels: int = 80) -> jnp.ndarray:
    """Log-mel-spectrogram L1."""
    fb = _mel_filterbank(sr, n_fft, n_mels)
    my = _stft_mag(y, n_fft, hop) @ fb.T
    mx = _stft_mag(x, n_fft, hop) @ fb.T
    return jnp.mean(jnp.abs(jnp.log(my + 1e-5) - jnp.log(mx + 1e-5)))


def loss_fn(params, audio: jnp.ndarray, mc: ModelConfig, rng=None,
            spectral: bool = False, drop_path_rate: float = 0.0):
    out = fcodec.forward(params, audio, mc, training=True, rng=rng,
                         drop_path_rate=drop_path_rate)
    y = out["generated_audio"]
    wav_l2 = jnp.mean((y - audio) ** 2)
    wav_l1 = jnp.mean(jnp.abs(y - audio))
    loss = wav_l2 + 0.1 * wav_l1 + out["commit_loss"]
    metrics = {"wav_l2": wav_l2, "wav_l1": wav_l1}
    if spectral:
        sl = stft_loss(y, audio)
        ml = mel_loss(y, audio)
        loss = loss + sl + ml
        metrics["stft"] = sl
        metrics["mel"] = ml
    metrics["loss"] = loss
    return loss, metrics


def sgd_update(params, grads, lr: float):
    return jax.tree.map(lambda p, g: p - lr * g, params, grads)


def make_train_step(mc: ModelConfig, lr: float = 1e-4, optimizer=None,
                    drop_path_rate: float = 0.0):
    """Single-device train step. With ``optimizer`` (an optax GradientTransformation),
    returns (params, opt_state, metrics); otherwise plain SGD.

    ``drop_path_rate`` (static float, captured at build time) > 0 enables
    stochastic depth + FSQ noise: the returned step then takes a trailing
    ``rng`` argument (``step(params, [opt_state,] audio, rng)``)."""

    def _loss(params, audio, rng):
        return loss_fn(params, audio, mc, rng=rng,
                       drop_path_rate=drop_path_rate)

    if optimizer is None:
        @jax.jit
        def step(params, audio, rng=None):
            (loss, metrics), grads = jax.value_and_grad(
                _loss, has_aux=True)(params, audio, rng)
            return sgd_update(params, grads, lr), metrics

        return step

    @jax.jit
    def step(params, opt_state, audio, rng=None):
        (loss, metrics), grads = jax.value_and_grad(
            _loss, has_aux=True)(params, audio, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_sharded_train_step(mesh: Mesh, mc: ModelConfig, lr: float = 1e-4,
                            optimizer=None, spectral: bool = False,
                            drop_path_rate: float = 0.0):
    """Full train step jitted over a (dp, sp, tp) mesh.

    Returns (step_fn, shard_params_fn, audio_sharding). The step does
    grad + update entirely under GSPMD; gradients reduce over dp
    automatically because the loss is a mean over the dp-sharded batch.

    ``optimizer``: an optax GradientTransformation — the step then takes and
    returns ``opt_state`` (init it AFTER ``shard_params`` so its moment
    pytrees inherit the param shardings via ``zeros_like``); plain SGD
    otherwise. ``spectral``: add the multi-resolution STFT + log-mel terms.
    ``drop_path_rate`` (static float) > 0 enables stochastic depth + FSQ
    noise; the step then takes a trailing ``rng`` argument.
    """

    def _constrained_loss(params, audio, rng):
        # batch over dp, time over sp. GSPMD inserts the conv halo exchanges
        # and attention-window reshard collectives for the spatially sharded
        # time axis (the explicit-ppermute inference path lives in
        # models.codec.encode_sp/decode_sp).
        audio = jax.lax.with_sharding_constraint(
            audio, NamedSharding(mesh, P("dp", "sp")))
        return loss_fn(params, audio, mc, rng=rng, spectral=spectral,
                       drop_path_rate=drop_path_rate)

    if optimizer is None:
        @partial(jax.jit, donate_argnums=(0,))
        def step(params, audio, rng=None):
            (loss, metrics), grads = jax.value_and_grad(
                _constrained_loss, has_aux=True)(params, audio, rng)
            return sgd_update(params, grads, lr), metrics
    else:
        import optax

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, audio, rng=None):
            (loss, metrics), grads = jax.value_and_grad(
                _constrained_loss, has_aux=True)(params, audio, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, metrics

    def shard_params(params):
        return jax.device_put(params, shrd.param_shardings(params, mesh))

    return step, shard_params, shrd.audio_sharding(mesh)
