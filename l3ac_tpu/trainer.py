"""Training loop driver: ``python -m l3ac_tpu train``.

Joins the pieces the framework already ships — the sharded (dp, sp, tp) train
step (``train.make_sharded_train_step``), optax, the spectral losses, and the
orbax sharded checkpoints (``runtime.checkpoint``) — into one restartable
entry point. Greenfield: the reference keeps training on an off-snapshot
branch (SURVEY §3.4) and has no trainer at all.

Restartability contract (tested by ``test_trainer_kill_and_resume``): the
data feed and the per-step rng are pure functions of (seed, step), so a run
killed at step k and resumed from the step-k checkpoint replays EXACTLY the
batches/noise an uninterrupted run would have seen — parameters after resume
match the uninterrupted run bit-for-bit on the same backend.

Checkpoint layout (one orbax dir per saved step under ``ckpt_dir``):
    ckpt_dir/step_00000012/   # {"params": ..., "opt": [leaves], "step": k}
``latest()`` resolves the newest step dir; ``--resume`` restores params +
optimizer state + step counter and continues.
"""

from __future__ import annotations

import re
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Deterministic data feeds: batch(step) must depend only on (seed, step).
# ---------------------------------------------------------------------------


class SyntheticAudio:
    """Reproducible random audio batches (smoke/bench feed)."""

    def __init__(self, batch: int, samples: int, seed: int = 0):
        self.batch, self.samples, self.seed = batch, samples, seed

    def __call__(self, step: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, step))
        return (rng.standard_normal((self.batch, self.samples)) * 0.3
                ).astype(np.float32)


class WavDirAudio:
    """Deterministic batches of random crops from a directory of 16 kHz mono
    WAV files (stdlib reader — same I/O path as the CLI)."""

    def __init__(self, wav_dir: str | Path, batch: int, samples: int,
                 sample_rate: int, seed: int = 0):
        from .utils.audio_io import read_wav
        self.files = sorted(Path(wav_dir).glob("*.wav"))
        if not self.files:
            raise FileNotFoundError(f"no .wav files under {wav_dir}")
        self.clips = []
        for f in self.files:
            audio, _ = read_wav(f, expect_rate=sample_rate)
            self.clips.append(np.asarray(audio, np.float32))
        self.batch, self.samples, self.seed = batch, samples, seed

    def __call__(self, step: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, step))
        out = np.zeros((self.batch, self.samples), np.float32)
        for b in range(self.batch):
            clip = self.clips[rng.integers(len(self.clips))]
            if len(clip) <= self.samples:
                out[b, :len(clip)] = clip
            else:
                start = rng.integers(len(clip) - self.samples + 1)
                out[b] = clip[start:start + self.samples]
        return out


# ---------------------------------------------------------------------------
# Checkpoint helpers (orbax sharded dirs, one per saved step)
# ---------------------------------------------------------------------------

_STEP_RE = re.compile(r"^step_(\d{8})$")


def latest(ckpt_dir: str | Path) -> tuple[int, Path] | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best = None
    for d in ckpt_dir.iterdir():
        m = _STEP_RE.match(d.name)
        if m:
            k = int(m.group(1))
            if best is None or k > best[0]:
                best = (k, d)
    return best


def _save(ckpt_dir: Path, step: int, params, opt_state) -> Path:
    from .runtime import checkpoint as ckpt
    target = ckpt_dir / f"step_{step:08d}"
    # step is stored as a fixed int32 so restore is independent of the live
    # jax_enable_x64 setting at either save or load time
    ckpt.save_sharded(target, {"params": params,
                               "opt": list(jax.tree.leaves(opt_state)),
                               "step": jnp.asarray(step, jnp.int32)})
    return target


def _restore(path: Path, params, opt_state):
    """Restore onto the shardings of freshly-initialized (sharded) state."""
    from .runtime import checkpoint as ckpt
    from jax.sharding import NamedSharding, PartitionSpec
    any_leaf = jax.tree.leaves(params)[0]
    replicated = NamedSharding(any_leaf.sharding.mesh, PartitionSpec())
    shardings = {"params": jax.tree.map(lambda a: a.sharding, params),
                 "opt": [a.sharding for a in jax.tree.leaves(opt_state)],
                 "step": replicated}
    template = {"params": jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
                "opt": [jax.ShapeDtypeStruct(a.shape, a.dtype)
                        for a in jax.tree.leaves(opt_state)],
                "step": jax.ShapeDtypeStruct((), jnp.int32)}
    state = ckpt.load_sharded(path, template=template, shardings=shardings)
    opt_state = jax.tree.unflatten(jax.tree.structure(opt_state),
                                   state["opt"])
    return state["params"], opt_state, int(state["step"])


# ---------------------------------------------------------------------------
# The driver
# ---------------------------------------------------------------------------


def train(config: str = "debug", *, steps: int = 20, batch: int = 4,
          seconds: float | None = None, tokens: int = 8,
          dp: int = 1, sp: int = 1, tp: int = 1,
          lr: float = 1e-4, spectral: bool = False,
          drop_path_rate: float = 0.0, seed: int = 0,
          wav_dir: str | None = None, ckpt_dir: str | None = None,
          save_every: int = 0, resume: bool = False,
          log_every: int = 1, log=print) -> dict:
    """Run ``steps`` optax-Adam train steps of ``config`` on a (dp, sp, tp)
    mesh; returns {"params", "opt_state", "step", "metrics"} (last metrics).

    ``seconds`` or ``tokens`` sets the per-sample clip length (rounded to a
    hop multiple — the preprocess contract). ``save_every`` > 0 writes an
    orbax sharded checkpoint every k steps into ``ckpt_dir``; ``resume``
    restores the newest one (params + optimizer moments + step) and
    continues with the identical data/rng stream.
    """
    import os

    import optax

    from . import train as train_mod
    from .config import get_config
    from .models import codec as fcodec
    from .parallel.mesh import make_mesh

    # The fused Pallas inference kernels define no VJPs (deliberate: they are
    # serving kernels; XLA fuses the training graph well on its own), so the
    # differentiated train step must trace the jnp reference path. Scoped to
    # this call: enabled() is consulted at trace time, inside the loop below.
    prev_no_pallas = os.environ.get("L3AC_TPU_NO_PALLAS")
    os.environ["L3AC_TPU_NO_PALLAS"] = "1"
    try:
        return _train_inner(
            config, steps=steps, batch=batch, seconds=seconds, tokens=tokens,
            dp=dp, sp=sp, tp=tp, lr=lr, spectral=spectral,
            drop_path_rate=drop_path_rate, seed=seed, wav_dir=wav_dir,
            ckpt_dir=ckpt_dir, save_every=save_every, resume=resume,
            log_every=log_every, log=log)
    finally:
        if prev_no_pallas is None:
            del os.environ["L3AC_TPU_NO_PALLAS"]
        else:
            os.environ["L3AC_TPU_NO_PALLAS"] = prev_no_pallas


def _train_inner(config, *, steps, batch, seconds, tokens, dp, sp, tp, lr,
                 spectral, drop_path_rate, seed, wav_dir, ckpt_dir,
                 save_every, resume, log_every, log) -> dict:
    import optax

    from . import train as train_mod
    from .config import get_config
    from .models import codec as fcodec
    from .parallel.mesh import make_mesh

    cfg = get_config(config)
    mc = cfg.network_config
    hop = mc.hop_length
    if seconds is not None:
        samples = max(hop, int(seconds * cfg.sample_rate) // hop * hop)
    else:
        samples = tokens * hop
    if batch % dp:
        raise ValueError(f"batch {batch} not divisible by dp {dp}")

    mesh = make_mesh(dp=dp, sp=sp, tp=tp)
    optimizer = optax.adam(lr)
    step_fn, shard_params, audio_sh = train_mod.make_sharded_train_step(
        mesh, mc, lr=lr, optimizer=optimizer, spectral=spectral,
        drop_path_rate=drop_path_rate)

    params = shard_params(fcodec.init_codec(jax.random.PRNGKey(seed), mc))
    opt_state = optimizer.init(params)
    # moment pytrees inherit param shardings via zeros_like, but optax's step
    # counters are created fresh on the default device — replicate them onto
    # the mesh so the jitted step sees one consistent device set
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    opt_state = jax.tree.map(
        lambda a: a if (hasattr(a, "sharding")
                        and getattr(a.sharding, "mesh", None) == mesh)
        else jax.device_put(a, rep), opt_state)

    start = 0
    if resume:
        found = latest(ckpt_dir) if ckpt_dir else None
        if found is None:
            log(f"--resume: no checkpoint under {ckpt_dir}, starting fresh")
        else:
            params, opt_state, start = _restore(found[1], params, opt_state)
            log(f"resumed from {found[1]} at step {start}")

    data = (WavDirAudio(wav_dir, batch, samples, cfg.sample_rate, seed)
            if wav_dir else SyntheticAudio(batch, samples, seed))
    base_rng = jax.random.PRNGKey(seed + 1)
    use_rng = drop_path_rate > 0.0

    metrics = {}
    ckpt_path = Path(ckpt_dir) if ckpt_dir else None
    t0 = time.perf_counter()
    for step in range(start, steps):
        audio = jax.device_put(jnp.asarray(data(step)), audio_sh)
        rng = jax.random.fold_in(base_rng, step) if use_rng else None
        params, opt_state, metrics = step_fn(params, opt_state, audio, rng)
        if log_every and (step + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.perf_counter() - t0
            log(f"step {step + 1}/{steps}  loss {m['loss']:.5f}  "
                f"wav_l2 {m['wav_l2']:.5f}  ({dt:.1f}s)")
        if ckpt_path and save_every and (step + 1) % save_every == 0:
            log(f"saved {_save(ckpt_path, step + 1, params, opt_state)}")
    # final save only if the loop actually advanced past the last periodic
    # save; a resume whose checkpoint is already >= --steps must not write a
    # step_{steps} dir holding later-step params, and reports the real step
    final_step = max(start, steps)
    if (ckpt_path and save_every and steps > start and steps % save_every):
        log(f"saved {_save(ckpt_path, steps, params, opt_state)}")
    return {"params": params, "opt_state": opt_state, "step": final_step,
            "metrics": metrics}
