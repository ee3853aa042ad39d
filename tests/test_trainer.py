"""Trainer driver: the sharded train step + optax + orbax sharded checkpoints
composed in one restartable entry point (VERDICT r3 item 6).

The load-bearing test is kill-and-resume: the data feed and per-step rng are
pure functions of (seed, step), so a run killed at step k and resumed from the
step-k checkpoint must reproduce the uninterrupted run's parameters
bit-for-bit (same backend, same compiled programs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l3ac_tpu import trainer


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_trainer_kill_and_resume(tmp_path):
    kw = dict(config="debug", batch=2, tokens=8, dp=2, sp=2, tp=2,
              lr=1e-3, seed=3, log=lambda *a: None)

    full = trainer.train(steps=4, **kw)

    ck = tmp_path / "ckpts"
    trainer.train(steps=2, ckpt_dir=ck, save_every=2, **kw)   # "killed" at 2
    assert trainer.latest(ck)[0] == 2
    resumed = trainer.train(steps=4, ckpt_dir=ck, save_every=2, resume=True,
                            **kw)

    # Each train() call re-jits the (identical) step program; XLA's
    # scheduling of the cross-device reductions can differ by last-ulp
    # between compilations (observed max ~1e-14 absolute), so "identical"
    # here means float-tight, not bit-for-bit across executables.
    for a, b in zip(_leaves(full["params"]), _leaves(resumed["params"])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-11)
    for a, b in zip(_leaves(full["opt_state"]), _leaves(resumed["opt_state"])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-11)
    assert trainer.latest(ck)[0] == 4


def test_trainer_drop_path_rng_threaded():
    """ADVICE r3: drop_path_rate must be reachable from the provided step
    builders — a rate > 0 threads rng through the step and changes the loss
    stream vs rate 0 (stochastic depth + FSQ noise active)."""
    r0 = trainer.train(config="debug", steps=2, batch=2, tokens=4,
                      seed=5, log=lambda *a: None)
    r1 = trainer.train(config="debug", steps=2, batch=2, tokens=4,
                      seed=5, drop_path_rate=0.5, log=lambda *a: None)
    assert float(r0["metrics"]["loss"]) != float(r1["metrics"]["loss"])


def test_trainer_loss_decreases_synthetic():
    out = trainer.train(config="debug", steps=8, batch=2, tokens=4, lr=1e-3,
                        seed=0, log=lambda *a: None)
    # synthetic noise isn't learnable content, but the reconstruction term
    # still falls from random init as the decoder learns the output scale
    assert float(out["metrics"]["loss"]) < 1.0


def test_trainer_cli_smoke(tmp_path, capsys):
    from l3ac_tpu.__main__ import main
    rc = main(["train", "--config", "debug", "--steps", "1", "--batch", "2",
               "--tokens", "4", "--ckpt-dir", str(tmp_path / "ck"),
               "--save-every", "1"])
    assert rc == 0
    assert trainer.latest(tmp_path / "ck")[0] == 1
    assert "step 1/1" in capsys.readouterr().out
