"""Tile-size sweep for the Pallas kernels, on real hardware.

Each configuration runs in a SUBPROCESS because the tile knobs
(L3AC_TPU_TAIL_TILE / L3AC_TPU_CU_BUDGET / L3AC_TPU_CU_CAP /
L3AC_TPU_FB_TILE) are read once at import and the jit cache does not key on
them. Timing is the two-point scan-chained slope (see
tools/profile_decoder.timeit for why naive timing is invalid through the
axon tunnel).

Usage:
    python tools/sweep_tiles.py            # sweep all kernels
    python tools/sweep_tiles.py --target tail --child-args ...  (internal)
"""

import argparse
import functools
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timeit(fn, *args, k1=5, k2=45):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, rest, iters):
        def step(c, _):
            out = fn(c, *rest)
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            dep = (jnp.sum(leaf[..., :8].astype(jnp.float32)) * 1e-20
                   ).astype(c.dtype)
            return c + dep, ()
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    x0, rest = args[0], args[1:]
    float(run(x0, rest, iters=k1)); float(run(x0, rest, iters=k2))
    t0 = time.perf_counter(); float(run(x0, rest, iters=k1))
    t1 = time.perf_counter(); float(run(x0, rest, iters=k2))
    t2 = time.perf_counter()
    return max(0.0, ((t2 - t1) - (t1 - t0)) / (k2 - k1))


def child(target: str):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from l3ac_tpu.models.layers import init_conv_unit, init_legacy_unit
    from l3ac_tpu.models.tconv import init_first_block
    from l3ac_tpu.ops import pallas as pk
    from l3ac_tpu.utils import init as pinit

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    if target == "tail":
        B, C, Tt = 8, 24, 79920
        units = [init_legacy_unit(jax.random.PRNGKey(i), C, dilation=d,
                                  dtype=dt)
                 for i, d in enumerate((1, 3, 9))]
        alpha = jnp.ones((C,), dt)
        oconv = pinit.conv_params(jax.random.PRNGKey(9), 7, C, 1, dtype=dt)
        x0 = jax.random.normal(key, (B, C, Tt), dt)
        x1 = jax.random.normal(jax.random.PRNGKey(1), (B, C, Tt), dt)
        t = timeit(lambda a, b: pk.legacy_tail.legacy_tail_poly_ct(
            a, b, units, alpha, oconv), x0, x1)
    elif target.startswith("cun"):
        _, c, tt = target.split(":")
        B, C, T = 8, int(c), int(tt)
        p = init_conv_unit(key, C, snake_act=True, use_norm=True, dtype=dt)
        x = jax.random.normal(key, (B, T, C), dt)
        t = timeit(lambda a: pk.conv_unit.conv_unit(a, p), x)
    elif target.startswith("cu"):
        _, c, tt = target.split(":")
        B, C, T = 8, int(c), int(tt)
        p = init_conv_unit(key, C, snake_act=True, use_norm=True, dtype=dt)
        x = jax.random.normal(key, (B, C, T), dt)
        t = timeit(lambda a: pk.conv_unit.conv_unit_ct(a, p), x)
    elif target.startswith("upps"):
        _, ci, co, sc, tt = target.split(":")
        B, Ci, Co, scale, T = 8, int(ci), int(co), int(sc), int(tt)
        w = jax.random.normal(key, (1, Ci, Co), dt) * 0.1
        b = jnp.zeros((Co,), dt)
        nw = jnp.ones((Co,), dt)
        nb = jnp.zeros((Co,), dt)
        x = jax.random.normal(key, (B, Ci, T), dt)
        t = timeit(lambda a: pk.upsample.up_fused_ct(
            a, w, b, nw, nb, scale=scale, phase_split=True), x)
    elif target.startswith("upct"):
        _, ci, co, sc, tt = target.split(":")
        B, Ci, Co, scale, T = 8, int(ci), int(co), int(sc), int(tt)
        w = jax.random.normal(key, (1, Ci, Co), dt) * 0.1
        b = jnp.zeros((Co,), dt)
        nw = jnp.ones((Co,), dt)
        nb = jnp.zeros((Co,), dt)
        x = jax.random.normal(key, (B, Ci, T), dt)
        t = timeit(lambda a: pk.upsample.up_fused_ct(
            a, w, b, nw, nb, scale=scale), x)
    elif target.startswith("upnat"):
        _, ci, co, sc, tt = target.split(":")
        B, Ci, Co, scale, T = 8, int(ci), int(co), int(sc), int(tt)
        w = jax.random.normal(key, (1, Ci, Co), dt) * 0.1
        b = jnp.zeros((Co,), dt)
        nw = jnp.ones((Co,), dt)
        nb = jnp.zeros((Co,), dt)
        x = jax.random.normal(key, (B, T, Ci), dt)
        t = timeit(lambda a: pk.upsample.up_fused(
            a, w, b, nw, nb, scale=scale), x)
    elif target == "fb":
        B, T = 8, 159840
        p = init_first_block(key, 24, dtype=dt)
        x = jax.random.normal(key, (B, T, 1), dt)
        t = timeit(lambda a: pk.first_block.first_block_ct(a, p), x)
    else:
        raise SystemExit(f"unknown target {target}")
    print(f"RESULT {t*1e3:.3f}")


def sweep(name: str, target: str, env_sets: list[dict]):
    print(f"== {name} ({target})")
    for es in env_sets:
        env = dict(os.environ)
        env.update({k: str(v) for k, v in es.items()})
        env.setdefault("L3AC_TPU_FAST_SINE", "1")
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "sweep_tiles.py"),
             "--target", target],
            env=env, capture_output=True, text=True, timeout=900)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
        val = line[0].split()[1] + " ms" if line else f"FAIL rc={r.returncode}"
        print(f"  {es}: {val}")
        if not line and r.returncode != 0:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            for ln in tail:
                print(f"    | {ln}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default=None)
    ap.add_argument("--only", default=None,
                    help="comma list: tail,cu2,cu3,fb")
    args = ap.parse_args()
    if args.target:
        child(args.target)
        return
    only = set(args.only.split(",")) if args.only else None
    if not only or "tail" in only:
        sweep("poly tail tile", "tail",
              [{"L3AC_TPU_TAIL_TILE": s} for s in (2048, 4096, 8192, 16384)])
    if not only or "cu2" in only:
        sweep("conv_unit_ct stage2 (C=96,T=26640)", "cu:96:26640",
              [{"L3AC_TPU_CU_BUDGET": b, "L3AC_TPU_CU_CAP": 32768}
               for b in (2 << 20, 4 << 20, 8 << 20)])
    if not only or "cu3" in only:
        sweep("conv_unit_ct stage3 (C=48,T=79920)", "cu:48:79920",
              [{"L3AC_TPU_CU_BUDGET": b, "L3AC_TPU_CU_CAP": 32768}
               for b in (2 << 20, 4 << 20, 8 << 20)])
    if not only or "fb" in only:
        sweep("first_block tile", "fb",
              [{"L3AC_TPU_FB_TILE": s} for s in (4096, 8192, 16384, 32768)])
    if not only or "fb2" in only:
        sweep("first_block tile (fine)", "fb",
              [{"L3AC_TPU_FB_TILE": s} for s in (10240, 12288, 14336)])
    if not only or "cun0" in only:
        sweep("conv_unit natural stage0 (C=512,T=1776)", "cun:512:1776",
              [{"L3AC_TPU_CU_NAT_BUDGET": b}
               for b in (1 << 20, 2 << 20, 4 << 20, 8 << 20)])
    if not only or "cun1" in only:
        sweep("conv_unit natural stage1 (C=256,T=8880)", "cun:256:8880",
              [{"L3AC_TPU_CU_NAT_BUDGET": b}
               for b in (1 << 20, 2 << 20, 4 << 20, 8 << 20)])
    if not only or "cue" in only:
        sweep("conv_unit_ct enc-stage0 (C=24,T=159840)", "cu:24:159840",
              [{"L3AC_TPU_CU_BUDGET": b, "L3AC_TPU_CU_CAP": c}
               for b, c in ((2 << 20, 6144), (4 << 20, 12288),
                            (8 << 20, 24576))])
    if not only or "up1" in only:
        sweep("up_fused natural stage1 (256->96 x3, T=8880)",
              "upnat:256:96:3:8880",
              [{"L3AC_TPU_UP_BUDGET": b, "L3AC_TPU_UP_CAP": 24576}
               for b in (2 << 20, 4 << 20, 8 << 20)])
    if not only or "cun1b" in only:
        sweep("conv_unit natural stage1 REPEAT (C=256,T=8880)", "cun:256:8880",
              [{"L3AC_TPU_CU_NAT_BUDGET": b}
               for b in (2 << 20, 4 << 20, 4 << 20, 2 << 20)])
    if not only or "up3" in only:
        sweep("up_fused_ct stage3-shape (48->24 x2, T=79920)",
              "upct:48:24:2:79920",
              [{"L3AC_TPU_UP_BUDGET": b, "L3AC_TPU_UP_CAP": 24576}
               for b in (2 << 20, 8 << 20, 16 << 20)])
    if not only or "up3ps" in only:
        sweep("up_fused_ct PHASE-SPLIT stage3 (48->24 x2, T=79920)",
              "upps:48:24:2:79920",
              [{"L3AC_TPU_UP_BUDGET": b, "L3AC_TPU_UP_CAP": c}
               for b, c in ((2 << 20, 6144), (8 << 20, 8192),
                            (8 << 20, 16384))])
    if not only or "up2" in only:
        sweep("up_fused_ct stage2 (96->48 x3, T=26640)", "upct:96:48:3:26640",
              [{"L3AC_TPU_UP_BUDGET": b, "L3AC_TPU_UP_CAP": 24576}
               for b in (2 << 20, 4 << 20, 8 << 20)])


if __name__ == "__main__":
    main()
