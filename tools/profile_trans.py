"""Per-piece timing of the en_encoder / en_decoder transformer stacks on the
real TPU (scan-slope method, tools/profile_decoder.timeit): each LocalTrans
sub-stack, the attention kernel alone at its real (T, window) shapes, and the
jnp glue (LN + qkv + head transposes + out proj, FFN) — so the split between
kernel time and HBM-relayout overhead is measured, not inferred."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("L3AC_TPU_FAST_SINE", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from l3ac_tpu.config import get_config
from l3ac_tpu.models import codec as fcodec
from l3ac_tpu.models import local_transformer as lt
from l3ac_tpu.ops import attention as att_ops
from l3ac_tpu.ops.pallas import local_attention as pk_att


def timeit(fn, x, k1=5, k2=45):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x0, iters):
        def step(c, _):
            out = fn(c)
            dep = (jnp.sum(out[..., :8].astype(jnp.float32)) * 1e-20
                   ).astype(c.dtype)
            return c + dep, ()
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(jnp.abs(y).astype(jnp.float32))

    float(run(x, iters=k1)); float(run(x, iters=k2))
    t0 = time.perf_counter(); float(run(x, iters=k1)); t1 = time.perf_counter()
    float(run(x, iters=k2)); t2 = time.perf_counter()
    return max(0.0, ((t2 - t1) - (t1 - t0)) / (k2 - k1))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "1kbps"
    cfg = get_config(name)
    mc = cfg.network_config
    dtype = jnp.bfloat16
    B = 8
    T = int(10.0 * cfg.sample_rate) // mc.hop_length * mc.hop_length
    params = fcodec.init_codec(jax.random.PRNGKey(0), mc, dtype=dtype)
    params = fcodec.attach_bias_caches(params, mc)

    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T), dtype) * 0.3
    feat = jax.jit(lambda a: fcodec.encoder_apply(
        params["encoder"], a[..., None], mc))(audio)
    print(f"{name}: feature {feat.shape} (T_hi), compress rate "
          f"{mc.en_coder_compress_rate}")

    ecf = lt.compressed_encoder_configs(mc)
    dcf = lt.compressed_decoder_configs(mc)
    pe, pd = params["en_encoder"], params["en_decoder"]

    rows = []

    def piece(label, fn, x):
        dt = timeit(fn, x)
        rows.append((label, dt))
        print(f"{label:34s} {dt*1e3:7.2f} ms")

    # --- en_encoder pieces
    piece("enc down_trans (d1, w750)",
          lambda x: lt.local_trans_apply(pe["down_trans"], x, ecf["down"]),
          feat)
    h1 = lt.local_trans_apply(pe["down_trans"], feat, ecf["down"])
    from l3ac_tpu.ops.conv import conv1d_strided_matmul
    piece("enc down_conv (/rate)",
          lambda x: conv1d_strided_matmul(x, pe["down_conv"]["w"],
                                          pe["down_conv"]["b"]), h1)
    h2 = conv1d_strided_matmul(h1, pe["down_conv"]["w"], pe["down_conv"]["b"])
    piece("enc post_trans (d2, w250)",
          lambda x: lt.local_trans_apply(pe["post_trans"], x, ecf["post"]), h2)

    # --- en_decoder pieces
    piece("dec pre_trans (d3, w250)",
          lambda x: lt.local_trans_apply(pd["pre_trans"], x, dcf["pre"]), h2)
    from l3ac_tpu.ops import upsample_linear
    h3 = upsample_linear(lt.local_trans_apply(pd["pre_trans"], h2, dcf["pre"]),
                         mc.en_coder_compress_rate)
    piece("dec upsample x rate",
          lambda x: upsample_linear(x, mc.en_coder_compress_rate),
          lt.local_trans_apply(pd["pre_trans"], h2, dcf["pre"]))
    piece("dec up_trans (d2, w750)",
          lambda x: lt.local_trans_apply(pd["up_trans"], x, dcf["up"]), h3)

    # --- attention kernel alone vs one full layer, at the up_trans shape
    tc = dcf["up"]
    layer = pd["up_trans"]["layers"][0]
    Tpad = (h3.shape[1] + tc.window_size - 1) // tc.window_size * tc.window_size
    x = jnp.pad(h3, ((0, 0), (0, Tpad - h3.shape[1]), (0, 0)))
    bias = att_ops.dynamic_position_bias(pd["up_trans"]["dyn_bias"],
                                         tc.window_size).astype(dtype)

    def attn_only(xx):
        Bq, Tq, _ = xx.shape
        from l3ac_tpu.ops.conv import linear_p
        qkv = linear_p(xx, layer["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = lambda t: t.reshape(Bq, Tq, tc.heads,
                                    tc.dim_head).transpose(0, 2, 1, 3)
        out = pk_att.local_attention(heads(q), heads(k), heads(v),
                                     window_size=tc.window_size, bias=bias)
        return out.transpose(0, 2, 1, 3).reshape(Bq, Tq, tc.inner_dim)

    piece("  one w750 layer: qkv+attn+merge", attn_only, x)
    qh = jnp.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                       (B, tc.heads, Tpad, tc.dim_head),
                                       dtype))
    piece("  attention kernel alone (w750)",
          lambda q: pk_att.local_attention(q, q, q,
                                           window_size=tc.window_size,
                                           bias=bias), qh)
    piece("  one w750 FF (LN+geglu)",
          lambda xx: lt._ff_apply(layer["ff"], xx), x)

    total = sum(d for _, d in rows[:6])
    print(f"{'sum enc+dec stacks':34s} {total*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
