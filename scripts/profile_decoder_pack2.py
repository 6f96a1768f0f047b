"""Decoder lane-ceiling A/B, scan-chained protocol (VERDICT r2 #2).

profile_decoder_pack.py's single-op timings sat on the tunnel's ~60 ms
dispatch+fetch floor — differences were noise. Here each arm runs K=16
serialized copies of the op inside one jitted ``lax.scan`` (the op's output
is zero-padded back onto the carry so iterations are data-dependent),
amortizing the floor 16x. ms printed are per single op application.

Arms:
  A  dec0-shape conv (224^2, 64 -> 32): plain vs space-to-depth packed
     (112^2, 256 -> 128; 4x real MACs, full lanes). The padding analysis
     says this is structurally a wash — if packing ~matches plain despite
     4x the real work, the C_out<128 lane padding is confirmed as the
     (XLA-structural) ceiling, and no repacking can beat it.
  B  up0-shape ConvTranspose (112^2, 64 -> 32, 2x2 s2): plain vs the
     algebraic 1x1-conv-to-128ch + depth-to-space form.
  C  stem conv (224^2, 1 -> 32): plain vs packed (112^2, 4 -> 128) —
     inference only (round 2 showed the big s2d win is the backward pass).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402

import jax
import jax.numpy as jnp

from profile_decoder_pack import pack_kernel, s2d, d2s, conv  # noqa: E402

K = 16


def chain(op, out_to_carry):
    """x -> scan of K data-dependent op applications."""
    def step(x, _):
        x = x + out_to_carry(op(x))
        return x, None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(step, x, None, length=K)
        return y

    return run


def pad_ch(y, c):
    return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, c - y.shape[-1])))


def main():
    B, iters = 128, 3
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"batch={B} K={K} dtype=bf16 backend={jax.default_backend()}", flush=True)

    def bufs(shape):
        return [jax.device_put(jnp.asarray(
            rng.standard_normal(shape, np.float32) * 0.1, dt))
            for _ in range(iters)]

    # ---- A: dec conv 64 -> 32 ------------------------------------------------
    k = rng.standard_normal((3, 3, 64, 32)).astype(np.float32) * 0.05
    kd = jnp.asarray(k, dt)
    kpd = jnp.asarray(pack_kernel(k), dt)
    plain = chain(lambda x: conv(x, kd), lambda y: pad_ch(y, 64))
    packed = chain(lambda x: conv(x, kpd), lambda y: pad_ch(y, 256))
    bx = bufs((B, 224, 224, 64))
    bp = [jax.device_put(s2d(b)) for b in bx]
    t0 = timed(plain, bx) / K
    t1 = timed(packed, bp) / K
    print(f"A dec conv 224^2 64->32 : plain {t0*1e3:6.2f} ms/op   s2d-packed {t1*1e3:6.2f} ms/op", flush=True)
    del bx, bp

    # ---- B: convT 112^2 64 -> 32 ----------------------------------------------
    kt = rng.standard_normal((2, 2, 64, 32)).astype(np.float32) * 0.05
    ktd = jnp.asarray(kt, dt)
    k11 = jnp.asarray(kt.reshape(4, 64, 32).transpose(1, 0, 2)
                      .reshape(64, 128)[None, None], dt)

    def down(y):  # (224^2, 32) -> carry (112^2, 64): stride-2 sample + pad
        return pad_ch(y[:, ::2, ::2, :], 64)

    convt = chain(lambda x: jax.lax.conv_transpose(
        x, ktd, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), down)
    as11 = chain(lambda x: d2s(conv(x, k11), 32), down)
    bt = bufs((B, 112, 112, 64))
    t2 = timed(convt, bt) / K
    t3 = timed(as11, bt) / K
    print(f"B up0 convT 112^2 64->32: convT {t2*1e3:6.2f} ms/op   1x1+d2s   {t3*1e3:6.2f} ms/op", flush=True)
    del bt

    # ---- C: stem 1 -> 32 --------------------------------------------------------
    ks = rng.standard_normal((3, 3, 1, 32)).astype(np.float32) * 0.05
    ksd = jnp.asarray(ks, dt)
    kspd = jnp.asarray(pack_kernel(ks), dt)
    stem = chain(lambda x: conv(x, ksd), lambda y: y[..., :1])
    stem_p = chain(lambda x: conv(x, kspd), lambda y: y[..., :4])
    bs_ = bufs((B, 224, 224, 1))
    bsp = [jax.device_put(s2d(b)) for b in bs_]
    t4 = timed(stem, bs_) / K
    t5 = timed(stem_p, bsp) / K
    print(f"C stem 224^2 1->32      : plain {t4*1e3:6.2f} ms/op   s2d-packed {t5*1e3:6.2f} ms/op", flush=True)


if __name__ == "__main__":
    main()
