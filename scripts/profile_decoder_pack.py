"""Decoder lane-ceiling A/B (VERDICT r2 next-round #2).

Hypothesis test: C_out in {32, 64} convs pad the MXU lane (output-channel)
dim to 128. Space-to-depth packing turns a (224^2, C_in -> 32) conv into a
(112^2, 4*C_in -> 128) conv — full lanes but 4x the real MACs, and the
contraction dim's padding scales by the same 4x, so the analysis says it's
structurally a wash. Measure it.

Also measured:
  - ConvTranspose(2x2, s2) vs its algebraic equivalent 1x1 conv to 4*C_out
    + depth-to-space (the convT's natural packed form: N = 4*C_out = 128
    full lanes at input resolution);
  - the serving stem (C_in=1, 224^2 -> 32) plain vs packed-with-unpack
    (round 2 measured pack+unpack relayouts beating the conv win; if the
    pack could ride the crop-resize matmuls for free, only unpack remains).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _timing import timed  # noqa: E402


import jax
import jax.numpy as jnp


def s2d(x):
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w // 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, h // 2, w // 2, 4 * c))


def d2s(x, c_out):
    b, h, w, _ = x.shape
    return (x.reshape(b, h, w, 2, 2, c_out)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, 2 * h, 2 * w, c_out))


def pack_kernel(k):
    """(3,3,cin,cout) -> (3,3,4cin,4cout) packed conv kernel (zeros off-tap),
    generalizing models/common.ConvStemS2D to any C_in."""
    kh, kw, cin, cout = k.shape
    kp = np.zeros((3, 3, 2, 2, cin, 2, 2, cout), k.dtype)
    for a_out in (0, 1):
        for a_in in (0, 1):
            for pu in (-1, 0, 1):
                du = 2 * pu + a_in - a_out
                if du not in (-1, 0, 1):
                    continue
                for b_out in (0, 1):
                    for b_in in (0, 1):
                        for pv in (-1, 0, 1):
                            dv = 2 * pv + b_in - b_out
                            if dv not in (-1, 0, 1):
                                continue
                            kp[pu + 1, pv + 1, a_in, b_in, :, a_out, b_out, :] = \
                                k[du + 1, dv + 1]
    return kp.reshape(3, 3, 4 * cin, 4 * cout)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    B, iters = 128, 2
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    print(f"batch={B} dtype=bf16 backend={jax.default_backend()}", flush=True)

    # ---- A: dec0 conv 224^2, 64 -> 32 --------------------------------------
    k = rng.standard_normal((3, 3, 64, 32)).astype(np.float32) * 0.05
    kp = pack_kernel(k)
    kd, kpd = jnp.asarray(k, dt), jnp.asarray(kp, dt)

    plain = jax.jit(lambda x: conv(x, kd))
    packed_pre = jax.jit(lambda xp: d2s(conv(xp, kpd), 32))     # input pre-packed
    packed_full = jax.jit(lambda x: d2s(conv(s2d(x), kpd), 32))  # incl. pack

    bufs = [jax.device_put(jnp.asarray(
        rng.standard_normal((B, 224, 224, 64), np.float32), dt)) for _ in range(iters)]
    bufs_p = [jax.device_put(s2d(b)) for b in bufs]

    t0 = timed(plain, bufs)
    t1 = timed(packed_pre, bufs_p)
    t2 = timed(packed_full, bufs)
    # equivalence spot check
    d = np.abs(np.asarray(plain(bufs[0]), np.float32)
               - np.asarray(packed_full(bufs[0]), np.float32)).max()
    print(f"A dec0 conv 224^2 64->32   plain: {t0*1e3:7.1f} ms  packed(pre): {t1*1e3:7.1f} ms  "
          f"packed(full): {t2*1e3:7.1f} ms  (maxdiff {d:.2e})", flush=True)
    del bufs, bufs_p

    # ---- B: dec0_up ConvTranspose 112^2 64 -> 32 ----------------------------
    kt = rng.standard_normal((2, 2, 64, 32)).astype(np.float32) * 0.05
    ktd = jnp.asarray(kt, dt)
    # 1x1-conv equivalent: out[2i+a, 2j+b, o] = sum_c in[i,j,c] k[a,b,c,o];
    # packed channel layout matches d2s's (a, b, o): ((a*2)+b)*32 + o
    k11 = jnp.asarray(kt.reshape(4, 64, 32).transpose(1, 0, 2)
                      .reshape(64, 128)[None, None], dt)

    convt = jax.jit(lambda x: jax.lax.conv_transpose(
        x, ktd, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    as11 = jax.jit(lambda x: d2s(conv(x, k11), 32))

    bufs_t = [jax.device_put(jnp.asarray(
        rng.standard_normal((B, 112, 112, 64), np.float32), dt)) for _ in range(iters)]
    t3 = timed(convt, bufs_t)
    t4 = timed(as11, bufs_t)
    d = np.abs(np.asarray(convt(bufs_t[0]), np.float32)
               - np.asarray(as11(bufs_t[0]), np.float32)).max()
    print(f"B up0 convT 112^2 64->32   convT: {t3*1e3:7.1f} ms  1x1+d2s: {t4*1e3:7.1f} ms  "
          f"(maxdiff {d:.2e})", flush=True)
    del bufs_t

    # ---- C: stem 224^2 1 -> 32 ----------------------------------------------
    ks = rng.standard_normal((3, 3, 1, 32)).astype(np.float32) * 0.05
    ksp = pack_kernel(ks)
    ksd, kspd = jnp.asarray(ks, dt), jnp.asarray(ksp, dt)
    stem_plain = jax.jit(lambda x: conv(x, ksd))
    stem_packed_pre = jax.jit(lambda xp: d2s(conv(xp, kspd), 32))
    bufs_s = [jax.device_put(jnp.asarray(
        rng.standard_normal((B, 224, 224, 1), np.float32), dt)) for _ in range(iters)]
    bufs_sp = [jax.device_put(s2d(b)) for b in bufs_s]
    t5 = timed(stem_plain, bufs_s)
    t6 = timed(stem_packed_pre, bufs_sp)
    d = np.abs(np.asarray(stem_plain(bufs_s[0]), np.float32)
               - np.asarray(stem_packed_pre(bufs_sp[0]), np.float32)).max()
    print(f"C stem 224^2 1->32         plain: {t5*1e3:7.1f} ms  packed(pre): {t6*1e3:7.1f} ms  "
          f"(maxdiff {d:.2e})", flush=True)


if __name__ == "__main__":
    main()
