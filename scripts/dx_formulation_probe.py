"""Microbench: dx (activation-gradient) formulations for the frozen int8
backbone at the 7B bench shapes.

The round-3 trace attribution (docs/PERF.md roofline table) named bytes as
the w8a8 headline's binding resource, with the backward's dequantized
(K, N) bf16 weight buffers as the largest avoidable stream (~26 GB/step at
7B/S=128: every one of the 7x32 backbone matmuls dequantizes its int8
kernel to bf16 in HBM before dx = g @ W^T). This probe times candidate
formulations in isolation on the real chip so the train-step default is
chosen from measurement, not theory (reference for the tradeoff already
measured: the per-channel Pallas dx kernel is SLOWER end-to-end, 0.545 vs
0.451 s/step — model/int8.py:25-31).

Formulations (per-channel scales s (N,), kernel kq (K, N) int8, cotangent
g (M, N) bf16):
  xla_dequant  w = kq.bf16 * s[None, :]; dx = g @ w.T        (current default)
  scale_g      dx = (g * s) @ kq.bf16.T   -- algebraically identical
               (dx[m,k] = sum_n g[m,n] s[n] kq[k,n]); the elementwise
               multiply moves to the (M, N) cotangent, so the only big-
               buffer op left is the int8->bf16 convert, which XLA can
               fuse into the dot's operand without a second full-size
               multiply pass.
  scale_dx     dx = bf16(f32(g @ kq.bf16.T-per-col-scaled)) via scaling the
               OUTPUT: invalid for per-output-channel scales folded on N
               (scales contract away) -- kept out.

Run: python scripts/dx_formulation_probe.py [--dims 4096x4096 4096x11008 ...]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def xla_dequant(g, kq, s):
    w = kq.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[None, :]
    return (g.astype(jnp.bfloat16) @ w.T).astype(g.dtype)


def scale_g(g, kq, s):
    gs = (g.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
    return (gs @ kq.astype(jnp.bfloat16).T).astype(g.dtype)


FORMS = {"xla_dequant": xla_dequant, "scale_g": scale_g}


def time_form(fn, g, kq, s, iters=30):
    f = jax.jit(fn)
    out = f(g, kq, s)
    np.asarray(out)  # relay: only a host fetch truly waits
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(g, kq, s)
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=3072,
                    help="rows = 3 objectives x batch 8 x S 128")
    ap.add_argument("--dims", nargs="*",
                    default=["4096x4096", "4096x11008", "11008x4096"])
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    for d in args.dims:
        k, n = (int(v) for v in d.split("x"))
        g = jnp.asarray(rng.standard_normal((args.m, n)), jnp.bfloat16)
        kq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.01, 0.02, (n,)), jnp.float32)
        # exactness first: scale_g must match xla_dequant bitwise-close
        ref = np.asarray(xla_dequant(g, kq, s), np.float32)
        for name, fn in FORMS.items():
            got = np.asarray(jax.jit(fn)(g, kq, s), np.float32)
            err = float(np.max(np.abs(got - ref) / (np.abs(ref) + 1e-3)))
            dt = time_form(fn, g, kq, s, args.iters)
            bw = (g.nbytes + kq.nbytes + k * args.m * 2) / dt / 1e9
            print(f"{d} {name:12s} {dt*1e3:8.3f} ms  rel_err={err:.2e} "
                  f"min_GB/s={bw:.0f}")


if __name__ == "__main__":
    main()
