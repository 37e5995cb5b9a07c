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
               multiply moves to the (M, N) cotangent (M=3072 < K), so the
               only (K, N)-sized op left is the int8->bf16 convert, which
               XLA may fuse into the dot's operand read instead of a
               convert+multiply buffer pass.
  dgrad_int8   quantize (g*s) rows to int8 and run the dx dot on the int8
               MXU rate. NOT exact (adds activation-grad rounding) —
               reported for information only, as the ceiling a quantized-
               dgrad mode would buy; adopting it would need a parity study
               like the w8a8 one.

Timing is relay-safe for this environment (CLAUDE.md): the relay
content-caches execution RESULTS, so each measurement is ONE jit call
running `iters` scan-chained iterations (every iteration's input content
differs — the output is fed back at 1e-6), on a freshly salted input per
call, with a host fetch inside the timed window.

Run: python scripts/dx_formulation_probe.py [--dims 4096x4096 4096x11008 ...]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def xla_dequant(g, kq, s):
    w = kq.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[None, :]
    return (g.astype(jnp.bfloat16) @ w.T).astype(g.dtype)


def scale_g(g, kq, s):
    gs = (g.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
    return (gs @ kq.astype(jnp.bfloat16).T).astype(g.dtype)


def dgrad_int8(g, kq, s):
    # the production recipe (int8.int8_matmul_dgrad): STOCHASTIC rounding —
    # RTN's systematic small-entry loss measurably corrupted 7B training
    # trajectories (docs/PERF.md w8a8d study), so the probe times what ships
    from flipped_tpu.model.int8 import stochastic_round
    gs = g.astype(jnp.float32) * s[None, :]
    amax = jnp.max(jnp.abs(gs), axis=-1, keepdims=True)
    gsc = jnp.maximum(amax / 127.0, 1e-30)
    gq = stochastic_round(gs / gsc).astype(jnp.int8)
    out = lax.dot_general(gq, kq, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * gsc).astype(g.dtype)


FORMS = {"xla_dequant": xla_dequant, "scale_g": scale_g,
         "dgrad_int8": dgrad_int8}


def make_timed(fn, kq, s, iters):
    """One jit call = `iters` chained dx applications (content differs per
    iteration, so the relay cannot replay any of them)."""
    k = kq.shape[0]

    def body(gc, _):
        out = fn(gc, kq, s)
        upd = (out * jnp.bfloat16(1e-6)).astype(gc.dtype)
        if k == gc.shape[1]:
            gc = gc + upd
        else:
            gc = gc.at[:, :k].add(upd) if k < gc.shape[1] else gc + upd[:, :gc.shape[1]]
        return gc, ()

    return jax.jit(lambda g0: lax.scan(body, g0, None, length=iters)[0])


def time_form(fn, kq, s, m, n, iters, reps, rng):
    f = make_timed(fn, kq, s, iters)
    best = float("inf")
    for _ in range(reps):
        g0 = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
        g0 = jax.device_put(g0)
        np.asarray(g0[0, 0])  # sync the transfer out of the timed window
        t0 = time.perf_counter()
        out = f(g0)
        np.asarray(out[0, 0])  # relay: only a host fetch truly waits
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=3072,
                    help="rows = 3 objectives x batch 8 x S 128")
    ap.add_argument("--dims", nargs="*",
                    default=["4096x4096", "4096x11008", "11008x4096"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    for d in args.dims:
        k, n = (int(v) for v in d.split("x"))
        g = jnp.asarray(rng.standard_normal((args.m, n)), jnp.bfloat16)
        kq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.01, 0.02, (n,)), jnp.float32)
        # numerics first, each form vs an f64 exact reference, normalized
        # by the dx distribution's scale (per-element relative error is
        # meaningless here: dx entries are +/- random sums, so near-zero
        # entries amplify benign rounding into huge ratios). xla_dequant
        # and scale_g differ only in bf16 rounding placement and must land
        # within a few 1e-3 of each other; dgrad_int8's larger err column
        # IS its information (activation-grad rounding).
        exact = (np.asarray(g, np.float64)
                 @ (np.asarray(kq, np.float64)
                    * np.asarray(s, np.float64)[None, :]).T)
        scale_ = float(np.std(exact)) or 1.0
        for name, fn in FORMS.items():
            got = np.asarray(jax.jit(fn)(g, kq, s), np.float32)
            err = float(np.max(np.abs(got - exact)) / scale_)
            dt = time_form(fn, kq, s, args.m, n, args.iters, args.reps, rng)
            bw = (g.nbytes + kq.nbytes + k * args.m * 2) / dt / 1e9
            print(f"{d} {name:12s} {dt*1e3:8.3f} ms  rel_err={err:.2e} "
                  f"min_GB/s={bw:.0f}", flush=True)


if __name__ == "__main__":
    main()
