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
    # the production XLA recipe (int8._dgrad_dx_xla): STOCHASTIC rounding —
    # RTN's systematic small-entry loss measurably corrupted 7B training
    # trajectories (docs/PERF.md w8a8d study), so the probe times what ships
    from flipped_tpu.model.int8 import _dgrad_dx_xla
    return _dgrad_dx_xla(g, kq, s)


def dgrad_pallas(g, kq, s):
    # the fused single-pass kernel (quantize in VMEM, no HBM gq buffer) —
    # bit-exact vs dgrad_int8's production twin (model/int8.py _dgrad_dx_xla)
    from flipped_tpu.model.pallas.quant_matmul import int8_dgrad_pallas
    return int8_dgrad_pallas(g, kq, s)


def fwd_xla(x, kq, s):
    # the w8a8 forward as shipped (model/int8.py _int8_matmul_fwd_impl)
    from flipped_tpu.model.int8 import _int8_matmul_fwd_impl
    return _int8_matmul_fwd_impl(x, kq, s)


def fwd_pallas(x, kq, s):
    from flipped_tpu.model.pallas.quant_matmul import int8_fwd_pallas
    return int8_fwd_pallas(x, kq, s)


# dx forms consume a (M, N) cotangent and emit (M, K); fwd forms consume a
# (M, K) activation and emit (M, N)
FORMS = {"xla_dequant": xla_dequant, "scale_g": scale_g,
         "dgrad_int8": dgrad_int8, "dgrad_pallas": dgrad_pallas}
FWD_FORMS = {"fwd_xla": fwd_xla, "fwd_pallas": fwd_pallas}


def make_timed(fn, kq, s, iters, out_dim):
    """One jit call = `iters` chained applications (content differs per
    iteration, so the relay cannot replay any of them)."""

    def body(gc, _):
        out = fn(gc, kq, s)
        upd = (out * jnp.bfloat16(1e-6)).astype(gc.dtype)
        d = gc.shape[1]
        if out_dim == d:
            gc = gc + upd
        else:
            gc = (gc.at[:, :out_dim].add(upd) if out_dim < d
                  else gc + upd[:, :d])
        return gc, ()

    return jax.jit(lambda g0: lax.scan(body, g0, None, length=iters)[0])


def time_form(fn, kq, s, m, in_dim, out_dim, iters, reps, rng):
    f = make_timed(fn, kq, s, iters, out_dim)
    best = float("inf")
    for _ in range(reps):
        g0 = jnp.asarray(rng.standard_normal((m, in_dim)), jnp.bfloat16)
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
    ap.add_argument("--phase", default="dx", choices=["dx", "fwd"],
                    help="dx: cotangent formulations; fwd: the per-channel "
                         "w8a8 forward (XLA vs fused Pallas)")
    args = ap.parse_args()

    forms = FORMS if args.phase == "dx" else FWD_FORMS
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    for d in args.dims:
        k, n = (int(v) for v in d.split("x"))
        in_dim, out_dim = (n, k) if args.phase == "dx" else (k, n)
        g = jnp.asarray(rng.standard_normal((args.m, in_dim)), jnp.bfloat16)
        kq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.01, 0.02, (n,)), jnp.float32)
        # numerics first, each form vs an f64 exact reference, normalized
        # by the dx distribution's scale (per-element relative error is
        # meaningless here: dx entries are +/- random sums, so near-zero
        # entries amplify benign rounding into huge ratios). xla_dequant
        # and scale_g differ only in bf16 rounding placement and must land
        # within a few 1e-3 of each other; dgrad_int8's larger err column
        # IS its information (activation-grad rounding).
        if args.phase == "dx":
            exact = (np.asarray(g, np.float64)
                     @ (np.asarray(kq, np.float64)
                        * np.asarray(s, np.float64)[None, :]).T)
        else:
            # fwd forms quantize activations, so the f64 dequant matmul is a
            # loose reference — the err column reports the activation-quant
            # envelope; XLA-vs-Pallas equality is asserted in the tests
            exact = (np.asarray(g, np.float64)
                     @ (np.asarray(kq, np.float64)
                        * np.asarray(s, np.float64)[None, :]))
        scale_ = float(np.std(exact)) or 1.0
        for name, fn in forms.items():
            got = np.asarray(jax.jit(fn)(g, kq, s), np.float32)
            err = float(np.max(np.abs(got - exact)) / scale_)
            dt = time_form(fn, kq, s, args.m, in_dim, out_dim,
                           args.iters, args.reps, rng)
            bw = (g.nbytes + kq.nbytes + out_dim * args.m * 2) / dt / 1e9
            print(f"{d} {name:12s} {dt*1e3:8.3f} ms  rel_err={err:.2e} "
                  f"min_GB/s={bw:.0f}", flush=True)


if __name__ == "__main__":
    main()
