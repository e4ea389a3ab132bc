"""Micro-benchmark of the winner-selection matmul in the deferred
kernels' PIPELINED regime: the matmul input of iteration i does NOT
depend on the accumulator (matches `_extract_loop`, where only the
recm += is loop-carried), and the one-hot is built in-loop from a
varying chunk id exactly as the kernels do. Forms:

  extract: dot(tab [REC, K], onehot [P, K], ((1,), (1,)))  -> [REC, P]
  rmw:     dot(grec [REC, P], onehot [P, K], ((1,), (0,))) -> [REC, K]

Modes: f32 HIGHEST (current) / exact bf16 3-split stacked / 3-split as
three separate matmuls / bf16x1 DEFAULT (cost floor, wrong results).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

REC, K, P = 48, 128, 256
ITERS = 100000


def _dot(a, b, dn, prec):
    return jax.lax.dot_general(
        a, b, (dn, ((), ())), preferred_element_type=jnp.float32,
        precision=prec)


def _split3(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r1 - mid
    return hi, mid, lo


def make_kernel(mode, form):
    H = jax.lax.Precision.HIGHEST
    D = jax.lax.Precision.DEFAULT
    dn = ((1,), (1,)) if form == "extract" else ((1,), (0,))

    def kernel(tab_ref, slot_ref, out_ref):
        # slot_ref [P, 1] int32 winner slots; onehot rebuilt per iter
        slot_col = slot_ref[...]
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (P, K), 1)
        tab = tab_ref[...]
        t = tab if form == "extract" else jnp.broadcast_to(
            tab[:, :1], (REC, P))

        def body(ci, acc):
            # per-iteration onehot exactly as the kernels build it
            oh = (slot_col - ci == k_iota).astype(jnp.float32)  # [P, K]
            if mode == "highest":
                g = _dot(t, oh, dn, H)
            elif mode == "split3":
                stack = jnp.concatenate(_split3(t), 0).astype(
                    jnp.bfloat16)
                g3 = _dot(stack, oh.astype(jnp.bfloat16), dn, D)
                g = (g3[0:REC] + g3[REC:2 * REC]) + g3[2 * REC:]
            elif mode == "split3_sep":
                ohb = oh.astype(jnp.bfloat16)
                hi, mid, lo = _split3(t)
                g = (_dot(hi.astype(jnp.bfloat16), ohb, dn, D)
                     + _dot(mid.astype(jnp.bfloat16), ohb, dn, D)
                     + _dot(lo.astype(jnp.bfloat16), ohb, dn, D))
            elif mode == "default_f32":
                g = _dot(t, oh, dn, D)
            else:
                raise ValueError(mode)
            return acc + g

        n = P if form == "extract" else K
        out_ref[...] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((REC, n), jnp.float32))

    return kernel


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_micro"))
    jax.block_until_ready(jnp.ones((8, 128)).sum())
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((REC, K)), jnp.float32)
    slot = jnp.asarray(rng.integers(0, K, (P, 1)), jnp.int32)

    for form in ("extract", "rmw"):
        n = P if form == "extract" else K
        for mode in ("highest", "split3", "split3_sep", "default_f32"):
            fn = jax.jit(pl.pallas_call(
                make_kernel(mode, form),
                out_shape=jax.ShapeDtypeStruct((REC, n), jnp.float32),
            ))
            out = fn(tab, slot)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(tab, slot)
                np.asarray(jax.device_get(out))
                best = min(best, time.perf_counter() - t0)
            print(f"{form:8s} {mode:12s}: {best / ITERS * 1e6:7.3f} "
                  f"us/iter", flush=True)


if __name__ == "__main__":
    main()
