"""Trustworthy on-device kernel timing for remote/tunneled TPU platforms.

``jax.block_until_ready`` on the axon remote platform returns before device
work completes, and a host read pays a large tunnel round trip.  So: run the
op N times *chained* (each iteration data-depends on the previous) inside one
jitted ``lax.fori_loop``, force one tiny host read at the end, and subtract
the 1-iteration time.  Per-iteration cost = (t_N - t_1) / (N - 1).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(op, args, n=32, warmup=True):
    """op: fn(*args, salt) -> pytree whose first leaf is an array.
    ``salt`` is a traced int32 scalar whose runtime value is always 0; the
    op MUST ADD it to one of its integer inputs (never multiply by 0 — XLA
    folds x*0 and the loop body becomes hoistable).  Returns s/iteration."""

    def run(k):
        def body(i, carry):
            # carry's runtime value is data-dependent on the previous
            # iteration; mask it to zero OPAQUELY (x - barrier(x) == 0 at
            # runtime, but the simplifier cannot prove it) so op inputs are
            # unchanged while the dependence chain survives optimization.
            salt = carry - jax.lax.optimization_barrier(carry)
            out = op(*args, salt)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jax.lax.optimization_barrier(
                jnp.min(leaf).astype(jnp.int32))
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    f = jax.jit(run, static_argnums=0)
    if warmup:
        np.asarray(f(1))
        np.asarray(f(n))

    def t(k, reps=3):
        # best-of: the shared tunneled device swings between consecutive
        # calls, and a single t1/tn pair can even go NEGATIVE after the
        # subtraction (observed r5: a gate artifact with every kernel at
        # ~0 ms).  The min of each is the machine, the rest is weather.
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(k))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(t(n) - t(1), 0.0) / (n - 1)


def report(name, op, args, n=32):
    dt = chain_time(op, args, n)
    print(f"{name:52s} {dt*1e3:9.3f} ms")
    return dt
