"""Profiling helpers.

The reference's performance story is code comments on integer tricks
(color_util.h:248-265); ours is measurable: jax.profiler traces plus an
honest throughput timer that works on remote-tunneled devices where
``block_until_ready`` returns before execution finishes (see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/texcomp_trace"):
    """Capture a jax.profiler trace around a block of device work.

    View with TensorBoard or xprof. Usage:

        with device_trace("/tmp/trace"):
            encode(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_op(op, arg, *, iters: int = 9, reps: int = 6) -> float:
    """Honest per-call seconds for ``op(arg) -> array``.

    Remote-tunneled platforms (and async dispatch generally) can make
    ``block_until_ready`` return before the device finishes, so instead we
    run K data-dependent iterations of the op inside one jitted lax.scan,
    fetch a 4-byte checksum to host (forcing completion), and difference
    two K values to cancel fixed dispatch/tunnel overhead. Tunnel latency
    is noisy; if the difference is implausibly small (short run slower
    than the long run), fall back to the conservative per-iteration time
    of the long run, which includes the fixed overhead and therefore only
    understates throughput."""

    def perturb(x, carry):
        """XOR a carry byte into every element (data dependence across
        iterations so the compiler can't CSE the op). RGBA uint8 images
        are xored through a u32[H, W] bitcast: a u8[H, W, 4] value inside
        the loop body gets layout T(8,128)(4,1) with the size-4 minor axis
        padded to 128 lanes — a 32x HBM blowup that OOMs at 8192^2."""
        if x.dtype == jnp.uint8 and x.ndim >= 3 and x.shape[-1] == 4:
            # Any rank: batched (B, H, W, 4) fleet inputs hit the same
            # 4 -> 128 lane padding as single images.
            w = jax.lax.bitcast_convert_type(x, jnp.uint32)
            w = w ^ (carry & jnp.uint32(0xFF)) * jnp.uint32(0x01010101)
            return jax.lax.bitcast_convert_type(w, jnp.uint8)
        return x ^ (carry & jnp.uint32(0xFF)).astype(x.dtype)

    @partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(carry, _):
            out = op(jax.tree.map(lambda a: perturb(a, carry), x))
            return out.astype(jnp.uint32).sum(), None

        final, _ = jax.lax.scan(body, jnp.uint32(0), None, length=n)
        return final

    def run(n):
        np.asarray(loop(arg, n))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(arg, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = run(1)
    t_long = run(1 + iters)
    dt = (t_long - t_short) / iters
    # Noise guard: a slow short-run would otherwise yield an absurd rate;
    # fall back to the conservative long-run per-iteration time.
    if dt <= t_long / (1 + iters) * 0.02:
        dt = t_long / (1 + iters)
    return dt


def throughput(op, arg, *, pixels: int, iters: int = 9, reps: int = 6) -> float:
    """Mpixels/sec of ``op(arg) -> array`` (see :func:`time_op`)."""
    return pixels / time_op(op, arg, iters=iters, reps=reps) / 1e6
