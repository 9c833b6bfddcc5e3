"""Microbenchmarks for Viterbi kernel variants and window-gather strategies
on the real TPU backend.  Methodology per CLAUDE.md: time by jitting a
scalar readback (sum of a tiny slice) and pulling the float; subtract the
noop line for pure device time.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from gr_ieee80211_tpu.ops.viterbi_pallas import (
        acs_sweep, traceback_sweep, B_TILE, T_CHUNK)
    from gr_ieee80211_tpu.ops import frontend as FE
    from gr_ieee80211_tpu.ops.cplx import CF

    B = 4096
    T = 4480          # bench trellis 4420 padded to T_CHUNK
    rng = np.random.default_rng(0)
    llr0 = jnp.asarray(rng.normal(size=(T, B)).astype(np.float32))
    llr1 = jnp.asarray(rng.normal(size=(T, B)).astype(np.float32))

    def timeit(name, fn, *a, n=5):
        s = jax.jit(lambda *a: jnp.sum(
            jax.tree_util.tree_leaves(fn(*a))[0][..., :1].astype(jnp.float32)))
        float(s(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            float(s(*a))
        t = (time.perf_counter() - t0) / n
        print(f"{name:28s} {t*1e3:8.2f} ms")
        return t, fn(*a)

    timeit("noop", lambda x: x[:1, :1] + 0.0, llr0)
    _, (dlo, dhi, _pm) = timeit("ACS r2", lambda a, b: acs_sweep(a, b),
                                llr0, llr1)
    timeit("TB  r2", lambda a, b: traceback_sweep(a, b), dlo, dhi)
    # radix-4 / packed / cascaded / f32-word variants were measured and
    # removed (see the module docstring of ops/viterbi_pallas.py for the
    # numbers): the plain radix-2 two-plane kernel is the v5e optimum.

    # ---- window gather variants ------------------------------------------
    N = 10_000_000
    n_win = 1968
    sre = jnp.asarray(rng.normal(size=N).astype(np.float32))
    sim = jnp.asarray(rng.normal(size=N).astype(np.float32))
    starts = jnp.asarray(
        np.sort(rng.integers(0, N - n_win - 8, size=B)).astype(np.int32))

    def g_sep(re, im, st):
        w = FE.gather_windows(CF(re, im), st, n_win)
        return w.re

    timeit("gather sep re/im", g_sep, sre, sim, starts)

    inter = jnp.stack([sre, sim], axis=1)           # (N, 2) interleaved

    def g_inter(x2, st):
        def one(s):
            return jax.lax.dynamic_slice(x2, (s, 0), (n_win, 2))
        return jax.vmap(one)(st)

    timeit("gather interleaved (N,2)", g_inter, inter, starts)

    st4 = (starts // 4) * 4

    def g_sep4(re, im, st):
        w = FE.gather_windows(CF(re, im), st, n_win)
        return w.re

    timeit("gather sep, 4-aligned", g_sep4, sre, sim, st4)

    st8 = (starts // 8) * 8
    timeit("gather sep, 8-aligned", g_sep4, sre, sim, st8)

    bre = sre.astype(jnp.bfloat16)
    bim = sim.astype(jnp.bfloat16)

    def g_bf16(re, im, st):
        def one(s):
            return (jax.lax.dynamic_slice(re, (s,), (n_win,)),
                    jax.lax.dynamic_slice(im, (s,), (n_win,)))
        return jax.vmap(one)(st)[0]

    timeit("gather sep bf16", g_bf16, bre, bim, starts)

    interb = jnp.stack([bre, bim], axis=1)
    timeit("gather interleaved bf16", g_inter, interb, starts)

    # gather via take along rows of a reshaped (N/8, 8) layout: rows r..r+246
    # covering the window, then per-row static slice -- emulates wider
    # descriptors (each gathered element is a 32-byte row)
    rows8 = sre[: (N // 8) * 8].reshape(N // 8, 8)

    def g_rows(rows, st):
        r0 = st // 8
        def one(r):
            return jax.lax.dynamic_slice(rows, (r, 0), (n_win // 8 + 1, 8))
        return jax.vmap(one)(r0)

    timeit("gather row-blocked (x8)", g_rows, rows8, starts)


if __name__ == "__main__":
    main()
