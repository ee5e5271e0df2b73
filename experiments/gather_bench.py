"""Micro-bench: TPU gather cost vs table size, and a chunked one-hot MXU
matmul as a small-table gather substitute.

CLAUDE.md r2 measured "~23 ms per 4M-row gather" on the packed face table.
This probes (a) whether that cost is table-size dependent, (b) whether a
one-hot matmul (exact at precision=HIGHEST: one-hot rows are powers of two,
bf16x6 reconstructs f32) beats it for tables that fit the MXU contraction.

Usage: python experiments/gather_bench.py [n_rows]
One process per invocation (axon tunnel measurement rules, CLAUDE.md):
every timed region ends with a host readback; one early D2H flips eager.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, repeats=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = None
    for _ in range(repeats):
        out = fn(*args)
        # chain: feed a scalar of out back to keep ordering
        args = (args[0] + 1e-20 * out[0, 0].astype(args[0].dtype),) + args[1:]
        acc = out
    _ = float(jnp.sum(acc))  # readback terminates the timed region
    return (time.perf_counter() - t0) / repeats * 1e3  # ms


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4 * 1024 * 1024
    key = jax.random.key(0)
    print(f"# backend={jax.default_backend()} rows={n_rows}")
    # early D2H -> eager mode
    _ = int(jnp.sum(jnp.ones(3)))

    results = {}
    for tbl_rows in (4, 64, 1440, 16384, 262144):
        table = jax.random.normal(key, (tbl_rows, 17), jnp.float32)
        idx = jax.random.randint(key, (n_rows,), 0, tbl_rows)

        gather = jax.jit(lambda t, i: t[i])
        ms = timeit(gather, table, idx)
        results[f"gather_{tbl_rows}"] = ms
        print(f"gather   table={tbl_rows:7d}: {ms:8.3f} ms")

        if tbl_rows <= 4096:
            chunk = 8192

            def onehot_mm(t, i, tbl_rows=tbl_rows, chunk=chunk):
                ic = i.reshape(-1, chunk)

                def one(ii):
                    oh = (
                        ii[:, None] == jnp.arange(tbl_rows, dtype=ii.dtype)[None, :]
                    ).astype(jnp.float32)
                    return jax.lax.dot(
                        oh, t, precision=jax.lax.Precision.HIGHEST
                    )

                return jax.lax.map(one, ic).reshape(-1, t.shape[1])

            f = jax.jit(onehot_mm)
            # correctness
            ref = np.asarray(table)[np.asarray(idx)]
            got = np.asarray(f(table, idx))
            assert np.array_equal(ref, got), "one-hot mm not exact!"
            ms2 = timeit(f, table, idx)
            results[f"onehot_{tbl_rows}"] = ms2
            print(f"onehotMM table={tbl_rows:7d}: {ms2:8.3f} ms")

    # 15 separate small gathers (gather_params pattern) vs 1 packed
    table = jax.random.normal(key, (4, 15), jnp.float32)
    idx = jax.random.randint(key, (n_rows,), 0, 4)

    def many(t, i):
        return jnp.stack([t[:, c][i] for c in range(15)], axis=1)

    ms = timeit(jax.jit(many), table, idx)
    print(f"15 small col-gathers (4-row table): {ms:8.3f} ms")
    results["many_small"] = ms

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
