"""Sweep the fused attention kernel's batch-tile size on the real chip.

The fused layer runs one grid step per ``bt`` batch rows (both directions);
``bt`` trades VMEM residency against grid-dispatch overhead and MXU
utilization of the per-head (L×hd) matmuls. This sweeps bt for the flagship
training configuration (B=1024, L=64, D=250, dropout 0.25 drawn in-kernel)
and prints fwd+bwd wall time per step for each.

Run: python scripts/bench_attention.py [bt ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from eeg_image_decode_tpu.ops import attention as A

    B, L, D, FF, H = 1024, 64, 250, 256, 4
    inner = (D // H) * H
    key = jax.random.key(0)
    ks = jax.random.split(key, 20)
    x = jax.random.normal(ks[0], (B, L, D), jnp.bfloat16)
    params = {
        "wq": jax.random.normal(ks[1], (D, inner)) * 0.05,
        "bq": jnp.zeros((inner,)),
        "wk": jax.random.normal(ks[2], (D, inner)) * 0.05,
        "bk": jnp.zeros((inner,)),
        "wv": jax.random.normal(ks[3], (D, inner)) * 0.05,
        "bv": jnp.zeros((inner,)),
        "wo": jax.random.normal(ks[4], (inner, D)) * 0.05,
        "bo": jnp.zeros((D,)),
        "ln1_s": jnp.ones((D,)),
        "ln1_b": jnp.zeros((D,)),
        "w1": jax.random.normal(ks[5], (D, FF)) * 0.05,
        "b1": jnp.zeros((FF,)),
        "w2": jax.random.normal(ks[6], (FF, D)) * 0.05,
        "b2": jnp.zeros((D,)),
        "ln2_s": jnp.ones((D,)),
        "ln2_b": jnp.zeros((D,)),
    }
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    seed = jnp.asarray(7, jnp.int32)

    # time N iterations inside ONE jitted lax.scan: per-dispatch wall time
    # through the axon tunnel is ~25 ms, so per-call timing is meaningless
    N_ITERS = 50

    bts = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
    for bt in bts:
        A.BLOCK_BT_TRAIN_BF16 = bt  # the seeded-dropout path below is 'training' mode

        def f(x, p):
            return jnp.sum(
                A.fused_attention_layer(
                    x, p, None, H, False, 0.25, seed
                ).astype(jnp.float32)
            )

        def run(x, params):
            def body(carry, _):
                _, (gx, _) = jax.value_and_grad(f, argnums=(0, 1))(
                    carry, params
                )
                # keep iterations dependent so nothing is hoisted/elided
                return carry + 1e-6 * gx.astype(carry.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
            return x

        jitted = jax.jit(run)
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(x, params))
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"bt={bt:3d}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(x, params))
            times.append((time.perf_counter() - t0) / N_ITERS)
        print(
            f"bt={bt:3d}: fwd+bwd {min(times)*1e3:7.3f} ms/iter  "
            f"(compile {compile_s:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
