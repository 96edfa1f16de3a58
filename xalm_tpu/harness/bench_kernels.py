"""Kernel micro-benchmarks and memory-bandwidth probes.

The TPU equivalent of the reference test binary's ``-k [matmul,mha,ffn]``
micro-benchmarks and ``-b``/``-b2`` main-memory bandwidth probes
(reference README.md:62-80) — the roofline that generation GB/s is read
against. Deterministic inputs (seed 42, the reference's fixture convention).

Methodology notes (hard-won on this host):
- A fixed ~30-40 ms dispatch+readback latency rides on every call through
  the axon tunnel, and identical calls may be memoized — so every probe
  measures the *slope* between two chained-iteration counts with a fresh
  input buffer per call, not single-call wall time.
- Even so, slope readings through the tunnel can exceed physical HBM
  bandwidth (execution pipelining across the timed boundary). Readings above
  ~100% SOL are flagged; treat bench.py's end-to-end decode (which threads a
  donated KV cache through every call) as the ground truth.

Usage: python -m xalm_tpu.harness.bench_kernels [-k matmul|mha|ffn|all] [-b]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GB_S = 819.0


def _flag(gb_s: float) -> str:
    return "  [!] exceeds SOL — tunnel artifact, distrust" if gb_s > V5E_HBM_GB_S else ""


def _slope_time(make_chain, args=(), n1: int = 8, n2: int = 40, reps: int = 4) -> float:
    """Seconds per chain iteration, by slope between two chain lengths.

    Large operands must ride in ``args`` (jit arguments), NOT closures —
    captured constants are serialized into the remote-compile request on
    this host and blow its size limit."""
    times = {}
    for n in (n1, n2):
        f = jax.jit(make_chain(n))
        x0 = jnp.ones((8, 4096), jnp.float32)
        np.asarray(f(x0, *args))  # compile
        best = float("inf")
        for rep in range(reps):
            xr = x0 + rep + 1  # fresh buffer defeats result memoization
            t0 = time.perf_counter()
            np.asarray(f(xr, *args))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[n2] - times[n1]) / (n2 - n1), 1e-9)


def bench_bandwidth() -> None:
    """-b: achievable HBM read bandwidth via chained bf16 matvecs over a
    3.76 GB weight set (too big to cache, forces HBM streaming)."""
    key = jax.random.PRNGKey(42)
    w = jax.random.normal(key, (32, 14336, 4096), jnp.bfloat16) * 0.02
    jax.block_until_ready(w)

    def make_chain(n):
        def chain(x, w):
            def body(c, i):
                y = jax.lax.dot_general(
                    c.astype(jnp.bfloat16), w[i % 32], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return y[:, :4096] * 1e-2, ()
            c, _ = jax.lax.scan(body, x, jnp.arange(n))
            return c
        return chain

    per = _slope_time(make_chain, (w,))
    gb_s = w[0].nbytes / per / 1e9
    print(f"-b HBM read probe: {per*1e3:.3f} ms / 117MB sweep -> "
          f"{gb_s:.0f} GB/s ({gb_s/V5E_HBM_GB_S*100:.0f}% of v5e SOL){_flag(gb_s)}")


def bench_bandwidth2() -> None:
    """-b2: HBM read+write bandwidth via a chained whole-buffer update
    (the second memory probe of the reference test binary, README.md:73-76).
    """
    key = jax.random.PRNGKey(42)
    buf = jax.random.normal(key, (32, 14336, 4096 // 4), jnp.bfloat16)  # ~0.94 GB
    jax.block_until_ready(buf)

    def make_chain(n):
        def chain(x, buf):
            def body(c, i):
                # touch every byte: read buf, write buf' (carry threads it)
                b2 = c[1] * jnp.bfloat16(1.0) + jnp.bfloat16(1e-8)
                return (c[0] + b2[0, :8, :128].astype(jnp.float32).sum(), b2), ()
            (acc, b2), _ = jax.lax.scan(body, (x.sum(), buf), jnp.arange(n))
            return acc + b2[0, 0, 0].astype(jnp.float32)
        return chain

    per = _slope_time(make_chain, (buf,))
    gb_s = 2 * buf.nbytes / per / 1e9  # read + write per iteration
    print(f"-b2 HBM copy probe: {per*1e3:.3f} ms / {buf.nbytes/1e9:.2f} GB r+w -> "
          f"{gb_s:.0f} GB/s ({gb_s/V5E_HBM_GB_S*100:.0f}% of v5e SOL){_flag(gb_s)}")


def bench_matmul() -> None:
    """-k matmul: fused dequant+matmul at Mistral-7B w1 shape per dtype."""
    from xalm_tpu.ops.pallas_matmul import pallas_qmatmul_stacked_full, supported_weight_dtype

    key = jax.random.PRNGKey(42)
    base = jax.random.normal(key, (8, 14336, 4096), jnp.bfloat16) * 0.02
    for name, wdt in (("i8", jnp.int8), ("bf16", jnp.bfloat16),
                      ("f8_e4m3(xla)", jnp.float8_e4m3fn)):
        if wdt == jnp.int8:
            w = jnp.clip(jnp.round(base.astype(jnp.float32) * 5000), -127, 127).astype(jnp.int8)
            scale = jnp.full((8, 14336), 1 / 5000, jnp.float32)
        else:
            w, scale = base.astype(wdt), None

        use_pallas = supported_weight_dtype(wdt)

        def make_chain(n, scale=scale, use_pallas=use_pallas):
            def chain(x, w):
                def body(c, i):
                    if use_pallas:
                        y = pallas_qmatmul_stacked_full(c, w, scale, i % 8)
                    else:
                        wi = w[i % 8].astype(jnp.bfloat16)
                        y = jax.lax.dot_general(
                            c.astype(jnp.bfloat16), wi, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    return y[:, :4096] * 1e-2, ()
                c, _ = jax.lax.scan(body, x, jnp.arange(n))
                return c
            return chain

        per = _slope_time(make_chain, (w,))
        gb_s = w[0].nbytes / per / 1e9
        impl = "pallas" if use_pallas else "xla"
        print(f"-k matmul [{name:>12}] ({impl}): {per*1e3:.3f} ms/matvec "
              f"(14336x4096) -> {gb_s:.0f} GB/s ({gb_s/V5E_HBM_GB_S*100:.0f}% SOL){_flag(gb_s)}")


def bench_mha() -> None:
    """-k mha: GQA decode attention over a full 4k fp16 KV cache."""
    from xalm_tpu.models import llama
    from xalm_tpu.models.config import ModelConfig
    from xalm_tpu.utils.synthetic import MISTRAL_7B

    cfg = MISTRAL_7B
    key = jax.random.PRNGKey(42)
    L = 8
    # head-major cache layout: (L, B, K, S, hd) — see runtime/cache.py
    k = jax.random.normal(key, (L, 1, cfg.n_kv_heads, cfg.max_seq_len, cfg.head_dim), jnp.float16)
    v = k + 1
    kv_len = jnp.full((1, 1), cfg.max_seq_len, jnp.int32)
    jax.block_until_ready((k, v))

    def make_chain(n):
        def chain(x, k, v):
            q0 = x[:1, :cfg.q_dim].reshape(1, 1, cfg.n_heads, cfg.head_dim)
            def body(c, i):
                kl = k[i % L]
                vl = v[i % L]
                out = llama.attention(c, kl, vl, kv_len, cfg)
                return out.reshape(1, 1, cfg.n_heads, cfg.head_dim) * 1e-2, ()
            c, _ = jax.lax.scan(body, q0, jnp.arange(n))
            return jnp.zeros((8, 4096)) + c.sum()
        return chain

    per = _slope_time(make_chain, (k, v))
    bytes_per = k[0].nbytes + v[0].nbytes
    gb_s = bytes_per / per / 1e9
    print(f"-k mha: {per*1e3:.3f} ms/layer-step (4k fp16 cache, "
          f"{bytes_per/1e6:.0f} MB) -> {gb_s:.0f} GB/s ({gb_s/V5E_HBM_GB_S*100:.0f}% SOL){_flag(gb_s)}")


def bench_ffn() -> None:
    """-k ffn: the full GLU FFN (w1/w3 -> act -> w2) at 7B shapes, i8."""
    from xalm_tpu.ops.pallas_matmul import pallas_qmatmul_stacked_full

    key = jax.random.PRNGKey(42)
    L = 4
    base = jax.random.normal(key, (L, 14336, 4096), jnp.bfloat16) * 0.02
    w13 = jnp.clip(jnp.round(base.astype(jnp.float32) * 5000), -127, 127).astype(jnp.int8)
    w2 = jnp.swapaxes(w13, 1, 2).copy()
    s13 = jnp.full((L, 14336), 1 / 5000, jnp.float32)
    s2 = jnp.full((L, 4096), 1 / 5000, jnp.float32)
    jax.block_until_ready((w13, w2))

    def make_chain(n):
        def chain(x, w13, w2):
            def body(c, i):
                l = i % L
                g = pallas_qmatmul_stacked_full(c, w13, s13, l)
                u = pallas_qmatmul_stacked_full(c, w13, s13, l)
                y = pallas_qmatmul_stacked_full(jax.nn.silu(g) * u, w2, s2, l)
                return y * 1e-2, ()
            c, _ = jax.lax.scan(body, x, jnp.arange(n))
            return c
        return chain

    per = _slope_time(make_chain, (w13, w2), n1=4, n2=20)
    bytes_per = 3 * w13[0].nbytes
    gb_s = bytes_per / per / 1e9
    print(f"-k ffn: {per*1e3:.3f} ms/ffn (3x 14336x4096 i8, {bytes_per/1e6:.0f} MB)"
          f" -> {gb_s:.0f} GB/s ({gb_s/V5E_HBM_GB_S*100:.0f}% SOL){_flag(gb_s)}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="xalm-bench-kernels", description=__doc__)
    p.add_argument("-k", dest="kernel", choices=["matmul", "mha", "ffn", "all"], default=None)
    p.add_argument("-b", dest="bandwidth", action="store_true", help="HBM read-bandwidth probe")
    p.add_argument("-b2", dest="bandwidth2", action="store_true", help="HBM read+write probe")
    args = p.parse_args(argv)
    print(f"device: {jax.devices()[0]} | backend: {jax.default_backend()}")
    if args.bandwidth:
        bench_bandwidth()
    if args.bandwidth2:
        bench_bandwidth2()
    if args.kernel in ("matmul", "all"):
        bench_matmul()
    if args.kernel in ("mha", "all"):
        bench_mha()
    if args.kernel in ("ffn", "all"):
        bench_ffn()
    if not args.bandwidth and not args.bandwidth2 and args.kernel is None:
        p.print_help()
    return 0


if __name__ == "__main__":
    sys.exit(main())
