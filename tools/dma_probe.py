#!/usr/bin/env python
"""HBM->VMEM streaming bandwidth probe: manual DMA vs pipelines.

The megakernel's manual make_async_copy weight streams measured ~465 GB/s
on v5e where the standard grid pipeline sustains ~745 GB/s (docs/PERF.md).
This probe isolates pure streaming: reduce-sum a large int8 array via

  a) manual double/multi-buffered make_async_copy (buffers x tile sweep)
  b) pltpu.emit_pipeline
  c) the standard pallas grid pipeline (BlockSpec)

Per-dispatch tunnel RTT on this host is ~30 ms — far above the stream time
— so each variant runs its full sweep R times INSIDE one dispatch (an outer
grid dimension) and the reported rate is the MARGINAL rate between R=4 and
R=20 dispatches: (t20 - t4) / (16 * bytes), which cancels the RTT and any
fixed compile/launch cost.

Usage: python tools/dma_probe.py [--mb 512]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512, help="stream size in MiB")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 4096  # lane width
    rows = args.mb * (1 << 20) // N
    print(f"stream: {rows} x {N} int8 = {rows * N / 1e9:.2f} GB", flush=True)
    key = jax.random.PRNGKey(0)
    # one distinct array per timed dispatch (+1 for warmups): the tunnel
    # memoizes byte-identical dispatches, so NO timed call may repeat an
    # earlier (fn, input) pair — a memoized sample returns in ~RTT and
    # would poison the marginal rate
    arrs = [
        jax.jit(lambda k: jax.random.randint(k, (rows, N), -127, 128, jnp.int32).astype(jnp.int8))(k)
        for k in jax.random.split(key, 2 * args.reps + 1)
    ]
    jax.block_until_ready(arrs)

    def manual(nbuf: int, tile_rows: int, reps: int):
        nt = rows // tile_rows

        def kernel(hbm, out_ref, buf, sem):
            def dma(i, slot):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(i * tile_rows, tile_rows), :], buf.at[slot], sem.at[slot]
                )

            for i in range(min(nbuf, nt)):
                dma(i, i).start()
            acc = jnp.zeros((1, N), jnp.float32)
            for i in range(nt):
                slot = i % nbuf
                dma(i, slot).wait()
                acc = acc + jnp.sum(
                    buf[slot].astype(jnp.float32), axis=0, keepdims=True
                ) * (1.0 / rows)
                if i + nbuf < nt:
                    dma(i + nbuf, slot).start()
            out_ref[...] = out_ref[...] + acc

        def outer(hbm, out_ref, buf, sem):
            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)
            kernel(hbm, out_ref, buf, sem)

        return pl.pallas_call(
            outer,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            grid=(reps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, N), lambda r: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, tile_rows, N), jnp.int8),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20,
                dimension_semantics=("arbitrary",),
            ),
        )

    def emit(tile_rows: int, reps: int):
        nt = rows // tile_rows

        def kernel(hbm, out_ref, acc):
            acc[...] = jnp.zeros_like(acc)

            def inner(buf_ref):
                acc[...] = acc[...] + jnp.sum(
                    buf_ref[...].astype(jnp.float32), axis=0, keepdims=True
                ) * (1.0 / rows)

            pltpu.emit_pipeline(
                inner,
                grid=(nt,),
                in_specs=[
                    pl.BlockSpec((tile_rows, N), lambda i: (i, 0)),
                ],
            )(hbm)
            out_ref[...] = out_ref[...] + acc[...]

        def outer(hbm, out_ref, acc):
            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)
            kernel(hbm, out_ref, acc)

        return pl.pallas_call(
            outer,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            grid=(reps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, N), lambda r: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20,
                dimension_semantics=("arbitrary",),
            ),
        )

    def gridpipe(tile_rows: int, reps: int):
        nt = rows // tile_rows

        def kernel(x_ref, out_ref):
            @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            out_ref[...] = out_ref[...] + jnp.sum(
                x_ref[...].astype(jnp.float32), axis=0, keepdims=True
            ) * (1.0 / rows)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            grid=(reps, nt),
            in_specs=[
                pl.BlockSpec((tile_rows, N), lambda r, i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, N), lambda r, i: (0, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )

    gb = rows * N / 1e9
    R_LO, R_HI = 4, 20

    def bench(name, make):
        f_lo = jax.jit(make(R_LO))
        f_hi = jax.jit(make(R_HI))
        np.asarray(f_lo(arrs[-1]))
        np.asarray(f_hi(arrs[-1]))  # compile+warm both

        def t(f, pool):
            best = float("inf")
            for r in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(f(pool[r]))  # unique input per timed dispatch
                best = min(best, time.perf_counter() - t0)
            return best

        dt = t(f_hi, arrs[args.reps : 2 * args.reps]) - t(f_lo, arrs[: args.reps])
        rate = gb * (R_HI - R_LO) / max(dt, 1e-9)
        print(f"{name:34s} {rate:7.1f} GB/s marginal", flush=True)

    for tile in (256, 512, 1024):
        bench(
            f"gridpipe tile={tile}r ({tile * N >> 20}MiB)",
            lambda r, t_=tile: gridpipe(t_, r),
        )
    for tile in (512, 1024):
        bench(f"emit_pipeline tile={tile}r", lambda r, t_=tile: emit(t_, r))
    for nbuf in (2, 4, 8):
        for tile in (256, 512, 1024):
            if nbuf * tile * N > 80 << 20:
                continue
            bench(
                f"manual nbuf={nbuf} tile={tile}r",
                lambda r, n_=nbuf, t_=tile: manual(n_, t_, r),
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
