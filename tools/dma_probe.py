#!/usr/bin/env python
"""HBM->VMEM streaming bandwidth probe: manual DMA vs pipelines.

The megakernel's manual make_async_copy weight streams measured ~465 GB/s
on v5e where the standard grid pipeline sustains ~745 GB/s (docs/PERF.md).
This probe isolates pure streaming: reduce-sum a large int8 array via

  a) manual double/multi-buffered make_async_copy (buffers x tile sweep)
  b) pltpu.emit_pipeline
  c) the standard pallas grid pipeline (BlockSpec)

Each variant reads the SAME bytes; wall time over a fresh array (the device
tunnel memoizes identical dispatches, so every timed call uses a distinct
input offset) gives GB/s.

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
    # 2 distinct arrays so back-to-back timed calls aren't memoized
    arrs = [
        jax.jit(lambda k: jax.random.randint(k, (rows, N), -127, 128, jnp.int32).astype(jnp.int8))(k)
        for k in jax.random.split(key, 2)
    ]
    jax.block_until_ready(arrs)

    def manual(nbuf: int, tile_rows: int):
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
            out_ref[...] = acc

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, tile_rows, N), jnp.int8),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )

    def emit(tile_rows: int):
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
            out_ref[...] = acc[...]

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )

    def gridpipe(tile_rows: int):
        nt = rows // tile_rows

        def kernel(x_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            out_ref[...] = out_ref[...] + jnp.sum(
                x_ref[...].astype(jnp.float32), axis=0, keepdims=True
            ) * (1.0 / rows)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((tile_rows, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )

    gb = rows * N / 1e9

    def bench(name, fn):
        f = jax.jit(fn)
        np.asarray(f(arrs[0]))  # compile+warm
        best = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(f(arrs[(r + 1) % 2]))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {gb / best:7.1f} GB/s  ({best * 1e3:.2f} ms)", flush=True)

    for tile in (256, 512, 1024):
        bench(f"gridpipe tile={tile}r ({tile * N >> 20}MiB)", gridpipe(tile))
    for tile in (512, 1024):
        bench(f"emit_pipeline tile={tile}r", emit(tile))
    for nbuf in (2, 4, 8):
        for tile in (256, 512, 1024):
            if nbuf * tile * N > 80 << 20:
                continue
            bench(f"manual nbuf={nbuf} tile={tile}r", manual(nbuf, tile))
    return 0


if __name__ == "__main__":
    sys.exit(main())
