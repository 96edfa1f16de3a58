#!/usr/bin/env python
"""Is a 4-bit weight body worth building? Measure the unpack tax on silicon.

A q4 megakernel would halve the dominant decode byte stream (7.0 GB of i8
body -> 3.5 GB packed nibbles), but every streamed byte then needs VPU
work the i8 kernel doesn't do: int8->int32 convert + two shifts + two
converts back to s8 (Mosaic legalizes integer vector ops at i32 width —
CLAUDE.md: 8/16-bit shifts don't legalize — so the unpack pays 4x lane
occupancy). Whether q4 wins is exactly whether that unpack sustains more
than the i8 stream's byte rate per LOGICAL weight.

Variants (manual multi-buffered DMA schedule, the megakernel's pool):
  i8  stream+dot     — today's consumer: s8 tile straight into dot_general
  q4  stream only    — packed bytes summed, no unpack (the q4 DMA floor)
  q4  unpack         — + i32 shift/mask nibble split to two s8 halves
  q4  unpack+dot     — + the two (B, TR) s8xs8 dots (the real q4 consumer)

Packing layout (what a q4 megakernel would use): byte j of a row packs
logical weights k=j (low nibble, signed via <<28>>28) and k=j+K/2 (high
nibble, signed via arithmetic >>4), so the unpacked halves feed two dots
contracting disjoint halves of the activation row — no lane interleave.

Reported rate is the marginal rate between R=4 and R=20 in-dispatch sweeps
(cancels the ~30 ms tunnel RTT and any memoization, same method as
tools/dma_probe.py). The verdict line compares LOGICAL GB/s: q4's physical
rate x2 vs i8's physical rate — >1 means a q4 body beats the i8 body.

Usage: python tools/q4_probe.py [--mb 256] [--tile 256] [--nbuf 8] [--b 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=128, help="PACKED stream MiB")
    ap.add_argument("--tile", type=int, default=256, help="tile rows")
    ap.add_argument("--nbuf", type=int, default=8)
    ap.add_argument("--b", type=int, default=8, help="activation rows")
    ap.add_argument("--reps", type=int, default=3)
    # in-dispatch sweep counts: the marginal time (r_hi - r_lo sweeps) must
    # dominate the ~30 ms tunnel RTT or the rates are noise
    ap.add_argument("--r-lo", type=int, default=20)
    ap.add_argument("--r-hi", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 2048  # packed lane width -> logical K = 4096 (Mistral-7B dim)
    K = 2 * N
    B = args.b
    TR, NBUF = args.tile, args.nbuf
    rows = args.mb * (1 << 20) // N
    rows -= rows % TR
    nt = rows // TR
    gb_packed = rows * N / 1e9
    print(
        f"packed stream: {rows} x {N} int8 = {gb_packed:.2f} GB "
        f"({2 * gb_packed:.2f} GB logical q4) | tile {TR}r x {NBUF} bufs | B={B}",
        flush=True,
    )

    key = jax.random.PRNGKey(0)
    mk = jax.jit(
        lambda k, r=rows, n=N: jax.random.randint(k, (r, n), -127, 128, jnp.int32).astype(jnp.int8)
    )
    arrs = [mk(k) for k in jax.random.split(key, 2 * args.reps + 1)]
    # i8 comparison streams the same PHYSICAL bytes (same wall time floor);
    # its logical rate is its physical rate
    xq = jax.jit(
        lambda k: jax.random.randint(k, (B, K), -127, 128, jnp.int32).astype(jnp.int8)
    )(jax.random.PRNGKey(9))
    jax.block_until_ready(arrs + [xq])

    def make(consumer, reps: int):
        """Manual NBUF-deep pool streaming `rows x N` int8, per-tile consumer."""

        def kernel(x_ref, hbm, out_ref, buf, sem):
            def dma(i, slot):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(i * TR, TR), :], buf.at[slot], sem.at[slot]
                )

            for i in range(min(NBUF, nt)):
                dma(i, i).start()
            acc = jnp.zeros((B, 128), jnp.float32)
            x = x_ref[...]
            for i in range(nt):
                slot = i % NBUF
                dma(i, slot).wait()
                acc = acc + consumer(x, buf[slot])
                if i + NBUF < nt:
                    dma(i + NBUF, slot).start()
            out_ref[...] = out_ref[...] + acc

        def outer(x_ref, hbm, out_ref, buf, sem):
            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            kernel(x_ref, hbm, out_ref, buf, sem)

        return pl.pallas_call(
            outer,
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
            grid=(reps,),
            in_specs=[
                pl.BlockSpec((B, K), lambda r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((B, 128), lambda r: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, TR, N), jnp.int8),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20,
                dimension_semantics=("arbitrary",),
            ),
        )

    def unpack(tile_i8):
        w = tile_i8.astype(jnp.int32)
        hi = (w >> 4).astype(jnp.int8)  # sign-extending: top nibble signed
        lo = ((w << 28) >> 28).astype(jnp.int8)  # low nibble re-signed
        return lo, hi

    def c_stream(x, tile):
        # touch every sublane strip without unpacking (DMA floor): one
        # reduced row, broadcast into the (B, 128) acc shape
        s = jnp.sum(tile[:, :128].astype(jnp.float32), axis=0, keepdims=True)
        return jnp.broadcast_to(s * 1e-6, (x.shape[0], 128))

    def c_unpack(x, tile):
        lo, hi = unpack(tile)
        s = jnp.sum(
            lo[:, :128].astype(jnp.float32) + hi[:, :128].astype(jnp.float32),
            axis=0,
            keepdims=True,
        )
        return jnp.broadcast_to(s * 1e-6, (x.shape[0], 128))

    def c_q4_dot(x, tile):
        lo, hi = unpack(tile)
        y = jax.lax.dot_general(
            x[:, :N], lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ) + jax.lax.dot_general(
            x[:, N:], hi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )  # (B, TR)
        return y[:, :128].astype(jnp.float32) * 1e-6

    def c_q4_dot_grouped(gs):
        """The quality-grade consumer: per-(row, group) scales mean one dot
        + one f32 scale-multiply per gs-wide contraction slice (same total
        MXU passes as one big dot; the overhead is instruction count)."""

        def c(x, tile):
            lo, hi = unpack(tile)
            acc = jnp.zeros((x.shape[0], TR), jnp.float32)
            for off, wh in ((0, lo), (N, hi)):
                for g in range(N // gs):
                    d = jax.lax.dot_general(
                        x[:, off + g * gs : off + (g + 1) * gs],
                        wh[:, g * gs : (g + 1) * gs],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = acc + d.astype(jnp.float32) * (1.0 + 1e-6 * g)
            return acc[:, :128] * 1e-6

        return c

    def c_i8_dot(x, tile):
        # today's a8 consumer on the same physical bytes: tile rows are
        # output rows, contraction over the N packed lanes
        y = jax.lax.dot_general(
            x[:, :N], tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y[:, :128].astype(jnp.float32) * 1e-6

    R_LO, R_HI = args.r_lo, args.r_hi
    results = {}

    def bench(name, consumer):
        f_lo = jax.jit(make(consumer, R_LO))
        f_hi = jax.jit(make(consumer, R_HI))
        np.asarray(f_lo(xq, arrs[-1]))
        np.asarray(f_hi(xq, arrs[-1]))

        def t(f, pool):
            best = float("inf")
            for r in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(f(xq, pool[r]))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = t(f_hi, arrs[args.reps : 2 * args.reps]) - t(f_lo, arrs[: args.reps])
        rate = gb_packed * (R_HI - R_LO) / max(dt, 1e-9)
        results[name] = rate
        print(f"{name:24s} {rate:7.1f} GB/s physical", flush=True)

    bench("i8 stream+dot", c_i8_dot)
    bench("q4 stream only", c_stream)
    bench("q4 unpack", c_unpack)
    bench("q4 unpack+dot", c_q4_dot)
    for gs in (512, 128):
        bench(f"q4 unpack+dot gs={gs}", c_q4_dot_grouped(gs))

    i8, q4 = results["i8 stream+dot"], results["q4 unpack+dot"]
    factor = 2 * q4 / i8
    print(
        f"\nverdict: q4 serves {2 * q4:.0f} GB/s LOGICAL vs i8 {i8:.0f} — "
        f"{factor:.2f}x {'(q4 body wins: build it)' if factor > 1.15 else '(unpack tax eats the savings: skip)'}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
