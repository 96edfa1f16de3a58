"""Whole-step fused decode megakernel: all L layers in ONE pallas_call.

The per-layer kernel chain (4 matmul launches + update + flash + XLA glue,
reference's per-op decomposition in src/infer.cpp:365-496) leaves the HBM
stream idle wherever compute serializes between launches: pipeline ramps on
the small weight streams, attention's fixed cost, rope/silu/residual glue —
~0.7 ms of a 10.6 ms step (docs/PERF.md). This kernel replaces the whole
layer stack with one grid=(L,) program whose weight traffic is a SINGLE
software-pipelined tile stream:

- wqkv, wo, and w13 share one rolling 1 MiB-tile buffer pool fed by one
  unified per-layer schedule (consume entry e -> issue entry e+NBUF), so
  the DMA engine always has NBUF tiles queued — across matmul boundaries,
  across the attention phase, and across the LAYER boundary (the tail of
  layer l's schedule prefetches layer l+1's wqkv tiles). w2 streams through
  its own pool (different contraction width) overlapped the same way.
  Tile-sized copies are the measured-fast path on this chip: tools/
  dma_probe.py clocks 1 MiB double-buffered manual DMA at ~850-900 GB/s
  where monolithic 17-25 MB slab copies ran the same stream at ~450 GB/s.
- attention (GQA flash over the ring cache), rope, sink re-rotation, the
  silu GLU, residual adds, and all norms/scales run on the VPU/MXU *under*
  the weight DMAs — their time is hidden, their XLA launches gone.
- the KV ring insert + sink rotation are 8-row-window in-place RMWs;
  attention reads are patched in-register so no write->read ordering stall
  exists.

b<=8 decode rows (t=1), int8 weights (per-row scales), bf16/f32 KV or the
quantized int8+per-row-scale KV cache — the headline decode regime
(BASELINE.json), the serving batch sizes, and the `--kv i8` regime. The
quantized path mirrors the per-layer _attn_q discipline exactly: int8 KV
codes feed the MXU dots directly with the per-row scales factored out of
the products as (1, sb) lane vectors (a full VPU dequant of the streamed
blocks caps at ~240-300 GB/s — the fp8-dequant trap), 32-row insert/sink
windows (the int8 sublane tile), and scale-plane updates as 128-lane
window RMWs riding the same patched-read race discipline as the codes.
The weight tile stream is identical at every B (weights stream once per
STEP); the matmul phases vectorize over rows on the MXU, and the
attention/ring phase loops rows statically — each row carries its own
kv_pos/kv_len/rotate (serving slots sit at different positions), and its
KV block DMAs keep HBM busy while the weight pool's lookahead is idle.
Other shapes fall back to the per-layer kernels in models/llama.py.
Weight layouts are the stacked fused (L, D, N) buffers of models/params.py
(wqkv kv-head-grouped, w13 chunk-pair-interleaved).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from xalm_tpu.ops.lowering import interpret_mode, lowering_for_tpu
from jax.experimental.pallas import tpu as pltpu

from xalm_tpu.models.config import KV_SINKS
from xalm_tpu.ops.pallas_attention import _quant_rows_f32, rope_lane

__all__ = ["fused_decode_step", "fused_step_supported"]

_TILE_A = int(os.environ.get("XALM_MK_TA", 0))  # pool-A tile rows; 0 = auto


def _tile_a(q4: int) -> int:
    """Measured per-dtype pool-A tile default: i8 is flat across 128-512
    (r4 sweep 4) so it keeps 256; the q4 kernel runs +3.7% at 512 — fewer,
    larger tiles amortize the per-tile nibble unpack better (r5 sweep,
    166.0 -> 172.1 tok/s, /tmp/sweep_q4_tiles.log). XALM_MK_TA overrides."""
    if _TILE_A:
        return _TILE_A
    return 512 if q4 else 256
_TILE_B = int(os.environ.get("XALM_MK_TB", 128))  # pool-B (w2) tile rows (x hidden lanes)
_NBUF_CAP = int(os.environ.get("XALM_MK_NBUF", 8))  # max outstanding tiles per pool
_B_PIPE = os.environ.get("XALM_MK_BPIPE", "1") != "0"  # cross-layer pool-B prefetch
_MAX_B = 8  # attention/ring phase unrolls rows; compile time scales with B


def _probe() -> set[str]:
    """Perf-ablation switches (XALM_MK_PROBE=a,b,...): correctness-breaking
    kernel variants for isolating where step time goes on hardware. Never
    set outside bench probing."""
    return set(filter(None, os.environ.get("XALM_MK_PROBE", "").split(",")))


def _pick_div(n: int, want: int) -> int:
    t = want
    while t > 1 and n % t != 0:
        t //= 2
    return t


def _nbuf(n_entries: int) -> int:
    """Largest pool size <= _NBUF_CAP dividing the schedule length (slots
    must line up across the layer boundary: entry e uses slot e % nbuf and
    next-layer prefetches are issued as entries n_lay + i)."""
    for c in range(min(_NBUF_CAP, n_entries), 0, -1):
        if n_entries % c == 0:
            return c
    return 1




def _kernel(
    meta_ref,  # scalar prefetch, flat (5*B,): [kv_pos*B, kv_len*B,
    # rotate*B, token*B, pos*B] — index [k*B + bi]
    *refs,  # pipelined VMEM inputs, ANY (HBM) inputs, outputs, scratch —
    # order depends on the fold flags, unpacked below
    L: int, N: int, DQ: int, KH: int, G: int, hd: int, QW: int,
    H2: int, S: int, sb: int, TA: int, TB: int, c13: int,
    eps: float, clip: float | None, act: str, cdtype,
    B: int = 1, quant: bool = False,
    V: int = 0, fold_wcls: bool = False, fold_embed: bool = False,
    ES: float = 1.0,
    # family deltas folded under the weight stream (all VPU work):
    has_bias: bool = False,  # Qwen2 fused qkv bias
    has_qk: bool = False,  # Qwen3 per-head q/k RMS norms before rope
    has_pn: bool = False,  # Gemma-2 post-attention/post-ffn block norms
    asc: float = 0.0,  # Gemma-2 attention-score softcap (0 = off)
    lsc: float = 0.0,  # Gemma-2 final-logit softcap (0 = off)
    a8: bool = False,  # W8A8 decode: per-row int8 activations, s8xs8 MXU
    q4: int = 0,  # packed-4-bit body: group size (0 = i8 body); implies a8
):
    it = iter(refs)
    x0_ref = None if fold_embed else next(it)
    cexp_ref = None if fold_embed else next(it)
    sexp_ref = None if fold_embed else next(it)
    c1_ref = next(it)
    s1_ref = next(it)
    freqs_ref = next(it) if fold_embed else None
    anorm_ref = next(it)
    mnorm_ref = next(it)
    sqkv_ref = next(it)
    so_ref = next(it)
    s13_ref = next(it)
    s2_ref = next(it)
    bqkv_ref = next(it) if has_bias else None
    qn_ref = next(it) if has_qk else None
    kn_ref = next(it) if has_qk else None
    pan_ref = next(it) if has_pn else None
    pmn_ref = next(it) if has_pn else None
    onorm_ref = next(it) if fold_wcls else None
    swcls_ref = next(it) if fold_wcls else None
    wqkv_hbm = next(it)
    wo_hbm = next(it)
    w13_hbm = next(it)
    w2_hbm = next(it)
    wcls_hbm = next(it) if fold_wcls else None
    embed_hbm = next(it) if fold_embed else None
    ck_in = next(it)
    cv_in = next(it)
    ks_in = next(it) if quant else None
    vs_in = next(it) if quant else None
    xout_ref = next(it)
    logits_ref = next(it) if fold_wcls else None
    token_ref = next(it) if fold_wcls else None
    ck_out = next(it)
    cv_out = next(it)
    ks_out = next(it) if quant else None
    vs_out = next(it) if quant else None
    scr = list(it)
    (
        x_ref, bufA, bufB,
        kblk, vblk, sinkw, kwin, vwin, kw_ref, vw_ref,
        acc_ref, m_ref, l_ref, act_ref, attn_ref, q_ref,
    ) = scr[:16]
    i_s = 16
    pn_ref = scr[i_s] if has_pn else None  # ffn output row (postnorm fold)
    i_s += 1 if has_pn else 0
    if quant:
        (ksb, vsb, kwsc, vwsc, scsink, scins, scv) = scr[i_s : i_s + 7]
        i_s += 7
    else:
        ksb = vsb = kwsc = vwsc = scsink = scins = scv = None
    ebuf = scr[i_s] if fold_embed else None
    i_s += 1 if fold_embed else 0
    (sA, sB, s_kb, s_vb, s_kw, s_vw, s_sink) = scr[i_s : i_s + 7]
    i_s += 7
    if quant:
        (s_ks, s_vs, s_ssk, s_sik, s_scv) = scr[i_s : i_s + 5]
        i_s += 5
    else:
        s_ks = s_vs = s_ssk = s_sik = s_scv = None
    s_emb = scr[i_s] if fold_embed else None
    PR = _probe()
    l = pl.program_id(0)
    neg_inf = -1e30

    nqkv = DQ // TA
    nwo = N // TA
    n13 = H2 // TA
    n_lay = nqkv + nwo + n13  # pool-A entries per layer
    nbA = _nbuf(n_lay)
    nt2 = N // TB
    nbB = _nbuf(nt2)

    # ---- unified pool-A tile stream -------------------------------------
    # Consume order per layer: wqkv tiles, wo tiles, w13 tiles; entries
    # [n_lay, n_lay + nqkv) are the NEXT layer's wqkv tiles. Every consume
    # of entry e issues entry e + nbA (slot layout is layer-invariant since
    # nbA divides n_lay), so the engine always has nbA tiles in flight —
    # including through the attention phase and the layer boundary.
    # pool-A tiles may have TWO lane widths (wqkv/w13/wcls contract N, wo
    # contracts QW = q_dim; Gemma-2 has QW != N): the pool is allocated at
    # the max used width and narrower tiles DMA into / load from a 128-
    # aligned lane-prefix slice. q4 bodies stream K/2-lane packed tiles
    # while the i8 head keeps its full N lanes.
    WA = max([N // (2 if q4 else 1), QW // (2 if q4 else 1)]
             + ([N] if fold_wcls else []))

    def _dstA(slot: int, width: int):
        return bufA.at[slot] if width == WA else bufA.at[slot, :, pl.ds(0, width)]

    def tileA(e: int, width: int):
        buf = bufA[e % nbA]
        return buf if width == WA else buf[:, :width]

    hv = 2 if q4 else 1  # packed-4-bit body tiles carry K/hv lanes

    def entry_dma(e: int):
        slot = e % nbA  # layer-invariant: nbA divides n_lay
        lyr, r = (l + 1, e - n_lay) if e >= n_lay else (l, e)
        if r < nqkv:
            src, w = wqkv_hbm.at[lyr, pl.ds(r * TA, TA), :], N // hv
        elif r < nqkv + nwo:
            src, w = wo_hbm.at[lyr, pl.ds((r - nqkv) * TA, TA), :], QW // hv
        else:
            src, w = w13_hbm.at[lyr, pl.ds((r - nqkv - nwo) * TA, TA), :], N // hv
        return pltpu.make_async_copy(src, _dstA(slot, w), sA.at[slot])

    # wcls tiles ride the SAME pool as entries [n_lay, n_lay + NW) of the
    # LAST layer (there is no next layer to prefetch): slot i % nbA, same
    # semaphores, so the lookahead stays full through phase 4 into the
    # logits stream
    NW = V // TA if fold_wcls else 0

    def wcls_dma(i: int):
        return pltpu.make_async_copy(
            wcls_hbm.at[pl.ds(i * TA, TA), :], _dstA(i % nbA, N), sA.at[i % nbA]
        )

    def issue(e: int):
        if e >= n_lay:
            @pl.when(l + 1 < L)
            def _():
                entry_dma(e).start()
            if fold_wcls and e - n_lay < NW:
                @pl.when(l + 1 == L)
                def _():
                    wcls_dma(e - n_lay).start()
        else:
            entry_dma(e).start()

    def consume_wait(e: int):
        entry_dma(e).wait()

    def emb_cp():
        # in-kernel embed row gather (B == 1 only): bf16 HBM slices must be
        # 16-row (sublane-tile) aligned, so fetch the token's window and
        # mask-select its row (cheaper than the XLA gather launch)
        start = meta_ref[3 * B] // 16 * 16
        return pltpu.make_async_copy(
            embed_hbm.at[pl.ds(start, 16), :], ebuf, s_emb
        )

    # ---- pool-B tile stream (w2; own pool: different contraction width) -
    # Cross-layer pipelined exactly like pool A: entry e >= nt2 is the NEXT
    # layer's tile e - nt2, slots line up because nbB divides nt2. Without
    # this, phase 4's first tiles queue BEHIND the ~nbA-tile pool-A
    # lookahead at every layer boundary (a measured ramp stall; the r4
    # ablation sweep put the whole FFN phase at ~0.65 ms/step of exposed
    # time vs a 738 GB/s zero-compute stream).
    def entryB_dma(e: int):
        slot = e % nbB
        lyr, r = (l + 1, e - nt2) if e >= nt2 else (l, e)
        return pltpu.make_async_copy(
            w2_hbm.at[lyr, pl.ds(r * TB, TB), :], bufB.at[slot], sB.at[slot]
        )

    def issueB(e: int):
        if e >= nt2:
            if _B_PIPE:
                @pl.when(l + 1 < L)
                def _():
                    entryB_dma(e).start()
        else:
            entryB_dma(e).start()

    @pl.when(l == 0)
    def _boot():
        if fold_embed:
            emb_cp().start()
        for e in range(min(nbA, n_lay)):
            entry_dma(e).start()
        if _B_PIPE:
            for e in range(min(nbB, nt2)):
                entryB_dma(e).start()
        if fold_embed:
            emb_cp().wait()
            tok = meta_ref[3 * B]
            rows = jax.lax.broadcasted_iota(jnp.int32, (16, N), 0)
            x_ref[...] = jnp.sum(
                jnp.where(rows == tok % 16, ebuf[...].astype(jnp.float32), 0.0),
                axis=0,
                keepdims=True,
            ) * ES
        else:
            x_ref[...] = x0_ref[...]

    # ---- attention-phase DMA helpers (defined early: row 0's reads are
    # prefetched at kernel top so their latency rides under phases 1-2
    # instead of serializing the attention phase) ----------------------
    def dma_kb(bi, t, slot):
        return pltpu.make_async_copy(
            ck_in.at[l, bi, :, pl.ds(t * sb, sb), :], kblk.at[slot], s_kb.at[slot]
        )

    def dma_vb(bi, t, slot):
        return pltpu.make_async_copy(
            cv_in.at[l, bi, :, pl.ds(t * sb, sb), :], vblk.at[slot], s_vb.at[slot]
        )

    # scale-plane flash blocks slice the lane (S) dim — the same blocking
    # the per-layer _attn_q grid pipeline generates (sb % 128 == 0 or whole)
    def dma_ks(bi, t, slot):
        return pltpu.make_async_copy(
            ks_in.at[l, bi, :, pl.ds(t * sb, sb)], ksb.at[slot], s_ks.at[slot]
        )

    def dma_vs(bi, t, slot):
        return pltpu.make_async_copy(
            vs_in.at[l, bi, :, pl.ds(t * sb, sb)], vsb.at[slot], s_vs.at[slot]
        )

    def _attn_reads(bi):
        """Start row ``bi``'s attention-phase reads: sink window, insert
        windows, flash block 0 (+ scale planes). Safe to issue at kernel
        top — every overlapping in-flight write is to a different layer's
        cache region, and this row's own RMW writes are patched
        in-register by the flash loop."""
        kvp = meta_ref[bi]
        sw_rows = sinkw.shape[1]
        blk = jnp.minimum(kvp, S - 1) // sw_rows * sw_rows
        pltpu.make_async_copy(
            ck_in.at[l, bi, :, pl.ds(0, sw_rows), :], sinkw, s_sink
        ).start()
        pltpu.make_async_copy(
            cv_in.at[l, bi, :, pl.ds(blk, sw_rows), :], vwin, s_vw
        ).start()
        pltpu.make_async_copy(
            ck_in.at[l, bi, :, pl.ds(blk, sw_rows), :], kwin, s_kw
        ).start()
        if quant:
            wsc = scsink.shape[1]
            bs = jnp.minimum(kvp, S - 1) // wsc * wsc
            pltpu.make_async_copy(
                ks_in.at[l, bi, :, pl.ds(0, wsc)], scsink, s_ssk
            ).start()
            pltpu.make_async_copy(
                ks_in.at[l, bi, :, pl.ds(bs, wsc)], scins, s_sik
            ).start()
            pltpu.make_async_copy(
                vs_in.at[l, bi, :, pl.ds(bs, wsc)], scv, s_scv
            ).start()
        dma_kb(bi, 0, 0).start()
        dma_vb(bi, 0, 0).start()
        if quant:
            dma_ks(bi, 0, 0).start()
            dma_vs(bi, 0, 0).start()

    skip_attn = "noattn" in PR  # probe: weight streams only
    if not skip_attn:
        _attn_reads(0)  # prefetch row 0 under the phase-1/2 tile stream

    def _a8dot(xf32, tile, sl):
        # W8A8: per-row int8 activations feed the MXU as s8 x s8 -> i32
        # (no per-tile int8->bf16 weight convert on the critical path; the
        # activation row quantizes ONCE per phase). ``sl`` is the (B, TA)
        # pre-broadcast weight-scale slice; the activation scale is a
        # (B, 1) lane broadcast.
        xq, xs = _quant_rows_f32(xf32)
        def dot(e_tile, e_sl):
            return jax.lax.dot_general(
                xq, e_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * e_sl * xs
        return dot

    def _q4dot(xf32, s4, K):
        # Packed-4-bit tile consumer (q4 body). The streamed tile carries
        # two signed nibbles per byte in split-half k-order, so unpack is
        # two arithmetic shifts at the i32 width Mosaic legalizes (hi
        # sign-extends through >>4; lo re-signs via <<28>>28) and the
        # halves feed dots over DISJOINT halves of the int8 activation row
        # — no lane interleave ever exists. Per-(row, group) scales ``s4``
        # (Gk, B, D) multiply each group's i32 partial in f32: group dots
        # split the contraction, so total MXU passes equal the single big
        # dot (tools/q4_probe.py measured grouping free on silicon).
        xq, xs = _quant_rows_f32(xf32)
        Kh = K // 2
        npg = Kh // q4

        # default i32: the bf16 floor-algebra variant is numerically exact
        # (tests) but currently fails Mosaic lowering on this toolchain
        # (remote-compile HTTP 500, /tmp/sweep_q4_bf16.log) — opt in to
        # re-probe on newer Mosaic
        unpack_bf16 = os.environ.get("XALM_MK_Q4UNPACK", "i32") == "bf16"

        def dot(tile_packed, out_sl):
            if "nounpack" in PR:
                # probe (correctness-breaking): skip the nibble unpack —
                # isolates its VPU cost
                hi = lo = tile_packed
            elif unpack_bf16:
                # bf16 floor-algebra unpack: every packed-byte value and
                # every intermediate (w/16 needs <= 7 significand bits) is
                # exactly representable in bf16, and bf16 vectors run
                # PACKED (2 elems/lane) on the VPU where the i32 shift
                # pipeline runs 1/lane (A/B via XALM_MK_Q4UNPACK=i32).
                # hi = floor(w/16) (arithmetic-shift
                # semantics incl. negatives); u = w - 16*hi in [0, 15];
                # the signed low nibble needs the [u >= 8] wrap fixup.
                wf = tile_packed.astype(jnp.bfloat16)
                hi_f = jnp.floor(wf * (1.0 / 16.0))
                u = wf - hi_f * 16.0
                lo_f = jnp.where(u >= 8.0, u - 16.0, u)
                hi = hi_f.astype(jnp.int8)
                lo = lo_f.astype(jnp.int8)
            else:  # XALM_MK_Q4UNPACK=i32 — the r4 shift pipeline
                w = tile_packed.astype(jnp.int32)
                hi = (w >> 4).astype(jnp.int8)
                lo = ((w << 28) >> 28).astype(jnp.int8)
            if "nogroup" in PR:
                # probe: ONE dot per half with a single scale — isolates the
                # per-group dot/scale/accumulate chain cost
                acc = None
                for h, wh in ((0, lo), (1, hi)):
                    d = jax.lax.dot_general(
                        xq[:, h * Kh : (h + 1) * Kh], wh,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * s4[h * npg][:, out_sl]
                    acc = d if acc is None else acc + d
                return acc * xs
            noscale = "noscale" in PR  # probe: drop per-group f32 rescale
            acc = None
            for h, wh in ((0, lo), (1, hi)):
                for gi in range(npg):
                    d = jax.lax.dot_general(
                        xq[:, h * Kh + gi * q4 : h * Kh + (gi + 1) * q4],
                        wh[:, gi * q4 : (gi + 1) * q4],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    if not noscale:
                        d = d * s4[h * npg + gi][:, out_sl]
                    acc = d if acc is None else acc + d
            return acc * xs

        return dot

    # ---- phase 1: fused qkv projection (norm prologue + scale epilogue) -
    x = x_ref[...]
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    xn_f = x * jax.lax.rsqrt(ms + eps) * anorm_ref[0]
    xn = xn_f.astype(jnp.bfloat16)
    # per-tile-sliced scale/bias rows arrive PRE-BROADCAST to (B, X)
    # (fused_decode_step materializes them in HBM): Mosaic lowers full-
    # width offset-0 broadcasts fine, but a lane-OFFSET slice of a
    # sublane-replicated (1, X) row cannot broadcast to (B, TA) — the b>1
    # "Invalid input layout" compile failure. q4 bodies instead carry
    # (Gk, B, X) group-scale blocks (same materialization, one plane per
    # contraction group).
    sqkv = sqkv_ref[0]
    if q4:
        dot1 = _q4dot(xn_f, sqkv, N)
    elif a8:
        dot1 = _a8dot(xn_f, None, None)
    bq = bqkv_ref[0] if has_bias else None
    skip_dot = "nodot" in PR  # probe: stream tiles with ZERO matmul work
    ys = []
    for e in range(nqkv):
        consume_wait(e)
        if skip_dot:
            yt = jnp.zeros((xn.shape[0], TA), jnp.float32)
        elif q4:
            yt = dot1(tileA(e, N // 2), slice(e * TA, (e + 1) * TA))
        elif a8:
            yt = dot1(tileA(e, N), sqkv[:, e * TA : (e + 1) * TA])
        else:
            yt = jax.lax.dot_general(
                xn, tileA(e, N), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sqkv[:, e * TA : (e + 1) * TA]
        if has_bias:  # Qwen2 fused qkv bias (rows match wqkv's order)
            yt = yt + bq[:, e * TA : (e + 1) * TA]
        ys.append(yt)
        issue(e + nbA)
    y = jnp.concatenate(ys, axis=1)  # (1, DQ) — lane concat, layout-free

    # ---- rope + clip + KV row build -------------------------------------
    if fold_embed:
        # per-step trig on the VPU (freqs_ref is the pair-repeated lane
        # table; repeat(cos(p*f), 2) == cos(p*repeat(f, 2)))
        posf = meta_ref[4 * B].astype(jnp.float32)
        ang = posf * freqs_ref[...]
        cexp = jnp.cos(ang)
        sexp = jnp.sin(ang)
    else:
        cexp = cexp_ref[...]
        sexp = sexp_ref[...]
    inv = 1.0 / math.sqrt(hd)
    # qs: HQ rotated query rows, (B, hd) f32. Float path pre-scales by
    # 1/sqrt(hd); the quant path folds inv into the scale product instead,
    # mirroring the per-layer _attn_q_kernel's op order exactly.
    def _hnorm(v, w_ref):
        # Qwen3 per-head RMS norm (per-layer path: llama.body's q_norm);
        # w_ref block is (1, 1, hd) -> [0] is the (1, hd) lane vector
        msv = jnp.mean(v * v, axis=-1, keepdims=True)
        return v * jax.lax.rsqrt(msv + eps) * w_ref[0]

    qs = []
    kw_f = []  # float path: per-kv-head rotated K rows as written
    for j in range(KH):
        base = j * (G + 2) * hd
        for a in range(G):
            qh = y[:, base + a * hd : base + (a + 1) * hd]
            if clip is not None:
                qh = jnp.clip(qh, -clip, clip)
            if has_qk:
                qh = _hnorm(qh, qn_ref)
            qr = rope_lane(qh, cexp, sexp, hd)
            qs.append(qr if quant else qr * inv)
        kh = y[:, base + G * hd : base + (G + 1) * hd]
        vh = y[:, base + (G + 1) * hd : base + (G + 2) * hd]
        if clip is not None:
            kh = jnp.clip(kh, -clip, clip)
            vh = jnp.clip(vh, -clip, clip)
        if has_qk:
            kh = _hnorm(kh, kn_ref)
        kh = rope_lane(kh, cexp, sexp, hd)
        if quant:
            # the i8 weight scheme applied to the KV rows (per-layer
            # _insert_q_kernel parity: same _quant_rows_f32)
            kq, ksc_new = _quant_rows_f32(kh)
            vq, vsc_new = _quant_rows_f32(vh)
            kw_ref[j] = kq
            vw_ref[j] = vq
            kwsc[j] = ksc_new
            vwsc[j] = vsc_new
        else:
            khc = kh.astype(cdtype)
            kw_ref[j] = khc
            vw_ref[j] = vh.astype(cdtype)
            kw_f.append(khc.astype(jnp.float32))

    hq = KH * G

    # ---- in-place ring insert + sink re-rotation (one batch row) --------
    # HBM DMA slices on the sequence dim must be sublane-tile (8) aligned,
    # so both are 8-row-window read-modify-writes (the same window
    # discipline as the per-layer _update_kernel). Window 0 (holding the
    # pinned sinks, reference infer.cpp:416-431) is always read — its
    # rotated values feed the attention patch — and written back when the
    # rotation or an in-window insert changed it; the insert window at
    # blk=(kvp//8)*8 is RMW'd when kvp lands outside window 0. Sentinel
    # kvp == S (a padding/inactive serving slot) drops writes. Rows run
    # sequentially, reusing the same window/block/accumulator scratch.
    def _attn_row(bi: int, prefetched: bool = False):
        kvp = meta_ref[bi]
        kvl = meta_ref[B + bi]
        rot = meta_ref[2 * B + bi]
        sw_rows = sinkw.shape[1]
        blk = jnp.minimum(kvp, S - 1) // sw_rows * sw_rows
        if quant:
            # scale-plane windows slice the LANE (S) dim, so they use their
            # own (wider) granule: wsc = min(128, S) lanes
            wsc = scsink.shape[1]
            bs = jnp.minimum(kvp, S - 1) // wsc * wsc

        if not prefetched:  # row 0's reads were started at kernel top
            _attn_reads(bi)
        pltpu.make_async_copy(
            ck_in.at[l, bi, :, pl.ds(0, sw_rows), :], sinkw, s_sink
        ).wait()
        if quant:
            pltpu.make_async_copy(
                ks_in.at[l, bi, :, pl.ds(0, wsc)], scsink, s_ssk
            ).wait()
        c1 = c1_ref[...]
        s1 = s1_ref[...]
        rows = jax.lax.broadcasted_iota(jnp.int32, (sw_rows, 1), 0)
        # per head: float path — (KV_SINKS, hd) rotated sink rows, cache-
        # rounded; quant path — (codes (sw_rows, hd) i8, scales (sw_rows, 1))
        rs = []
        for j in range(KH):
            if quant:
                # dequant the window rows: the (1, wsc) scale lane row must
                # become a (sw_rows, 1) column — a lane-collapsing reshape
                # Mosaic rejects — so route it through an eye-masked reduce
                srow = scsink[j : j + 1, :]  # (1, wsc)
                re_ = jax.lax.broadcasted_iota(jnp.int32, (sw_rows, wsc), 0)
                le_ = jax.lax.broadcasted_iota(jnp.int32, (sw_rows, wsc), 1)
                sc_col = jnp.sum(
                    jnp.where(re_ == le_, jnp.broadcast_to(srow, (sw_rows, wsc)), 0.0),
                    axis=1, keepdims=True,
                )  # (sw_rows, 1): row r carries scale lane r
                win = sinkw[j].astype(jnp.float32) * sc_col
                rotw = rope_lane(win, c1, s1, hd)
                rq, rsc = _quant_rows_f32(rotw)  # requant (per-layer parity)
                new = jnp.where(
                    rows == kvp,
                    jnp.broadcast_to(kw_ref[j, bi : bi + 1], (sw_rows, hd)),
                    jnp.where((rows < KV_SINKS) & (rot != 0), rq, sinkw[j]),
                )
                sinkw[j] = new
                rs.append((rq, rsc))
                # scale window 0: new-row lane + rotated sink lanes
                lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, wsc), 1)
                srow = jnp.where(lane1 == kvp, kwsc[j, bi, 0], srow)
                for si in range(KV_SINKS):
                    srow = jnp.where((lane1 == si) & (rot != 0), rsc[si, 0], srow)
                scsink[j : j + 1, :] = srow
            else:
                win = sinkw[j].astype(jnp.float32)  # (sw_rows, hd)
                rotw = rope_lane(win, c1, s1, hd).astype(cdtype)
                new = jnp.where(
                    rows == kvp,
                    jnp.broadcast_to(kw_ref[j, bi : bi + 1], (sw_rows, hd)),
                    jnp.where((rows < KV_SINKS) & (rot != 0), rotw, sinkw[j]),
                )
                sinkw[j] = new
                rs.append(rotw[:KV_SINKS].astype(jnp.float32))

        @pl.when((kvp < sw_rows) | (rot != 0))
        def _sink_wb():
            pltpu.make_async_copy(
                sinkw, ck_out.at[l, bi, :, pl.ds(0, sw_rows), :], s_sink
            ).start()

        if quant:
            # scale window 0 write-back: the new-row lane lands here iff
            # kvp < wsc (it then does NOT land in the bs window, which is
            # this same window 0 — its write is gated to kvp >= wsc below)
            @pl.when((kvp < wsc) | (rot != 0))
            def _ssk_wb():
                pltpu.make_async_copy(
                    scsink, ks_out.at[l, bi, :, pl.ds(0, wsc)], s_ssk
                ).start()

        pltpu.make_async_copy(
            ck_in.at[l, bi, :, pl.ds(blk, sw_rows), :], kwin, s_kw
        ).wait()
        pltpu.make_async_copy(
            cv_in.at[l, bi, :, pl.ds(blk, sw_rows), :], vwin, s_vw
        ).wait()
        for j in range(KH):
            kwin[j] = jnp.where(
                rows == kvp - blk,
                jnp.broadcast_to(kw_ref[j, bi : bi + 1], (sw_rows, hd)),
                kwin[j],
            )
            vwin[j] = jnp.where(
                rows == kvp - blk,
                jnp.broadcast_to(vw_ref[j, bi : bi + 1], (sw_rows, hd)),
                vwin[j],
            )
        if quant:
            pltpu.make_async_copy(
                ks_in.at[l, bi, :, pl.ds(bs, wsc)], scins, s_sik
            ).wait()
            pltpu.make_async_copy(
                vs_in.at[l, bi, :, pl.ds(bs, wsc)], scv, s_scv
            ).wait()
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, wsc), 1)
            for j in range(KH):
                scins[j : j + 1, :] = jnp.where(
                    lane1 == kvp - bs, kwsc[j, bi, 0], scins[j : j + 1, :]
                )
                scv[j : j + 1, :] = jnp.where(
                    lane1 == kvp - bs, vwsc[j, bi, 0], scv[j : j + 1, :]
                )

        @pl.when((kvp >= sw_rows) & (kvp < S))
        def _ins_k():
            pltpu.make_async_copy(
                kwin, ck_out.at[l, bi, :, pl.ds(blk, sw_rows), :], s_kw
            ).start()

        @pl.when(kvp < S)
        def _ins_v():
            pltpu.make_async_copy(
                vwin, cv_out.at[l, bi, :, pl.ds(blk, sw_rows), :], s_vw
            ).start()

        if quant:
            @pl.when((kvp >= wsc) & (kvp < S))
            def _ins_ks():
                pltpu.make_async_copy(
                    scins, ks_out.at[l, bi, :, pl.ds(bs, wsc)], s_sik
                ).start()

            @pl.when(kvp < S)
            def _ins_vs():
                pltpu.make_async_copy(
                    scv, vs_out.at[l, bi, :, pl.ds(bs, wsc)], s_scv
                ).start()

        # ---- flash attention over the ring (in-register patched reads) --
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, neg_inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        # park this row's rotated q heads as a (hq, hd) scratch matrix:
        # Mosaic cannot lower a sublane concat of vectors whose lane
        # offsets differ (hd < 128 heads are lane slices of y), but
        # per-row masked stores + sliced loads lower fine
        for h in range(hq):
            q_ref[h : h + 1, :] = qs[h][bi : bi + 1]
        nblk = (kvl + sb - 1) // sb
        # flash block 0 was already started by _attn_reads (at kernel top
        # for row 0, at this row's entry otherwise) — starting it again
        # here would double-bump the DMA semaphore and corrupt every
        # subsequent wait

        def blk_body(t, _):
            slot = t % 2

            @pl.when(t + 1 < nblk)
            def _next():
                dma_kb(bi, t + 1, (t + 1) % 2).start()
                dma_vb(bi, t + 1, (t + 1) % 2).start()
                if quant:
                    dma_ks(bi, t + 1, (t + 1) % 2).start()
                    dma_vs(bi, t + 1, (t + 1) % 2).start()

            dma_kb(bi, t, slot).wait()
            dma_vb(bi, t, slot).wait()
            if quant:
                dma_ks(bi, t, slot).wait()
                dma_vs(bi, t, slot).wait()
            rel = kvp - t * sb  # new row's index inside this block (may be OOR)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (sb, hd), 0)
            rg = t * sb + jax.lax.broadcasted_iota(jnp.int32, (1, sb), 1)
            live = rg < kvl  # (1, sb)
            lane_sb = jax.lax.broadcasted_iota(jnp.int32, (1, sb), 1)
            for j in range(KH):
                # patch: this step's row + (wrapped) rotated sinks — the
                # HBM writes race harmlessly, every read is fixed up here.
                # Quant path: int8 codes stay codes (they feed the MXU
                # directly); their per-row scales are patched in the (1, sb)
                # scale lane vectors that factor out of both dots.
                if quant:
                    kb = jnp.where(rows2 == rel, kw_ref[j, bi : bi + 1], kblk[slot, j])
                    vb = jnp.where(rows2 == rel, vw_ref[j, bi : bi + 1], vblk[slot, j])
                    ksc = jnp.where(lane_sb == rel, kwsc[j, bi, 0], ksb[slot, j : j + 1, :])
                    vsc = jnp.where(lane_sb == rel, vwsc[j, bi, 0], vsb[slot, j : j + 1, :])
                    rqj, rscj = rs[j]
                    for si in range(KV_SINKS):
                        hit = rows2 == (si - t * sb)
                        kb = jnp.where(hit & (rot != 0), rqj[si : si + 1], kb)
                        ksc = jnp.where(
                            (lane_sb == (si - t * sb)) & (rot != 0), rscj[si, 0], ksc
                        )
                    qj = q_ref[j * G : j * G + G, :].astype(
                        jnp.bfloat16
                    )  # (G, hd) — per-layer q dtype
                    scores = jax.lax.dot_general(
                        qj, kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * (ksc * inv)  # (G, sb)
                else:
                    kb = kblk[slot, j].astype(jnp.float32)  # (sb, hd)
                    vb = vblk[slot, j].astype(jnp.float32)
                    kb = jnp.where(rows2 == rel, kw_f[j][bi : bi + 1], kb)
                    vb = jnp.where(
                        rows2 == rel, vw_ref[j, bi : bi + 1].astype(jnp.float32), vb
                    )
                    for si in range(KV_SINKS):
                        kb = jnp.where(
                            (rows2 == (si - t * sb)) & (rot != 0), rs[j][si : si + 1], kb
                        )
                    qj = q_ref[j * G : j * G + G, :]  # (G, hd)
                    scores = jax.lax.dot_general(
                        qj, kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (G, sb)
                if asc:  # Gemma-2 attention-score softcap (HF eager parity)
                    scores = jnp.tanh(scores * (1.0 / asc)) * asc
                scores = jnp.where(live, scores, neg_inf)
                lo = j * G
                m_old = m_ref[lo : lo + G, :1]
                m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
                alpha = jnp.exp(m_old - m_new)
                p = jnp.where(live, jnp.exp(scores - m_new), 0.0)
                m_ref[lo : lo + G, :1] = m_new
                l_ref[lo : lo + G, :1] = l_ref[lo : lo + G, :1] * alpha + jnp.sum(
                    p, axis=-1, keepdims=True
                )
                pv = (p * vsc).astype(jnp.bfloat16) if quant else p
                acc_ref[lo : lo + G, :] = acc_ref[lo : lo + G, :] * alpha + (
                    jax.lax.dot_general(
                        pv, vb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            return 0

        jax.lax.fori_loop(0, nblk, blk_body, 0)

        # deferred RMW write-back waits: the flash loop read patched
        # in-register values, so the writes above only had to complete
        # before the NEXT row reuses the window scratch — waiting here
        # hides their latency under the flash compute instead of
        # serializing ~5 copy round-trips per layer
        @pl.when((kvp < sw_rows) | (rot != 0))
        def _sink_wb_w():
            pltpu.make_async_copy(
                sinkw, ck_out.at[l, bi, :, pl.ds(0, sw_rows), :], s_sink
            ).wait()

        @pl.when((kvp >= sw_rows) & (kvp < S))
        def _ins_k_w():
            pltpu.make_async_copy(
                kwin, ck_out.at[l, bi, :, pl.ds(blk, sw_rows), :], s_kw
            ).wait()

        @pl.when(kvp < S)
        def _ins_v_w():
            pltpu.make_async_copy(
                vwin, cv_out.at[l, bi, :, pl.ds(blk, sw_rows), :], s_vw
            ).wait()

        if quant:
            @pl.when((kvp < wsc) | (rot != 0))
            def _ssk_wb_w():
                pltpu.make_async_copy(
                    scsink, ks_out.at[l, bi, :, pl.ds(0, wsc)], s_ssk
                ).wait()

            @pl.when((kvp >= wsc) & (kvp < S))
            def _ins_ks_w():
                pltpu.make_async_copy(
                    scins, ks_out.at[l, bi, :, pl.ds(bs, wsc)], s_sik
                ).wait()

            @pl.when(kvp < S)
            def _ins_vs_w():
                pltpu.make_async_copy(
                    scv, vs_out.at[l, bi, :, pl.ds(bs, wsc)], s_scv
                ).wait()

        # normalize and park this row's attention output as a lane vector
        # (hq sublane row picks; every wo tile is then ONE (B, TA) dot)
        lsafe = jnp.where(l_ref[:hq, :1] > 0, l_ref[:hq, :1], 1.0)
        attn = acc_ref[:hq, :] / lsafe  # (HQ, hd) f32
        # lane-flatten via per-head stores: a lane concat of rows taken at
        # different sublane offsets is another Mosaic concat NotImplemented
        for h in range(hq):
            attn_ref[bi : bi + 1, h * hd : (h + 1) * hd] = attn[h : h + 1, :]

    if skip_attn:  # probe: weight streams only
        attn_ref[...] = jnp.zeros_like(attn_ref)
    else:
        for bi in range(B):
            _attn_row(bi, prefetched=bi == 0)

    # ---- phase 2: wo tiles (row-parallel over output rows) + residual ---
    attn_flat = attn_ref[...].astype(jnp.bfloat16)  # (B, QD)
    so = so_ref[0]
    x = x_ref[...]
    if q4:
        dot2 = _q4dot(attn_ref[...], so, QW)
    elif a8:
        dot2 = _a8dot(attn_ref[...], None, None)
    parts = []
    for e in range(nqkv, nqkv + nwo):
        consume_wait(e)
        eo = e - nqkv
        if not skip_dot:
            if q4:
                parts.append(dot2(tileA(e, QW // 2), slice(eo * TA, (eo + 1) * TA)))
            elif a8:
                parts.append(dot2(tileA(e, QW), so[:, eo * TA : (eo + 1) * TA]))
            else:
                parts.append(jax.lax.dot_general(
                    attn_flat, tileA(e, QW), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * so[:, eo * TA : (eo + 1) * TA])
        issue(e + nbA)
    if not skip_dot:
        # single whole-row store: per-tile (B, TA) sub-stores measurably
        # serialize against the tile waits (r4 sweep 6), a lane concat of
        # register tiles doesn't
        proj = jnp.concatenate(parts, axis=1)  # (B, N)
        if has_pn:
            # Gemma-2 post-attention norm needs the FULL projection before
            # the residual add
            msp = jnp.mean(proj * proj, axis=-1, keepdims=True)
            x_ref[...] = x + proj * jax.lax.rsqrt(msp + eps) * pan_ref[0]
        else:
            x_ref[...] = x + proj

    # ---- phase 3: w13 tiles -> silu GLU ---------------------------------
    x = x_ref[...]
    ms2 = jnp.mean(x * x, axis=-1, keepdims=True)
    xn2_f = x * jax.lax.rsqrt(ms2 + eps) * mnorm_ref[0]
    xn2 = xn2_f.astype(jnp.bfloat16)
    s13 = s13_ref[0]
    if q4:
        dot3 = _q4dot(xn2_f, s13, N)
    elif a8:
        dot3 = _a8dot(xn2_f, None, None)
    skip_ffn = "noffn" in PR
    skip_glu = "noglu" in PR  # probe: phase-3 dots, no GLU/act stores
    skip_w2 = "now2" in PR  # probe: skip phase-4 compute only
    acts = []
    for e in range(nqkv + nwo, n_lay):
        consume_wait(e)
        i = e - nqkv - nwo
        if not skip_ffn:
            if q4:
                yt = dot3(tileA(e, N // 2), slice(i * TA, (i + 1) * TA))
            elif a8:
                yt = dot3(tileA(e, N), s13[:, i * TA : (i + 1) * TA])
            else:
                yt = jax.lax.dot_general(
                    xn2, tileA(e, N), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * s13[:, i * TA : (i + 1) * TA]  # (1, TA)
            if skip_glu:
                act_ref[:, i * (TA // 2) : i * (TA // 2) + 1] = yt[:, :1]
                issue(e + nbA)
                continue
            for p_ in range(TA // (2 * c13)):
                off = p_ * 2 * c13
                gate = yt[:, off : off + c13]
                up = yt[:, off + c13 : off + 2 * c13]
                if act == "silu":
                    a = jax.nn.silu(gate) * up
                else:
                    a = jax.nn.gelu(gate, approximate=True) * up
                acts.append(a)  # chunk order == lane order: one store below
        issue(e + nbA)
    if acts:
        act_ref[...] = jnp.concatenate(acts, axis=1)  # (B, H)

    # ---- phase 4: w2 tiles (cross-layer pipelined pool B) ----------------
    if not _B_PIPE:  # A/B toggle: prime at phase-4 entry (the pre-r4 ramp)
        for i in range(min(nbB, nt2)):
            entryB_dma(i).start()
    actb = act_ref[...].astype(jnp.bfloat16)
    s2 = s2_ref[0]
    if q4:
        # pool B is allocated at the packed width (H/2 lanes) for q4
        dot4 = _q4dot(act_ref[...], s2, act_ref.shape[1])
    elif a8:
        dot4 = _a8dot(act_ref[...], None, None)
    y2s = []
    for i in range(nt2):
        entryB_dma(i).wait()
        if not (skip_ffn or skip_w2):
            if q4:
                y2s.append(dot4(bufB[i % nbB], slice(i * TB, (i + 1) * TB)))
            elif a8:
                y2s.append(dot4(bufB[i % nbB], s2[:, i * TB : (i + 1) * TB]))
            else:
                y2s.append(jax.lax.dot_general(
                    actb, bufB[i % nbB], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * s2[:, i * TB : (i + 1) * TB])
        issueB(i + nbB)
    if y2s:
        down = jnp.concatenate(y2s, axis=1)  # (B, N)
        if has_pn:  # Gemma-2 post-ffn norm before the residual add
            msd = jnp.mean(down * down, axis=-1, keepdims=True)
            down = down * jax.lax.rsqrt(msd + eps) * pmn_ref[0]
        x_ref[...] = x_ref[...] + down

    @pl.when(l == L - 1)
    def _emit():
        xout_ref[...] = x_ref[...]

    # ---- phase 5 (last layer only): final norm + classifier stream ------
    # The i8 head (same (TA, N) tile shape as pool A) continues the unified
    # tile stream, so the logits matmul pays no separate launch, no
    # pipeline re-ramp, and no XLA rmsnorm/dynamic-slice glue.
    if fold_wcls:
        @pl.when(l == L - 1)
        def _logits():
            x = x_ref[...]
            ms3 = jnp.mean(x * x, axis=-1, keepdims=True)
            xn3_f = x * jax.lax.rsqrt(ms3 + eps) * onorm_ref[...]
            xn3 = xn3_f.astype(jnp.bfloat16)
            if a8:
                dot5 = _a8dot(xn3_f, None, None)
            sw = swcls_ref[...]  # (B, V), pre-broadcast
            skip_log = "nologit" in PR  # probe: stream w/o compute
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, TA), 1)
            # per-row running greedy argmax across tiles
            rm = jnp.full((B, 1), -1e30, jnp.float32)
            ri = jnp.zeros((B, 1), jnp.int32)
            for i in range(NW):
                wcls_dma(i).wait()
                if not skip_log:
                    if a8:
                        lt = dot5(tileA(i, N), sw[:, i * TA : (i + 1) * TA])
                    else:
                        lt = jax.lax.dot_general(
                            xn3, tileA(i, N), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) * sw[:, i * TA : (i + 1) * TA]  # (B, TA)
                    if lsc:  # Gemma-2 final-logit softcap (monotone:
                        # the running argmax below is unaffected)
                        lt = jnp.tanh(lt * (1.0 / lsc)) * lsc
                    logits_ref[:, i * TA : (i + 1) * TA] = lt
                    tmax = jnp.max(lt, axis=1, keepdims=True)  # (B, 1)
                    # first-occurrence tie-break, matching jnp.argmax
                    tidx = jnp.min(
                        jnp.where(lt == tmax, lane + i * TA, jnp.int32(2**30)),
                        axis=1,
                        keepdims=True,
                    )
                    ri = jnp.where(tmax > rm, tidx, ri)
                    rm = jnp.maximum(tmax, rm)
                if i + nbA < NW:
                    wcls_dma(i + nbA).start()
            # full lane vector: sub-lane (B,1) outputs are a Mosaic layout risk
            token_ref[...] = jnp.broadcast_to(ri, (B, 128))


def measured_fused_preferred(batch: int, quantized_cache: bool) -> bool:
    """Measured-on-silicon path preference (docs/PERF.md variant matrix).

    The megakernel wins every configuration except batch >= 8 with an int8
    KV cache, where the per-layer path ran 714.7 vs 703.0 tok/s (the
    batched (kh, nsb) quantized-attention grid tiles better outside the
    megakernel's single-core DMA schedule). Engines built with
    ``fused_step="auto"`` (the default) route by this table; the shape is
    trace-time static so the choice costs nothing at runtime.
    """
    return not (batch >= 8 and quantized_cache)


def fused_step_supported(
    cfg, params, cache_k, batch: int, t: int, k_scale=None, a8: bool = False
) -> bool:
    """Shape/dtype gate for the megakernel decode path."""
    if not (1 <= batch <= _MAX_B) or t != 1:
        return False
    quant = k_scale is not None
    if quant:
        if jnp.dtype(cache_k.dtype) != jnp.dtype(jnp.int8):
            return False
    elif jnp.dtype(cache_k.dtype) not in (
        jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)
    ):
        return False
    lp = params.layers
    # Qwen2 qkv bias, Qwen3 qk-norm, and Gemma-2 postnorms/softcaps are all
    # folded in-kernel (VPU work under the weight stream) — no family gate
    if lp.w13 is None:
        return False  # MoE FFN (Mixtral) decodes through the XLA path
    for qw in (lp.wqkv, lp.wo, lp.w13, lp.w2):
        if qw.values.dtype != jnp.int8 or qw.scale is None:
            return False
    q4 = lp.wqkv.q4group
    if q4 or any(qw.q4group for qw in (lp.wo, lp.w13, lp.w2)):
        # packed 4-bit body: all four dense weights must share the group
        # size, and the in-kernel unpack only exists on the s8xs8 (a8)
        # dot path — int8 activations are what make the two half-dots and
        # per-group scale products exact-MXU work
        if not a8:
            return False
        if any(qw.q4group != q4 for qw in (lp.wo, lp.w13, lp.w2)):
            return False
        if q4 % 128:
            return False
        scale_bytes = 0
        for qw in (lp.wqkv, lp.wo, lp.w13, lp.w2):
            kp = qw.values.shape[-1]  # packed K/2
            if kp % q4 or kp % 128:
                return False
            # (Gk, B, D) pre-broadcast group-scale plane per layer
            scale_bytes += (2 * kp // q4) * batch * qw.values.shape[-2] * 4
        # the pipelined scale planes are double-buffered in VMEM alongside
        # the ~12 MB tile pools + attention scratch: keep them under half
        # the 100 MB budget (b=8 x group-128 at 7B shapes would need ~108)
        if 2 * scale_bytes > 48 * 1024 * 1024:
            return False
    from xalm_tpu.models.params import ffn_chunk

    L, DQ, Np = lp.wqkv.values.shape
    N = Np * 2 if q4 else Np
    QD = lp.wo.values.shape[2] * (2 if q4 else 1)
    c13 = ffn_chunk(cfg.hidden_dim)
    h2 = 2 * cfg.hidden_dim
    ta = min(_tile_a(q4), DQ, N, h2)
    if DQ % ta or N % ta or h2 % ta or ta % (2 * c13):
        return False
    # int8 tile second-to-last dims must be 32-row sublane multiples or
    # Mosaic rejects the HBM slices (CLAUDE.md tiling rule); every real
    # family is 128-aligned, this guards exotic debug shapes
    if ta % 32 or _pick_div(N, _TILE_B) % 32:
        return False
    if cfg.head_dim % 2 != 0:
        return False
    # sequence-dim DMA slices (8/32-row insert/sink windows, sb-row flash
    # blocks) must be sublane-tile aligned: S % 8 (f32/bf16) or S % 32
    # (int8) guarantees both (_pick_div(S, 512) then lands on a multiple).
    # The quant path additionally slices the scale planes' LANE (S) dim, so
    # its flash block must be a 128-lane multiple (or the whole window) and
    # its 128-lane scale windows must tile S — KVCache.plane_shape's %32
    # physical padding satisfies all of this for every power-of-two context.
    S = cache_k.shape[3]
    if S < 8 or S % 8:
        return False
    # real Mosaic cannot memref_slice sub-lane-tile trailing dims (the
    # manual DMAs slice (.., hd)/(.., N)-shaped HBM windows); interpret
    # mode (CPU tests) has no such limit, so only gate on the TPU backend
    if lowering_for_tpu() and (
        cfg.head_dim % 128 or N % 128 or DQ % 128 or h2 % 128
        or cfg.hidden_dim % 128 or QD % 128
    ):
        return False
    if quant:
        if S < 32 or S % 32:
            return False
        sb = _pick_div(S, 512)
        if sb != S and sb % 128:
            return False
        if S % min(128, S):
            return False
        # real Mosaic cannot memref_slice a sub-128-lane window out of the
        # (L, B, KH, S) scale planes (lane tile is 128): tiny quant windows
        # run the per-layer path on hardware, interpret mode still covers
        if S % 128 and lowering_for_tpu():
            return False
    if os.environ.get("XALM_NO_MEGAKERNEL"):
        return False
    return True


def embed_fold_supported(cfg, params) -> bool:
    """Can the megakernel gather the embed row + compute rope trig itself?
    Needs a plain bf16 embed table whose vocab is 16-row aligned (the bf16
    HBM window tile)."""
    e = params.embed
    if jnp.dtype(e.values.dtype) != jnp.dtype(jnp.bfloat16) or e.scale is not None:
        return False
    Ve, n = e.values.shape
    if Ve < 16 or Ve % 16:
        return False
    if n % 128 and lowering_for_tpu():
        # Mosaic cannot memref_slice a dynamic sublane window out of a
        # sub-lane-tile (n < 128 or unaligned) HBM table; interpret mode can
        return False
    if os.environ.get("XALM_NO_MK_EMBED"):
        return False
    return True


def wcls_fold_supported(cfg, params) -> bool:
    """Can the megakernel also stream the classifier head (phase 5)?
    Requires an i8 per-row-scaled head (Engine(wcls_i8=True) or an i8-typed
    container head) whose shape tiles like pool A."""
    w = params.wcls
    if w.values.dtype != jnp.int8 or w.scale is None:
        return False
    lp = params.layers
    if lp.w13 is None:
        return False  # MoE FFN (Mixtral): the megakernel is dense-only
    _, DQ, N = lp.wqkv.values.shape
    if lp.wqkv.q4group:
        N *= 2  # packed body: wqkv lanes are K/2, the head stays i8 at N
    H2 = lp.w13.values.shape[1]
    ta = min(_tile_a(lp.wqkv.q4group), DQ, N, H2)
    V, n = w.values.shape
    if n != N or V % ta:
        return False
    if os.environ.get("XALM_NO_MK_WCLS"):
        return False
    return True


def fused_decode_step(
    params,
    cfg,
    x0: jax.Array,  # (B, N) f32 — post-embed residual input
    cache_k: jax.Array,  # (L, B, KH, S, hd) bf16/f32/int8 — updated in place
    cache_v: jax.Array,
    kv_pos: jax.Array,  # (B,) int32, per row (S = dropped write)
    kv_len: jax.Array,  # (B,) int32
    rotate: jax.Array,  # (B,) int32 — sink re-rotation active
    cexp_p: jax.Array,  # (B, hd) f32 — cos at each row's position
    sexp_p: jax.Array,
    cexp1: jax.Array,  # (1, hd) f32 — +1-position rotation (sinks)
    sexp1: jax.Array,
    wcls=None,  # QWeight (V, N) i8 + per-row scale: fold logits in-kernel
    out_norm=None,  # (N,) f32 — required with wcls
    embed=None,  # QWeight (Ve, N) bf16: fold the row gather in-kernel (B=1)
    token=None,  # (1,) int32 — required with embed (x0 then ignored)
    pos=None,  # (1,) int32 — required with embed (rope trig in-kernel)
    freqs=None,  # (hd//2,) rope inverse frequencies — required with embed
    k_scale=None,  # (L, B, KH, S) f32 — int8 caches only; updated in place
    v_scale=None,
    a8: bool = False,  # W8A8 decode: int8 activations, s8xs8 MXU dots
):
    """One full decode-layer-stack step over B <= _MAX_B rows.

    With an int8 cache (``k_scale``/``v_scale`` given) the return tuples
    additionally carry the updated scale planes (..., ck, cv, ks, vs).

    Returns (x (B, N) f32, ck, cv), or — when ``wcls``/``out_norm`` are
    given (see wcls_fold_supported) — (x, logits (B, V) f32, token (B, 128)
    int32 greedy argmax, ck, cv). With ``embed``/``token``/``pos``/
    ``freqs`` (see embed_fold_supported; B == 1 only) the kernel also
    gathers the embed row and computes rope trig itself; ``x0``/``cexp_p``/
    ``sexp_p`` are then unused."""
    lp = params.layers
    q4 = lp.wqkv.q4group  # packed-4-bit body: trailing (contraction) dims
    # carry K/2 bytes; logical dims double back here
    hv = 2 if q4 else 1
    L, DQ, Np = lp.wqkv.values.shape
    N = Np * hv
    QD = lp.wo.values.shape[2] * hv  # wo: (L, N, QD); QD may differ from N
    H2 = lp.w13.values.shape[1]
    H = lp.w2.values.shape[2] * hv
    _, B, KH, S, hd = cache_k.shape
    G = cfg.n_heads // cfg.n_kv_heads
    from xalm_tpu.models.params import ffn_chunk

    c13 = ffn_chunk(cfg.hidden_dim)
    assert DQ == KH * (G + 2) * hd, (DQ, KH, G, hd)
    sb = _pick_div(S, 512)
    TA = min(_tile_a(q4), DQ, N, H2)
    TB = _pick_div(N, _TILE_B)
    cdtype = cache_k.dtype
    quant = k_scale is not None
    if quant:
        assert v_scale is not None and jnp.dtype(cdtype) == jnp.dtype(jnp.int8)
        assert S % 32 == 0 and (sb == S or sb % 128 == 0), (S, sb)
    sw_rows = 32 if quant else min(8, S)
    wsc = min(128, S)
    hq = KH * G
    hq_p = -(-hq // 8) * 8
    clip = cfg.qkv_clip if math.isfinite(cfg.qkv_clip) else None
    interp = interpret_mode()
    nbA = _nbuf((DQ + N + H2) // TA)
    nbB = _nbuf(N // TB)
    fold_wcls = wcls is not None
    fold_embed = embed is not None
    V = wcls.values.shape[0] if fold_wcls else 0
    if fold_wcls:
        assert out_norm is not None
        assert wcls.values.dtype == jnp.int8 and wcls.scale is not None
        assert V % TA == 0 and wcls.values.shape[1] == N, (wcls.values.shape, TA)
    if fold_embed:
        assert B == 1, "embed fold is a b=1 specialization"
        assert token is not None and pos is not None and freqs is not None
        assert embed.values.dtype == jnp.bfloat16 and embed.scale is None
        assert embed.values.shape[0] % 16 == 0 and embed.values.shape[1] == N
    assert 1 <= B <= _MAX_B, B

    zeros = jnp.zeros((B,), jnp.int32)
    # flat (5*B,) scalar-prefetch vector; the kernel indexes [k*B + bi]
    meta = jnp.concatenate(
        [
            jnp.asarray(kv_pos, jnp.int32).reshape(B),
            jnp.asarray(kv_len, jnp.int32).reshape(B),
            jnp.asarray(rotate, jnp.int32).reshape(B),
            jnp.asarray(token, jnp.int32).reshape(B) if fold_embed else zeros,
            jnp.asarray(pos, jnp.int32).reshape(B) if fold_embed else zeros,
        ]
    )

    has_bias = lp.bqkv is not None
    has_qk = lp.q_norm is not None
    has_pn = lp.post_attn_norm is not None
    if has_pn:
        assert lp.post_mlp_norm is not None and QD == N
    kernel = functools.partial(
        _kernel,
        L=L, N=N, DQ=DQ, KH=KH, G=G, hd=hd, QW=QD, H2=H2, S=S, sb=sb,
        TA=TA, TB=TB, c13=c13, eps=cfg.norm_eps, clip=clip, act=cfg.act,
        cdtype=cdtype, B=B, quant=quant, V=V, fold_wcls=fold_wcls,
        fold_embed=fold_embed, ES=float(cfg.embed_scale),
        has_bias=has_bias, has_qk=has_qk, has_pn=has_pn,
        asc=float(cfg.attn_softcap), lsc=float(cfg.logit_softcap),
        a8=a8, q4=q4,
    )
    if q4:
        assert a8, "the q4 body requires int8 activations (a8 decode)"
    const = lambda l, m: (0, 0)
    row = lambda l, m: (l, 0, 0)
    hd_spec = pl.BlockSpec((1, hd), const, memory_space=pltpu.VMEM)
    bhd_spec = pl.BlockSpec((B, hd), const, memory_space=pltpu.VMEM)
    vm_specs = [] if fold_embed else [
        pl.BlockSpec((B, N), const, memory_space=pltpu.VMEM),  # x0
        bhd_spec, bhd_spec,  # cexp_p, sexp_p (per-row positions)
    ]
    vm_specs += [hd_spec, hd_spec]  # c1, s1
    if fold_embed:
        vm_specs.append(hd_spec)  # pair-repeated freqs
    if q4:
        # per-(row, group) scale planes: (Gk, B, X) per layer, one plane
        # per contraction group (Gk = K // q4group per weight)
        row4 = lambda l, m: (l, 0, 0, 0)

        def _gspec(x_dim, k_dim):
            return pl.BlockSpec(
                (1, k_dim // q4, B, x_dim), row4, memory_space=pltpu.VMEM
            )

        scale_specs = [
            _gspec(DQ, N), _gspec(N, QD), _gspec(H2, N), _gspec(N, H),
        ]
    else:
        # per-tile-sliced scale rows ride pre-broadcast (B, X) blocks (see
        # the kernel comment at phase 1)
        scale_specs = [
            pl.BlockSpec((1, B, DQ), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, N), row, memory_space=pltpu.VMEM),
        ]
    vm_specs += [
        pl.BlockSpec((1, 1, N), row, memory_space=pltpu.VMEM),  # attn_norm
        pl.BlockSpec((1, 1, N), row, memory_space=pltpu.VMEM),  # mlp_norm
    ] + scale_specs
    if has_bias:
        vm_specs.append(pl.BlockSpec((1, B, DQ), row, memory_space=pltpu.VMEM))
    if has_qk:
        vm_specs += [
            pl.BlockSpec((1, 1, hd), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), row, memory_space=pltpu.VMEM),
        ]
    if has_pn:
        vm_specs += [
            pl.BlockSpec((1, 1, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), row, memory_space=pltpu.VMEM),
        ]
    if fold_wcls:
        vm_specs += [
            pl.BlockSpec((1, N), const, memory_space=pltpu.VMEM),  # out_norm
            pl.BlockSpec((B, V), const, memory_space=pltpu.VMEM),  # wcls scale
        ]
    n_alias = 4 if quant else 2  # caches (+ scale planes) alias in-place
    n_any = 4 + n_alias + (1 if fold_wcls else 0) + (1 if fold_embed else 0)
    out_specs = [pl.BlockSpec((B, N), const, memory_space=pltpu.VMEM)]
    if fold_wcls:
        out_specs.append(pl.BlockSpec((B, V), const, memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec((B, 128), const, memory_space=pltpu.VMEM))
    out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_alias
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=vm_specs + [pl.BlockSpec(memory_space=pl.ANY)] * n_any,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, N), jnp.float32),  # x residual
            # pool A (wqkv/wo/w13[/wcls]): q4 bodies stream K/2-lane packed
            # tiles, the i8 head needs full N lanes
            pltpu.VMEM(
                (nbA, TA,
                 max([N // hv, QD // hv] + ([N] if fold_wcls else []))),
                jnp.int8,
            ),
            pltpu.VMEM((nbB, TB, H // hv), jnp.int8),  # pool B (w2)
            pltpu.VMEM((2, KH, sb, hd), cdtype),  # K blocks (row-serial)
            pltpu.VMEM((2, KH, sb, hd), cdtype),  # V blocks (row-serial)
            pltpu.VMEM((KH, sw_rows, hd), cdtype),  # sink window
            pltpu.VMEM((KH, sw_rows, hd), cdtype),  # K insert window
            pltpu.VMEM((KH, sw_rows, hd), cdtype),  # V insert window
            pltpu.VMEM((KH, B, hd), cdtype),  # K rows to insert
            pltpu.VMEM((KH, B, hd), cdtype),  # V rows to insert
            pltpu.VMEM((hq_p, hd), jnp.float32),  # flash acc (row-serial)
            pltpu.VMEM((hq_p, 128), jnp.float32),  # flash m
            pltpu.VMEM((hq_p, 128), jnp.float32),  # flash l
            pltpu.VMEM((B, H), jnp.float32),  # act
            pltpu.VMEM((B, QD), jnp.float32),  # attention out rows
            pltpu.VMEM((hq_p, hd), jnp.float32),  # q rows (row-serial)
        ]
        + ([pltpu.VMEM((B, N), jnp.float32)] if has_pn else [])  # ffn out
        + ([
            pltpu.VMEM((2, KH, sb), jnp.float32),  # K scale flash blocks
            pltpu.VMEM((2, KH, sb), jnp.float32),  # V scale flash blocks
            pltpu.VMEM((KH, B, 1), jnp.float32),  # new K row scales
            pltpu.VMEM((KH, B, 1), jnp.float32),  # new V row scales
            pltpu.VMEM((KH, wsc), jnp.float32),  # K scale window 0 (sinks)
            pltpu.VMEM((KH, wsc), jnp.float32),  # K scale insert window
            pltpu.VMEM((KH, wsc), jnp.float32),  # V scale window
        ] if quant else [])
        + ([pltpu.VMEM((16, N), jnp.bfloat16)] if fold_embed else [])  # embed win
        + [
            pltpu.SemaphoreType.DMA((nbA,)),  # pool A
            pltpu.SemaphoreType.DMA((nbB,)),  # pool B
            pltpu.SemaphoreType.DMA((2,)),  # k blocks
            pltpu.SemaphoreType.DMA((2,)),  # v blocks
            pltpu.SemaphoreType.DMA(()),  # k window rmw
            pltpu.SemaphoreType.DMA(()),  # v window rmw
            pltpu.SemaphoreType.DMA(()),  # sink rmw
        ]
        + ([
            pltpu.SemaphoreType.DMA((2,)),  # k scale blocks
            pltpu.SemaphoreType.DMA((2,)),  # v scale blocks
            pltpu.SemaphoreType.DMA(()),  # k scale window 0
            pltpu.SemaphoreType.DMA(()),  # k scale insert window
            pltpu.SemaphoreType.DMA(()),  # v scale window
        ] if quant else [])
        + ([pltpu.SemaphoreType.DMA(())] if fold_embed else []),  # embed win
    )
    weight_bytes = (
        lp.wqkv.values.nbytes + lp.wo.values.nbytes
        + lp.w13.values.nbytes + lp.w2.values.nbytes
    )
    out_shape = [jax.ShapeDtypeStruct((B, N), jnp.float32)]
    if fold_wcls:
        out_shape.append(jax.ShapeDtypeStruct((B, V), jnp.float32))
        out_shape.append(jax.ShapeDtypeStruct((B, 128), jnp.int32))
    out_shape += [
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
    ]
    if quant:
        out_shape += [
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ]
    # input indices counted incl. the scalar-prefetch arg; the caches (and
    # scale planes when quant) are the last inputs and alias the last
    # outputs (in-place update)
    n_in = 1 + len(vm_specs) + n_any
    n_out = len(out_shape)
    aliases = {n_in - i: n_out - i for i in range(1, n_alias + 1)}
    call_args = [meta]
    if not fold_embed:
        call_args += [x0, cexp_p, sexp_p]
    call_args += [cexp1, sexp1]
    if fold_embed:
        call_args.append(
            jnp.repeat(jnp.asarray(freqs, jnp.float32).reshape(1, -1), 2, axis=-1)
        )
    def _rows_b(a, w):  # (L, w) -> (L, B, w) materialized (scales are
        # ~0.6% of step bytes even at B=8; B=1 is a plain reshape)
        return jnp.broadcast_to(
            a.reshape(L, 1, w).astype(jnp.float32), (L, B, w)
        )

    def _rows_g(a, w, k):  # q4: (L, w, Gk) -> (L, Gk, B, w) group planes
        gk = k // q4
        t = jnp.transpose(a.astype(jnp.float32), (0, 2, 1))  # (L, Gk, w)
        return jnp.broadcast_to(t.reshape(L, gk, 1, w), (L, gk, B, w))

    call_args += [
        lp.attn_norm.reshape(L, 1, N).astype(jnp.float32),
        lp.mlp_norm.reshape(L, 1, N).astype(jnp.float32),
    ]
    if q4:
        call_args += [
            _rows_g(lp.wqkv.scale, DQ, N),
            _rows_g(lp.wo.scale, N, QD),
            _rows_g(lp.w13.scale, H2, N),
            _rows_g(lp.w2.scale, N, H),
        ]
    else:
        call_args += [
            _rows_b(lp.wqkv.scale, DQ),
            _rows_b(lp.wo.scale, N),
            _rows_b(lp.w13.scale, H2),
            _rows_b(lp.w2.scale, N),
        ]
    if has_bias:
        call_args.append(_rows_b(lp.bqkv, DQ))
    if has_qk:
        call_args += [
            lp.q_norm.reshape(L, 1, hd).astype(jnp.float32),
            lp.k_norm.reshape(L, 1, hd).astype(jnp.float32),
        ]
    if has_pn:
        call_args += [
            lp.post_attn_norm.reshape(L, 1, N).astype(jnp.float32),
            lp.post_mlp_norm.reshape(L, 1, N).astype(jnp.float32),
        ]
    if fold_wcls:
        call_args += [
            jnp.asarray(out_norm, jnp.float32).reshape(1, N),
            jnp.broadcast_to(
                jnp.asarray(wcls.scale, jnp.float32).reshape(1, V), (B, V)
            ),
        ]
    call_args += [
        lp.wqkv.values,
        lp.wo.values,
        lp.w13.values,
        lp.w2.values,
    ]
    if fold_wcls:
        call_args.append(wcls.values)
    if fold_embed:
        call_args.append(embed.values)
    call_args += [cache_k, cache_v]
    if quant:
        call_args += [k_scale, v_scale]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (DQ * N + N * QD + H2 * N + N * H) * L
            + (2 * B * V * N if fold_wcls else 0),
            bytes_accessed=weight_bytes
            + (wcls.values.nbytes if fold_wcls else 0),
            transcendentals=0,
        ),
        interpret=interp,
    )(*call_args)
    return outs
