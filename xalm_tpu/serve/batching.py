"""Continuous batching: slot-based scheduler over a fixed-batch decode step.

The reference decodes a single sequence (batch=1 loop, reference
main.cpp:105-115); this is the multi-sequence serving layer the BASELINE
targets ("continuous batching across hosts"). Design:

- The KV cache is allocated once for ``max_batch`` slots; sequences are
  admitted into free slots and retired on EOS/completion without ever
  reshaping or recompiling the decode step (static shapes — XLA-friendly).
- Idle/prefilling slots are masked with the forward's ``valid`` mechanism
  (their KV writes drop out-of-bounds, their logits are ignored).
- **Prefill is incremental, budgeted, and packed**: each scheduler tick
  advances EVERY admitting request by one chunk of at most
  ``prefill_budget`` tokens in a single valid-masked step call (positions
  are per-sequence vectors, so rows at different prompt offsets share the
  dispatch), then runs a decode segment for every active slot — a long
  prompt never stalls active decodes for more than one chunk width, and
  concurrent admissions no longer serialize their prefills.
- Greedy sampling, matching the reference's argmax semantics.

The decode scan valid-masks every non-decoding slot (free or
mid-prefill): an unmasked junk decode would advance through the ring and —
for prompts at or past the window — wrap into live slots and re-rotate
sinks. Masked rows neither write KV nor rotate (the forward's sentinel
mechanism).

Works with both the single-chip Engine and the ShardedEngine (dp shards the
slot dimension).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from xalm_tpu.runtime.engine import Engine, _bucket

__all__ = ["Request", "ContinuousBatcher"]


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_lane(cache, dst, src):
    """Copy one batch lane's KV (+ scale planes) onto another, in place on
    the donated cache (prefix caching; ~1.3 ms for a full 7B lane)."""

    def cp(x):
        return None if x is None else x.at[:, dst].set(x[:, src])

    return jax.tree.map(cp, cache, is_leaf=lambda x: x is None)

# widest packed prefill call: the engine's largest compiled chunk bucket —
# a single tick can then use the big buckets instead of paying up to 8x the
# dispatches at the old 64 cap; the per-tick stall bound stays prefill_budget
from xalm_tpu.runtime.engine import _CHUNK_BUCKETS as _ENGINE_BUCKETS

_MAX_CHUNK = _ENGINE_BUCKETS[-1]


@dataclasses.dataclass
class Request:
    prompt_ids: list[int]
    max_new_tokens: int = 128
    on_token: Callable[[int], None] | None = None
    stop_on_eos: bool = True
    # per-request sampling (0 = greedy): each slot carries its own PRNG key,
    # so a request's stream is deterministic under its seed regardless of
    # which requests it is co-batched with (sampler.sample_rows)
    temperature: float = 0.0
    top_p: float = 1.0
    seed: int | None = None
    # OpenAI-style logprobs: 0 = off; N>0 collects the chosen token's
    # logprob plus min(N, 5) top alternatives per generated token
    logprobs: int = 0
    out_logprobs: list[float] = dataclasses.field(default_factory=list)
    out_top_logprobs: list[list[tuple[int, float]]] = dataclasses.field(
        default_factory=list
    )
    # filled by the batcher
    id: int = -1
    out_tokens: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    submitted_s: float = 0.0
    admitted_s: float = 0.0  # prefill start (slot assigned)
    first_token_s: float = 0.0  # first generated token delivered
    finished_s: float = 0.0


class ContinuousBatcher:
    def __init__(
        self,
        engine: Engine,
        max_batch: int = 8,
        segment: int | None = None,
        prefill_budget: int = 256,
    ):
        """``segment``: decode steps per scheduler tick. >1 runs a device-side
        scan between admission/retirement checks (dispatch latency amortizes
        ~segment-fold; EOS latency grows by at most segment-1 steps — greedy
        output is unchanged). Defaults to 8 on TPU, 1 elsewhere.

        ``prefill_budget``: max prompt tokens advanced per tick — the bound
        on how long active decodes stall behind an admitting prompt."""
        import jax

        self.engine = engine
        self.max_batch = max_batch
        if segment is None:
            segment = 8 if jax.default_backend() == "tpu" else 1
        self.segment = max(1, segment)
        self.prefill_budget = max(1, prefill_budget)
        self.cache = engine.new_cache(max_batch)
        self.slots: list[Request | None] = [None] * max_batch
        self._pos = np.zeros(max_batch, np.int32)  # next position per slot
        self._next_tok = np.zeros(max_batch, np.int32)  # token to feed next
        # prefill frontier per slot; -1 = slot is decoding (or free)
        self._prefill_pos = np.full(max_batch, -1, np.int32)
        # per-slot sampling state (temperature 0 rows decode greedily).
        # DEVICE-RESIDENT across decode ticks: uploading keys/temps/top_ps
        # and reading keys back every tick cost 4 tunnel round-trips
        # (~10 ms each) — ~40 % of a segment-8 tick at 7B. The numpy
        # copies are authoritative only between _samp_sync() (device ->
        # host, lazy) and the next _samp_upload() (host -> device, only
        # after host-side mutation at admission / first-token probes).
        self._pend_lp = [None] * max_batch  # pending token's logprob
        self._pend_top = [None] * max_batch  # pending token's top-5 alts
        self._keys = np.zeros((max_batch, 2), np.uint32)
        self._temps = np.zeros(max_batch, np.float32)
        self._top_ps = np.ones(max_batch, np.float32)
        self._keys_dev = None  # freshest keys live HERE when not None
        self._samp_dev = None  # (temps_dev, top_ps_dev) cache
        self._waiting: list[Request] = []
        self._next_id = 0
        self.completed: list[Request] = []
        self.decode_steps = 0
        self.decoded_tokens = 0
        self.prefix_hits = 0
        self.prefix_tokens_saved = 0

    # ------------------------------------------------- sampling-state sync
    def _samp_np(self) -> np.ndarray:
        """Host view of the per-slot PRNG keys, syncing from the device
        copy if that is fresher. Call BEFORE any host-side key mutation;
        the mutation then invalidates the device copy."""
        if self._keys_dev is not None:
            self._keys = np.array(self._keys_dev)
            self._keys_dev = None
        return self._keys

    def _samp_dirty(self) -> None:
        """Host-side temps/top_ps changed (admission/retire): re-upload
        lazily at the next sampled tick."""
        self._samp_dev = None

    # ------------------------------------------------------------- warmup

    def warmup(self, sampled: bool = True, logprobs: bool = True) -> float:
        """Load/compile every program the serving loop can hit, BEFORE
        traffic. Returns seconds spent.

        On a remote-attach device even persistently-CACHED executables pay
        a per-program load when first invoked (measured: a mixed sampled
        workload touches ~74 programs whose lazy loads added ~45 s across
        the first requests' TTFT at 7B). Every call here is fully
        valid-masked — no slot state or KV row changes (masked rows hit
        the kv_pos sentinel, and masked sampling rows do not consume
        PRNG state).
        """
        t0 = time.perf_counter()
        b = self.max_batch
        chunk = min(self.prefill_budget, _MAX_CHUNK)
        # packed prefill chunks at every bucket the scheduler can emit
        for t in sorted({1, *[x for x in _ENGINE_BUCKETS if x <= chunk]}):
            _, self.cache = self.engine.step(
                np.zeros((b, t), np.int32), np.zeros(b, np.int32), self.cache,
                jnp.asarray(np.zeros((b, t), bool)), logits_mode="none",
            )
        # finishing probe (t=1, full logits)
        probe, self.cache = self.engine.step(
            np.zeros((b, 1), np.int32), np.zeros(b, np.int32), self.cache,
            jnp.asarray(np.zeros((b, 1), bool)), logits_mode="last",
        )
        np.asarray(probe[:1, :1])
        mask = np.zeros(b, bool)
        out, self.cache = self.engine.decode_scan(
            self._next_tok.copy(), self._pos.copy(), self.cache,
            self.segment, valid=mask,
        )
        np.asarray(out)
        if sampled and getattr(self.engine, "_sample_scan_rows", None) is not None:
            keys = jnp.zeros((b, 2), jnp.uint32)
            temps = jnp.zeros((b,), jnp.float32)
            tps = jnp.ones((b,), jnp.float32)
            for lp in (False, True) if logprobs else (False,):
                outs = self.engine._sample_scan_rows(
                    self.engine.params, self._next_tok.copy(),
                    self._pos.copy(), self.cache, keys, temps, tps,
                    n_steps=self.segment, valid=jnp.asarray(mask), want_lp=lp,
                )
                self.cache = outs[-1]
                np.asarray(outs[0])
            # the batched first-token pass runs eagerly at the full
            # padded batch — touch both its variants
            from xalm_tpu.sampler import sample_rows

            np.asarray(jax.vmap(lambda k: jax.random.split(k, 2))(keys))
            np.asarray(sample_rows(probe, keys, temps, tps))
            if logprobs:
                for o in jax.device_get(
                    sample_rows(probe, keys, temps, tps, return_logprobs=True)
                ):
                    pass
            np.asarray(jnp.argmax(probe, -1))
        return time.perf_counter() - t0

    # ------------------------------------------------------------- lifecycle

    def submit(self, req: Request) -> int:
        if (req.temperature > 0 or req.logprobs) and (
            getattr(self.engine, "_sample_scan_rows", None) is None
        ):
            raise NotImplementedError(
                "this engine has no per-row sampled scan (PipelinedEngine): "
                "submit greedy requests without logprobs"
            )
        req.id = self._next_id
        req.submitted_s = time.perf_counter()
        self._next_id += 1
        self._waiting.append(req)
        return req.id

    @property
    def active(self) -> int:
        return sum(s is not None for s in self.slots)

    @property
    def pending(self) -> int:
        return len(self._waiting)

    def cancel(self, req_id: int) -> bool:
        """Stop a request early (client disconnect / server-side stop
        sequence). Must be called from the scheduler thread (like step).
        The request still lands in ``completed`` with whatever it emitted."""
        for j, r in enumerate(self._waiting):
            if r.id == req_id:
                self._waiting.pop(j)
                r.done = True
                r.finished_s = time.perf_counter()
                self.completed.append(r)
                return True
        for i, r in enumerate(self.slots):
            if r is not None and r.id == req_id:
                self._retire(i)
                return True
        return False

    def _shared_prefix(self, req: Request) -> tuple[int, int]:
        """Longest already-prefilled common prompt prefix among ACTIVE slots
        (automatic prefix caching: a repeated system prompt's KV rows copy
        lane-to-lane instead of recomputing). Pre-wrap only — past the ring
        boundary position->slot mapping depends on history. Returns
        (src_slot, shared_tokens); (-1, 0) when nothing usable."""
        best, best_n = -1, 0
        s = self.engine.cfg.max_seq_len
        for j, r in enumerate(self.slots):
            if r is None or int(self._pos[j]) >= s:
                continue  # a wrapped src has clobbered its early prompt rows
            pj = r.prompt_ids
            # rows are valid up to the src's prefill frontier (or the whole
            # prompt once it is decoding)
            avail = len(pj) if self._prefill_pos[j] < 0 else int(self._prefill_pos[j])
            n = 0
            lim = min(len(req.prompt_ids) - 1, avail, s - 1)
            while n < lim and req.prompt_ids[n] == pj[n]:
                n += 1
            if n > best_n:
                best, best_n = j, n
        return (best, best_n) if best_n >= self._PREFIX_MIN else (-1, 0)

    _PREFIX_MIN = 16  # below this the lane copy costs more than it saves

    def _admit(self) -> None:
        for i in range(self.max_batch):
            if self.slots[i] is None and self._waiting:
                req = self._waiting.pop(0)
                req.admitted_s = time.perf_counter()
                src, shared = self._shared_prefix(req)
                self.slots[i] = req
                self._prefill_pos[i] = 0
                self._pos[i] = 0
                if src >= 0:
                    # copy the src lane's KV (rows beyond `shared` are junk
                    # the kv_len masking never exposes; they are rewritten
                    # as this slot prefills/decodes past them)
                    self.cache = _copy_lane(self.cache, i, src)
                    self._prefill_pos[i] = shared
                    self._pos[i] = shared
                    self.prefix_hits += 1
                    self.prefix_tokens_saved += shared
                self._temps[i] = max(req.temperature, 0.0)
                self._top_ps[i] = req.top_p
                self._samp_dirty()
                if req.temperature > 0:
                    import jax

                    seed = req.seed if req.seed is not None else req.id
                    self._samp_np()[i] = np.asarray(jax.random.PRNGKey(seed))

    def _prefill_tick(self, slots: list[int]) -> None:
        """Advance EVERY admitting slot by one budgeted chunk in one packed,
        valid-masked step call (per-sequence position vectors let rows sit at
        different prompt offsets; the one-slot-per-tick design left B-1 rows
        of each chunk call as masked padding). Slots whose padded bucket
        would cross the ring boundary fall back to a solo exact-width call
        (rare: prompt at/past the window)."""
        s = self.engine.cfg.max_seq_len
        chunk = min(self.prefill_budget, _MAX_CHUNK)
        plan = []  # (slot, pos, t)
        for i in slots:
            pos = int(self._prefill_pos[i])
            n = len(self.slots[i].prompt_ids)
            if pos + 1 >= s and n - pos > 1:
                t = 1  # ring would wrap: per-token stepping
            else:
                t = min(n - pos, chunk, max(s - pos, 1))
            plan.append((i, pos, t))
        # bucket the packed call's shape (padding masked by `valid`): every
        # distinct (B, T) is a separately compiled program, and random prompt
        # lengths would otherwise compile one per tail remainder. Same bucket
        # series as Engine.prefill.
        bucket = min(_bucket(max(t for _, _, t in plan)), chunk)
        packed = [e for e in plan if e[1] + bucket <= s]
        solo = [e for e in plan if e[1] + bucket > s]
        if packed:
            self._prefill_call(packed, bucket)
        for e in solo:
            # exact width: padding must never cross the ring boundary (the
            # contiguous chunk write clamps its window start, which would
            # misplace valid rows)
            self._prefill_call([e], e[2])

    def _prefill_call(self, entries: list[tuple[int, int, int]], bucket: int) -> None:
        b = self.max_batch
        tokens = np.zeros((b, bucket), np.int32)
        valid = np.zeros((b, bucket), bool)
        posv = self._pos.copy()
        finishing = []
        for i, pos, t in entries:
            ids = self.slots[i].prompt_ids
            tokens[i, :t] = ids[pos : pos + t]
            valid[i, :t] = True
            posv[i] = pos
            if pos + t >= len(ids):
                finishing.append((i, t))
        _, self.cache = self.engine.step(
            tokens, posv, self.cache, jnp.asarray(valid), logits_mode="none"
        )
        if finishing:
            # next-token logits for the finishing rows via ONE (B, 1)
            # "last" call re-feeding each row's final prompt token at its
            # final position with every write masked off (the packed call
            # above already wrote that KV; kv_len lets the row attend to
            # itself). The old logits_mode="all" computed the head over the
            # whole (B, bucket, vocab) block — ~0.5 GB of f32 logits per
            # finishing tick at 7B shapes — for one needed row each.
            toks2 = np.zeros((b, 1), np.int32)
            pos2 = posv.copy()
            for i, t in finishing:
                ids_i = self.slots[i].prompt_ids
                toks2[i, 0] = ids_i[-1]
                pos2[i] = len(ids_i) - 1
            import os as _os2
            _t_pr0 = time.perf_counter()
            probe, self.cache = self.engine.step(
                toks2, pos2, self.cache,
                jnp.asarray(np.zeros((b, 1), bool)),
                logits_mode="last",
            )  # (B, vocab)
            if _os2.environ.get("XALM_SERVE_TRACE"):
                np.asarray(probe[:1, :1])
                print(f"[tick] probe step x{len(finishing)} "
                      f"{1e3*(time.perf_counter()-_t_pr0):.1f}ms", flush=True)
        if finishing:
            # ONE batched first-token pass for every finishing slot, PADDED
            # to the full batch so the shape is static: the old per-slot
            # loop dispatched 3-5 tiny device ops per request (~30-60 ms
            # each through a remote-attach link), and a rows-sized batch
            # would compile/load one program per finishing-count.
            from xalm_tpu.sampler import sample_rows

            rows = [i for i, _ in finishing]
            any_sampled = any(self.slots[i].temperature > 0 for i in rows)
            any_lp = any(self.slots[i].logprobs for i in rows)
            if any_sampled or any_lp:
                kall = self._samp_np()
                both = jax.vmap(lambda k: jax.random.split(k, 2))(
                    jnp.asarray(kall)
                )  # (b, 2, 2); only finishing rows' advances are kept
                outs = sample_rows(
                    probe, both[:, 0],
                    jnp.asarray(self._temps), jnp.asarray(self._top_ps),
                    return_logprobs=any_lp,
                )
                if any_lp:
                    draw, lp1, top1v, top1i = jax.device_get(outs)
                else:
                    draw = np.asarray(outs)
                    lp1 = top1v = top1i = None
                adv = np.asarray(both[:, 1])
                kall[rows] = adv[rows]  # non-finishing keys stay untouched
            else:
                draw = np.asarray(jnp.argmax(probe, -1))
                lp1 = top1v = top1i = None
            for i in rows:
                self._next_tok[i] = int(draw[i])
                if self.slots[i].logprobs and lp1 is not None:
                    self._pend_lp[i] = float(lp1[i])
                    self._pend_top[i] = list(
                        zip(top1i[i].tolist(), top1v[i].tolist())
                    )
                else:
                    self._pend_lp[i] = self._pend_top[i] = None
        for i, pos, t in entries:
            n = len(self.slots[i].prompt_ids)
            done = pos + t >= n
            self._prefill_pos[i] = -1 if done else pos + t
            self._pos[i] = n if done else pos + t

    def _retire(self, slot: int) -> None:
        req = self.slots[slot]
        req.done = True
        req.finished_s = time.perf_counter()
        self.completed.append(req)
        self.slots[slot] = None
        self._prefill_pos[slot] = -1

    def _emit(self, slot: int, tok: int, lp=None, top=None) -> bool:
        """Deliver one generated token; returns True if the request stops."""
        req = self.slots[slot]
        if not req.out_tokens:
            req.first_token_s = time.perf_counter()
        req.out_tokens.append(tok)
        if req.logprobs and lp is not None:
            req.out_logprobs.append(float(lp))
            req.out_top_logprobs.append(top[: min(req.logprobs, 5)] if top else [])
        if req.on_token:
            req.on_token(tok)
        stop = (
            req.stop_on_eos
            and self.engine.tokenizer is not None
            and self.engine.tokenizer.is_stop(tok)
        )
        return stop or len(req.out_tokens) >= req.max_new_tokens

    # ------------------------------------------------------------------ tick

    def step(self) -> bool:
        """One scheduler tick: admit -> packed budgeted prefill chunks ->
        batched decode segment -> retire. Returns False when nothing is left
        to do."""
        import os as _os
        trace = _os.environ.get("XALM_SERVE_TRACE")
        t0 = time.perf_counter()
        self._admit()
        t_admit = time.perf_counter()
        prefilling = [
            i for i, s in enumerate(self.slots)
            if s is not None and self._prefill_pos[i] >= 0
        ]
        if prefilling:
            # one budgeted chunk for every admitting request, packed into a
            # single masked call (decode below still runs)
            self._prefill_tick(prefilling)
        if trace:
            t_pf = time.perf_counter()
            print(f"[tick] admit {1e3*(t_admit-t0):.1f}ms prefill({len(prefilling)}) "
                  f"{1e3*(t_pf-t_admit):.1f}ms", flush=True)

        decoding = [
            i for i, s in enumerate(self.slots)
            if s is not None and self._prefill_pos[i] < 0
        ]
        if not decoding:
            return bool(self._waiting) or any(s is not None for s in self.slots)

        # each decoding slot's _next_tok is its freshly sampled token: emit it
        for i in decoding:
            if self._emit(i, int(self._next_tok[i]),
                          lp=self._pend_lp[i], top=self._pend_top[i]):
                self._retire(i)
        decoding = [
            i for i, s in enumerate(self.slots)
            if s is not None and self._prefill_pos[i] < 0
        ]
        if not decoding:
            return (
                bool(self._waiting)
                or any(s is not None for s in self.slots)
            )

        b = self.max_batch
        import os as _os
        _t_dec0 = time.perf_counter()
        sampling = any(
            self.slots[i].temperature > 0 or self.slots[i].logprobs
            for i in decoding
        )
        if self.segment > 1 or sampling:
            # device-side scan: all slots step `segment` tokens in one
            # dispatch. Non-decoding rows are valid-masked — they must not
            # write: a free or mid-prefill slot's junk decode would advance
            # through the ring and, once its position passed the window,
            # clobber live KV and re-rotate sinks (found by review: a long
            # prompt admitted mid-flight corrupted neighbors' generations).
            mask = np.zeros(b, bool)
            mask[decoding] = True
            lps = topv = topi = None
            if sampling:
                # mixed batch: per-row keyed sampling (greedy rows ride
                # temperature 0 through the same scan); the logprobs surface
                # is gated statically — no vocab-wide softmax unless asked
                want_lp = any(self.slots[i].logprobs for i in decoding)
                if self._samp_dev is None:
                    self._samp_dev = (
                        jnp.asarray(self._temps), jnp.asarray(self._top_ps)
                    )
                keys_dev = (
                    self._keys_dev if self._keys_dev is not None
                    else jnp.asarray(self._keys)
                )
                outs = self.engine._sample_scan_rows(
                    self.engine.params, self._next_tok.copy(),
                    self._pos.copy(), self.cache, keys_dev,
                    self._samp_dev[0], self._samp_dev[1],
                    n_steps=self.segment, valid=jnp.asarray(mask),
                    want_lp=want_lp,
                )
                if want_lp:
                    out, lps, topv, topi, keys, self.cache = outs
                    # one batched fetch instead of three sequential ~10 ms
                    # round-trips per tick
                    lps, topv, topi = jax.device_get((lps, topv, topi))
                else:
                    out, keys, self.cache = outs
                self._keys_dev = keys  # stays on device; host syncs lazily
            else:
                out, self.cache = self.engine.decode_scan(
                    self._next_tok.copy(), self._pos.copy(), self.cache,
                    self.segment, valid=mask,
                )
            out = np.asarray(out)
            if _os.environ.get("XALM_SERVE_TRACE"):
                print(f"[tick] decode seg{self.segment} x{len(decoding)} "
                      f"{1e3*(time.perf_counter()-_t_dec0):.1f}ms "
                      f"(sampling={sampling})", flush=True)

            def tt(i, j):
                if topi is None:
                    return None, None
                return lps[i, j], list(zip(topi[i, j].tolist(), topv[i, j].tolist()))

            delivered = 0
            for i in decoding:
                stopped = False
                # emit all but the last sampled token; the last becomes the
                # pending _next_tok (emitted at the next tick, like tick start)
                for j, tok in enumerate(out[i, :-1]):
                    delivered += 1
                    lp_j, top_j = tt(i, j)
                    if self._emit(i, int(tok), lp=lp_j, top=top_j):
                        stopped = True
                        break
                if stopped:
                    self._retire(i)
                else:
                    self._next_tok[i] = int(out[i, -1])
                    self._pend_lp[i], self._pend_top[i] = tt(i, self.segment - 1)
                    self._pos[i] += self.segment
                    delivered += 1  # the pending token, emitted next tick
            self.decode_steps += self.segment
            self.decoded_tokens += delivered
            return True

        valid = np.zeros((b, 1), bool)
        valid[decoding] = True
        tokens = self._next_tok.reshape(b, 1).copy()
        logits, self.cache = self.engine.step(
            tokens, self._pos.copy(), self.cache, jnp.asarray(valid), logits_mode="last"
        )
        logits = np.asarray(logits)
        for i in decoding:
            self._next_tok[i] = int(np.argmax(logits[i]))
            self._pend_lp[i], self._pend_top[i] = None, None
            self._pos[i] += 1
        self.decode_steps += 1
        self.decoded_tokens += len(decoding)
        return True

    def run(self) -> list[Request]:
        """Drain all submitted requests to completion."""
        while self.step():
            pass
        return self.completed

    # ------------------------------------------------------------- reporting

    def latency_stats(self) -> dict:
        """p50/p95 serving latencies over completed requests (seconds):
        queue wait (submit -> slot), time-to-first-token (submit -> first
        generated token), and per-token decode latency."""
        done = [r for r in self.completed if r.out_tokens]
        if not done:
            return {}

        def pct(vals, q):
            return float(np.percentile(np.asarray(vals), q))

        queue = [r.admitted_s - r.submitted_s for r in done]
        ttft = [r.first_token_s - r.submitted_s for r in done]
        tok_lat = [
            (r.finished_s - r.first_token_s) / max(len(r.out_tokens) - 1, 1)
            for r in done
        ]
        return {
            "completed": len(done),
            "queue_wait_p50_s": pct(queue, 50),
            "queue_wait_p95_s": pct(queue, 95),
            "ttft_p50_s": pct(ttft, 50),
            "ttft_p95_s": pct(ttft, 95),
            "tok_latency_p50_s": pct(tok_lat, 50),
            "tok_latency_p95_s": pct(tok_lat, 95),
        }
