"""Continuous batching: slot-based scheduler over a fixed-batch decode step.

The reference decodes a single sequence (batch=1 loop, reference
main.cpp:105-115); this is the multi-sequence serving layer the BASELINE
targets ("continuous batching across hosts"). Design:

- The KV cache is allocated once for ``max_batch`` slots; sequences are
  admitted into free slots and retired on EOS/completion without ever
  reshaping or recompiling the decode step (static shapes — XLA-friendly).
- Idle/prefilling slots are masked with the forward's ``valid`` mechanism
  (their KV writes drop out-of-bounds, their logits are ignored).
- Prompt prefill reuses the batched step with only the admitted slot valid;
  decode runs all active slots in one call per token.
- Greedy sampling, matching the reference's argmax semantics.

Works with both the single-chip Engine and the ShardedEngine (dp shards the
slot dimension).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax.numpy as jnp
import numpy as np

from xalm_tpu.runtime.engine import Engine

__all__ = ["Request", "ContinuousBatcher"]

_CHUNK = 64


@dataclasses.dataclass
class Request:
    prompt_ids: list[int]
    max_new_tokens: int = 128
    on_token: Callable[[int], None] | None = None
    stop_on_eos: bool = True
    # filled by the batcher
    id: int = -1
    out_tokens: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    submitted_s: float = 0.0
    finished_s: float = 0.0


class ContinuousBatcher:
    def __init__(self, engine: Engine, max_batch: int = 8, segment: int | None = None):
        """``segment``: decode steps per scheduler tick. >1 runs a device-side
        scan between admission/retirement checks (dispatch latency amortizes
        ~segment-fold; EOS latency grows by at most segment-1 steps — greedy
        output is unchanged). Defaults to 8 on TPU, 1 elsewhere."""
        import jax

        self.engine = engine
        self.max_batch = max_batch
        if segment is None:
            segment = 8 if jax.default_backend() == "tpu" else 1
        self.segment = max(1, segment)
        self.cache = engine.new_cache(max_batch)
        self.slots: list[Request | None] = [None] * max_batch
        self._pos = np.zeros(max_batch, np.int32)  # next position per slot
        self._next_tok = np.zeros(max_batch, np.int32)  # token to feed next
        self._needs_prefill: list[Request] = []
        self._waiting: list[Request] = []
        self._next_id = 0
        self.completed: list[Request] = []
        self.decode_steps = 0
        self.decoded_tokens = 0

    # ------------------------------------------------------------- lifecycle

    def submit(self, req: Request) -> int:
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

    def _admit(self) -> None:
        for i in range(self.max_batch):
            if self.slots[i] is None and self._waiting:
                req = self._waiting.pop(0)
                self.slots[i] = req
                self._prefill_slot(i, req)

    def _prefill_slot(self, slot: int, req: Request) -> None:
        """Chunked prefill of one slot; other slots are valid-masked out."""
        ids = req.prompt_ids
        s = self.engine.cfg.max_seq_len
        b = self.max_batch
        pos = 0
        n = len(ids)
        logits = None
        while pos < n:
            t = 1 if (pos + 1 >= s and n - pos > 1) else min(n - pos, _CHUNK, max(s - pos, 1))
            tokens = np.zeros((b, t), np.int32)
            tokens[slot, :t] = ids[pos : pos + t]
            valid = np.zeros((b, t), bool)
            valid[slot] = True
            posv = self._pos.copy()
            posv[slot] = pos
            is_last = pos + t >= n
            out, self.cache = self.engine.step(
                tokens,
                posv,
                self.cache,
                jnp.asarray(valid),
                logits_mode="all" if is_last else "none",
            )
            if is_last:
                logits = np.asarray(out)[slot, t - 1]
            pos += t
        self._pos[slot] = n
        self._next_tok[slot] = int(np.argmax(logits))

    def _retire(self, slot: int) -> None:
        req = self.slots[slot]
        req.done = True
        req.finished_s = time.perf_counter()
        self.completed.append(req)
        self.slots[slot] = None

    # ------------------------------------------------------------------ tick

    def step(self) -> bool:
        """One scheduler tick: admit -> batched decode -> retire.
        Returns False when nothing is left to do."""
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return bool(self._waiting)

        # each active slot's _next_tok is its freshly sampled token: emit it
        for i in active:
            req = self.slots[i]
            tok = int(self._next_tok[i])
            req.out_tokens.append(tok)
            if req.on_token:
                req.on_token(tok)
            stop = (
                req.stop_on_eos
                and self.engine.tokenizer is not None
                and self.engine.tokenizer.is_stop(tok)
            )
            if stop or len(req.out_tokens) >= req.max_new_tokens:
                self._retire(i)

        active = [i for i, s in enumerate(self.slots) if s is not None]
        if not active:
            return bool(self._waiting) or any(s is not None for s in self.slots)

        b = self.max_batch
        if self.segment > 1:
            # device-side scan: all slots step `segment` tokens in one
            # dispatch. Idle slots decode junk into their own (about to be
            # re-prefilled, kv_len-masked) cache regions — harmless.
            out, self.cache = self.engine.decode_scan(
                self._next_tok.copy(), self._pos.copy(), self.cache, self.segment
            )
            out = np.asarray(out)
            delivered = 0
            for i in active:
                req = self.slots[i]
                stopped = False
                # emit all but the last sampled token; the last becomes the
                # pending _next_tok (emitted at the next tick, like tick start)
                for tok in out[i, :-1]:
                    tok = int(tok)
                    req.out_tokens.append(tok)
                    delivered += 1
                    if req.on_token:
                        req.on_token(tok)
                    if (
                        req.stop_on_eos
                        and self.engine.tokenizer is not None
                        and self.engine.tokenizer.is_stop(tok)
                    ) or len(req.out_tokens) >= req.max_new_tokens:
                        stopped = True
                        break
                if stopped:
                    self._retire(i)
                else:
                    self._next_tok[i] = int(out[i, -1])
                    self._pos[i] += self.segment
                    delivered += 1  # the pending token, emitted next tick
            self.decode_steps += self.segment
            self.decoded_tokens += delivered
            return True

        valid = np.zeros((b, 1), bool)
        valid[active] = True
        tokens = self._next_tok.reshape(b, 1).copy()
        logits, self.cache = self.engine.step(
            tokens, self._pos.copy(), self.cache, jnp.asarray(valid), logits_mode="last"
        )
        logits = np.asarray(logits)
        for i in active:
            self._next_tok[i] = int(np.argmax(logits[i]))
            self._pos[i] += 1
        self.decode_steps += 1
        self.decoded_tokens += len(active)
        return True

    def run(self) -> list[Request]:
        """Drain all submitted requests to completion."""
        while self.step():
            pass
        return self.completed
