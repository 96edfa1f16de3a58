"""Tensor/data-parallel engine: the single-chip Engine over a device mesh.

``forward`` runs under ``jax.shard_map`` with megatron-style local shards
(xalm_tpu/parallel/shardings.py): every matmul and the Pallas kernels see
local arrays, the two row-parallel reductions psum over ICI inside the layer
scan, and greedy sampling does a distributed argmax over the vocab-sharded
logits. dp shards the batch (continuous-batching slots) with no collectives
on the decode path.

The reference has no distributed mode (SURVEY.md §2.4); this is the
target-platform extension scaled per BASELINE.json (tensor-sharded weights +
KV over a v5e slice, >=85% 2-host efficiency target).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xalm_tpu.models.config import ModelConfig
from xalm_tpu.models.llama import forward
from xalm_tpu.models.params import ModelParams, QWeight
from xalm_tpu.parallel.mesh import AXIS_DP, AXIS_TP
from xalm_tpu.parallel.shardings import cache_pspecs, param_pspecs, validate_tp
from xalm_tpu.runtime.cache import KVCache
from xalm_tpu.runtime.engine import Engine
from xalm_tpu.tokenizer import Tokenizer

__all__ = ["ShardedEngine", "sharded_argmax", "sharded_token_logprobs"]


def sharded_token_logprobs(logits: jax.Array, targets: jax.Array, axis_name: str) -> jax.Array:
    """log softmax(logits)[target] over a vocab-sharded (B, V_local) logits
    array (the tp analogue of sampler.token_logprobs): local max/sum-exp with
    pmax/psum reductions, target logit fetched from whichever shard owns the
    global index — no full-vocab all-gather."""
    logits = logits.astype(jnp.float32)
    vloc = logits.shape[-1]
    shard = jax.lax.axis_index(axis_name)
    m = jax.lax.pmax(jnp.max(logits, axis=-1), axis_name)  # (B,)
    se = jax.lax.psum(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1), axis_name)
    lse = m + jnp.log(se)
    loc_t = targets.astype(jnp.int32) - shard * vloc
    in_shard = (loc_t >= 0) & (loc_t < vloc)
    tl = jnp.take_along_axis(logits, jnp.clip(loc_t, 0, vloc - 1)[:, None], axis=-1)[:, 0]
    tl = jax.lax.psum(jnp.where(in_shard, tl, 0.0), axis_name)
    return tl - lse


def sharded_argmax(logits: jax.Array, axis_name: str) -> jax.Array:
    """Greedy token over a vocab-sharded (B, V_local) logits array.

    Local argmax per shard, then a global winner pick over the tp axis —
    no full-vocab all-gather.
    """
    vloc = logits.shape[-1]
    loc_idx = jnp.argmax(logits, axis=-1)  # (B,)
    loc_val = jnp.take_along_axis(logits, loc_idx[:, None], axis=-1)[:, 0]
    shard = jax.lax.axis_index(axis_name)
    glob_idx = loc_idx + shard * vloc
    vals = jax.lax.all_gather(loc_val, axis_name)  # (tp, B)
    idxs = jax.lax.all_gather(glob_idx, axis_name)  # (tp, B)
    winner = jnp.argmax(vals, axis=0)  # (B,)
    return jnp.take_along_axis(idxs, winner[None], axis=0)[0].astype(jnp.int32)


def _pspecs_like(params: ModelParams, cfg: ModelConfig) -> ModelParams:
    """param_pspecs with scale specs dropped wherever params carry None
    (pytree structures must match for shard_map)."""
    specs = param_pspecs(cfg)

    def fix(qw_spec, qw):
        if qw is None:  # absent optional field (e.g. bqkv without bias)
            return None
        if isinstance(qw, QWeight):
            return QWeight(
                qw_spec.values, qw_spec.scale if qw.scale is not None else None
            )
        return qw_spec

    return jax.tree.map(
        fix,
        specs,
        params,
        is_leaf=lambda x: isinstance(x, QWeight) or x is None,
    )


class ShardedEngine(Engine):
    """Engine whose step functions run under shard_map over a (dp, tp) mesh."""

    def decode_path(self, batch: int = 1) -> str:
        # the megakernel is single-device (forward gates on tp_axis); every
        # sharded decode step runs the per-layer kernels inside shard_map
        return (
            f"perlayer (shard_map dp={self.mesh.shape[AXIS_DP]}"
            f" tp={self.mesh.shape[AXIS_TP]})"
        )

    def __init__(
        self,
        cfg: ModelConfig,
        params: ModelParams,
        tokenizer: Tokenizer | None,
        mesh: Mesh,
        *,
        kv_dtype="auto",
        compute_dtype="auto",
        matmul_impl: str = "auto",
        a8_prefill: bool = False,
        abstract: bool = False,
    ):
        self.mesh = mesh
        self.abstract = abstract
        tp = mesh.shape[AXIS_TP]
        validate_tp(cfg, tp)

        if matmul_impl == "auto":
            matmul_impl = "pallas" if jax.default_backend() == "tpu" else "xla"

        pspecs = _pspecs_like(params, cfg)
        from xalm_tpu.parallel.multihost import make_global

        if abstract:
            # AOT mode (parallel/aot.py): params become ShapeDtypeStructs
            # sharded over a (possibly topology-only) mesh — nothing is
            # materialized, so _fwd can be lower()ed and compile()d against
            # a TPU topology with zero real chips. step()/generate() will
            # fail by construction; this engine is for compilation only.
            params = jax.tree.map(
                lambda x, s: None
                if x is None
                else jax.ShapeDtypeStruct(
                    x.shape, x.dtype, sharding=NamedSharding(mesh, s)
                ),
                params,
                pspecs,
                is_leaf=lambda x: x is None,
            )
        else:
            params = jax.tree.map(
                lambda x, s: None if x is None else make_global(mesh, s, x),
                params,
                pspecs,
                is_leaf=lambda x: x is None,
            )

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        if kv_dtype == "auto":
            kv_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float16
        self.kv_dtype = kv_dtype
        if compute_dtype == "auto":
            compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        self.compute_dtype = compute_dtype
        self.matmul_impl = matmul_impl
        quantized_kv = jnp.dtype(kv_dtype) == jnp.dtype(jnp.int8)
        cspecs = cache_pspecs(cfg, quantized_kv)

        data_spec = P(AXIS_DP)  # tokens/pos/valid: batch over dp
        tok2 = P(AXIS_DP, None)

        def local_fwd(params, tokens, pos, cache, valid, logits_mode):
            logits, cache = forward(
                params,
                cfg,
                tokens,
                pos,
                cache,
                valid,
                logits_mode=logits_mode,
                compute_dtype=compute_dtype,
                matmul_impl=matmul_impl,
                a8_prefill=a8_prefill,
                tp_axis=AXIS_TP,
            )
            return logits, cache

        def make_fwd(logits_mode):
            out_logits_spec = (
                P(AXIS_DP, AXIS_TP)
                if logits_mode == "last"
                else P(AXIS_DP, None, AXIS_TP)
            )
            fn = jax.shard_map(
                lambda p, t, ps, c, v: local_fwd(p, t, ps, c, v, logits_mode),
                mesh=mesh,
                in_specs=(pspecs, tok2, data_spec, cspecs, tok2),
                out_specs=(out_logits_spec, cspecs),
                check_vma=False,
            )
            return fn

        fwd_last = make_fwd("last")
        fwd_all = make_fwd("all")
        fwd_none = jax.shard_map(
            lambda p, t, ps, c, v: local_fwd(p, t, ps, c, v, "none")[1],
            mesh=mesh,
            in_specs=(pspecs, tok2, data_spec, cspecs, tok2),
            out_specs=cspecs,
            check_vma=False,
        )

        def _fwd(params, tokens, pos, cache, valid, *, logits_mode):
            if valid is None:
                valid = jnp.ones(tokens.shape, bool)
            if logits_mode == "none":
                return None, fwd_none(params, tokens, pos, cache, valid)
            fn = fwd_last if logits_mode == "last" else fwd_all
            return fn(params, tokens, pos, cache, valid)

        self._fwd = jax.jit(_fwd, static_argnames=("logits_mode",), donate_argnums=(3,))
        # unjitted: runtime/spec.py composes device-side argmax on top
        self._fwd_raw = _fwd

        def _decode_scan(params, token0, pos0, cache, n_steps: int, valid=None):
            if valid is None:
                valid = jnp.ones(token0.shape, bool)

            def local(params, token0, pos0, cache, valid):
                def step(carry, _):
                    tok, p, cache = carry
                    logits, cache = forward(
                        params,
                        cfg,
                        tok[:, None],
                        p,
                        cache,
                        valid[:, None],
                        logits_mode="last",
                        compute_dtype=compute_dtype,
                        matmul_impl=matmul_impl,
                        tp_axis=AXIS_TP,
                    )
                    nxt = sharded_argmax(logits, AXIS_TP)
                    return (nxt, p + 1, cache), nxt

                (tok, p, cache), toks = jax.lax.scan(
                    step, (token0, pos0, cache), None, length=n_steps
                )
                return toks.T, cache

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(pspecs, data_spec, data_spec, cspecs, data_spec),
                out_specs=(tok2, cspecs),
                check_vma=False,
            )(params, token0, pos0, cache, valid)

        self._decode_scan = jax.jit(
            _decode_scan, static_argnames=("n_steps",), donate_argnums=(3,)
        )

        def _sample_scan(
            params, token0, pos0, cache, key0,
            n_steps: int, temperature: float, top_k: int, top_p: float, valid=None
        ):
            """Stochastic decode scan under shard_map (Engine._sample_scan
            parity): logits all_gather over the vocab shards, then every
            device in a tp group draws the same token from the same key;
            dp groups fold their axis index into the key so equal prompts
            on different dp rows stay independent."""
            from xalm_tpu.sampler import sample

            if valid is None:
                valid = jnp.ones(token0.shape, bool)

            def local(params, token0, pos0, cache, valid, key0):
                key0 = jax.random.fold_in(key0, jax.lax.axis_index(AXIS_DP))

                def step(carry, _):
                    tok, p, cache, key = carry
                    logits, cache = forward(
                        params, cfg, tok[:, None], p, cache, valid[:, None],
                        logits_mode="last",
                        compute_dtype=compute_dtype,
                        matmul_impl=matmul_impl,
                        tp_axis=AXIS_TP,
                    )
                    full = jax.lax.all_gather(logits, AXIS_TP, axis=1, tiled=True)
                    key, sub = jax.random.split(key)
                    nxt = sample(
                        full, sub, temperature=temperature, top_k=top_k, top_p=top_p
                    )
                    return (nxt, p + 1, cache, key), nxt

                (tok, p, cache, _), toks = jax.lax.scan(
                    step, (token0, pos0, cache, key0), None, length=n_steps
                )
                return toks.T, cache

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(pspecs, data_spec, data_spec, cspecs, data_spec, P()),
                out_specs=(tok2, cspecs),
                check_vma=False,
            )(params, token0, pos0, cache, valid, key0)

        self._sample_scan = jax.jit(
            _sample_scan,
            static_argnames=("n_steps", "temperature", "top_k", "top_p"),
            donate_argnums=(3,),
        )

        # ---- scanned fast paths (feature parity with Engine: prefill whole
        # chunk blocks / score wrapped-ppl segments in ONE dispatch instead of
        # per-chunk / per-token stepping — the dispatch-latency trap the
        # engine docstrings warn about applies just the same under shard_map)

        def _prefill_chunks_local(params, tokens_c, pos0, cache):
            def body(carry, toks):
                p, c = carry
                _, c = forward(
                    params, cfg, toks, p, c, None,
                    logits_mode="none", compute_dtype=compute_dtype,
                    matmul_impl=matmul_impl, a8_prefill=a8_prefill,
                    tp_axis=AXIS_TP,
                )
                return (p + toks.shape[-1], c), None

            (_, cache), _ = jax.lax.scan(body, (pos0, cache), tokens_c)
            return cache

        prefill_chunks_sm = jax.jit(
            jax.shard_map(
                _prefill_chunks_local,
                mesh=mesh,
                in_specs=(pspecs, P(None, AXIS_DP, None), data_spec, cspecs),
                out_specs=cspecs,
                check_vma=False,
            ),
            donate_argnums=(3,),
        )

        def _prefill_chunks(params, tokens_c, pos0, cache):
            # pad the batch to the dp-padded cache batch; padding rows run an
            # unmasked junk prefill of their OWN rows (chunk contract: no
            # wrap), which real use later overwrites — same safety argument
            # as Engine's blind full-chunk writes
            bp = cache.batch
            toks = np.asarray(tokens_c, np.int32)
            c, b, ch = toks.shape
            if b != bp:
                toks = np.concatenate(
                    [toks, np.zeros((c, bp - b, ch), np.int32)], axis=1
                )
            pos = self._pad_to(np.asarray(pos0, np.int32), bp)
            return prefill_chunks_sm(
                params,
                self._global(toks, P(None, AXIS_DP, None)),
                self._global(pos, P(AXIS_DP)),
                cache,
            )

        self._prefill_chunks = _prefill_chunks

        def _ppl_scan_local(params, toks, tgts, pos0, cache):
            def step(carry, inp):
                p, c = carry
                t, tgt = inp
                logits, c = forward(
                    params, cfg, t[:, None], p, c,
                    logits_mode="last", compute_dtype=compute_dtype,
                    matmul_impl=matmul_impl, tp_axis=AXIS_TP,
                )
                lp = sharded_token_logprobs(logits, tgt, AXIS_TP)
                return (p + 1, c), lp

            (_, cache), lps = jax.lax.scan(step, (pos0, cache), (toks.T, tgts.T))
            return lps.T, cache

        ppl_scan_sm = jax.jit(
            jax.shard_map(
                _ppl_scan_local,
                mesh=mesh,
                in_specs=(pspecs, tok2, tok2, data_spec, cspecs),
                out_specs=(tok2, cspecs),
                check_vma=False,
            ),
            donate_argnums=(4,),
        )

        def _ppl_scan(params, toks, tgts, pos0, cache):
            bp = cache.batch
            toks = np.asarray(toks, np.int32)
            b = toks.shape[0]
            # padding rows teacher-force token 0 through their own (junk)
            # rows; their log-probs are sliced away below
            toksp = self._pad_to(toks, bp)
            tgtsp = self._pad_to(np.asarray(tgts, np.int32), bp)
            posp = self._pad_to(np.asarray(pos0, np.int32), bp)
            lps, cache = ppl_scan_sm(
                params,
                self._global(toksp, P(AXIS_DP, None)),
                self._global(tgtsp, P(AXIS_DP, None)),
                self._global(posp, P(AXIS_DP)),
                cache,
            )
            if b != bp and jax.process_count() == 1:
                lps = lps[:b]
            return lps, cache

        self._ppl_scan = _ppl_scan

    @classmethod
    def from_xalm(
        cls, path: str, mesh: Mesh, *, context: int = 0, fp8_mode: str = "auto", **kw
    ) -> "ShardedEngine":
        from xalm_tpu.io import XalmFile
        from xalm_tpu.models.params import load_params

        xf = XalmFile(path)
        cfg = ModelConfig.from_metadata(xf.config, context)
        params = load_params(xf, cfg, device_put=False, fp8_mode=fp8_mode)
        tokenizer = Tokenizer.from_xalm(xf) if "tokenizer.tokens" in xf else None
        xf.close()
        return cls(cfg, params, tokenizer, mesh, **kw)

    # ------------------------------------------------------ batch padding
    # dp shards the batch dimension, so every global batch must be a
    # multiple of dp. Pad transparently: extra rows are valid=False in both
    # step() and decode_scan(), so they neither write the cache nor rotate
    # sinks (their logits/tokens are sliced away before returning).

    def _pad_to(self, arr, bp: int, fill=0):
        arr = np.asarray(arr)
        b = arr.shape[0]
        if b == bp:
            return arr
        pad = np.full((bp - b,) + arr.shape[1:], fill, arr.dtype)
        return np.concatenate([arr, pad], axis=0)

    def _global(self, arr, spec):
        from xalm_tpu.parallel.multihost import make_global

        return make_global(self.mesh, spec, arr)

    def new_cache(self, batch: int = 1) -> KVCache:
        dp = self.mesh.shape[AXIS_DP]
        batch = -(-batch // dp) * dp
        quantized = jnp.dtype(self.kv_dtype) == jnp.dtype(jnp.int8)
        cspecs = cache_pspecs(self.cfg, quantized)
        if self.abstract:
            # AOT mode: an aval-only cache carrying the real shardings
            host = jax.eval_shape(lambda: KVCache.init(self.cfg, batch, self.kv_dtype))
            return jax.tree.map(
                lambda a, s: None
                if a is None
                else jax.ShapeDtypeStruct(
                    a.shape, a.dtype, sharding=NamedSharding(self.mesh, s)
                ),
                host,
                cspecs,
                is_leaf=lambda x: x is None,
            )
        shardings = jax.tree.map(
            lambda s: None if s is None else NamedSharding(self.mesh, s),
            cspecs,
            is_leaf=lambda x: x is None,
        )
        # jit-initialized with out_shardings: the zero cache is born sharded
        # on every host's devices — no process ever materializes (or could
        # address) the whole multi-host buffer
        init = jax.jit(
            lambda: KVCache.init(self.cfg, batch, self.kv_dtype),
            out_shardings=shardings,
        )
        return init()

    def step(self, tokens, pos, cache: KVCache, valid=None, logits_mode="last"):
        tokens = np.asarray(tokens, np.int32)
        pos = np.asarray(pos, np.int32)
        b, bp = tokens.shape[0], cache.batch
        if valid is None and b != bp:
            valid = np.ones(tokens.shape, bool)
        tokens = self._pad_to(tokens, bp)
        pos = self._pad_to(pos, bp)
        if valid is not None:
            valid = self._pad_to(np.asarray(valid, bool), bp, fill=False)
        out, cache = self._fwd(
            self.params,
            self._global(tokens, P(AXIS_DP, None)),
            self._global(pos, P(AXIS_DP)),
            cache,
            # valid=None keeps the blind in-place chunk-write fast path
            None if valid is None else self._global(valid, P(AXIS_DP, None)),
            logits_mode=logits_mode,
        )
        if out is not None and b != bp and jax.process_count() == 1:
            out = out[:b]
        return out, cache

    def decode_scan(self, tokens, pos, cache: KVCache, n_steps: int, valid=None):
        tokens = np.asarray(tokens, np.int32)
        b, bp = tokens.shape[0], cache.batch
        if valid is None and b != bp:
            valid = np.ones((b,), bool)
        if valid is not None:
            valid = self._global(
                self._pad_to(np.asarray(valid, bool), bp, fill=False), P(AXIS_DP)
            )
        toks, cache = self._decode_scan(
            self.params,
            self._global(self._pad_to(tokens, bp).astype(np.int32), P(AXIS_DP)),
            self._global(self._pad_to(np.asarray(pos, np.int32), bp), P(AXIS_DP)),
            cache,
            n_steps,
            valid,
        )
        if b != bp and jax.process_count() == 1:
            toks = toks[:b]
        return toks, cache
