"""Pipeline parallelism: the layer stack sharded over a ``pp`` mesh axis.

Target-platform extension (SURVEY.md §2.4; the reference is single-device).
Capacity-mode inference pp: device s holds layers [s*L/PP, (s+1)*L/PP)
AND their KV-cache slice, so weight + cache memory divide by PP — the
lever that fits a model too big for one chip's HBM. The stacked (L, ...)
layout (models/params.py) makes the sharding a plain leading-dim split;
sequencing runs inside ``shard_map`` with a ppermute ring handing the
residual stage to stage (llama.forward(pp_axis=...)).

One sequence's forward is inherently sequential across stages, so pp
buys memory, not single-stream speed; batch throughput comes from
composing dp on top (the batcher) or the microbatch-overlap extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xalm_tpu.models.config import ModelConfig
from xalm_tpu.parallel.mesh import AXIS_TP
from xalm_tpu.models.llama import forward
from xalm_tpu.models.params import ModelParams
from xalm_tpu.runtime.cache import KVCache
from xalm_tpu.runtime.engine import Engine
from xalm_tpu.tokenizer import Tokenizer

__all__ = ["AXIS_PP", "make_pp_mesh", "PipelinedEngine"]

AXIS_PP = "pp"


def make_pp_mesh(pp: int, tp: int = 1, devices=None) -> Mesh:
    """A (pp,) or (pp, tp) mesh: stages over pp, megatron tensor
    parallelism within each stage over tp (ICI-adjacent devices)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if pp * tp > len(devices):
        raise ValueError(f"pp*tp={pp}*{tp} > {len(devices)} devices")
    if tp == 1:
        return Mesh(np.array(devices[:pp]), (AXIS_PP,))
    return Mesh(np.array(devices[: pp * tp]).reshape(pp, tp), (AXIS_PP, AXIS_TP))


def _param_pspecs(params: ModelParams, tp: int = 1) -> ModelParams:
    """Layer-stacked arrays shard on their leading L dim (and, with tp > 1,
    megatron column/row within each stage — shardings.param_pspecs layout);
    embed, head, and final norm are replicated on every device (the head's
    matmul runs on the psum-broadcast final residual)."""
    from xalm_tpu.models.params import LayerParams, QWeight

    tpa = AXIS_TP if tp > 1 else None
    col = QWeight(values=P(AXIS_PP, tpa, None), scale=P(AXIS_PP, tpa))
    row = QWeight(values=P(AXIS_PP, None, tpa), scale=P(AXIS_PP, None))
    layers = LayerParams(
        attn_norm=P(AXIS_PP, None),
        wqkv=col,
        wo=row,
        mlp_norm=P(AXIS_PP, None),
        w13=col,
        w2=row,
        bqkv=P(AXIS_PP, tpa),
        # MoE expert stacks shard by layer like everything else (E local)
        wgate=P(AXIS_PP, None, None),
        w13e=QWeight(
            values=P(AXIS_PP, None, None, None), scale=P(AXIS_PP, None, None)
        ),
        w2e=QWeight(
            values=P(AXIS_PP, None, None, None), scale=P(AXIS_PP, None, None)
        ),
        post_attn_norm=P(AXIS_PP, None),
        post_mlp_norm=P(AXIS_PP, None),
        q_norm=P(AXIS_PP, None),
        k_norm=P(AXIS_PP, None),
    )

    def repl(x):
        return None if x is None else P(*([None] * x.ndim))

    specs = ModelParams(
        embed=jax.tree.map(repl, params.embed),
        layers=layers,
        out_norm=repl(params.out_norm),
        wcls=jax.tree.map(repl, params.wcls),
    )

    def fix(spec, x):
        if x is None:
            return None
        if isinstance(x, QWeight):
            return QWeight(spec.values, spec.scale if x.scale is not None else None)
        return spec

    return jax.tree.map(
        fix, specs, params,
        is_leaf=lambda x: isinstance(x, (QWeight, P)) or x is None,
    )


def _cache_pspecs(quantized: bool, tp: int = 1) -> KVCache:
    tpa = AXIS_TP if tp > 1 else None
    spec = P(AXIS_PP, None, tpa, None, None)  # (L, B, KH, S, hd)
    sspec = P(AXIS_PP, None, tpa, None) if quantized else None
    return KVCache(k=spec, v=spec, k_scale=sspec, v_scale=sspec)


class PipelinedEngine(Engine):
    """Engine with the layer stack pipeline-sharded over a pp mesh.

    Builds its own shard_map step/decode-scan; the portable per-chunk
    prefill/perplexity paths are inherited (the class contract for
    subclasses that leave _prefill_chunks/_ppl_scan as None)."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: ModelParams,
        tokenizer: Tokenizer | None,
        mesh: Mesh,
        *,
        kv_dtype="auto",
        compute_dtype="auto",
    ):
        pp = mesh.shape[AXIS_PP]
        tp = mesh.shape.get(AXIS_TP, 1)
        if cfg.n_layers % pp != 0:
            raise ValueError(f"pp={pp} must divide n_layers={cfg.n_layers}")
        if tp > 1:
            from xalm_tpu.parallel.shardings import validate_tp

            validate_tp(cfg, tp)
            if params.layers.w13e is not None:
                raise NotImplementedError(
                    "MoE + tp: expert stacks are not tp-sharded yet; "
                    "use a pp-only mesh"
                )
        self.mesh = mesh
        self._tp = tp

        # the scalar-prefetch Pallas kernels index the FULL stacked weight
        # buffer; under pp each device holds a slice, so the XLA matmul path
        # (which slices locally) serves the stages
        super().__init__(
            cfg, params, tokenizer,
            kv_dtype=kv_dtype, compute_dtype=compute_dtype,
            matmul_impl="xla", fused_step=False,
        )
        pspecs = _param_pspecs(self.params, tp)
        self.params = jax.tree.map(
            lambda x, s: None if x is None else jax.device_put(
                x, NamedSharding(mesh, s)
            ),
            self.params, pspecs, is_leaf=lambda x: x is None,
        )
        self._pspecs = pspecs
        cdt = self.compute_dtype
        repl = P()

        def _make_fwd(logits_mode: str):
            cspecs = _cache_pspecs(
                jnp.dtype(self.kv_dtype) == jnp.dtype(jnp.int8), tp
            )
            out_logits = None if logits_mode == "none" else repl

            def local(params, tokens, pos, cache, valid):
                return forward(
                    params, cfg, tokens, pos, cache, valid,
                    logits_mode=logits_mode, compute_dtype=cdt,
                    matmul_impl="xla", pp_axis=AXIS_PP,
                    tp_axis=AXIS_TP if tp > 1 else None, fused_step=False,
                )

            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(pspecs, repl, repl, cspecs, repl),
                out_specs=(out_logits, cspecs),
                check_vma=False,
            )

        fwds = {m: _make_fwd(m) for m in ("none", "last", "all", "token")}

        def _fwd(params, tokens, pos, cache, valid, *, logits_mode):
            if valid is None:
                valid = jnp.ones(tokens.shape, bool)
            return fwds[logits_mode](params, tokens, pos, cache, valid)

        self._fwd = jax.jit(_fwd, static_argnames=("logits_mode",), donate_argnums=(3,))
        self._fwd_raw = _fwd

        def _decode_scan(params, token0, pos0, cache, n_steps: int, valid):
            if valid is None:
                valid = jnp.ones(token0.shape, bool)
            step_fn = fwds["token"]

            def step(carry, _):
                token, p, c = carry
                nxt, c = step_fn(params, token[:, None], p, c, valid[:, None])
                return (nxt, p + 1, c), nxt

            (tok, p, cache), tokens = jax.lax.scan(
                step, (token0, pos0, cache), None, length=n_steps
            )
            return tokens.T, cache

        self._decode_scan = jax.jit(
            _decode_scan, static_argnames=("n_steps",), donate_argnums=(3,)
        )
        self._sample_scan = None  # stochastic decode: not built for pp yet
        self._sample_scan_rows = None
        # Engine.__init__ set instance attrs for its plain-jit fast paths;
        # on pp-sharded params those would dynamic-slice L-sharded stacks
        # (GSPMD all-gathers the whole weight set — OOM in exactly the
        # capacity regime pp exists for). Null them: the portable per-chunk
        # prefill/perplexity paths run the shard_map step instead.
        self._prefill_chunks = None
        self._ppl_scan = None

    @classmethod
    def from_xalm(cls, path: str, mesh: Mesh, *, context: int = 0,
                  kv_dtype="auto", compute_dtype="auto",
                  fp8_mode: str = "auto") -> "PipelinedEngine":
        from xalm_tpu.io import XalmFile
        from xalm_tpu.models.params import load_params

        xf = XalmFile(path)
        cfg = ModelConfig.from_metadata(xf.config, context)
        # host-side load: committing the full weight set to device 0 before
        # resharding would OOM in the capacity regime pp exists for
        params = load_params(xf, cfg, device_put=False, fp8_mode=fp8_mode)
        tokenizer = Tokenizer.from_xalm(xf) if "tokenizer.tokens" in xf else None
        chat_template = xf.config.get("chat_template")
        xf.close()
        eng = cls(cfg, params, tokenizer, mesh,
                  kv_dtype=kv_dtype, compute_dtype=compute_dtype)
        eng.chat_template = chat_template
        return eng

    def new_cache(self, batch: int = 1) -> KVCache:
        quantized = jnp.dtype(self.kv_dtype) == jnp.dtype(jnp.int8)
        cspecs = _cache_pspecs(quantized, self._tp)
        shardings = jax.tree.map(
            lambda s: None if s is None else NamedSharding(self.mesh, s),
            cspecs, is_leaf=lambda x: x is None,
        )
        # born sharded (jit out_shardings): no device ever materializes the
        # whole cache — the capacity constraint pp exists to relieve
        init = jax.jit(
            lambda: KVCache.init(self.cfg, batch, self.kv_dtype),
            out_shardings=shardings,
        )
        with self.mesh:
            return init()
