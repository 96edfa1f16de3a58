"""xalm_tpu — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of jubruckne/Xalm
(a C++ fork of andrewkchan/yalm):

- ``.xalm`` frozen-weight container reader/writer (reference format:
  /root/reference/src/xalm.h:90-192, convert.py:248-321).
- HF-safetensors converter with weight-only FP16/BF16/FP8(E4M3/E5M2)/INT8
  quantization and an ``--analyze`` error-study mode.
- Llama/Mistral model family: GQA attention with a StreamingLLM sink+ring
  sliding-window KV cache, interleaved RoPE, GLU FFN.
- Fused dequant+matmul Pallas decode kernels; batched XLA prefill.
- Tensor-parallel / data-parallel sharding over a ``jax.sharding.Mesh``.
- completion / perplexity / passkey CLI harness with tok/s, latency and
  achieved-bandwidth-vs-roofline reporting.

The compute path is pure functional JAX (jit + lax control flow + Pallas);
nothing here is a port of the reference's C++ — see SURVEY.md for the
behavioral contract and PARITY.md for the component crosswalk.

Quick start::

    from xalm_tpu import Engine
    eng = Engine.from_xalm("model.xalm")
    tokens, stats = eng.generate(eng.tokenizer.encode("Hello"), 128)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (keep `import xalm_tpu` free of jax startup)
    if name == "Engine":
        from xalm_tpu.runtime.engine import Engine

        return Engine
    if name == "ShardedEngine":
        from xalm_tpu.parallel.sharded_engine import ShardedEngine

        return ShardedEngine
    if name == "PipelinedEngine":
        from xalm_tpu.parallel.pipeline import PipelinedEngine

        return PipelinedEngine
    if name == "ContinuousBatcher":
        from xalm_tpu.serve.batching import ContinuousBatcher

        return ContinuousBatcher
    if name == "Request":
        from xalm_tpu.serve.batching import Request

        return Request
    if name == "generate_spec":
        from xalm_tpu.runtime.spec import generate_spec

        return generate_spec
    if name == "XalmFile":
        from xalm_tpu.io import XalmFile

        return XalmFile
    raise AttributeError(f"module 'xalm_tpu' has no attribute {name!r}")
